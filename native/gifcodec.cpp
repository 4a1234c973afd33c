// gifgan_tpu native GIF codec.
//
// The reference leans on moviepy/imageio/ffmpeg for GIF IO (avi_2_gif.py:5,
// utils.py:132-147, model_sampler.py:26-28) — native code living in
// third-party dependencies. Here the hot GIF path is first-party C++:
// a GIF87a/89a LZW decoder (frame compositing incl. disposal + transparency
// + interlace) and a GIF89a encoder (web-safe 6x6x6 cube + 40-gray global
// palette, LZW with dynamic code sizes), exposed as a C ABI for ctypes.
//
// Build: make -C native   ->  libgifgan_native.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Reader {
  const uint8_t* p;
  size_t len;
  size_t pos = 0;
  bool ok = true;

  uint8_t u8() {
    if (pos >= len) { ok = false; return 0; }
    return p[pos++];
  }
  uint16_t u16() {  // little-endian
    uint16_t lo = u8(), hi = u8();
    return static_cast<uint16_t>(lo | (hi << 8));
  }
  void skip(size_t n) {
    if (pos + n > len) { ok = false; pos = len; } else { pos += n; }
  }
};

// ---------------------------------------------------------------------------
// LZW decoder (GIF variant): variable code width, clear/EOI codes.
// ---------------------------------------------------------------------------
bool lzw_decode(Reader& r, int min_code_size, std::vector<uint8_t>& out,
                size_t max_pixels) {
  const int kMaxCodes = 4096;
  std::vector<int> prefix(kMaxCodes, -1);
  std::vector<uint8_t> suffix(kMaxCodes), first(kMaxCodes);

  const int clear_code = 1 << min_code_size;
  const int eoi_code = clear_code + 1;
  int next_code = eoi_code + 1;
  int code_size = min_code_size + 1;

  for (int i = 0; i < clear_code; ++i) {
    suffix[i] = static_cast<uint8_t>(i);
    first[i] = static_cast<uint8_t>(i);
  }

  uint32_t bits = 0;
  int nbits = 0;
  int prev = -1;
  std::vector<uint8_t> stack;
  stack.reserve(kMaxCodes);

  int block_remaining = 0;
  for (;;) {
    while (nbits < code_size) {
      if (block_remaining == 0) {
        block_remaining = r.u8();
        if (!r.ok) return false;
        if (block_remaining == 0) return true;  // terminator
      }
      bits |= static_cast<uint32_t>(r.u8()) << nbits;
      nbits += 8;
      --block_remaining;
      if (!r.ok) return false;
    }
    int code = static_cast<int>(bits & ((1u << code_size) - 1));
    bits >>= code_size;
    nbits -= code_size;

    if (code == clear_code) {
      next_code = eoi_code + 1;
      code_size = min_code_size + 1;
      prev = -1;
      continue;
    }
    if (code == eoi_code) {
      // consume remaining sub-blocks INCLUDING the 0x00 terminator (the old
      // while-loop skipped nothing when block_remaining was already 0,
      // leaving the terminator to be misread as a block type and dropping
      // all later frames)
      r.skip(block_remaining);
      for (;;) {
        uint8_t sz = r.u8();
        if (!r.ok || sz == 0) break;
        r.skip(sz);
      }
      return true;
    }

    int entry = code;
    if (code >= next_code) {          // KwKwK case
      if (prev < 0) return false;
      stack.push_back(first[prev]);
      entry = prev;
    }
    while (entry >= clear_code) {     // walk the chain
      stack.push_back(suffix[entry]);
      entry = prefix[entry];
      if (static_cast<int>(stack.size()) > kMaxCodes) return false;
    }
    stack.push_back(suffix[entry]);

    for (auto it = stack.rbegin(); it != stack.rend(); ++it) {
      if (out.size() >= max_pixels) break;
      out.push_back(*it);
    }
    stack.clear();

    if (prev >= 0 && next_code < kMaxCodes) {
      prefix[next_code] = prev;
      suffix[next_code] = first[code < next_code ? code : prev];
      first[next_code] = first[prev];
      ++next_code;
      if (next_code == (1 << code_size) && code_size < 12) ++code_size;
    }
    prev = code;
    if (out.size() >= max_pixels) {
      // Drain remaining sub-blocks up to AND INCLUDING the 0x00 terminator,
      // unconditionally: when the pixel cap lands exactly on a sub-block
      // boundary (block_remaining == 0) there is still a final sub-block
      // holding the EOI code plus the terminator; leaving them unconsumed
      // makes the next byte get misparsed as a block type and silently
      // drops all later frames.
      r.skip(block_remaining);
      for (;;) {
        uint8_t sz = r.u8();
        if (!r.ok || sz == 0) break;
        r.skip(sz);
      }
      return true;
    }
  }
}

const int kInterlaceStart[4] = {0, 4, 2, 1};
const int kInterlaceStep[4] = {8, 8, 4, 2};

}  // namespace

extern "C" {

// Decode a GIF byte buffer into RGB frames.
// Returns 0 on success. Caller frees *out_frames with gifgan_free.
// Frames are (n, h, w, 3) row-major uint8, fully composited.
int gifgan_decode(const uint8_t* data, size_t len, uint8_t** out_frames,
                  int* out_w, int* out_h, int* out_n, int max_frames) {
  // DoS hardening (fuzz corpus, round 2): a 19-byte crafted input could
  // declare a 65535x65535 logical screen -> 12.9 GB canvas zero-init and
  // per-frame copy (measured 81 s); caps below bound work linearly in the
  // input size. 16.8M px = 4096x4096 is ~16x any GIF this pipeline meets.
  constexpr size_t kMaxCanvasPixels = 4096u * 4096u;
  constexpr size_t kMaxTotalBytes = 1u << 30;  // 1 GB composited output

  Reader r{data, len};
  if (len < 13 || memcmp(data, "GIF8", 4) != 0) return -1;
  r.skip(6);  // header
  int W = r.u16(), H = r.u16();
  if (W == 0 || H == 0 || static_cast<size_t>(W) * H > kMaxCanvasPixels)
    return -6;
  uint8_t packed = r.u8();
  r.skip(2);  // bg color index + aspect
  int gct_size = (packed & 0x80) ? (2 << (packed & 0x07)) : 0;

  std::vector<uint8_t> gct(3 * 256, 0);
  for (int i = 0; i < gct_size * 3; ++i) gct[i] = r.u8();

  std::vector<uint8_t> canvas(static_cast<size_t>(W) * H * 3, 0);
  std::vector<uint8_t> prev_canvas;
  std::vector<uint8_t> frames;
  int n = 0;

  int transparent = -1;
  int disposal = 0;

  while (r.ok && (max_frames <= 0 || n < max_frames)) {
    uint8_t block = r.u8();
    if (!r.ok || block == 0x3B) break;  // trailer
    if (block == 0x21) {                // extension
      uint8_t label = r.u8();
      if (label == 0xF9) {              // graphic control
        r.u8();                         // size (4)
        uint8_t flags = r.u8();
        r.u16();                        // delay
        int tc = r.u8();
        r.u8();                         // terminator
        disposal = (flags >> 2) & 0x7;
        transparent = (flags & 1) ? tc : -1;
      } else {                          // skip sub-blocks
        for (;;) {
          uint8_t sz = r.u8();
          if (!r.ok || sz == 0) break;
          r.skip(sz);
        }
      }
    } else if (block == 0x2C) {         // image descriptor
      int ix = r.u16(), iy = r.u16(), iw = r.u16(), ih = r.u16();
      if (iw == 0 || ih == 0 ||
          static_cast<size_t>(iw) * ih > kMaxCanvasPixels)
        return -7;
      uint8_t ip = r.u8();
      bool interlaced = ip & 0x40;
      int lct_size = (ip & 0x80) ? (2 << (ip & 0x07)) : 0;
      std::vector<uint8_t> lct;
      const uint8_t* pal = gct.data();
      if (lct_size) {
        lct.resize(3 * 256, 0);
        for (int i = 0; i < lct_size * 3; ++i) lct[i] = r.u8();
        pal = lct.data();
      }
      int min_code = r.u8();
      if (min_code < 2 || min_code > 11) return -2;

      std::vector<uint8_t> idx;
      idx.reserve(static_cast<size_t>(iw) * ih);
      if (!lzw_decode(r, min_code, idx, static_cast<size_t>(iw) * ih))
        return -3;
      idx.resize(static_cast<size_t>(iw) * ih, 0);

      if (disposal == 3) prev_canvas = canvas;

      // compose into canvas (de-interlacing if needed)
      if (interlaced) {
        std::vector<uint8_t> deint(idx.size());
        size_t s = 0;
        for (int pass = 0; pass < 4; ++pass)
          for (int y = kInterlaceStart[pass]; y < ih;
               y += kInterlaceStep[pass])
            for (int x = 0; x < iw; ++x)
              deint[static_cast<size_t>(y) * iw + x] = idx[s++];
        idx.swap(deint);
      }
      for (int y = 0; y < ih; ++y) {
        int cy = iy + y;
        if (cy >= H) break;
        for (int x = 0; x < iw; ++x) {
          int cx = ix + x;
          if (cx >= W) continue;
          int v = idx[static_cast<size_t>(y) * iw + x];
          if (v == transparent) continue;
          size_t off = (static_cast<size_t>(cy) * W + cx) * 3;
          canvas[off] = pal[3 * v];
          canvas[off + 1] = pal[3 * v + 1];
          canvas[off + 2] = pal[3 * v + 2];
        }
      }

      if (frames.size() + canvas.size() > kMaxTotalBytes) return -8;
      frames.insert(frames.end(), canvas.begin(), canvas.end());
      ++n;

      if (disposal == 2) {              // restore to background: clear region
        for (int y = 0; y < ih && iy + y < H; ++y)
          for (int x = 0; x < iw && ix + x < W; ++x)
            memset(&canvas[(static_cast<size_t>(iy + y) * W + ix + x) * 3],
                   0, 3);
      } else if (disposal == 3 && !prev_canvas.empty()) {
        canvas = prev_canvas;
      }
      transparent = -1;
      disposal = 0;
    } else {
      break;  // unknown block
    }
  }

  if (n == 0) return -4;
  uint8_t* buf = static_cast<uint8_t*>(malloc(frames.size()));
  if (!buf) return -5;
  memcpy(buf, frames.data(), frames.size());
  *out_frames = buf;
  *out_w = W;
  *out_h = H;
  *out_n = n;
  return 0;
}

void gifgan_free(void* p) { free(p); }

namespace {

// ---------------------------------------------------------------------------
// Encoder: fixed 6x6x6 color cube (216) + 40 grays global palette, LZW.
// ---------------------------------------------------------------------------
struct BitWriter {
  std::vector<uint8_t>& out;
  uint32_t bits = 0;
  int nbits = 0;
  std::vector<uint8_t> block;

  explicit BitWriter(std::vector<uint8_t>& o) : out(o) {}

  void put(int code, int width) {
    bits |= static_cast<uint32_t>(code) << nbits;
    nbits += width;
    while (nbits >= 8) {
      block.push_back(static_cast<uint8_t>(bits & 0xFF));
      bits >>= 8;
      nbits -= 8;
      if (block.size() == 255) flush_block();
    }
  }
  void flush_block() {
    if (block.empty()) return;
    out.push_back(static_cast<uint8_t>(block.size()));
    out.insert(out.end(), block.begin(), block.end());
    block.clear();
  }
  void finish() {
    if (nbits > 0) {
      block.push_back(static_cast<uint8_t>(bits & 0xFF));
      if (block.size() == 255) flush_block();
    }
    flush_block();
    out.push_back(0);  // block terminator
  }
};

inline int quantize(const uint8_t* rgb) {
  // map to 6x6x6 cube index; grays 216..255 used for near-gray colors
  int r = rgb[0], g = rgb[1], b = rgb[2];
  int mx = r > g ? (r > b ? r : b) : (g > b ? g : b);
  int mn = r < g ? (r < b ? r : b) : (g < b ? g : b);
  if (mx - mn < 12) {                       // near-gray: 40-level ramp
    int lum = (r * 299 + g * 587 + b * 114) / 1000;
    int gi = (lum * 39 + 127) / 255;        // nearest gray level
    if (gi > 39) gi = 39;
    return 216 + gi;
  }
  // nearest multiple of 51 per channel
  int ri = (r + 25) / 51, gi = (g + 25) / 51, bi = (b + 25) / 51;
  if (ri > 5) ri = 5;
  if (gi > 5) gi = 5;
  if (bi > 5) bi = 5;
  return ri * 36 + gi * 6 + bi;
}

void lzw_encode(const std::vector<uint8_t>& idx, std::vector<uint8_t>& out) {
  const int min_code_size = 8;
  out.push_back(min_code_size);
  const int clear_code = 1 << min_code_size;   // 256
  const int eoi = clear_code + 1;              // 257

  // dictionary: hash of (prefix_code << 8 | next_byte) -> code
  std::vector<int32_t> table(1 << 20, -1);
  auto key = [](int prefix, uint8_t c) { return (prefix << 8) | c; };

  BitWriter bw(out);
  int code_size = min_code_size + 1;
  int next_code = eoi + 1;
  bw.put(clear_code, code_size);

  int prefix = idx.empty() ? 0 : idx[0];
  for (size_t i = 1; i < idx.size(); ++i) {
    uint8_t c = idx[i];
    int k = key(prefix, c);
    if (table[k] >= 0) {
      prefix = table[k];
      continue;
    }
    bw.put(prefix, code_size);
    // width-bump BEFORE adding this miss's entry — the classic compress.c
    // ordering (output() checks free_ent > maxcode, then the caller adds)
    if (next_code > (1 << code_size) - 1 && code_size < 12) ++code_size;
    if (next_code < 4096) {
      table[k] = next_code++;
    } else {
      bw.put(clear_code, code_size);
      std::fill(table.begin(), table.end(), -1);
      code_size = min_code_size + 1;
      next_code = eoi + 1;
    }
    prefix = c;
  }
  bw.put(prefix, code_size);
  bw.put(eoi, code_size);
  bw.finish();
}

}  // namespace

// Encode (n, h, w, 3) RGB frames as an animated GIF (infinite loop).
// delay_cs: per-frame delay in centiseconds. Returns 0 on success; caller
// frees *out with gifgan_free.
int gifgan_encode(const uint8_t* frames, int n, int w, int h, int delay_cs,
                  uint8_t** out, size_t* out_len) {
  if (n <= 0 || w <= 0 || h <= 0) return -1;
  std::vector<uint8_t> g;
  g.reserve(static_cast<size_t>(n) * w * h / 4 + 1024);

  const char hdr[] = "GIF89a";
  g.insert(g.end(), hdr, hdr + 6);
  g.push_back(w & 0xFF); g.push_back((w >> 8) & 0xFF);
  g.push_back(h & 0xFF); g.push_back((h >> 8) & 0xFF);
  g.push_back(0xF7);  // GCT present, 256 entries
  g.push_back(0);     // background
  g.push_back(0);     // aspect

  // global palette: 216 cube + 40 grays
  for (int i = 0; i < 216; ++i) {
    g.push_back(static_cast<uint8_t>((i / 36) * 51));
    g.push_back(static_cast<uint8_t>(((i / 6) % 6) * 51));
    g.push_back(static_cast<uint8_t>((i % 6) * 51));
  }
  for (int i = 0; i < 40; ++i) {
    uint8_t v = static_cast<uint8_t>(i * 255 / 39);
    g.push_back(v); g.push_back(v); g.push_back(v);
  }

  // netscape loop extension
  const uint8_t loop[] = {0x21, 0xFF, 0x0B, 'N', 'E', 'T', 'S', 'C', 'A',
                          'P', 'E', '2', '.', '0', 0x03, 0x01, 0x00, 0x00,
                          0x00};
  g.insert(g.end(), loop, loop + sizeof(loop));

  std::vector<uint8_t> idx(static_cast<size_t>(w) * h);
  for (int f = 0; f < n; ++f) {
    // graphic control (delay)
    g.push_back(0x21); g.push_back(0xF9); g.push_back(0x04);
    g.push_back(0x00);
    g.push_back(delay_cs & 0xFF); g.push_back((delay_cs >> 8) & 0xFF);
    g.push_back(0x00); g.push_back(0x00);
    // image descriptor (full frame, GCT)
    g.push_back(0x2C);
    g.push_back(0); g.push_back(0); g.push_back(0); g.push_back(0);
    g.push_back(w & 0xFF); g.push_back((w >> 8) & 0xFF);
    g.push_back(h & 0xFF); g.push_back((h >> 8) & 0xFF);
    g.push_back(0x00);

    const uint8_t* fp = frames + static_cast<size_t>(f) * w * h * 3;
    for (size_t i = 0; i < idx.size(); ++i)
      idx[i] = static_cast<uint8_t>(quantize(fp + 3 * i));
    lzw_encode(idx, g);
  }
  g.push_back(0x3B);  // trailer

  uint8_t* buf = static_cast<uint8_t*>(malloc(g.size()));
  if (!buf) return -5;
  memcpy(buf, g.data(), g.size());
  *out = buf;
  *out_len = g.size();
  return 0;
}

}  // extern "C"
