// Fuzz driver for the GIF codec: decode a file (or stdin) under
// ASan/UBSan and free the result. Exit 0 on clean decode-or-reject;
// the sanitizer aborts on any OOB read/write, leak, or UB.
//
// Built by `make -C native fuzz`; driven over a generated corpus of
// truncated/bit-flipped/pathological GIFs by tests/test_native_gif.py
// (round-1 verdict item 6: the advisor found a real sub-block boundary
// bug in this decoder — fixed in d19040e — and the same class of bug
// silently corrupts eval/track_rate's quality metric, so the corpus run
// is a committed regression gate, not a one-off).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" {
int gifgan_decode(const uint8_t* data, size_t len, uint8_t** out_frames,
                  int* out_w, int* out_h, int* out_n, int max_frames);
void gifgan_free(void* p);
}

int main(int argc, char** argv) {
  std::vector<uint8_t> buf;
  FILE* f = argc > 1 ? std::fopen(argv[1], "rb") : stdin;
  if (!f) return 2;
  uint8_t tmp[65536];
  size_t got;
  while ((got = std::fread(tmp, 1, sizeof tmp, f)) > 0)
    buf.insert(buf.end(), tmp, tmp + got);
  if (argc > 1) std::fclose(f);

  uint8_t* frames = nullptr;
  int w = 0, h = 0, n = 0;
  int rc = gifgan_decode(buf.data(), buf.size(), &frames, &w, &h, &n,
                         /*max_frames=*/64);
  if (rc == 0) {
    // bounded-output contract: dimensions positive and small enough that
    // n*h*w*3 can't have overflowed the allocation size computation
    if (w <= 0 || h <= 0 || n <= 0 || w > 65535 || h > 65535 || n > 64) {
      std::fprintf(stderr, "UNBOUNDED OUTPUT w=%d h=%d n=%d\n", w, h, n);
      return 3;
    }
    // touch every output byte so ASan sees any under-allocation
    size_t total = static_cast<size_t>(n) * h * w * 3;
    volatile uint64_t sum = 0;
    for (size_t i = 0; i < total; ++i) sum += frames[i];
    (void)sum;
    gifgan_free(frames);
  }
  return 0;
}
