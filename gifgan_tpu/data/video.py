"""Host-side video/GIF IO.

Decode stays on host (the TPU can't read mp4); the design splits IO from
compute: decode workers produce fixed-shape uint8 clip arrays, the
resize+normalize hot transform runs on-device (gifgan_tpu.kernels.resize),
and batches stream to HBM double-buffered (gifgan_tpu.data.loader) — versus
the reference which decodes with cv2 inline in the train loop
(z_model_lib.py:332-351), its dominant stall.

Encode (sample mp4s / GIF walls) also stays host-side, with the reference's
atomic tmp-file rename for the continuous sampler (model_sampler.py:74-80).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

try:
    import cv2
    HAVE_CV2 = True
except Exception:  # pragma: no cover
    HAVE_CV2 = False

try:
    import imageio.v2 as imageio
    HAVE_IMAGEIO = True
except Exception:  # pragma: no cover
    HAVE_IMAGEIO = False


class ClipTooShortError(ValueError):
    pass


def decode_clip(path: str, length: int, size: int,
                strict: bool = True) -> np.ndarray:
    """Decode the first `length` frames of a video, resized to (size, size),
    RGB uint8: (length, size, size, 3).

    strict=True raises ClipTooShortError on short clips (the reference
    asserts, z_model_lib.py:350); strict=False pads by repeating the last
    frame (z_space_finder-style tolerance, z_space_finder.py:69-86).
    """
    if not HAVE_CV2:
        raise RuntimeError("cv2 unavailable: no mp4 decode on this host")
    cap = cv2.VideoCapture(path)
    frames = []
    while cap.isOpened() and len(frames) < length:
        ret, im = cap.read()
        if not ret:
            break
        im = cv2.resize(im, (size, size), interpolation=cv2.INTER_LINEAR)
        frames.append(cv2.cvtColor(im, cv2.COLOR_BGR2RGB))
    cap.release()
    if len(frames) < length:
        if strict or not frames:
            raise ClipTooShortError(
                f"{path}: {len(frames)} frames < {length}")
        frames.extend([frames[-1]] * (length - len(frames)))
    return np.stack(frames[:length])


def decode_clip_batch(paths: Sequence[str], length: int, size: int,
                      strict: bool = True) -> np.ndarray:
    """(N, length, size, size, 3) uint8."""
    return np.stack([decode_clip(p, length, size, strict) for p in paths])


def encode_mp4(path: str, frames: np.ndarray, fps: float = 25.0) -> None:
    """frames: (T, H, W, 3) uint8 RGB -> mp4 (fourcc mp4v, like the
    reference's 0x20 writer, z_model_lib.py:292-295)."""
    if not HAVE_CV2:
        raise RuntimeError("cv2 unavailable: no mp4 encode on this host")
    t, h, w = frames.shape[:3]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()


def write_gif(path: str, frames: np.ndarray, fps: float = 8.0,
              atomic: bool = True) -> None:
    """frames: (T, H, W, 3) uint8 RGB -> GIF, atomically (tmp+rename,
    model_sampler.py:74-80). Uses the native C++ encoder
    (native/gifcodec.cpp) when built; imageio otherwise."""
    from gifgan_tpu.data import native_gif

    if native_gif.available():
        native_gif.encode_gif(path, np.ascontiguousarray(frames[..., :3]),
                              fps=fps, atomic=atomic)
        return
    if not HAVE_IMAGEIO:
        raise RuntimeError("no GIF encoder available on this host")
    tmp = path + ".tmp.gif" if atomic else path
    # the legacy GIF-PIL plugin selected by format="GIF" takes duration in
    # SECONDS (it writes int(duration*100) centiseconds) — not the ms the
    # v3 pillow plugin takes
    imageio.mimwrite(tmp, list(frames), format="GIF",
                     duration=1.0 / fps, loop=0)
    if atomic:
        os.replace(tmp, path)


def read_gif(path: str, size: Optional[int] = None) -> np.ndarray:
    """(T, H, W, 3) uint8 RGB. Native C++ decoder when built; imageio
    fallback."""
    from gifgan_tpu.data import native_gif

    if native_gif.available():
        frames = native_gif.decode_gif(path)
    elif HAVE_IMAGEIO:
        frames = np.stack([np.asarray(f)[..., :3]
                           for f in imageio.mimread(path)])
    else:
        raise RuntimeError("no GIF decoder available on this host")
    if size is not None and frames.shape[1:3] != (size, size):
        if HAVE_CV2:
            frames = np.stack([
                cv2.resize(f, (size, size), interpolation=cv2.INTER_LINEAR)
                for f in frames])
        else:
            import jax
            import jax.numpy as jnp

            frames = np.clip(np.asarray(jax.image.resize(
                jnp.asarray(frames, jnp.float32),
                (frames.shape[0], size, size, frames.shape[3]),
                method="linear")), 0, 255).astype(np.uint8)
    return frames


def sample_frames_from_video(path: str, n: int, size: int,
                             rng: np.random.Generator) -> List[np.ndarray]:
    """Randomly sample n frames (by index) resized to (size, size) — the
    image-DCGAN training-set builder (reference sample_frames.py:19-37)."""
    if not HAVE_CV2:
        raise RuntimeError("cv2 unavailable")
    cap = cv2.VideoCapture(path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if total <= 0:
        cap.release()
        return []
    idxs = sorted(rng.choice(total, size=min(n, total), replace=False))
    out = []
    pos = 0
    want = set(int(i) for i in idxs)
    while cap.isOpened() and pos <= max(want):
        ret, im = cap.read()
        if not ret:
            break
        if pos in want:
            im = cv2.resize(im, (size, size), interpolation=cv2.INTER_LINEAR)
            out.append(cv2.cvtColor(im, cv2.COLOR_BGR2RGB))
        pos += 1
    cap.release()
    return out


def bulk_resize(in_dir: str, out_dir: str, width: int, length: int,
                pattern: str = ".mp4") -> dict:
    """Re-encode every video in a dir to width x width and exactly `length`
    frames, skipping short clips (reference bulk_resize.py:38-64). Returns
    counts."""
    os.makedirs(out_dir, exist_ok=True)
    stats = {"written": 0, "skipped_short": 0, "errors": 0}
    for name in sorted(os.listdir(in_dir)):
        if not name.endswith(pattern):
            continue
        try:
            clip = decode_clip(os.path.join(in_dir, name), length, width,
                               strict=True)
        except ClipTooShortError:
            stats["skipped_short"] += 1
            continue
        except Exception:
            stats["errors"] += 1
            continue
        encode_mp4(os.path.join(out_dir, name), clip)
        stats["written"] += 1
    return stats


def video_to_gif(in_path: str, out_path: str, fps: float = 8.0) -> None:
    """avi/mp4 -> GIF (reference avi_2_gif.py:44-50)."""
    clip = None
    if HAVE_CV2:
        cap = cv2.VideoCapture(in_path)
        frames = []
        while cap.isOpened():
            ret, im = cap.read()
            if not ret:
                break
            frames.append(cv2.cvtColor(im, cv2.COLOR_BGR2RGB))
        cap.release()
        clip = np.stack(frames) if frames else None
    if clip is None:
        raise RuntimeError(f"could not decode {in_path}")
    write_gif(out_path, clip, fps=fps)


def video_to_frames(video_path: str, out_dir: str, rate: float,
                    detector=None, crop_size: int = 108,
                    prefix: str = "frame") -> dict:
    """Extract frames at `rate` fps; when a detector is given, keep only
    frames with a face and crop a fixed crop_size box around the best face's
    center, deleting no-face frames (reference video_to_frames.py:53-91 which
    shelled to ffmpeg + facedetect.py --best)."""
    import imageio.v2 as imageio

    if not HAVE_CV2:
        raise RuntimeError("cv2 unavailable")
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    step = max(1, int(round(fps / rate)))
    stats = {"frames": 0, "kept": 0, "no_face": 0}
    i = out_i = 0
    while cap.isOpened():
        ret, im = cap.read()
        if not ret:
            break
        if i % step == 0:
            stats["frames"] += 1
            rgb = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
            keep = rgb
            if detector is not None:
                dets = detector(rgb, i)
                if not dets:
                    stats["no_face"] += 1
                    i += 1
                    continue
                best = max(dets, key=lambda d: d.width * d.height)
                cx = (best.x1 + best.x2) // 2
                cy = (best.y1 + best.y2) // 2
                half = crop_size // 2
                y0 = min(max(cy - half, 0), max(rgb.shape[0] - crop_size, 0))
                x0 = min(max(cx - half, 0), max(rgb.shape[1] - crop_size, 0))
                keep = rgb[y0:y0 + crop_size, x0:x0 + crop_size]
            imageio.imwrite(os.path.join(out_dir,
                                         f"{prefix}_{out_i:06d}.png"), keep)
            out_i += 1
            stats["kept"] += 1
        i += 1
    cap.release()
    return stats
