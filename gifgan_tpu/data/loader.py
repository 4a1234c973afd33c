"""Prefetching device feed + worker-pool video decode.

The reference loads and decodes images/videos synchronously inside the train
loop (model.py:196-201, z_model_lib.py:213 — flagged in SURVEY.md §3.1/3.2 as
the dominant stall). Here a background thread prepares the next batches while
the device computes, and batches are placed onto the mesh ahead of use
(double buffering): the host decode pipeline and the TPU step overlap.

`clip_batches_from_files` adds the multi-core stage: N decode workers
(cv2 and the first-party GIF codec both release the GIL inside their C/C++
decode loops) fill batches ahead of the consumer — the flagship b64 step
consumes ~2.4k clip-decodes/s at full TPU throughput while one host core
decodes ~1.3k 16x64x64 clips/s, so decode must fan out across cores.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence

import jax
import numpy as np


_DONE = object()


def _prefetch_worker(batch_iter, q, device_put, stop, err_box):
    """Free function on purpose: a bound-method target would make the worker
    thread hold a strong reference to the loader, so an abandoned loader
    (early `break` in a train loop, a test taking one batch) could never be
    garbage-collected and its worker would block on q.put forever. Leaked
    workers from ~200 early-exiting loaders were alive during the heaviest
    compile of the test suite when it segfaulted; every put is stop-aware
    and bounded so close()/__del__ can always release the thread."""
    try:
        for batch in batch_iter:
            if stop.is_set():
                return
            if device_put is not None:
                batch = device_put(batch)
            while not stop.is_set():
                try:
                    q.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue
            if stop.is_set():
                return
    except BaseException as e:  # surfaced on next()
        err_box.append(e)
    finally:
        while not stop.is_set():
            try:
                q.put(_DONE, timeout=0.1)
                break
            except queue.Full:
                continue


class PrefetchLoader:
    """Wraps a batch-producing iterator; prefetches up to `depth` batches on
    a worker thread and (optionally) places them with a sharding. Call
    `close()` (or just drop the object — `__del__` covers abandonment) when
    breaking out before exhaustion, so the worker thread is released."""

    def __init__(self, batch_iter: Iterator, depth: int = 2,
                 device_put: Optional[Callable] = None):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._err_box: list = []
        self._thread = threading.Thread(
            target=_prefetch_worker,
            args=(batch_iter, self._q, device_put, self._stop,
                  self._err_box),
            daemon=True)
        self._thread.start()

    def close(self):
        """Stop the worker without draining the source iterator. Safe to
        call multiple times, from __del__, or after normal exhaustion."""
        self._stop.set()
        try:
            while True:  # unblock a worker stuck in q.put
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _DONE:
            if self._err_box:
                raise self._err_box[0]
            raise StopIteration
        return item


def default_clip_decode(path: str, length: int, size: int) -> np.ndarray:
    """(length, size, size, 3) uint8 from a .gif (first-party codec) or any
    cv2-decodable video; short clips pad by repeating the last frame."""
    if path.endswith(".gif"):
        from gifgan_tpu.data import native_gif
        from gifgan_tpu.data.video import read_gif

        if native_gif.available():
            frames = native_gif.decode_gif(path, max_frames=length)
        else:
            frames = read_gif(path)[:length]
        if frames.shape[1] != size or frames.shape[2] != size:
            import cv2

            frames = np.stack([cv2.resize(f, (size, size),
                                          interpolation=cv2.INTER_LINEAR)
                               for f in frames])
        if frames.shape[0] < length:
            pad = np.repeat(frames[-1:], length - frames.shape[0], axis=0)
            frames = np.concatenate([frames, pad])
        return frames[:length]
    from gifgan_tpu.data.video import decode_clip

    return decode_clip(path, length, size, strict=False)


def clip_batches_from_files(paths: Sequence[str], batch_size: int,
                            length: int, size: int, epochs: int = 1,
                            shuffle: bool = True, seed: int = 0,
                            workers: int = 4,
                            decode_fn: Optional[Callable] = None,
                            fold_time: bool = True,
                            normalize: bool = True,
                            on_error: Optional[Callable] = None,
                            ) -> Iterator[np.ndarray]:
    """Worker-pool decoded clip batches from video files on disk.

    Yields (B*T, s, s, 3) float32 in [-1, 1] (fold_time=True, the vid-GAN
    layout) or (B, T, s, s, 3). Decode runs on `workers` threads with a
    bounded in-flight window (2x workers) ahead of the consumer; failed
    decodes are skipped (on_error(path, exc) observes them) and the batch
    backfills from subsequent files — the z_space_finder-style tolerance
    (reference z_space_finder.py:69-86) instead of the training-path assert.
    """
    decode_fn = decode_fn or (
        lambda p: default_clip_decode(p, length, size))
    rng = np.random.default_rng(seed)
    paths = list(paths)
    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        for _ in range(epochs):
            order = rng.permutation(len(paths)) if shuffle \
                else np.arange(len(paths))
            pending = []           # in-flight (path, future), submit-ordered
            idx = 0
            batch = []

            def submit_upto(k):
                nonlocal idx
                while idx < len(order) and len(pending) < k:
                    p = paths[order[idx]]
                    pending.append((p, pool.submit(decode_fn, p)))
                    idx += 1

            submit_upto(2 * max(1, workers))
            while pending:
                p, fut = pending.pop(0)
                try:
                    clip = fut.result()
                    batch.append(np.asarray(clip))
                except Exception as e:  # skip + backfill
                    if on_error is not None:
                        on_error(p, e)
                submit_upto(2 * max(1, workers) + 1)
                if len(batch) == batch_size:
                    out = np.stack(batch)
                    batch = []
                    if normalize:
                        out = out.astype(np.float32) / 127.5 - 1.0
                    if fold_time:
                        out = out.reshape(-1, *out.shape[2:])
                    yield out


def batches_from_array(data: np.ndarray, batch_size: int, epochs: int = 1,
                       shuffle: bool = True, seed: int = 0,
                       drop_remainder: bool = True) -> Iterator[np.ndarray]:
    """Simple epoch x batch iterator over an in-memory array (the reference's
    epoch/batch_idxs loop, model.py:185-191)."""
    rng = np.random.default_rng(seed)
    n = data.shape[0]
    for _ in range(epochs):
        idx = rng.permutation(n) if shuffle else np.arange(n)
        end = (n // batch_size) * batch_size if drop_remainder else n
        for i in range(0, end, batch_size):
            yield data[idx[i:i + batch_size]]
