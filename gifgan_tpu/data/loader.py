"""Prefetching device feed.

The reference loads and decodes images/videos synchronously inside the train
loop (model.py:196-201, z_model_lib.py:213 — flagged in SURVEY.md §3.1/3.2 as
the dominant stall). Here a background thread prepares the next batches while
the device computes, and batches are placed onto the mesh ahead of use
(double buffering): the host decode pipeline and the TPU step overlap.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np


class PrefetchLoader:
    """Wraps a batch-producing iterator; prefetches up to `depth` batches on
    a worker thread and (optionally) places them with a sharding."""

    def __init__(self, batch_iter: Iterator, depth: int = 2,
                 device_put: Optional[Callable] = None):
        self._iter = batch_iter
        self._device_put = device_put
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._iter:
                if self._device_put is not None:
                    batch = self._device_put(batch)
                self._q.put(batch)
        except BaseException as e:  # surfaced on next()
            self._err = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


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
