"""Checkpointing with pytree-path surgery.

The reference's most distinctive checkpoint features (SURVEY.md §5.4) are
surgical tf.train.Saver restores:
  (a) restore everything EXCEPT a latent variable
      (discriminator_activation_optimizer.py:78),
  (b) restore a flat checkpoint into a nested scope by name-prefix stripping
      (z_model_lib.py:117-134 `load_image_gan`),
  (c) re-initialize only optimizer slots (z_model_lib.py:180-185).

With explicit pytree state all three are ordinary tree operations:
  (a) `restore` a sub-path of the tree,
  (b) `graft` a saved tree into a subtree of a larger state,
  (c) simply rebuild the optimizer state — it's a value, not graph surgery.

Storage uses orbax-style zarr-free numpy archives (single .npz per step +
JSON treedef) — simple, fast, and portable; plus `latest_step`/`all_steps`
management with max_to_keep GC (reference: Saver(max_to_keep), z_model_lib.py:204).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

SEP = "/"


def _flatten_with_paths(tree) -> Dict[str, Any]:
    flat = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        key = SEP.join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    if hasattr(entry, "name"):
        return str(entry.name)
    return str(entry)


def save(ckpt_dir: str, step: int, tree: Any, max_to_keep: int = 0) -> str:
    """Write `tree` as ckpt_dir/step_N/{arrays.npz, tree.json}. Atomic via
    tmp-dir rename (the reference uses tmp-file renames for its sampler
    outputs, model_sampler.py:74-80 — same idea for checkpoints)."""
    tree = jax.device_get(tree)
    flat = _flatten_with_paths(tree)
    final = os.path.join(ckpt_dir, f"step_{step:010d}")
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    np.savez(os.path.join(tmp, "arrays.npz"), **flat)
    meta = {
        "step": step,
        "keys": sorted(flat.keys()),
        "dtypes": {k: str(v.dtype) for k, v in flat.items()},
    }
    with open(os.path.join(tmp, "tree.json"), "w") as f:
        json.dump(meta, f)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    if max_to_keep > 0:
        for s in all_steps(ckpt_dir)[:-max_to_keep]:
            shutil.rmtree(os.path.join(ckpt_dir, f"step_{s:010d}"))
    return final


def all_steps(ckpt_dir: str) -> List[int]:
    if not os.path.isdir(ckpt_dir):
        return []
    steps = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_step(ckpt_dir: str) -> Optional[int]:
    steps = all_steps(ckpt_dir)
    return steps[-1] if steps else None


def load_flat(ckpt_dir: str, step: Optional[int] = None) -> Dict[str, np.ndarray]:
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"step_{step:010d}", "arrays.npz")
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def restore(ckpt_dir: str, target: Any, step: Optional[int] = None,
            exclude: Sequence[str] = (), prefix: str = "") -> Any:
    """Restore into the structure of `target`.

    exclude: path prefixes to SKIP restoring (keep target's value) — pattern
        (a), e.g. exclude=("z",) keeps the fresh latent while restoring model
        params around it.
    prefix: strip/namespace translation — pattern (b): checkpoint key `k`
        is looked up as `prefix + k`... i.e. pass prefix="img_gan/" to load a
        flat image-GAN checkpoint into the `img_gan` subtree of a larger tree,
        or use `graft` below for the common case.
    """
    flat_ckpt = load_flat(ckpt_dir, step)
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(target)
    new_leaves = []
    matched, missing = [], []
    for path, leaf in leaves_with_paths:
        key = SEP.join(_path_str(p) for p in path)
        if any(key == e or key.startswith(e + SEP) for e in exclude):
            new_leaves.append(leaf)
            continue
        ckpt_key = prefix + key
        if ckpt_key in flat_ckpt:
            arr = flat_ckpt[ckpt_key]
            new_leaves.append(np.asarray(arr, dtype=np.asarray(leaf).dtype)
                              .reshape(np.shape(leaf)))
            matched.append(ckpt_key)
        else:
            new_leaves.append(leaf)
            missing.append(ckpt_key)
    # A no-op restore must be loud: the reference's tf.train.Saver raises on
    # missing variables; silently keeping fresh random params means "training
    # proceeds with a random model while printing success" (ADVICE round 1).
    _check_match("restore", ckpt_dir, matched, missing, flat_ckpt,
                 warn_unconsumed=not exclude and not prefix)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def graft(ckpt_dir: str, target: Any, subpath: str, ckpt_prefix: str = "",
          step: Optional[int] = None) -> Any:
    """Pattern (b): load a checkpoint saved from a SMALLER/different tree into
    the subtree `subpath` of `target` (the reference's load_image_gan scope
    surgery, z_model_lib.py:117-134).

    A leaf at target path `subpath/REST` is restored from checkpoint key
    `ckpt_prefix + REST`; everything outside `subpath` is untouched. E.g.
    grafting a standalone image-GAN checkpoint (keys `params/generator/...`)
    into a video-GAN state: subpath="params/img_generator",
    ckpt_prefix="params/generator/".
    """
    flat_ckpt = load_flat(ckpt_dir, step)
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(target)
    new_leaves = []
    matched, missing = [], []
    sp = subpath.rstrip(SEP) + SEP
    for path, leaf in leaves_with_paths:
        key = SEP.join(_path_str(p) for p in path)
        if key.startswith(sp):
            ckpt_key = ckpt_prefix + key[len(sp):]
            if ckpt_key in flat_ckpt:
                new_leaves.append(
                    np.asarray(flat_ckpt[ckpt_key],
                               dtype=np.asarray(leaf).dtype)
                    .reshape(np.shape(leaf)))
                matched.append(ckpt_key)
                continue
            missing.append(ckpt_key)
        new_leaves.append(leaf)
    # Grafting nothing (wrong subpath/ckpt_prefix/architecture) must raise,
    # not leave the frozen image GAN at random init (ADVICE round 1).
    _check_match("graft", ckpt_dir, matched, missing, flat_ckpt)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _check_match(op: str, ckpt_dir: str, matched: List[str],
                 missing: List[str], flat_ckpt: Dict[str, np.ndarray],
                 warn_unconsumed: bool = False) -> None:
    """Raise on a zero-key no-op; warn on partial matches and (for plain
    full restores) on checkpoint keys that nothing consumed — a likely
    layout mismatch. Grafts/prefix/exclude restores intentionally consume
    subsets, so unconsumed keys are only flagged when warn_unconsumed."""
    if not matched:
        sample_ckpt = sorted(flat_ckpt)[:5]
        sample_want = missing[:5]
        raise KeyError(
            f"{op}: 0 of {len(missing)} target leaves matched any checkpoint "
            f"key in {ckpt_dir} — wrong prefix/subpath or architecture? "
            f"wanted e.g. {sample_want}, checkpoint has e.g. {sample_ckpt}")
    if missing:
        import warnings

        warnings.warn(
            f"{op}: {len(missing)} target leaves had no checkpoint key "
            f"(kept current values), e.g. {missing[:5]}", stacklevel=3)
    if warn_unconsumed:
        unconsumed = sorted(set(flat_ckpt) - set(matched))
        if unconsumed:
            import warnings

            warnings.warn(
                f"{op}: {len(unconsumed)} checkpoint keys were not consumed "
                f"by any target leaf (layout mismatch?), e.g. "
                f"{unconsumed[:5]}", stacklevel=3)


class AsyncCheckpointer:
    """Async checkpoint writes: the device->host snapshot happens on the
    caller's thread (cheap, and REQUIRED before the next donated train step
    invalidates the buffers), while serialization + npz write + GC run on a
    background thread so the next chunk's compute overlaps the disk write
    (orbax-style async save; SURVEY.md §5.4 round-2 upgrade).

    Errors surface on the next save() or wait(). One in-flight write at a
    time — a second save blocks until the previous write lands, bounding
    memory at one host snapshot.
    """

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=1)
        self._pending = None

    def save(self, ckpt_dir: str, step: int, tree: Any,
             max_to_keep: int = 0):
        self.wait()
        # snapshot: device arrays come back as fresh host buffers; numpy
        # leaves pass through device_get by reference and MUST be copied or
        # later in-place mutation corrupts the pending write
        host_tree = jax.tree_util.tree_map(
            lambda x: np.array(x) if isinstance(x, np.ndarray)
            else jax.device_get(x), tree)

        def _write():
            return save(ckpt_dir, step, host_tree, max_to_keep=max_to_keep)

        self._pending = self._pool.submit(_write)
        return self._pending

    def wait(self):
        if self._pending is not None:
            fut, self._pending = self._pending, None
            fut.result()  # re-raises write errors

    def close(self):
        self.wait()
        self._pool.shutdown(wait=True)


def save_multihost(ckpt_dir: str, step: int, tree: Any, max_to_keep: int = 0,
                   process_index: Optional[int] = None,
                   barrier=None) -> Optional[str]:
    """Replicated-state save on a multi-host pod: the primary process writes
    (state is replicated, so one copy suffices — shared-filesystem layout),
    every process joins a named barrier before AND after so no process races
    ahead into a restore of a half-written step.

    process_index/barrier are injectable for tests; defaults use the live
    jax.distributed runtime (multihost_utils.sync_global_devices).
    """
    if process_index is None:
        process_index = jax.process_index()
    if barrier is None:
        if jax.process_count() == 1:
            barrier = lambda name: None
        else:
            from jax.experimental import multihost_utils

            barrier = lambda name: multihost_utils.sync_global_devices(name)
    barrier(f"ckpt_pre_{step}")
    path = None
    if process_index == 0:
        path = save(ckpt_dir, step, tree, max_to_keep=max_to_keep)
    barrier(f"ckpt_post_{step}")
    return path
