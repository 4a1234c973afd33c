"""Pallas row gather: corpus sampling at HBM copy speed.

The device-resident corpus sampler (data/device.py, the endurance loop's
prep path) needs `corpus[idx]` for ~5k scattered rows per chunk. The two
non-Pallas formulations both leave large factors on the table at the
flagship chunk shape ((4096, 196608) u8 corpus, 5120 sampled rows):

  * `jnp.take` lowers to an XLA row gather that moves ~1.6 GB/s on a v5e
    (3.68 s/chunk) — gathers don't pipeline HBM reads well.
  * one-hot @ corpus runs on the MXU (48 ms/chunk) but pays
    M x N x D = 8.2 TFLOP of matmul for what is semantically a copy, and
    needs a bf16-widened resident corpus (2 bytes/px instead of 1).

A gather is pure bandwidth: ~1 GB of u8 reads + ~3.9 GB of f32 writes
~= 6 ms at HBM speed-of-light. This kernel gets there with the canonical
scalar-prefetch pattern (pallas_guide.md "PrefetchScalarGridSpec"): the
index vector is prefetched, the grid walks output rows, and each step's
input BlockSpec index_map picks source block `idx[i]` — the pipeline
machinery turns that into one scattered 192 KB HBM->VMEM DMA per row,
double-buffered against the cast+scale VPU work and the output write-back.

The corpus stays uint8 in HBM (1 byte/px — half the matmul path's resident
footprint and half its read traffic); the u8 -> f32 widen and the
[-1, 1] scale ride along in VMEM (u8 casts hop via int32 — Mosaic has no
direct u8->f32). Rows are blocked as (rows, 128) planes so the DMA'd block
is tile-aligned for 8-bit data ((32, 128) tiles — callers pad D to a
multiple of 32*128; data/device.py does).

Measured (fill in from examples/corpus_sampler_bench.py on real hardware)
vs take / one-hot-matmul at the flagship chunk shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

LANE = 128
U8_SUBLANE = 32  # (32, 128) tiling for 8-bit dtypes


def _gather_scale_kernel(idx_ref, row_ref, out_ref):
    del idx_ref  # consumed by the index_maps; the body just widens+scales
    x = row_ref[0].astype(jnp.int32).astype(jnp.float32)
    out_ref[0] = x / 127.5 - 1.0


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_scaled(data_u8: jax.Array, idx: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """data_u8 (N, D) uint8, idx (M,) int -> (M, D) float32 = data[idx]
    / 127.5 - 1.0, with jnp.take's out-of-range clamp semantics.

    D must be a multiple of 4096 (= 32 sublanes x 128 lanes, the uint8
    tile) so each row reshapes to a tile-aligned (D/128, 128) plane.
    """
    n, d = data_u8.shape
    if data_u8.dtype != jnp.uint8:
        raise ValueError(f"data must be uint8, got {data_u8.dtype}")
    if d % (U8_SUBLANE * LANE):
        raise ValueError(f"D={d} must be a multiple of {U8_SUBLANE * LANE}")
    r = d // LANE
    (m,) = idx.shape
    idx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)
    planes = data_u8.reshape(n, r, LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, r, LANE), lambda i, idx_ref: (idx_ref[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, LANE), lambda i, idx_ref: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _gather_scale_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, r, LANE), jnp.float32),
        interpret=interpret,
    )(idx, planes)
    return out.reshape(m, d)
