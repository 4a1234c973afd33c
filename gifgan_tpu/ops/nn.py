"""Functional NN layers with the reference's exact numerics.

Rebuilt from the behavior of models/recurrent_z/ops.py (reference):
  - conv2d: 5x5 stride-2 SAME, truncated-normal(0.02) weights, zero bias
    (ops.py:51-62)
  - conv3d: 3x3x3 stride-2 SAME (ops.py:64-75)
  - deconv2d: 5x5 stride-2 transposed conv, normal(0.02) weights, TF
    [h, w, out_ch, in_ch] kernel layout / gradient-of-conv semantics
    (ops.py:77-100)
  - linear: normal(0.02) weights (ops.py:106-117)
  - batch_norm: decay 0.9, eps 1e-5, scale+center, train/inference modes
    (ops.py:10-24 wrapping tf.contrib.layers.batch_norm)
  - lrelu leak 0.2 (ops.py:103), add_noise (ops.py:119-123),
    get_std (ops.py:125-128)

Design is TPU-first: parameters are plain pytrees (dicts of arrays), every
layer is a pure function, layouts are NHWC/NDHWC (XLA:TPU native), and all
matmuls/convs take a `dtype` so activations can run in bfloat16 on the MXU
while parameters stay float32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def truncated_normal_init(key, shape, stddev=0.02, dtype=jnp.float32):
    """TF truncated_normal_initializer: normal clipped to 2 sigma, resampled.

    jax.random.truncated_normal samples from the same +-2-sigma truncated
    distribution (exact, not clip-based).
    """
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def normal_init(key, shape, stddev=0.02, dtype=jnp.float32):
    return stddev * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# conv2d — 5x5 stride-2 SAME
# ---------------------------------------------------------------------------

def conv2d_init(key, in_ch: int, out_ch: int, k: int = 5, stddev: float = 0.02):
    return {
        "w": truncated_normal_init(key, (k, k, in_ch, out_ch), stddev),
        "b": jnp.zeros((out_ch,), jnp.float32),
    }


def conv2d(params, x: Array, stride: int = 2, dtype=None,
           impl: Optional[str] = None) -> Array:
    """impl: None/"default" = SAME strided conv (TF-exact numerics);
    "s2d" = the space-to-depth phase packing (same function, accumulation
    order differs; see _conv2d_s2d — the measured c=3 fast path)."""
    dtype = dtype or x.dtype
    if (impl == "s2d" and stride == 2 and params["w"].shape[0] == 5
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        return _conv2d_s2d(params, x, dtype)
    w = params["w"].astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y + params["b"]).astype(dtype)


def _conv2d_s2d(params, x: Array, dtype) -> Array:
    """Stride-2 k=5 SAME conv over a space-to-depth phase-packed input.

    1-D derivation (SAME stride-2 k=5 pads (1, 2)):
        y[j] = sum_t x[2j-1+t] w[t]
             = x_odd[j-1] w0 + x_even[j] w1 + x_odd[j] w2
               + x_even[j+1] w3 + x_odd[j+1] w4
    so over the 2x2-phase-packed grid this is a dense VALID 3x3 conv with
    4*c_in input channels; per displacement d and phase p the tap index is
    E[d+1, p] with E = [[-,0],[1,2],[3,4]] (- = zero slot). 25 of 36 slots
    are real taps; the zeros buy 4x MXU lane packing where it matters —
    the c=3 input layer runs at 7% of bf16 peak as N=3-against-128-lanes
    (docs/PROFILE.md), and phase packing measured +7.5% on its fwd+bwd at
    the flagship shape (examples/conv_roofline.py, 2026-08-20). Identical
    terms to the strided form, so equal up to accumulation order. Opt-in
    per call site (models/dcgan.py packed_c3) — the default conv2d stays
    the TF-exact execution the golden tests pin.
    """
    w = params["w"].astype(dtype)  # (5, 5, cin, cout)
    cin, cout = w.shape[2], w.shape[3]
    b, H, W = x.shape[0], x.shape[1], x.shape[2]
    m, n = H // 2, W // 2
    xs = x.astype(dtype).reshape(b, m, 2, n, 2, cin)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(b, m, n, 4 * cin)
    xs = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # index 5 = zeros
    E = jnp.array([[5, 0], [1, 2], [3, 4]])  # (displacement, phase) -> tap
    kern = wp[E[:, :, None, None], E[None, None, :, :]]  # (3,2,3,2,ci,co)
    kern = jnp.transpose(kern, (0, 2, 1, 3, 4, 5)).reshape(3, 3, 4 * cin,
                                                           cout)
    y = jax.lax.conv_general_dilated(
        xs, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (y + params["b"]).astype(dtype)


# ---------------------------------------------------------------------------
# conv3d — 3x3x3 stride-2 SAME (video discriminator)
# ---------------------------------------------------------------------------

def conv3d_init(key, in_ch: int, out_ch: int, k: int = 3, stddev: float = 0.02):
    return {
        "w": truncated_normal_init(key, (k, k, k, in_ch, out_ch), stddev),
        "b": jnp.zeros((out_ch,), jnp.float32),
    }


def conv3d(params, x: Array, stride: int = 2, dtype=None) -> Array:
    dtype = dtype or x.dtype
    w = params["w"].astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w,
        window_strides=(stride, stride, stride),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return (y + params["b"]).astype(dtype)


# ---------------------------------------------------------------------------
# deconv2d — transposed conv, TF kernel layout [h, w, out_ch, in_ch]
# ---------------------------------------------------------------------------

def deconv2d_init(key, in_ch: int, out_ch: int, k: int = 5, stddev: float = 0.02):
    # TF conv2d_transpose filter layout: [height, width, output_ch, input_ch]
    # (ops.py:82). Kept identical so checkpoints port 1:1.
    return {
        "w": normal_init(key, (k, k, out_ch, in_ch), stddev),
        "b": jnp.zeros((out_ch,), jnp.float32),
    }


# Module-level deconv implementation selector. "dilated" is the literal
# gradient-of-conv form; "subpixel" computes the identical function as a
# dense stride-1 conv with 4x output channels + depth-to-space, which avoids
# the 75% zero-MACs of the input-dilated conv on the MXU (same terms, so
# equal up to accumulation order). Switch with set_deconv_impl().
_DECONV_IMPL = "dilated"


def set_deconv_impl(impl: str) -> str:
    """Set the module-wide deconv2d implementation ("dilated" | "subpixel").

    Returns the previous value. Takes effect at trace time — jitted callers
    pick it up on their next (re)trace.
    """
    global _DECONV_IMPL
    assert impl in ("dilated", "subpixel"), impl
    prev = _DECONV_IMPL
    _DECONV_IMPL = impl
    return prev


def deconv2d(params, x: Array, stride: int = 2, dtype=None,
             impl: Optional[str] = None) -> Array:
    """Exact tf.nn.conv2d_transpose(..., padding='SAME') semantics.

    TF's conv2d_transpose is the gradient-of-conv2d: its [h,w,out,in] filter
    is the HWIO kernel of the forward conv being transposed. In JAX that is
    conv_transpose(..., transpose_kernel=True) with the kernel as HWIO where
    I = deconv output channels, O = deconv input channels.
    """
    dtype = dtype or x.dtype
    w = params["w"].astype(dtype)
    k = w.shape[0]
    if (impl or _DECONV_IMPL) == "subpixel" and stride == 2 and k == 5:
        return _deconv2d_subpixel(params, x, dtype)
    # Gradient-of-conv written explicitly: dilate the input by `stride`,
    # convolve stride-1 with the spatially-flipped kernel (in/out swapped).
    # TF SAME forward conv (n=m*stride -> m) pads total (k - stride), low
    # side getting the floor; the transpose therefore pads (k-1-pl, k-1-pr).
    pad_total = max(k - stride, 0)
    pl = pad_total // 2
    pr = pad_total - pl
    pad = (k - 1 - pl, k - 1 - pr)
    rhs = jnp.transpose(jnp.flip(w, (0, 1)), (0, 1, 3, 2))
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), rhs,
        window_strides=(1, 1),
        padding=(pad, pad),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y + params["b"]).astype(dtype)


def _deconv2d_subpixel(params, x: Array, dtype) -> Array:
    """Stride-2 k=5 SAME deconv as a dense conv + depth-to-space.

    Derivation (1-D, per axis): with the gradient-of-conv padding
    (k-1-pl, k-1-pr) = (3, 2) the output decomposes by parity into
        y[2i]   = x[i-1]*w[3] + x[i]*w[1]
        y[2i+1] = x[i-1]*w[4] + x[i]*w[2] + x[i+1]*w[0]
    i.e. each of the four (row, col) output parities is a VALID 3x3 conv over
    x padded by 1, with a sub-kernel gathered from the original 5x5 weights
    (zero where a parity has only 2 taps). One conv with 4*out_ch channels
    computes all four; interleaving the parities is a reshape/transpose
    (depth-to-space). Identical terms to the dilated form — no zero MACs.
    """
    w = params["w"].astype(dtype)  # (5, 5, out_ch, in_ch) — TF deconv layout
    out_ch, in_ch = w.shape[2], w.shape[3]
    # Pad a zero slice at index 5 so parity-0's missing third tap can be
    # gathered uniformly.
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    idx = jnp.array([[3, 1, 5],   # even outputs: taps at x[i-1], x[i]
                     [4, 2, 0]])  # odd outputs: taps at x[i-1], x[i], x[i+1]
    # K[a, b, r, s, o, i] = wp[idx[a, r], idx[b, s], o, i]
    kern = wp[idx[:, :, None, None], idx[None, None, :, :]]  # (2,3,2,3,o,i)
    kern = jnp.transpose(kern, (1, 3, 5, 0, 2, 4))           # (3,3,i,2,2,o)
    kern = kern.reshape(3, 3, in_ch, 4 * out_ch)
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b, m, n = x.shape[0], x.shape[1], x.shape[2]
    y = y.reshape(b, m, n, 2, 2, out_ch)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * m, 2 * n, out_ch)
    return (y + params["b"]).astype(dtype)


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, stddev: float = 0.02,
                bias_start: float = 0.0):
    return {
        "w": normal_init(key, (in_dim, out_dim), stddev),
        "b": jnp.full((out_dim,), bias_start, jnp.float32),
    }


def linear(params, x: Array, dtype=None) -> Array:
    dtype = dtype or x.dtype
    y = jnp.dot(x.astype(dtype), params["w"].astype(dtype))
    return (y + params["b"]).astype(dtype)


# ---------------------------------------------------------------------------
# batch norm — decay 0.9, eps 1e-5, dual train/inference semantics
# ---------------------------------------------------------------------------

def batch_norm_init(num_features: int):
    """Returns (params, state): learnable scale/bias + running moments."""
    params = {
        "scale": jnp.ones((num_features,), jnp.float32),
        "bias": jnp.zeros((num_features,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((num_features,), jnp.float32),
        "var": jnp.ones((num_features,), jnp.float32),
    }
    return params, state


def batch_norm(params, state, x: Array, train: bool,
               momentum: float = 0.9, eps: float = 1e-5):
    """Returns (y, new_state).

    train=True: normalize by batch moments over all non-channel axes and
    update running moments with EMA decay `momentum` — matching
    tf.contrib.layers.batch_norm(decay=0.9, epsilon=1e-5, scale=True,
    updates_collections=None) (reference ops.py:17-24). train=False:
    normalize by running moments, state unchanged.

    Under pjit data parallelism the batch moments are computed over the full
    logical batch (XLA inserts the cross-device reduction), i.e. sync-BN for
    free.
    """
    axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(x.astype(jnp.float32), axis=axes)
        var = jnp.var(x.astype(jnp.float32), axis=axes)
        new_state = {
            "mean": momentum * state["mean"] + (1.0 - momentum) * mean,
            "var": momentum * state["var"] + (1.0 - momentum) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + params["bias"]
    return y.astype(x.dtype), new_state


# ---------------------------------------------------------------------------
# activations / noise / diagnostics
# ---------------------------------------------------------------------------

def lrelu(x: Array, leak: float = 0.2) -> Array:
    return jnp.maximum(x, leak * x)


def add_noise(key: Optional[Array], x: Array, stddev) -> Array:
    """Gaussian instance noise (ops.py:119-123). No-op when stddev == 0.

    `stddev` may be a Python float (baked into the program — zero skips the
    RNG entirely) or a traced scalar (train/vid.py Knobs: one compiled
    program serves every noise level; zero then still draws + adds 0).
    """
    if key is None:
        return x
    if isinstance(stddev, (float, int)):
        if stddev == 0.0:
            return x
        return x + stddev * jax.random.normal(key, x.shape, x.dtype)
    return x + jnp.asarray(stddev, x.dtype) * jax.random.normal(
        key, x.shape, x.dtype)


def get_std(x: Array) -> Array:
    """Mean per-feature std over the batch axis (ops.py:125-128) — the
    GAN-collapse early-warning diagnostic printed each step."""
    var = jnp.var(x.astype(jnp.float32), axis=0)
    return jnp.sqrt(jnp.mean(var))


def sigmoid_ce(logits: Array, labels: Array) -> Array:
    """tf.nn.sigmoid_cross_entropy_with_logits, mean-reduced."""
    zeros = jnp.zeros_like(logits)
    cond = logits >= zeros
    relu_logits = jnp.where(cond, logits, zeros)
    neg_abs = jnp.where(cond, -logits, logits)
    return jnp.mean(relu_logits - logits * labels + jnp.log1p(jnp.exp(neg_abs)))
