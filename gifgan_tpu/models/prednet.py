"""Minimal PredNet (Lotter, Kreiman & Cox 2016) — scan-based, TPU-first.

The reference VENDORS the third-party Keras PredNet as an unintegrated
comparison baseline (models/recurrent_image/prednet_reference/prednet.py:
10-13; SURVEY.md §2.3 "treat as comparison baseline only"). This is a
first-party, integrated rebuild of the core architecture so the baseline
can actually be trained and compared:

  per layer l (bottom -> top):
    R_l : convLSTM representation
    A_hat_l = relu(conv(R_l))            (prediction; layer 0 clamps to
                                          the pixel range)
    E_l = [relu(A_l - A_hat_l), relu(A_hat_l - A_l)]   (split error)
    A_{l+1} = maxpool(relu(conv(E_l)))   (bottom-up target)
  update order per timestep: top-down R updates (fed E_l(t-1) and the
  upsampled R_{l+1}(t)), then bottom-up A/E; training loss is the
  time-averaged mean of layer-0 errors (the "L_0" weighting of the paper),
  i.e. next-frame L1.

Time recursion via lax.scan; convLSTM gates in one fused conv (MXU).
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gifgan_tpu.ops import nn

Array = jax.Array


class PredNetConfig(NamedTuple):
    image_size: int = 64
    c_dim: int = 3
    channels: Tuple[int, ...] = (16, 32)   # R/A channels per layer
    kernel: int = 3
    compute_dtype: str = "float32"


def _conv_init(key, in_ch, out_ch, k):
    return {
        "w": nn.normal_init(key, (k, k, in_ch, out_ch), 0.05),
        "b": jnp.zeros((out_ch,), jnp.float32),
    }


def _conv(p, x, dtype):
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p["w"].astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"].astype(dtype)


def init(key, cfg: PredNetConfig):
    ch = cfg.channels
    n = len(ch)
    keys = jax.random.split(key, 3 * n)
    params: Dict = {}
    for l in range(n):
        a_ch = cfg.c_dim if l == 0 else ch[l - 1]       # A_l channels
        e_ch = 2 * a_ch                                  # split error
        r_top = ch[l + 1] if l + 1 < n else 0
        # convLSTM input: [E_l(t-1), upsampled R_{l+1}(t)] + hidden R_l
        in_ch = e_ch + r_top + ch[l]
        params[f"lstm{l}"] = _conv_init(keys[3 * l], in_ch, 4 * ch[l],
                                        cfg.kernel)
        params[f"ahat{l}"] = _conv_init(keys[3 * l + 1], ch[l], a_ch,
                                        cfg.kernel)
        if l + 1 < n:
            params[f"up{l}"] = _conv_init(keys[3 * l + 2], e_ch, ch[l],
                                          cfg.kernel)
    return params


def _zeros_state(cfg: PredNetConfig, batch: int):
    s = cfg.image_size
    state = []
    for l, ch in enumerate(cfg.channels):
        size = s // (2 ** l)
        a_ch = cfg.c_dim if l == 0 else cfg.channels[l - 1]
        state.append({
            "c": jnp.zeros((batch, size, size, ch), jnp.float32),
            "r": jnp.zeros((batch, size, size, ch), jnp.float32),
            "e": jnp.zeros((batch, size, size, 2 * a_ch), jnp.float32),
        })
    return state


def _step(params, cfg: PredNetConfig, state: List[Dict], frame: Array):
    """One PredNet timestep. frame: (B, s, s, c) in [0, 1].
    Returns (new_state, prediction A_hat_0, layer-0 error mean)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    n = len(cfg.channels)
    new_state = [dict(s) for s in state]

    # top-down: update representations
    for l in range(n - 1, -1, -1):
        inputs = [state[l]["e"]]
        if l + 1 < n:
            r_up = new_state[l + 1]["r"]
            b, h, w, c = r_up.shape
            r_up = jnp.repeat(jnp.repeat(r_up, 2, axis=1), 2, axis=2)
            inputs.append(r_up)
        inputs.append(state[l]["r"])
        gates = _conv(params[f"lstm{l}"], jnp.concatenate(inputs, -1), dtype)
        i, f, o, g = jnp.split(gates.astype(jnp.float32), 4, axis=-1)
        c_new = (jax.nn.sigmoid(f + 1.0) * state[l]["c"]
                 + jax.nn.sigmoid(i) * jnp.tanh(g))
        r_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        new_state[l]["c"] = c_new
        new_state[l]["r"] = r_new

    # bottom-up: predictions and errors
    a = frame
    pred0 = None
    for l in range(n):
        a_hat = jax.nn.relu(
            _conv(params[f"ahat{l}"], new_state[l]["r"], dtype)
        ).astype(jnp.float32)
        if l == 0:
            a_hat = jnp.minimum(a_hat, 1.0)   # pixel range clamp
            pred0 = a_hat
        e = jnp.concatenate([jax.nn.relu(a - a_hat),
                             jax.nn.relu(a_hat - a)], axis=-1)
        new_state[l]["e"] = e
        if l + 1 < n:
            a = jax.nn.relu(_conv(params[f"up{l}"], e, dtype))
            a = jax.lax.reduce_window(
                a.astype(jnp.float32), -jnp.inf, jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    err0 = jnp.mean(new_state[0]["e"])
    return new_state, pred0, err0


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(params, clips: Array, cfg: PredNetConfig):
    """clips (B, T, s, s, c) in [0, 1] -> (predictions (B, T, s, s, c),
    mean layer-0 error over t >= 1). predictions[t] is the model's guess
    for frame t made BEFORE seeing it."""
    b, t = clips.shape[:2]
    state0 = _zeros_state(cfg, b)

    def scan_body(state, frame):
        new_state, pred, err = _step(params, cfg, state, frame)
        return new_state, (pred, err)

    _, (preds, errs) = jax.lax.scan(scan_body, state0,
                                    jnp.moveaxis(clips, 0, 1))
    preds = jnp.moveaxis(preds, 0, 1)
    return preds, jnp.mean(errs[1:])   # t=0 has no history; standard skip


def loss_fn(params, clips: Array, cfg: PredNetConfig):
    _, err = forward(params, clips, cfg)
    return err
