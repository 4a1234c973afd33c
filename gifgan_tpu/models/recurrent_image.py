"""Frame-conditioned recurrent (conv-LSTM) video GAN — the "recurrent_image"
family, TPU-native.

Rebuilt from the behavior of models/recurrent_image/rnn_test/
recurrent_DCGAN.py (reference):

  Generator (:170-228): per-frame conv encoder 64x64x3 -> 4x4x512
      (4x conv 5x5/2, moments-normalization without scale/bias, relu),
      flattened straight into an LSTM(100); per-step decoder FC 100->8192 +
      4x [moments-norm -> relu -> deconv 5x5/2] -> (tanh+1)/2 in [0,1].
      Trained teacher-forced: input X = frames 0..T-1, target Y = 1..T
      (:159-166).
  Discriminator (:236-291): shared per-frame conv stack + FC 8192->100
      embedding, embeddings concatenated over time (T*100), final FC logit;
      applied with the same weights to the generated sequence and real Y.
  Variants: 3-layer MultiRNNCell (multi-layer_recurrent_DCGAN.py:186-220),
      output dropout keep 0.8, and G-encoder-shares-D-conv-filters
      (…with_shared_conv_and_drop_out.py:170-207).

TPU-first redesign: the 16-step unrolled `tf.nn.rnn` + per-frame Python loops
become ONE `lax.scan` over time with the conv encoder/decoder applied to the
whole (B*T) folded batch in single big convolutions (encoder/decoder have no
cross-time dependency — only the LSTM does), keeping the MXU busy with large
batched convs instead of 16 small ones.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gifgan_tpu.core.config import RecurrentImageConfig
from gifgan_tpu.ops import nn

Array = jax.Array


def moments_norm(x: Array, t: int = 1, eps: float = 1e-5) -> Array:
    """tf.nn.batch_normalization with batch moments and no scale/offset
    (reference :189-191): normalization over (batch, h, w) per channel.

    The reference normalizes PER TIME STEP (its Python loop applies the op
    frame-by-frame); when x is a folded (B*T, h, w, c) batch, pass t so the
    moments are computed per (t, channel) — the convs stay folded for the
    MXU, only the cheap normalization unfolds."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)   # moments in f32 even for bf16 activations
    if t == 1:
        mean = jnp.mean(xf, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(xf, axis=(0, 1, 2), keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)
    bt = x.shape[0]
    x5 = xf.reshape(bt // t, t, *x.shape[1:])
    mean = jnp.mean(x5, axis=(0, 2, 3), keepdims=True)
    var = jnp.var(x5, axis=(0, 2, 3), keepdims=True)
    return ((x5 - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape).astype(dtype)


def _layer_channels(cfg: RecurrentImageConfig):
    # 64x64x3 -> 32x32x64 -> 16x16x128 -> 8x8x256 -> 4x4x512 (reference
    # layer_shapes, :29-34, scaled by base_filters/64)
    f = cfg.base_filters
    return [cfg.c_dim, f, f * 2, f * 4, f * 8]


def fc_size(cfg: RecurrentImageConfig) -> int:
    s16 = cfg.image_size // 16
    return s16 * s16 * cfg.base_filters * 8


# ---------------------------------------------------------------------------
# LSTM (TF BasicLSTMCell semantics: gate order i,j,f,o; forget_bias 1.0)
# ---------------------------------------------------------------------------

def lstm_init(key, input_dim: int, units: int, stddev: float = 0.02):
    k1, = jax.random.split(key, 1)
    return {
        "w": nn.normal_init(k1, (input_dim + units, 4 * units), stddev),
        "b": jnp.zeros((4 * units,), jnp.float32),
    }


def lstm_step(params, carry, x: Array) -> Tuple[Tuple[Array, Array], Array]:
    c, h = carry
    gates = jnp.dot(jnp.concatenate([x, h], axis=-1), params["w"]) + params["b"]
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    new_c = c * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    return (new_c, new_h), new_h


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

def init_generator(key, cfg: RecurrentImageConfig) -> Dict:
    chans = _layer_channels(cfg)
    # key layout: enc 0-3, lstm 4..3+L, out_fc 4+L, dec 5+L..8+L — disjoint
    # for any num_lstm_layers
    L = cfg.num_lstm_layers
    keys = jax.random.split(key, 9 + L)
    params: Dict = {}
    if not cfg.share_disc_conv:
        for i in range(4):
            params[f"enc{i}"] = {
                "w": nn.normal_init(keys[i], (5, 5, chans[i], chans[i + 1]))}
    fc = fc_size(cfg)
    for layer in range(L):
        # shared-conv variant feeds the LSTM D's 100-d fc embedding
        # (reference …shared_conv…:214), not the raw conv features
        in0 = cfg.lstm_units if cfg.share_disc_conv else fc
        in_dim = in0 if layer == 0 else cfg.lstm_units
        params[f"lstm{layer}"] = lstm_init(keys[4 + layer], in_dim,
                                           cfg.lstm_units)
    params["out_fc"] = {
        "w": nn.normal_init(keys[4 + L], (cfg.lstm_units, fc)),
        "b": jnp.zeros((1, fc), jnp.float32),
    }
    for i in range(4):
        # deconv filter TF layout [h, w, out, in], top-down: 512->256->128->64->3
        params[f"dec{i}"] = {
            "w": nn.normal_init(keys[5 + L + i],
                                (5, 5, chans[3 - i], chans[4 - i]))}
    return params


def init_discriminator(key, cfg: RecurrentImageConfig) -> Dict:
    chans = _layer_channels(cfg)
    keys = jax.random.split(key, 6)
    params: Dict = {}
    for i in range(4):
        params[f"conv{i}"] = {
            "w": nn.normal_init(keys[i], (5, 5, chans[i], chans[i + 1]))}
    fc = fc_size(cfg)
    params["fc"] = {"w": nn.normal_init(keys[4], (fc, cfg.lstm_units)),
                    "b": jnp.zeros((1, cfg.lstm_units), jnp.float32)}
    params["final_fc"] = {
        "w": nn.normal_init(keys[5], (cfg.lstm_units * cfg.seq_length, 1)),
        "b": jnp.zeros((1, 1), jnp.float32)}
    return params


def init(key, cfg: RecurrentImageConfig) -> Tuple[Dict, Dict]:
    kg, kd = jax.random.split(key)
    return init_generator(kg, cfg), init_discriminator(kd, cfg)


# ---------------------------------------------------------------------------
# forward passes
# ---------------------------------------------------------------------------

def _conv_stack(filters, x: Array, act, dtype, t: int = 1) -> Array:
    for w in filters:
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = act(moments_norm(y, t))
    return x


def _encode(params, d_params, frames_bt: Array, cfg, dtype,
            t: int = 1) -> Array:
    """(B*T, s, s, c) -> (B*T, fc). Uses D's conv filters when
    share_disc_conv (reference shared-conv variant :170-207)."""
    if cfg.share_disc_conv:
        # reference shared-conv variant: D's convs AND D's fc embedding
        # (…shared_conv…:170-214) — the LSTM sees the 100-d embedding
        filters = [d_params[f"conv{i}"]["w"] for i in range(4)]
        h = _conv_stack(filters, frames_bt, jax.nn.relu, dtype, t)
        h = h.reshape(h.shape[0], -1)
        emb = jnp.dot(h.astype(dtype), d_params["fc"]["w"].astype(dtype))
        return emb + d_params["fc"]["b"]
    filters = [params[f"enc{i}"]["w"] for i in range(4)]
    h = _conv_stack(filters, frames_bt, jax.nn.relu, dtype, t)
    return h.reshape(h.shape[0], -1)


def _decode(params, states_bt: Array, cfg, dtype, t: int = 1) -> Array:
    """(B*T, units) -> (B*T, s, s, c) in [0, 1]."""
    s16 = cfg.image_size // 16
    f8 = cfg.base_filters * 8
    h = jnp.dot(states_bt.astype(dtype), params["out_fc"]["w"].astype(dtype))
    h = (h + params["out_fc"]["b"]).reshape(-1, s16, s16, f8)
    for i in range(4):
        h = jax.nn.relu(moments_norm(h, t))
        h = nn.deconv2d({"w": params[f"dec{i}"]["w"],
                         "b": jnp.zeros((params[f"dec{i}"]["w"].shape[2],),
                                        jnp.float32)}, h, dtype=dtype)
    return (jnp.tanh(h.astype(jnp.float32)) + 1.0) / 2.0


def _run_lstm(params, inputs_tbf: Array, cfg,
              dropout_rng: Optional[Array]) -> Array:
    """inputs (T, B, fc) -> hidden states (T, B, units) via lax.scan over a
    (possibly multi-layer, dropout-wrapped) LSTM stack."""
    b = inputs_tbf.shape[1]
    zeros = jnp.zeros((b, cfg.lstm_units), jnp.float32)
    init_carry = tuple((zeros, zeros) for _ in range(cfg.num_lstm_layers))

    keep = 1.0 - cfg.lstm_dropout
    t = inputs_tbf.shape[0]
    if dropout_rng is not None and cfg.lstm_dropout > 0:
        masks = (jax.random.bernoulli(
            dropout_rng, keep,
            (cfg.num_lstm_layers, t, b, cfg.lstm_units)).astype(jnp.float32)
            / keep)
    else:
        masks = jnp.ones((cfg.num_lstm_layers, t, b, cfg.lstm_units),
                         jnp.float32)

    def step(carry, xs):
        x, mask_t = xs
        new_carry = []
        for layer in range(cfg.num_lstm_layers):
            (c, h), out = lstm_step(params[f"lstm{layer}"], carry[layer], x)
            out = out * mask_t[layer]
            new_carry.append((c, h))
            x = out
        return tuple(new_carry), x

    _, states = jax.lax.scan(step, init_carry,
                             (inputs_tbf, jnp.swapaxes(masks, 0, 1)))
    return states


def generator(params, frames: Array, cfg: RecurrentImageConfig,
              d_params: Optional[Dict] = None,
              dropout_rng: Optional[Array] = None) -> Array:
    """Teacher-forced next-frame prediction: frames (B, T, s, s, c) in [0,1]
    -> predicted frames (B, T, s, s, c) in [0,1].

    Encoder/decoder run once over the folded (B*T) batch; only the LSTM
    scans over time.
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    b, t = frames.shape[:2]
    folded = frames.reshape((b * t,) + frames.shape[2:])
    enc = _encode(params, d_params, folded, cfg, dtype, t)   # (B*T, fc)
    enc_tbf = enc.reshape(b, t, -1).swapaxes(0, 1)           # (T, B, fc)
    states = _run_lstm(params, enc_tbf, cfg, dropout_rng)    # (T, B, units)
    states_bt = states.swapaxes(0, 1).reshape(b * t, -1)
    out = _decode(params, states_bt, cfg, dtype, t)
    out = out.reshape(b, t, cfg.image_size, cfg.image_size, cfg.c_dim)
    if getattr(cfg, "residual_prediction", False):
        # predict the frame DELTA instead of the frame: pred = x + d, d in
        # [-1, 1] (decoder output re-centered). Standard video-prediction
        # technique; deviation from the reference architecture (see
        # RecurrentImageConfig.residual_prediction).
        out = jnp.clip(frames + (2.0 * out - 1.0), 0.0, 1.0)
    return out


def rollout(params, first_frame: Array, length: int,
            cfg: RecurrentImageConfig, d_params: Optional[Dict] = None,
            ) -> Array:
    """Autoregressive generation: seed with one frame (B, s, s, c) in [0,1],
    feed each prediction back in. Returns (B, length, s, s, c)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    b = first_frame.shape[0]
    zeros = jnp.zeros((b, cfg.lstm_units), jnp.float32)
    init_carry = tuple((zeros, zeros) for _ in range(cfg.num_lstm_layers))

    def step(carry, _):
        lstm_carry, frame = carry
        enc = _encode(params, d_params, frame, cfg, dtype)
        x = enc
        new_carry = []
        for layer in range(cfg.num_lstm_layers):
            (c, h), out = lstm_step(params[f"lstm{layer}"],
                                    lstm_carry[layer], x)
            new_carry.append((c, h))
            x = out
        nxt = _decode(params, x, cfg, dtype)
        if getattr(cfg, "residual_prediction", False):
            # same delta semantics as generator(): pred = frame + recentered
            nxt = jnp.clip(frame + (2.0 * nxt - 1.0), 0.0, 1.0)
        return (tuple(new_carry), nxt), nxt

    _, frames = jax.lax.scan(step, (init_carry, first_frame), None,
                             length=length)
    return jnp.swapaxes(frames, 0, 1)


def discriminator(params, frames: Array, cfg: RecurrentImageConfig) -> Array:
    """(B, T, s, s, c) in [0,1] -> logits (B, 1). Shared per-frame conv+FC
    embedding, concatenated over time, final FC (reference :236-268)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    b, t = frames.shape[:2]
    folded = frames.reshape((b * t,) + frames.shape[2:])
    filters = [params[f"conv{i}"]["w"] for i in range(4)]
    h = _conv_stack(filters, folded, nn.lrelu, dtype, t)
    h = h.reshape(b * t, -1)
    emb = jnp.dot(h.astype(dtype), params["fc"]["w"].astype(dtype))
    emb = emb + params["fc"]["b"]
    concat = emb.reshape(b, t * cfg.lstm_units)
    logits = jnp.dot(concat, params["final_fc"]["w"].astype(dtype))
    return (logits + params["final_fc"]["b"]).astype(jnp.float32)
