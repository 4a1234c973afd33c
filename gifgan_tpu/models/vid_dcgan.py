"""VID_DCGAN — the flagship nested "recurrent-z" video GAN, TPU-native.

Rebuilt from the behavior of models/recurrent_z/z_model_lib.py (reference):

  z-sequence generator (z_model_lib.py:353-382): video latent z(120) is
      broadcast over `vid_length` frames, a per-frame scalar frame-number in
      linspace(-1, 1) is appended, time is folded into batch
      ((B, T, 121) -> (B*T, 121)), and a 3x512 BN+ReLU MLP maps each row to a
      tanh per-frame image latent z(100).

  Nested image GAN (z_model_lib.py:68-76): the per-frame latents drive the
      *frozen* image DCGAN generator with inner batch B*T. Composition here is
      literally `dcgan.generator(img_params, vid_generator(z))` — no graph
      surgery; freezing is an optimizer partition, not a variable-name filter.

  Video discriminator (z_model_lib.py:384-418): the image discriminator's
      inference-mode h2 activation tap (B*T, 8, 8, 256) is reshaped to
      (B, T, 8, 8, 256) and passed through 3x [conv3d 3x3x3/2] (lrelu; BN on
      layers 2-3) and a linear logit.

  First-frame loss (z_model_lib.py:107-115): MSE between the generated
      frame-0 latent and dims [0:z_output] of the video latent, making
      z[0:100] ≈ identity ("face") and z[100:120] ≈ motion ("expression").

The time-folded-batch layout is deliberate: frames shard over the mesh `data`
axis exactly like batch, so data parallelism covers time too (SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gifgan_tpu.core.config import VidGANConfig
from gifgan_tpu.models import dcgan
from gifgan_tpu.ops import nn

Array = jax.Array


class VidGANParams(NamedTuple):
    vid_generator: Dict
    vid_discriminator: Dict
    img_generator: Dict
    img_discriminator: Dict


class VidGANState(NamedTuple):
    vid_generator: Dict
    vid_discriminator: Dict
    img_generator: Dict
    img_discriminator: Dict


# ---------------------------------------------------------------------------
# z-sequence generator
# ---------------------------------------------------------------------------

def init_vid_generator(key, cfg: VidGANConfig) -> Tuple[Dict, Dict]:
    h = cfg.hidden_dim
    keys = jax.random.split(key, 4)
    params = {
        "lin0": nn.linear_init(keys[0], cfg.z_input_size + 1, h),
        "lin1": nn.linear_init(keys[1], h, h),
        "lin2": nn.linear_init(keys[2], h, h),
        "lin3": nn.linear_init(keys[3], h, cfg.z_output_size),
    }
    state = {}
    for i in range(3):
        p, s = nn.batch_norm_init(h)
        params[f"bn{i}"] = p
        state[f"bn{i}"] = s
    return params, state


def vid_generator(params, state, z: Array, cfg: VidGANConfig, train: bool,
                  ) -> Tuple[Array, Dict]:
    """z (B, z_in) -> per-frame latents (B*T, z_out) in [-1, 1] (tanh)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    b = z.shape[0]
    t = cfg.vid_length
    z_copied = jnp.broadcast_to(z[:, None, :], (b, t, cfg.z_input_size))
    frame_numbers = jnp.linspace(-1.0, 1.0, t, dtype=jnp.float32)
    frame_numbers = jnp.broadcast_to(frame_numbers[None, :, None], (b, t, 1))
    h = jnp.concatenate([z_copied, frame_numbers], axis=-1)
    h = h.reshape(b * t, cfg.z_input_size + 1).astype(dtype)

    new_state = {}
    for i in range(3):
        h = nn.linear(params[f"lin{i}"], h, dtype=dtype)
        h, new_state[f"bn{i}"] = nn.batch_norm(
            params[f"bn{i}"], state[f"bn{i}"], h, train)
        h = jax.nn.relu(h)
    h = nn.linear(params["lin3"], h, dtype=dtype)
    return jnp.tanh(h.astype(jnp.float32)), new_state


# ---------------------------------------------------------------------------
# video discriminator over image-D activation maps
# ---------------------------------------------------------------------------

def init_vid_discriminator(key, cfg: VidGANConfig) -> Tuple[Dict, Dict]:
    f = cfg.d_filters
    act_ch = cfg.image_gan.df_dim * 4          # image-D h2 tap channels
    act_hw = cfg.image_gan.output_size // 8    # image-D h2 tap spatial size
    t, hw = cfg.vid_length, act_hw
    for _ in range(3):
        t, hw = (t + 1) // 2, (hw + 1) // 2
    flat = t * hw * hw * f
    keys = jax.random.split(key, 4)
    params = {
        "h1_conv": nn.conv3d_init(keys[0], act_ch, f),
        "h2_conv": nn.conv3d_init(keys[1], f, f),
        "h3_conv": nn.conv3d_init(keys[2], f, f),
        "h4_lin": nn.linear_init(keys[3], flat, 1),
    }
    state = {}
    for i in (2, 3):
        p, s = nn.batch_norm_init(f)
        params[f"bn{i}"] = p
        state[f"bn{i}"] = s
    return params, state


def vid_discriminator(params, state, activations: Array, cfg: VidGANConfig,
                      train: bool) -> Tuple[Array, Dict]:
    """activations (B*T, h, w, c) -> logits (B, 1); returns new BN state.

    Layer pattern matches the reference (z_model_lib.py:408-415): lrelu conv3d
    without BN, then two BN'd lrelu conv3ds, then the linear logit.
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    t = cfg.vid_length
    bt, hh, ww, c = activations.shape
    b = bt // t
    vid = activations.reshape(b, t, hh, ww, c).astype(dtype)

    new_state = {}
    h = nn.lrelu(nn.conv3d(params["h1_conv"], vid, dtype=dtype))
    h = nn.conv3d(params["h2_conv"], h, dtype=dtype)
    h, new_state["bn2"] = nn.batch_norm(params["bn2"], state["bn2"], h, train)
    h = nn.lrelu(h)
    h = nn.conv3d(params["h3_conv"], h, dtype=dtype)
    h, new_state["bn3"] = nn.batch_norm(params["bn3"], state["bn3"], h, train)
    h = nn.lrelu(h)
    logits = nn.linear(params["h4_lin"], h.reshape(b, -1), dtype=dtype)
    return logits.astype(jnp.float32), new_state


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def init(key, cfg: VidGANConfig) -> Tuple[VidGANParams, VidGANState]:
    kg, kd, ki = jax.random.split(key, 3)
    gp, gs = init_vid_generator(kg, cfg)
    dp, ds = init_vid_discriminator(kd, cfg)
    img_params, img_state = dcgan.init(ki, cfg.image_gan)
    return (VidGANParams(gp, dp, img_params.generator, img_params.discriminator),
            VidGANState(gs, ds, img_state.generator, img_state.discriminator))


def generate_videos(params: VidGANParams, state: VidGANState, z: Array,
                    cfg: VidGANConfig, train: bool,
                    ) -> Tuple[Array, Array, Dict, Dict]:
    """z (B, z_in) -> (frames (B*T, s, s, c), frame latents (B*T, z_out),
    new vid-G state, new img-G state)."""
    g_out, gs = vid_generator(params.vid_generator, state.vid_generator,
                              z, cfg, train)
    frames, igs = dcgan.generator(params.img_generator, state.img_generator,
                                  g_out, cfg.image_gan, train)
    return frames, g_out, gs, igs


def first_frame_loss(g_out: Array, z: Array, cfg: VidGANConfig) -> Array:
    """MSE between generated frame-0 latents and z[:, :z_out]
    (z_model_lib.py:107-115). g_out is time-folded (B*T, z_out); frame 0 is
    the stride-T slice (z_model_lib.py:64)."""
    first = g_out[::cfg.vid_length]
    target = z[:, :cfg.z_output_size]
    return jnp.mean(jnp.square(first - target))
