"""Image DCGAN, TPU-native.

Re-designed from the behavior of the reference's carpedm20-lineage DCGAN
(models/recurrent_z/model.py:12-370):

  Generator (model.py:298-324):  z(100) -> linear -> (s/16, s/16, 8*gf)
      -> BN+ReLU -> 4x [deconv2d 5x5/2] with BN+ReLU on the first three
      -> tanh, NHWC.
  Discriminator (model.py:268-279): 4x [conv2d 5x5/2] with lrelu and BN on
      layers 1-3 -> linear logit. The post-lrelu h2 activation map
      (s/8, s/8, 4*df) is returned as a tap — the hook the entire
      latent-optimization and video-GAN stack builds on (model.py:279).

Where the reference builds four graph copies (train/inference x real/fake,
model.py:108-115), this is a single pure function with a `train` flag;
BN running moments are explicit state. The reference's 'd_'/'g_' variable-name
partition (model.py:136-139) becomes two separate parameter pytrees.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gifgan_tpu.core.config import DCGANConfig
from gifgan_tpu.ops import nn

Array = jax.Array


class DCGANParams(NamedTuple):
    generator: Dict
    discriminator: Dict


class DCGANState(NamedTuple):
    generator: Dict
    discriminator: Dict


def init_generator(key, cfg: DCGANConfig) -> Tuple[Dict, Dict]:
    s16 = cfg.output_size // 16
    gf = cfg.gf_dim
    keys = jax.random.split(key, 5)
    params = {
        "h0_lin": nn.linear_init(keys[0], cfg.z_dim, gf * 8 * s16 * s16),
        "h1_deconv": nn.deconv2d_init(keys[1], gf * 8, gf * 4),
        "h2_deconv": nn.deconv2d_init(keys[2], gf * 4, gf * 2),
        "h3_deconv": nn.deconv2d_init(keys[3], gf * 2, gf),
        "h4_deconv": nn.deconv2d_init(keys[4], gf, cfg.c_dim),
    }
    state = {}
    for i, ch in enumerate([gf * 8, gf * 4, gf * 2, gf]):
        p, s = nn.batch_norm_init(ch)
        params[f"bn{i}"] = p
        state[f"bn{i}"] = s
    return params, state


def generator(params, state, z: Array, cfg: DCGANConfig, train: bool,
              ) -> Tuple[Array, Dict]:
    """z (B, z_dim) -> image (B, s, s, c) in [-1, 1]; returns new BN state."""
    dtype = jnp.dtype(cfg.compute_dtype)
    s16 = cfg.output_size // 16
    gf = cfg.gf_dim
    new_state = {}

    h = nn.linear(params["h0_lin"], z.astype(dtype), dtype=dtype)
    h = h.reshape(-1, s16, s16, gf * 8)
    h, new_state["bn0"] = nn.batch_norm(params["bn0"], state["bn0"], h, train)
    h = jax.nn.relu(h)

    for i, name in enumerate(["h1_deconv", "h2_deconv", "h3_deconv"]):
        h = nn.deconv2d(params[name], h, dtype=dtype)
        h, new_state[f"bn{i + 1}"] = nn.batch_norm(
            params[f"bn{i + 1}"], state[f"bn{i + 1}"], h, train)
        h = jax.nn.relu(h)

    h = nn.deconv2d(params["h4_deconv"], h, dtype=dtype)
    return jnp.tanh(h.astype(jnp.float32)), new_state


def init_discriminator(key, cfg: DCGANConfig) -> Tuple[Dict, Dict]:
    df = cfg.df_dim
    s16 = cfg.output_size // 16
    keys = jax.random.split(key, 5)
    params = {
        "h0_conv": nn.conv2d_init(keys[0], cfg.c_dim, df),
        "h1_conv": nn.conv2d_init(keys[1], df, df * 2),
        "h2_conv": nn.conv2d_init(keys[2], df * 2, df * 4),
        "h3_conv": nn.conv2d_init(keys[3], df * 4, df * 8),
        "h3_lin": nn.linear_init(keys[4], df * 8 * s16 * s16, 1),
    }
    state = {}
    for i, ch in enumerate([df * 2, df * 4, df * 8], start=1):
        p, s = nn.batch_norm_init(ch)
        params[f"bn{i}"] = p
        state[f"bn{i}"] = s
    return params, state


def discriminator(params, state, x: Array, cfg: DCGANConfig, train: bool,
                  ) -> Tuple[Array, Array, Dict]:
    """image (B, s, s, c) -> (logits (B, 1), h2 activation tap, new BN state).

    The h2 tap is the post-lrelu (s/8, s/8, 4*df) feature map
    (reference model.py:275,279).
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    new_state = {}

    h = nn.lrelu(nn.conv2d(params["h0_conv"], x.astype(dtype), dtype=dtype))
    h = nn.conv2d(params["h1_conv"], h, dtype=dtype)
    h, new_state["bn1"] = nn.batch_norm(params["bn1"], state["bn1"], h, train)
    h = nn.lrelu(h)
    h = nn.conv2d(params["h2_conv"], h, dtype=dtype)
    h, new_state["bn2"] = nn.batch_norm(params["bn2"], state["bn2"], h, train)
    h2 = nn.lrelu(h)
    h = nn.conv2d(params["h3_conv"], h2, dtype=dtype)
    h, new_state["bn3"] = nn.batch_norm(params["bn3"], state["bn3"], h, train)
    h = nn.lrelu(h)
    logits = nn.linear(params["h3_lin"], h.reshape(h.shape[0], -1), dtype=dtype)
    return logits.astype(jnp.float32), h2, new_state


def init(key, cfg: DCGANConfig) -> Tuple[DCGANParams, DCGANState]:
    kg, kd = jax.random.split(key)
    gp, gs = init_generator(kg, cfg)
    dp, ds = init_discriminator(kd, cfg)
    return DCGANParams(gp, dp), DCGANState(gs, ds)


def sample(params: DCGANParams, state: DCGANState, z: Array,
           cfg: DCGANConfig) -> Array:
    """Inference-mode sampler (reference model.py:346-370): BN uses running
    moments, state is not updated."""
    x, _ = generator(params.generator, state.generator, z, cfg, train=False)
    return x
