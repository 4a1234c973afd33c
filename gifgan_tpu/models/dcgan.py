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
    assert cfg.output_size % 16 == 0, "unconditional DCGAN needs size % 16"
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

    # output layer (c_dim channels): with packed_c3, the subpixel form
    # computes 4*c out-channels before its depth-to-space — 4x MXU lane
    # packing where N=c_dim=3 pads 128 lanes (measured +15% on this
    # stage's fwd+bwd; examples/conv_roofline.py 2026-08-20)
    impl = "subpixel" if getattr(cfg, "packed_c3", False) else None
    h = nn.deconv2d(params["h4_deconv"], h, dtype=dtype, impl=impl)
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

    # input layer (c_dim channels): packed_c3 runs it space-to-depth
    # phase-packed (3 -> 12 contraction channels; measured +7.5% fwd+bwd
    # at the flagship shape; examples/conv_roofline.py 2026-08-20)
    impl0 = "s2d" if getattr(cfg, "packed_c3", False) else None
    h = nn.lrelu(nn.conv2d(params["h0_conv"], x.astype(dtype), dtype=dtype,
                           impl=impl0))
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


# ---------------------------------------------------------------------------
# Conditional (y-label) variant — the MNIST configuration
# (reference model.py:281-296 discriminator, :325-344 generator: label
# conditioning by concatenation onto the latent / feature maps)
# ---------------------------------------------------------------------------

def conv_cond_concat(x: Array, y: Array) -> Array:
    """Concatenate a (B, y_dim) label onto a (B, h, w, c) feature map as
    constant channels (reference ops.py:45-49)."""
    b, h, w, _ = x.shape
    yb = jnp.broadcast_to(y[:, None, None, :], (b, h, w, y.shape[-1]))
    return jnp.concatenate([x, yb.astype(x.dtype)], axis=-1)


def init_generator_cond(key, cfg: DCGANConfig, y_dim: int,
                        gfc_dim: int = 1024) -> Tuple[Dict, Dict]:
    s4 = cfg.output_size // 4
    gf = cfg.gf_dim
    keys = jax.random.split(key, 4)
    params = {
        "h0_lin": nn.linear_init(keys[0], cfg.z_dim + y_dim, gfc_dim),
        "h1_lin": nn.linear_init(keys[1], gfc_dim + y_dim, gf * 2 * s4 * s4),
        "h2_deconv": nn.deconv2d_init(keys[2], gf * 2 + y_dim, gf * 2),
        "h3_deconv": nn.deconv2d_init(keys[3], gf * 2 + y_dim, cfg.c_dim),
    }
    state = {}
    for name, ch in (("bn0", gfc_dim), ("bn1", gf * 2 * s4 * s4),
                     ("bn2", gf * 2)):
        p, s = nn.batch_norm_init(ch)
        params[name] = p
        state[name] = s
    return params, state


def generator_cond(params, state, z: Array, y: Array, cfg: DCGANConfig,
                   train: bool) -> Tuple[Array, Dict]:
    """Label-conditioned generator; sigmoid output in [0, 1] (MNIST images
    are stored [0, 1]; reference model.py:344)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    s2, s4 = cfg.output_size // 2, cfg.output_size // 4
    gf = cfg.gf_dim
    new_state = {}
    zy = jnp.concatenate([z, y], axis=1).astype(dtype)
    h, new_state["bn0"] = nn.batch_norm(
        params["bn0"], state["bn0"], nn.linear(params["h0_lin"], zy,
                                               dtype=dtype), train)
    h = jax.nn.relu(h)
    h = jnp.concatenate([h, y.astype(h.dtype)], axis=1)
    h, new_state["bn1"] = nn.batch_norm(
        params["bn1"], state["bn1"], nn.linear(params["h1_lin"], h,
                                               dtype=dtype), train)
    h = jax.nn.relu(h).reshape(-1, s4, s4, gf * 2)
    h = conv_cond_concat(h, y)
    h, new_state["bn2"] = nn.batch_norm(
        params["bn2"], state["bn2"], nn.deconv2d(params["h2_deconv"], h,
                                                 dtype=dtype), train)
    h = jax.nn.relu(h)
    h = conv_cond_concat(h, y)
    h = nn.deconv2d(params["h3_deconv"], h, dtype=dtype)
    return jax.nn.sigmoid(h.astype(jnp.float32)), new_state


def init_discriminator_cond(key, cfg: DCGANConfig, y_dim: int,
                            dfc_dim: int = 1024) -> Tuple[Dict, Dict]:
    s4 = cfg.output_size // 4
    df = cfg.df_dim
    keys = jax.random.split(key, 4)
    c1 = cfg.c_dim + y_dim
    flat = s4 * s4 * (df + y_dim)
    params = {
        "h0_conv": nn.conv2d_init(keys[0], cfg.c_dim + y_dim, c1),
        "h1_conv": nn.conv2d_init(keys[1], c1 + y_dim, df + y_dim),
        "h2_lin": nn.linear_init(keys[2], flat + y_dim, dfc_dim),
        "h3_lin": nn.linear_init(keys[3], dfc_dim + y_dim, 1),
    }
    state = {}
    for name, ch in (("bn1", df + y_dim), ("bn2", dfc_dim)):
        p, s = nn.batch_norm_init(ch)
        params[name] = p
        state[name] = s
    return params, state


def discriminator_cond(params, state, x: Array, y: Array, cfg: DCGANConfig,
                       train: bool) -> Tuple[Array, Dict]:
    dtype = jnp.dtype(cfg.compute_dtype)
    new_state = {}
    h = conv_cond_concat(x.astype(dtype), y)
    h = nn.lrelu(nn.conv2d(params["h0_conv"], h, dtype=dtype))
    h = conv_cond_concat(h, y)
    h, new_state["bn1"] = nn.batch_norm(
        params["bn1"], state["bn1"], nn.conv2d(params["h1_conv"], h,
                                               dtype=dtype), train)
    h = nn.lrelu(h).reshape(h.shape[0], -1)
    h = jnp.concatenate([h, y.astype(h.dtype)], axis=1)
    h, new_state["bn2"] = nn.batch_norm(
        params["bn2"], state["bn2"], nn.linear(params["h2_lin"], h,
                                               dtype=dtype), train)
    h = nn.lrelu(h)
    h = jnp.concatenate([h, y.astype(h.dtype)], axis=1)
    logits = nn.linear(params["h3_lin"], h, dtype=dtype)
    return logits.astype(jnp.float32), new_state
