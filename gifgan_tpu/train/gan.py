"""Image DCGAN training — fused jitted step functions.

The reference runs 6-7 separate session executions per batch (1 D update,
2 G updates, 3 loss re-evals; model.py:226-243), re-crossing the
Python<->runtime boundary each time and re-running forward passes for losses.
Here a batch is ONE compiled XLA program: D update + `gen_updates` G updates +
all metrics, with the optimizer (Adam 2e-4, beta1 0.5 — model.py:153-156)
fused in. Data parallelism is just input sharding: place the batch with its
leading axis sharded over the mesh `data` axis and XLA inserts the gradient
all-reduces over ICI.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from gifgan_tpu.core.config import DCGANConfig, TrainConfig
from gifgan_tpu.models import dcgan
from gifgan_tpu.ops import nn

Array = jax.Array


class TrainState(NamedTuple):
    params: dcgan.DCGANParams
    state: dcgan.DCGANState      # BN running moments
    opt_g: optax.OptState
    opt_d: optax.OptState
    step: Array


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    # TF AdamOptimizer defaults: beta2=0.999, eps=1e-8 (model.py:153-156).
    return optax.adam(tcfg.learning_rate, b1=tcfg.beta1, b2=0.999, eps=1e-8)


def init_train_state(key, cfg: DCGANConfig, tcfg: TrainConfig) -> TrainState:
    params, state = dcgan.init(key, cfg)
    opt = make_optimizer(tcfg)
    return TrainState(
        params=params,
        state=state,
        opt_g=opt.init(params.generator),
        opt_d=opt.init(params.discriminator),
        step=jnp.zeros((), jnp.int32),
    )


def _d_step(ts: TrainState, images: Array, z: Array, rng, cfg: DCGANConfig,
            opt: optax.GradientTransformation) -> Tuple[TrainState, Dict]:
    k_img, k_fake = jax.random.split(rng)
    noisy_images = nn.add_noise(k_img, images, cfg.noise_std)
    # The generator forward happens outside the differentiated function: the
    # D step never needs gradients through G.
    fake, gen_bn_state = dcgan.generator(
        ts.params.generator, ts.state.generator, z, cfg, train=True)
    noisy_fake = nn.add_noise(k_fake, fake, cfg.noise_std)

    def loss_fn(d_params):
        logits_real, _, ds1 = dcgan.discriminator(
            d_params, ts.state.discriminator, noisy_images, cfg, train=True)
        logits_fake, _, ds2 = dcgan.discriminator(
            d_params, ds1, noisy_fake, cfg, train=True)
        loss_real = nn.sigmoid_ce(logits_real, jnp.ones_like(logits_real))
        loss_fake = nn.sigmoid_ce(logits_fake, jnp.zeros_like(logits_fake))
        return loss_real + loss_fake, (loss_real, loss_fake, ds2)

    (d_loss, (loss_real, loss_fake, disc_bn_state)), grads = (
        jax.value_and_grad(loss_fn, has_aux=True)(ts.params.discriminator))
    updates, opt_d = opt.update(grads, ts.opt_d, ts.params.discriminator)
    d_params = optax.apply_updates(ts.params.discriminator, updates)

    ts = ts._replace(
        params=ts.params._replace(discriminator=d_params),
        state=dcgan.DCGANState(gen_bn_state, disc_bn_state),
        opt_d=opt_d,
    )
    metrics = {
        "d_loss": d_loss,
        "d_loss_real": loss_real,
        "d_loss_fake": loss_fake,
        "images_std": nn.get_std(images.reshape(images.shape[0], -1)),
        "g_std": nn.get_std(fake.reshape(fake.shape[0], -1)),
    }
    return ts, metrics


def _g_step(ts: TrainState, z: Array, rng, cfg: DCGANConfig,
            opt: optax.GradientTransformation) -> Tuple[TrainState, Dict]:
    def loss_fn(g_params):
        fake, gs = dcgan.generator(
            g_params, ts.state.generator, z, cfg, train=True)
        noisy_fake = nn.add_noise(rng, fake, cfg.noise_std)
        logits_fake, _, ds = dcgan.discriminator(
            ts.params.discriminator, ts.state.discriminator, noisy_fake, cfg,
            train=True)
        loss = nn.sigmoid_ce(logits_fake, jnp.ones_like(logits_fake))
        return loss, (gs, ds)

    (g_loss, (gen_bn_state, disc_bn_state)), grads = (
        jax.value_and_grad(loss_fn, has_aux=True)(ts.params.generator))
    updates, opt_g = opt.update(grads, ts.opt_g, ts.params.generator)
    g_params = optax.apply_updates(ts.params.generator, updates)

    ts = ts._replace(
        params=ts.params._replace(generator=g_params),
        state=dcgan.DCGANState(gen_bn_state, disc_bn_state),
        opt_g=opt_g,
    )
    return ts, {"g_loss": g_loss}


@functools.partial(jax.jit, static_argnames=("cfg", "tcfg"), donate_argnums=(0,))
def train_step(ts: TrainState, images: Array, z: Array, rng,
               cfg: DCGANConfig, tcfg: TrainConfig) -> Tuple[TrainState, Dict]:
    """One full batch: `disc_updates` D updates + `gen_updates` G updates
    (1 + 2 in the reference, model.py:226-239), one XLA program."""
    opt = make_optimizer(tcfg)
    metrics = {}
    keys = jax.random.split(rng, tcfg.disc_updates + tcfg.gen_updates)
    for i in range(tcfg.disc_updates):
        ts, d_metrics = _d_step(ts, images, z, keys[i], cfg, opt)
        metrics.update(d_metrics)
    for i in range(tcfg.gen_updates):
        ts, g_metrics = _g_step(ts, z, keys[tcfg.disc_updates + i], cfg, opt)
        metrics.update(g_metrics)
    ts = ts._replace(step=ts.step + 1)
    return ts, metrics


@functools.partial(jax.jit, static_argnames=("cfg",))
def sample_step(ts: TrainState, z: Array, cfg: DCGANConfig) -> Array:
    """Inference-mode sample grid source (reference sampler, model.py:346)."""
    return dcgan.sample(ts.params, ts.state, z, cfg)
