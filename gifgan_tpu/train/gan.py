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


def make_optimizer(tcfg: TrainConfig,
                   role: str = "g") -> optax.GradientTransformation:
    # TF AdamOptimizer defaults: beta2=0.999, eps=1e-8 (model.py:153-156).
    # role="d" honors tcfg.d_learning_rate (TTUR; None = shared LR). The
    # Adam state pytree is LR-independent, so either role can init slots.
    lr = tcfg.learning_rate
    if role == "d" and tcfg.d_learning_rate is not None:
        lr = tcfg.d_learning_rate
    return optax.adam(lr, b1=tcfg.beta1, b2=0.999, eps=1e-8)


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
    opt_g, opt_d = make_optimizer(tcfg, "g"), make_optimizer(tcfg, "d")
    metrics = {}
    keys = jax.random.split(rng, tcfg.disc_updates + tcfg.gen_updates)
    for i in range(tcfg.disc_updates):
        ts, d_metrics = _d_step(ts, images, z, keys[i], cfg, opt_d)
        metrics.update(d_metrics)
    for i in range(tcfg.gen_updates):
        ts, g_metrics = _g_step(ts, z, keys[tcfg.disc_updates + i], cfg,
                                opt_g)
        metrics.update(g_metrics)
    ts = ts._replace(step=ts.step + 1)
    return ts, metrics


@functools.partial(jax.jit, static_argnames=("cfg",))
def sample_step(ts: TrainState, z: Array, cfg: DCGANConfig) -> Array:
    """Inference-mode sample grid source (reference sampler, model.py:346)."""
    return dcgan.sample(ts.params, ts.state, z, cfg)


# ---------------------------------------------------------------------------
# Conditional (MNIST) training — reference model.py:206-224 mnist branch
# ---------------------------------------------------------------------------

class CondTrainState(NamedTuple):
    params: dcgan.DCGANParams       # generator/discriminator cond param dicts
    state: dcgan.DCGANState
    opt_g: optax.OptState
    opt_d: optax.OptState
    step: Array


def init_cond_train_state(key, cfg: DCGANConfig, y_dim: int,
                          tcfg: TrainConfig) -> CondTrainState:
    kg, kd = jax.random.split(key)
    gp, gs = dcgan.init_generator_cond(kg, cfg, y_dim)
    dp, ds = dcgan.init_discriminator_cond(kd, cfg, y_dim)
    opt = make_optimizer(tcfg)
    return CondTrainState(dcgan.DCGANParams(gp, dp), dcgan.DCGANState(gs, ds),
                          opt.init(gp), opt.init(dp),
                          jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg", "tcfg"), donate_argnums=(0,))
def cond_train_step(ts: CondTrainState, images: Array, y: Array, z: Array,
                    rng, cfg: DCGANConfig, tcfg: TrainConfig,
                    ) -> Tuple[CondTrainState, Dict]:
    """Label-conditioned D+G updates (images in [0, 1], one-hot y).
    Instance noise (cfg.noise_std) applies to the real path like the
    reference's noisy_images (model.py:82,100)."""
    opt = make_optimizer(tcfg, "g")
    opt_disc = make_optimizer(tcfg, "d")
    metrics = {}
    keys = jax.random.split(rng, tcfg.disc_updates + 1)
    for u in range(tcfg.disc_updates):
        noisy_images = nn.add_noise(keys[u], images, cfg.noise_std)
        fake, gen_bn = dcgan.generator_cond(
            ts.params.generator, ts.state.generator, z, y, cfg, train=True)

        def d_loss_fn(dp):
            lr_, ds1 = dcgan.discriminator_cond(
                dp, ts.state.discriminator, noisy_images, y, cfg, train=True)
            lf_, ds2 = dcgan.discriminator_cond(dp, ds1, fake, y, cfg,
                                                train=True)
            loss_r = nn.sigmoid_ce(lr_, jnp.ones_like(lr_))
            loss_f = nn.sigmoid_ce(lf_, jnp.zeros_like(lf_))
            return loss_r + loss_f, (loss_r, loss_f, ds2)

        (d_loss, (lr_v, lf_v, disc_bn)), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(ts.params.discriminator)
        updates, opt_d = opt_disc.update(grads, ts.opt_d,
                                         ts.params.discriminator)
        ts = ts._replace(
            params=ts.params._replace(
                discriminator=optax.apply_updates(ts.params.discriminator,
                                                  updates)),
            state=dcgan.DCGANState(gen_bn, disc_bn), opt_d=opt_d)
        metrics.update(d_loss=d_loss, d_loss_real=lr_v, d_loss_fake=lf_v)

    for _ in range(tcfg.gen_updates):
        def g_loss_fn(gp):
            fake, gs = dcgan.generator_cond(
                gp, ts.state.generator, z, y, cfg, train=True)
            logits, ds = dcgan.discriminator_cond(
                ts.params.discriminator, ts.state.discriminator, fake, y,
                cfg, train=True)
            return nn.sigmoid_ce(logits, jnp.ones_like(logits)), (gs, ds)

        (g_loss, (gen_bn, disc_bn)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(ts.params.generator)
        updates, opt_g = opt.update(grads, ts.opt_g, ts.params.generator)
        ts = ts._replace(
            params=ts.params._replace(
                generator=optax.apply_updates(ts.params.generator, updates)),
            state=dcgan.DCGANState(gen_bn, disc_bn), opt_g=opt_g)
        metrics["g_loss"] = g_loss

    return ts._replace(step=ts.step + 1), metrics


@functools.partial(jax.jit, static_argnames=("cfg",))
def cond_sample_step(ts: CondTrainState, z: Array, y: Array,
                     cfg: DCGANConfig) -> Array:
    x, _ = dcgan.generator_cond(ts.params.generator, ts.state.generator,
                                z, y, cfg, train=False)
    return x


@functools.partial(jax.jit, static_argnames=("cfg", "tcfg"), donate_argnums=(0,))
def train_chunk(ts: TrainState, images_stack: Array, z_stack: Array, rng,
                cfg: DCGANConfig, tcfg: TrainConfig) -> Tuple[TrainState, Dict]:
    """K image-GAN train steps as one XLA program (lax.scan) — amortizes the
    per-step host dispatch (see train/vid.py train_chunk for measurements).
    images_stack (K, B, s, s, c); z_stack (K, B, z)."""
    k = z_stack.shape[0]
    keys = jax.random.split(rng, k)

    def body(ts, xs):
        images, z, key = xs
        ts, metrics = train_step.__wrapped__(ts, images, z, key, cfg, tcfg)
        return ts, metrics

    return jax.lax.scan(body, ts, (images_stack, z_stack, keys))


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tcfg", "sample_fn"),
                   donate_argnums=(0,))
def train_chunk_ids(ts: TrainState, ids_stack: Array, z_stack: Array, rng,
                    corpus_data: Array, cfg: DCGANConfig, tcfg: TrainConfig,
                    sample_fn) -> Tuple[TrainState, Dict]:
    """train_chunk, but each step's images are gathered INSIDE the scan
    body from a device-resident still corpus (data/device.py DeviceCorpus:
    pass `corpus.data` and `corpus.sample_fn`). ids_stack: (K, B) int32.
    Peak image memory is one (B, s, s, c) batch instead of the whole
    (K, B, ...) stack — see train/vid.py train_chunk_ids for the flagship
    numbers that motivated the layout."""
    k = z_stack.shape[0]
    keys = jax.random.split(rng, k)

    def body(ts, xs):
        idx, z, key = xs
        images = sample_fn(corpus_data, idx)  # (B, s, s, c) f32
        ts, metrics = train_step.__wrapped__(ts, images, z, key, cfg, tcfg)
        return ts, metrics

    return jax.lax.scan(body, ts, (ids_stack, z_stack, keys))
