"""recurrent_image GAN training — fused jitted step.

Reference loop (recurrent_DCGAN.py:300-398): input clips of T+1 frames;
X = frames 0..T-1, Y = frames 1..T (:159-166); Adam 2e-4 beta1 0.5, 1 D +
2 G updates per batch (:306-307, :352-375); LSTM state threaded through
feed_dicts there, pure scan state here.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from gifgan_tpu.core.config import RecurrentImageConfig, TrainConfig
from gifgan_tpu.models import recurrent_image as ri
from gifgan_tpu.ops import nn
from gifgan_tpu.train.gan import make_optimizer

Array = jax.Array


class RecurrentTrainState(NamedTuple):
    params_g: Dict
    params_d: Dict
    opt_g: optax.OptState
    opt_d: optax.OptState
    step: Array


def init_train_state(key, cfg: RecurrentImageConfig,
                     tcfg: TrainConfig) -> RecurrentTrainState:
    pg, pd = ri.init(key, cfg)
    opt = make_optimizer(tcfg)
    return RecurrentTrainState(pg, pd, opt.init(pg), opt.init(pd),
                               jnp.zeros((), jnp.int32))


def split_xy(clips: Array) -> Tuple[Array, Array]:
    """clips (B, T+1, s, s, c) in [0,1] -> (X frames 0..T-1, Y frames 1..T)."""
    return clips[:, :-1], clips[:, 1:]


@functools.partial(jax.jit, static_argnames=("cfg", "tcfg"), donate_argnums=(0,))
def train_step(ts: RecurrentTrainState, clips: Array, rng,
               cfg: RecurrentImageConfig, tcfg: TrainConfig,
               ) -> Tuple[RecurrentTrainState, Dict]:
    opt = make_optimizer(tcfg)
    x, y = split_xy(clips)
    metrics = {}
    keys = jax.random.split(rng, tcfg.disc_updates + tcfg.gen_updates)

    for u in range(tcfg.disc_updates):
        fake = ri.generator(ts.params_g, x, cfg, d_params=ts.params_d,
                            dropout_rng=keys[u] if cfg.lstm_dropout else None)

        def d_loss_fn(pd):
            logits_fake = ri.discriminator(pd, fake, cfg)
            logits_real = ri.discriminator(pd, y, cfg)
            lf = nn.sigmoid_ce(logits_fake, jnp.zeros_like(logits_fake))
            lr = nn.sigmoid_ce(logits_real, jnp.ones_like(logits_real))
            return lf + lr, (lf, lr)

        (d_loss, (lf, lr)), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(ts.params_d)
        updates, opt_d = opt.update(grads, ts.opt_d, ts.params_d)
        ts = ts._replace(params_d=optax.apply_updates(ts.params_d, updates),
                         opt_d=opt_d)
        metrics.update(d_loss=d_loss, d_loss_fake=lf, d_loss_real=lr)

    for u in range(tcfg.gen_updates):
        k = keys[tcfg.disc_updates + u]

        def g_loss_fn(pg):
            fake = ri.generator(pg, x, cfg, d_params=ts.params_d,
                                dropout_rng=k if cfg.lstm_dropout else None)
            logits_fake = ri.discriminator(ts.params_d, fake, cfg)
            adv = nn.sigmoid_ce(logits_fake, jnp.ones_like(logits_fake))
            pix = jnp.mean(jnp.abs(fake - y))
            adv_w = jnp.where(ts.step >= cfg.adversarial_after_steps,
                              1.0, 0.0) if cfg.adversarial_after_steps else 1.0
            adv_w = adv_w * cfg.adversarial_loss_scalar
            return adv_w * adv + cfg.pixel_loss_scalar * pix, (adv, pix)

        (g_loss, (adv, pix)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(ts.params_g)
        updates, opt_g = opt.update(grads, ts.opt_g, ts.params_g)
        ts = ts._replace(params_g=optax.apply_updates(ts.params_g, updates),
                         opt_g=opt_g)
        metrics["g_loss"] = g_loss
        metrics["g_loss_adv"] = adv
        metrics["pixel_mae"] = pix

    return ts._replace(step=ts.step + 1), metrics


@functools.partial(jax.jit, static_argnames=("cfg",))
def predict(ts: RecurrentTrainState, clips: Array,
            cfg: RecurrentImageConfig) -> Array:
    """Teacher-forced next-frame predictions for a (B, T+1, ...) clip batch."""
    x, _ = split_xy(clips)
    return ri.generator(ts.params_g, x, cfg, d_params=ts.params_d)


@functools.partial(jax.jit, static_argnames=("cfg", "length"))
def sample_rollout(ts: RecurrentTrainState, first_frames: Array, length: int,
                   cfg: RecurrentImageConfig) -> Array:
    return ri.rollout(ts.params_g, first_frames, length, cfg,
                      d_params=ts.params_d)
