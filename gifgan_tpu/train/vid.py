"""VID_DCGAN (recurrent-z video GAN) training — fused jitted steps.

Semantics rebuilt from z_model_lib.py (reference):

  - Fake path during training: video-G in TRAIN mode produces per-frame
    latents; the nested image generator runs in INFERENCE mode (the reference
    wires `sampler(sample_z=G_out)`, z_model_lib.py:68-76 + model.py:111) and
    the image discriminator's activation tap is taken in INFERENCE mode
    (D_activations_inf_, z_model_lib.py:89). Image BN state therefore never
    updates during video training — the image GAN is frozen by default.
  - Real path: image-D inference-mode activations of the (instance-noised)
    real frames (z_model_lib.py:84).
  - Activation noise on both paths (z_model_lib.py:84,89); image noise on
    frames (model.py:82,112).
  - The video discriminator's BN always uses batch statistics (the reference
    calls its bns without a train flag, z_model_lib.py:411-413).
  - Freezing: the reference restores the image GAN into a nested scope and
    excludes its vars from the optimizers (z_model_lib.py:117-134, 165-185).
    Here frozen-vs-trainable is an explicit pytree partition; the
    --train_img_gen / --train_img_disc unfreeze flags select the partition.
  - Loss: GAN sigmoid-CE + first_frame_loss_scalar * MSE(frame-0 latent,
    z[:, :z_out]) (z_model_lib.py:102-115).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from gifgan_tpu.core.config import TrainConfig, VidGANConfig
from gifgan_tpu.models import dcgan, vid_dcgan
from gifgan_tpu.models.vid_dcgan import VidGANParams, VidGANState
from gifgan_tpu.ops import nn
from gifgan_tpu.train.gan import make_optimizer

Array = jax.Array


class VidTrainState(NamedTuple):
    params: VidGANParams
    state: VidGANState
    opt_g: optax.OptState
    opt_d: optax.OptState
    step: Array


class Knobs(NamedTuple):
    """Runtime training knobs — TRACED scalars, so one compiled program
    serves every value. The levers the endurance evidence showed matter
    against D saturation (docs/ENDURANCE.md: the round-1 run needed a
    manual noise raise 0.1 -> 0.5 to revive a saturated D; changing
    cfg.*_noise_std instead recompiles the flagship program, ~6 min
    through the remote-compile relay). Consumed by train_step/train_chunk
    (knobs=None keeps the baked-from-cfg graph) and produced per-chunk by
    train/controller.py's automated intervention policy.
    """
    image_noise_std: Array       # replaces cfg.image_noise_std
    activation_noise_std: Array  # replaces cfg.activation_noise_std
    d_lr_scale: Array            # multiplies the D update (Adam is
    #                              lr-linear, so == scaling the D lr)


def make_knobs(cfg: VidGANConfig, image_noise_std=None,
               activation_noise_std=None, d_lr_scale=1.0) -> Knobs:
    """Build a Knobs pytree of f32 scalars, defaulting to cfg's values."""
    img = cfg.image_noise_std if image_noise_std is None else image_noise_std
    act = (cfg.activation_noise_std if activation_noise_std is None
           else activation_noise_std)
    f = lambda v: jnp.asarray(v, jnp.float32)
    return Knobs(f(img), f(act), f(d_lr_scale))


def _g_trainable(params: VidGANParams, tcfg: TrainConfig) -> Dict:
    t = {"vid": params.vid_generator}
    if tcfg.train_img_gen:
        t["img"] = params.img_generator
    return t


def _d_trainable(params: VidGANParams, tcfg: TrainConfig) -> Dict:
    t = {"vid": params.vid_discriminator}
    if tcfg.train_img_disc:
        t["img"] = params.img_discriminator
    return t


def init_train_state(key, cfg: VidGANConfig, tcfg: TrainConfig) -> VidTrainState:
    params, state = vid_dcgan.init(key, cfg)
    opt = make_optimizer(tcfg)
    return VidTrainState(
        params=params,
        state=state,
        opt_g=opt.init(_g_trainable(params, tcfg)),
        opt_d=opt.init(_d_trainable(params, tcfg)),
        step=jnp.zeros((), jnp.int32),
    )


def _noise_stds(cfg: VidGANConfig, knobs):
    """Noise levels: baked Python floats from cfg (knobs=None — zero stds
    compile to no-ops) or the traced Knobs scalars."""
    if knobs is None:
        return cfg.image_noise_std, cfg.activation_noise_std
    return knobs.image_noise_std, knobs.activation_noise_std


def _fake_activations(params: VidGANParams, state: VidGANState, z: Array,
                      cfg: VidGANConfig, keys, knobs=None,
                      fold_sharding=None):
    """vidG(train) -> imgG(inference) -> noise -> imgD(inference) h2 tap.
    Returns (noisy acts, g_out, vid G state, PRE-noise act std — the
    collapse diagnostic is measured before the injected noise,
    z_model_lib.py:85,90).

    fold_sharding (optional NamedSharding): layout wall at the vid-D
    boundary — see train_step's docstring (sequence-parallel runs pin the
    folded activations data-only here so the vid-D never tries to shard
    its shrinking time axis over `seq`)."""
    img_std, act_std = _noise_stds(cfg, knobs)
    g_out, vid_gs = vid_dcgan.vid_generator(
        params.vid_generator, state.vid_generator, z, cfg, train=True)
    frames, _ = dcgan.generator(
        params.img_generator, state.img_generator, g_out, cfg.image_gan,
        train=False)
    noisy_frames = nn.add_noise(keys[0], frames, img_std)
    _, acts, _ = dcgan.discriminator(
        params.img_discriminator, state.img_discriminator, noisy_frames,
        cfg.image_gan, train=False)
    pre_noise_std = nn.get_std(acts.reshape(acts.shape[0], -1))
    acts = nn.add_noise(keys[1], acts, act_std)
    if fold_sharding is not None:
        acts = jax.lax.with_sharding_constraint(acts, fold_sharding)
    return acts, g_out, vid_gs, pre_noise_std


def _real_activations(params: VidGANParams, state: VidGANState, frames: Array,
                      cfg: VidGANConfig, keys, knobs=None,
                      fold_sharding=None):
    img_std, act_std = _noise_stds(cfg, knobs)
    noisy = nn.add_noise(keys[0], frames, img_std)
    _, acts, _ = dcgan.discriminator(
        params.img_discriminator, state.img_discriminator, noisy,
        cfg.image_gan, train=False)
    pre_noise_std = nn.get_std(acts.reshape(acts.shape[0], -1))
    acts = nn.add_noise(keys[1], acts, act_std)
    if fold_sharding is not None:
        acts = jax.lax.with_sharding_constraint(acts, fold_sharding)
    return acts, pre_noise_std


def _d_step(ts: VidTrainState, frames: Array, z: Array, rng,
            cfg: VidGANConfig, tcfg: TrainConfig, opt,
            knobs=None, fold_sharding=None) -> Tuple[VidTrainState, Dict]:
    keys = jax.random.split(rng, 4)
    frozen = ts.params

    def loss_fn(trainable):
        params = frozen._replace(vid_discriminator=trainable["vid"])
        if "img" in trainable:
            params = params._replace(img_discriminator=trainable["img"])
        real_acts, real_std = _real_activations(params, ts.state, frames,
                                                cfg, keys[:2], knobs,
                                                fold_sharding)
        fake_acts, _, _, fake_std = _fake_activations(
            params, ts.state, z, cfg, keys[2:], knobs, fold_sharding)
        logits_real, ds1 = vid_dcgan.vid_discriminator(
            params.vid_discriminator, ts.state.vid_discriminator, real_acts,
            cfg, train=True)
        logits_fake, ds2 = vid_dcgan.vid_discriminator(
            params.vid_discriminator, ds1, fake_acts, cfg, train=True)
        loss_real = nn.sigmoid_ce(logits_real, jnp.ones_like(logits_real))
        loss_fake = nn.sigmoid_ce(logits_fake, jnp.zeros_like(logits_fake))
        aux = (loss_real, loss_fake, ds2, real_std, fake_std)
        return loss_real + loss_fake, aux

    trainable = _d_trainable(ts.params, tcfg)
    (d_loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
    loss_real, loss_fake, vid_ds, real_std, fake_std = aux
    updates, opt_d = opt.update(grads, ts.opt_d, trainable)
    if knobs is not None:
        # Adam's update is lr-linear, so scaling the update IS scaling the
        # D lr — the TTUR lever as a runtime knob (no recompile, slot
        # state untouched so the scale can move freely mid-run).
        updates = jax.tree_util.tree_map(
            lambda u: u * knobs.d_lr_scale.astype(u.dtype), updates)
    new_trainable = optax.apply_updates(trainable, updates)

    params = ts.params._replace(vid_discriminator=new_trainable["vid"])
    if "img" in new_trainable:
        params = params._replace(img_discriminator=new_trainable["img"])
    ts = ts._replace(params=params,
                     state=ts.state._replace(vid_discriminator=vid_ds),
                     opt_d=opt_d)
    metrics = {
        "d_loss": d_loss,
        "d_loss_real": loss_real,
        "d_loss_fake": loss_fake,
        "real_activation_std": real_std,
        "fake_activation_std": fake_std,
    }
    return ts, metrics


def _g_step(ts: VidTrainState, z: Array, rng, cfg: VidGANConfig,
            tcfg: TrainConfig, opt, knobs=None,
            fold_sharding=None) -> Tuple[VidTrainState, Dict]:
    keys = jax.random.split(rng, 2)
    frozen = ts.params

    def loss_fn(trainable):
        params = frozen._replace(vid_generator=trainable["vid"])
        if "img" in trainable:
            params = params._replace(img_generator=trainable["img"])
        fake_acts, g_out, vid_gs, _ = _fake_activations(
            params, ts.state, z, cfg, keys, knobs, fold_sharding)
        logits_fake, _ = vid_dcgan.vid_discriminator(
            params.vid_discriminator, ts.state.vid_discriminator, fake_acts,
            cfg, train=True)
        realism = nn.sigmoid_ce(logits_fake, jnp.ones_like(logits_fake))
        ff = (cfg.first_frame_loss_scalar *
              vid_dcgan.first_frame_loss(g_out, z, cfg))
        return realism + ff, (realism, ff, vid_gs)

    trainable = _g_trainable(ts.params, tcfg)
    (g_loss, (realism, ff, vid_gs)), grads = (
        jax.value_and_grad(loss_fn, has_aux=True)(trainable))
    updates, opt_g = opt.update(grads, ts.opt_g, trainable)
    new_trainable = optax.apply_updates(trainable, updates)

    params = ts.params._replace(vid_generator=new_trainable["vid"])
    if "img" in new_trainable:
        params = params._replace(img_generator=new_trainable["img"])
    ts = ts._replace(params=params,
                     state=ts.state._replace(vid_generator=vid_gs),
                     opt_g=opt_g)
    return ts, {"g_loss": g_loss, "g_loss_realism": realism,
                "first_frame_loss": ff}


@functools.partial(jax.jit, static_argnames=("cfg", "tcfg",
                                              "fold_sharding"),
                   donate_argnums=(0,))
def train_step(ts: VidTrainState, frames: Array, z: Array, rng,
               cfg: VidGANConfig, tcfg: TrainConfig, knobs=None,
               fold_sharding=None) -> Tuple[VidTrainState, Dict]:
    """One batch: `disc_updates` D + `gen_updates` G updates, one XLA program.

    `frames` is time-folded (B*T, s, s, c) — the layout the whole stack
    standardizes on so frames shard over the mesh data axis like batch.

    knobs (optional, traced): runtime noise levels + D-lr scale — see
    Knobs. None keeps the cfg-baked program.

    fold_sharding (optional, STATIC NamedSharding): layout wall applied to
    BOTH the real- and fake-path activations right before they enter the
    vid discriminator. Sequence-parallel runs pass sp.vid_d_sharding(mesh)
    — folded batch over `data` only — so the per-frame image stack (where
    the FLOPs are) computes (data x seq)-sharded, and time is gathered over
    `seq` once at this boundary: the vid-D's stride-2 conv3ds shrink T
    toward 1, and letting GSPMD keep seq-sharding those shrinking axes
    produces replicate-then-repartition resharding of the backward
    cotangents ("involuntary full rematerialization", MULTICHIP_r02;
    round-2 verdict item 4).
    """
    opt_g, opt_d = make_optimizer(tcfg, "g"), make_optimizer(tcfg, "d")
    metrics = {"images_std": nn.get_std(frames.reshape(frames.shape[0], -1))}
    keys = jax.random.split(rng, tcfg.disc_updates + tcfg.gen_updates)
    for i in range(tcfg.disc_updates):
        ts, m = _d_step(ts, frames, z, keys[i], cfg, tcfg, opt_d, knobs,
                        fold_sharding)
        metrics.update(m)
    # NOTE: the repeated G updates stay Python-unrolled on purpose. A
    # lax.scan over the G update compiles ~25% smaller/faster (8.7 vs
    # 11.45 MB executable) but measured 34.7 vs 40.6 steps/s at the
    # flagship shape — the scan carry copies the full train state between
    # iterations. Runtime wins; bench.py hides the compile instead.
    for i in range(tcfg.gen_updates):
        ts, m = _g_step(ts, z, keys[tcfg.disc_updates + i], cfg, tcfg,
                        opt_g, knobs, fold_sharding)
        metrics.update(m)
    ts = ts._replace(step=ts.step + 1)
    return ts, metrics


def load_image_gan(ts: VidTrainState, ckpt_dir: str, step=None) -> VidTrainState:
    """Graft a standalone image-GAN checkpoint (saved as {"params": DCGANParams,
    "state": DCGANState}) into the nested image subtrees — the reference's
    `load_image_gan` scope surgery (z_model_lib.py:117-134), as plain pytree
    grafting."""
    from gifgan_tpu.core import checkpoint as ckpt_lib

    tree = ts._asdict()
    for sub, pref in (
        ("params/img_generator", "params/generator/"),
        ("params/img_discriminator", "params/discriminator/"),
        ("state/img_generator", "state/generator/"),
        ("state/img_discriminator", "state/discriminator/"),
    ):
        tree = ckpt_lib.graft(ckpt_dir, tree, sub, ckpt_prefix=pref, step=step)
    return VidTrainState(**tree)


def quantize_sampler(ts: VidTrainState, cfg: VidGANConfig,
                     calib_batches: int = 0, calib_batch_size: int = 64,
                     calib_key=None, float_last: bool = False,
                     float_layers=(), calib_mode: str = "max",
                     bias_correct: bool = False):
    """int8 serving sampler: quantize the frozen generator stack once
    (ops/quant.py — BN folded, per-channel int8 weights) and return
    (qtree, jitted fn(qtree, z) -> (B, T, s, s, c)).

    calib_batches > 0 additionally bakes STATIC activation scales from that
    many uniform-z calibration batches (quant.calibrate_vid_stack): the
    forward then skips the per-layer dynamic max reduce and clips inputs
    beyond the calibrated range. calib_mode="mse" refines each scale by
    the argmin-MSE fraction sweep (round-5 cliff work).

    bias_correct=True runs the per-layer empirical bias correction
    (quant.bias_correct_vid_stack) over the calibration batches (8
    default batches when calib_batches == 0), AFTER scale calibration so
    the correction sees the final quantization config.

    2x MXU rate vs bf16 on v5e for the conv-bound sampler; parity with the
    float path is pinned in tests/test_quant.py.
    """
    from gifgan_tpu.ops import quant

    q = quant.quantize_vid_stack(ts.params, ts.state, float_last=float_last,
                                 float_layers=float_layers)
    n_z = max(calib_batches, 8 if bias_correct else 0)
    zs = []
    if n_z:
        key = calib_key if calib_key is not None else jax.random.PRNGKey(11)
        zs = [jax.random.uniform(jax.random.fold_in(key, i),
                                 (calib_batch_size, cfg.z_input_size),
                                 minval=-1.0, maxval=1.0)
              for i in range(n_z)]
    if calib_batches > 0:
        q = quant.calibrate_vid_stack(q, zs[:calib_batches], cfg,
                                      mode=calib_mode)
    if bias_correct:
        q = quant.bias_correct_vid_stack(q, ts.params, ts.state, zs, cfg)
    return q, sample_videos_q


@functools.partial(jax.jit, static_argnames=("cfg",))
def sample_videos_q(q, z: Array, cfg: VidGANConfig) -> Array:
    """int8 counterpart of sample_videos over a quantized serving tree
    (quantize_sampler, or quant.load_artifact on a serving host)."""
    from gifgan_tpu.ops import quant

    frames, _ = quant.generate_videos_q(q, z, cfg)
    s = cfg.image_gan.output_size
    return frames.reshape(z.shape[0], cfg.vid_length, s, s,
                          cfg.image_gan.c_dim)


@functools.partial(jax.jit, static_argnames=("cfg",))
def sample_videos(ts: VidTrainState, z: Array, cfg: VidGANConfig) -> Array:
    """Inference sampler (reference dump_sample, z_model_lib.py:261-330):
    both generators in inference mode. Returns (B, T, s, s, c) in [-1, 1]."""
    g_out, _ = vid_dcgan.vid_generator(
        ts.params.vid_generator, ts.state.vid_generator, z, cfg, train=False)
    frames, _ = dcgan.generator(
        ts.params.img_generator, ts.state.img_generator, g_out,
        cfg.image_gan, train=False)
    s = cfg.image_gan.output_size
    return frames.reshape(z.shape[0], cfg.vid_length, s, s,
                          cfg.image_gan.c_dim)


@functools.partial(jax.jit, static_argnames=("cfg", "tcfg",
                                              "fold_sharding"),
                   donate_argnums=(0,))
def train_chunk(ts: VidTrainState, frames_stack: Array, z_stack: Array, rng,
                cfg: VidGANConfig, tcfg: TrainConfig, knobs=None,
                fold_sharding=None) -> Tuple[VidTrainState, Dict]:
    """K train steps as ONE XLA program via lax.scan.

    Per-step host dispatch through the device runtime costs as much as the
    math at this model size (measured: 18.7 -> 37.2 steps/s on one v5e chip
    by chaining K=10 steps). frames_stack: (K, B*T, s, s, c);
    z_stack: (K, B, z_in). Returns metrics stacked over the chunk.
    knobs: optional runtime Knobs, constant over the chunk (the collapse
    controller acts between chunks).
    """
    k = z_stack.shape[0]
    keys = jax.random.split(rng, k)

    def body(ts, xs):
        frames, z, key = xs
        ts, metrics = train_step.__wrapped__(ts, frames, z, key, cfg, tcfg,
                                             knobs, fold_sharding)
        return ts, metrics

    ts, metrics = jax.lax.scan(body, ts, (frames_stack, z_stack, keys))
    return ts, metrics


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tcfg", "sample_fn"),
                   donate_argnums=(0,))
def train_chunk_ids(ts: VidTrainState, ids_stack: Array, z_stack: Array,
                    rng, corpus_data: Array, cfg: VidGANConfig,
                    tcfg: TrainConfig, sample_fn, knobs=None,
                    ) -> Tuple[VidTrainState, Dict]:
    """train_chunk, but each step's frames are gathered INSIDE the scan
    body from a device-resident corpus (data/device.py DeviceCorpus:
    pass `corpus.data` and `corpus.sample_fn`).

    ids_stack: (K, B) int32 clip ids. Peak frame memory is ONE step's
    (B*T, s, s, c) batch instead of the whole chunk's (K, B*T, ...) — at
    the flagship endurance shape (K=80, B=64, T=16, 64px) that is 50 MB
    resident instead of 4 GB, which is the difference between the
    endurance config fitting on one v5e next to the corpus and a
    RESOURCE_EXHAUSTED. The host still ships only ids per chunk.
    """
    k = z_stack.shape[0]
    keys = jax.random.split(rng, k)

    def body(ts, xs):
        idx, z, key = xs
        g = sample_fn(corpus_data, idx)
        if g.ndim == 5:                           # (B, T, s, s, c)
            frames = g.reshape((-1,) + g.shape[2:])  # time folds into batch
        else:                                     # already time-folded
            frames = g  # DeviceCorpus.fold_sample_fn: the fold happened on
            # the 1-byte resident dtype, quartering the reshape+layout-copy
            # bytes between the gather and the first conv (round-4 verdict
            # item 1 — that formatting was ~9.4 ms/step of the production
            # program's 42.8 ms)
        ts, metrics = train_step.__wrapped__(ts, frames, z, key, cfg, tcfg,
                                             knobs)
        return ts, metrics

    ts, metrics = jax.lax.scan(body, ts, (ids_stack, z_stack, keys))
    return ts, metrics
