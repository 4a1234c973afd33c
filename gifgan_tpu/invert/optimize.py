"""GAN inversion: optimize latent z against frozen generator/discriminator.

The reference implements five scripts around one skeleton — rebuild DCGAN with
z as a trainable tf.Variable, restore every variable except z, Adam-minimize
a weighted loss w.r.t. z only (discriminator_activation_optimizer.py:56-80,
:163-219). In JAX this is simply `optax.adam` over a z array with all model
params closed over — no graph surgery. All four variants:

  - image inversion (discriminator_activation_optimizer.py)
  - whole-video joint: one z per frame (…_optimizer_video.py:39-40)
  - whole-video iterative: frame-by-frame warm start
    (…_optimizer_video_iterative.py:184-223)
  - nested: invert VID_DCGAN's video-z so generated frame 0 matches a target
    (…_optimizer_nested.py:148-208)

Loss = normalized weighted sum (weights divided by their total,
…optimizer.py:164-174) of pixel L1/L2, D-activation (h2 tap) L1/L2, and
generator loss, each mean-per-sample then mean-over-batch (:176-205).
LR decays by `lr_decay_factor` every `lr_decay_every` steps (:264-266).

The whole optimization runs as jitted `lax.scan` chunks — one XLA program per
chunk length instead of the reference's per-step sess.run round trips — and z
batches shard over the mesh data axis like any other batch: pass `mesh=` to
`invert()` (or any variant wrapper) and the problem's batch-dim arrays
(targets, D-activation taps, z, Adam slots) are placed over the mesh `data`
axis with params/state replicated — per-sample loss terms stay shard-local,
XLA reduces only the scalar batch means, and the result is bit-compatible
with single-device execution (tests/test_sharding.py pins parity). The one
inversion workload big enough to warrant this is the dataset-scale
z_space_finder batch loop (reference z_space_finder.py:303-317), so
`z_finder.extract_z_trajectories` forwards the same `mesh=`.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gifgan_tpu.core.config import DCGANConfig, InvertConfig, VidGANConfig
from gifgan_tpu.models import dcgan, vid_dcgan
from gifgan_tpu.ops import nn

Array = jax.Array


class InversionProblem(NamedTuple):
    """A loss split into a STATIC callable (hashable jit key — shared across
    calls so the optimization scan compiles once per problem kind + shapes,
    not once per invert() call) and DYNAMIC data (params/targets pytree,
    traced): loss = kind_fn(z, dynamic) -> (scalar loss, generated images)."""
    kind: str                       # key into _PROBLEM_KINDS
    statics: tuple                  # hashable extras (cfg, weights, flags)
    dynamic: tuple                  # traced pytree (params, state, targets, …)
    z_shape: Tuple[int, ...]

    def loss_fn(self, z):
        return _PROBLEM_KINDS[self.kind](z, self.dynamic, *self.statics)


def normalized_weights(icfg: InvertConfig) -> Dict[str, float]:
    w = {
        "pixel_l1": icfg.pixel_l1,
        "pixel_l2": icfg.pixel_l2,
        "activation_l1": icfg.activation_l1,
        "activation_l2": icfg.activation_l2,
        "generator_loss": icfg.generator_loss,
    }
    total = sum(w.values())
    if total <= 0:
        raise ValueError("at least one loss weight must be positive")
    return {k: v / total for k, v in w.items()}


def _weighted_loss(gen_images, gen_acts, gen_logits, targets, target_acts,
                   w) -> Array:
    per = lambda d, red: jnp.mean(red(d), axis=tuple(range(1, d.ndim)))
    loss = 0.0
    if w["pixel_l1"]:
        loss += w["pixel_l1"] * jnp.mean(per(gen_images - targets, jnp.abs))
    if w["pixel_l2"]:
        loss += w["pixel_l2"] * jnp.mean(per(gen_images - targets, jnp.square))
    if w["activation_l1"]:
        loss += w["activation_l1"] * jnp.mean(per(gen_acts - target_acts, jnp.abs))
    if w["activation_l2"]:
        loss += w["activation_l2"] * jnp.mean(per(gen_acts - target_acts, jnp.square))
    if w["generator_loss"]:
        loss += w["generator_loss"] * nn.sigmoid_ce(
            gen_logits, jnp.ones_like(gen_logits))
    return loss


def target_activations(params: dcgan.DCGANParams, state: dcgan.DCGANState,
                       targets: Array, cfg: DCGANConfig,
                       train_mode: bool = False) -> Array:
    """Precompute the D h2 tap for the targets (…optimizer.py:151-155)."""
    _, acts, _ = dcgan.discriminator(
        params.discriminator, state.discriminator, targets, cfg,
        train=train_mode)
    return acts


def _image_loss(z, dynamic, cfg, w_items, train_mode):
    params, state, targets, t_acts = dynamic
    w = dict(w_items)
    imgs, _ = dcgan.generator(params.generator, state.generator, z, cfg,
                              train=train_mode)
    logits, acts, _ = dcgan.discriminator(
        params.discriminator, state.discriminator, imgs, cfg,
        train=train_mode)
    return _weighted_loss(imgs, acts, logits, targets, t_acts, w), imgs


def image_problem(params: dcgan.DCGANParams, state: dcgan.DCGANState,
                  targets: Array, cfg: DCGANConfig, icfg: InvertConfig,
                  ) -> InversionProblem:
    """Invert targets (B, s, s, c) with one z per image."""
    w = normalized_weights(icfg)
    train_mode = icfg.use_train_mode_activations
    t_acts = target_activations(params, state, targets, cfg, train_mode)
    return InversionProblem(
        "image", (cfg, tuple(sorted(w.items())), train_mode),
        (params, state, targets, t_acts),
        (targets.shape[0], cfg.z_dim))


def nested_first_frame_problem(params: vid_dcgan.VidGANParams,
                               state: vid_dcgan.VidGANState,
                               targets: Array, cfg: VidGANConfig,
                               icfg: InvertConfig) -> InversionProblem:
    """Invert the VIDEO latent z(z_in) so generated frame 0 of each video
    matches its target image; losses on strided [::T] slices
    (…_optimizer_nested.py:148-208)."""
    w = normalized_weights(icfg)
    icf = cfg.image_gan
    train_mode = icfg.use_train_mode_activations
    t_acts = target_activations(
        dcgan.DCGANParams(params.img_generator, params.img_discriminator),
        dcgan.DCGANState(state.img_generator, state.img_discriminator),
        targets, icf, train_mode=train_mode)
    return InversionProblem(
        "nested_first_frame", (cfg, tuple(sorted(w.items())), train_mode),
        (params, state, targets, t_acts),
        (targets.shape[0], cfg.z_input_size))


def _nested_first_frame_loss(z, dynamic, cfg, w_items, train_mode):
    params, state, targets, t_acts = dynamic
    w = dict(w_items)
    icf = cfg.image_gan
    frames, _, _, _ = vid_dcgan.generate_videos(params, state, z, cfg,
                                                train=train_mode)
    logits, acts, _ = dcgan.discriminator(
        params.img_discriminator, state.img_discriminator, frames, icf,
        train=train_mode)
    t = cfg.vid_length
    # pixel/activation losses on frame 0 only ([::T] slices) but the
    # generator-loss regularizer over ALL frames — the reference uses the
    # whole-video g_loss unsliced (…_optimizer_nested.py:192)
    loss = _weighted_loss(frames[::t], acts[::t], logits[::t],
                          targets, t_acts,
                          {**w, "generator_loss": 0.0})
    if w["generator_loss"]:
        loss += w["generator_loss"] * nn.sigmoid_ce(
            logits, jnp.ones_like(logits))
    return loss, frames


_PROBLEM_KINDS = {
    "image": _image_loss,
    "nested_first_frame": _nested_first_frame_loss,
}


def _make_opt(icfg: InvertConfig) -> optax.GradientTransformation:
    if icfg.lr_decay_every > 0 and icfg.lr_decay_factor != 1.0:
        sched = optax.exponential_decay(
            icfg.learning_rate, transition_steps=icfg.lr_decay_every,
            decay_rate=icfg.lr_decay_factor, staircase=True)
    else:
        sched = icfg.learning_rate
    return optax.adam(sched, b1=0.5, b2=0.999, eps=1e-8)


@functools.partial(jax.jit,
                   static_argnames=("kind", "statics", "icfg", "n_steps"))
def _run_chunk(z, opt_state, dynamic, kind, statics, icfg, n_steps):
    """n_steps of Adam-on-z as one scan. All jit keys are hashable VALUES
    (problem kind + frozen configs), so repeated invert() calls with the
    same shapes reuse one compilation — critical for the per-frame warm-start
    loops (invert_video_iterative, z_finder)."""
    loss_fn = _PROBLEM_KINDS[kind]
    opt = _make_opt(icfg)

    def body(carry, _):
        z, opt_state = carry
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            z, dynamic, *statics)
        updates, opt_state = opt.update(grads, opt_state, z)
        z = optax.apply_updates(z, updates)
        return (z, opt_state), loss

    (z, opt_state), losses = jax.lax.scan(body, (z, opt_state), None,
                                          length=n_steps)
    return z, opt_state, losses


def shard_problem(problem: InversionProblem, mesh,
                  z0: Optional[Array] = None):
    """Place an inversion problem for data-parallel execution: params/state
    replicated, the batch-dim arrays (targets, target activations, z) sharded
    over the mesh `data` axis. Sharding is input placement (the repo-wide
    invariant): `_run_chunk` stays the exact same jitted program — GSPMD
    propagates the input layouts through the scan, keeps per-sample work
    shard-local, and inserts only the scalar-mean reductions."""
    from gifgan_tpu.core.mesh import (DATA_AXIS, data_sharding,
                                      replicated_sharding)

    n_data = mesh.shape[DATA_AXIS]
    b = problem.z_shape[0]
    if b % n_data:
        raise ValueError(
            f"the mesh data axis ({n_data}) must divide the inversion "
            f"batch ({b}); pad the batch (z_finder already pads partial "
            f"batches) or shrink the mesh")
    rep = replicated_sharding(mesh)
    # both problem kinds share the (params, state, targets, t_acts) layout;
    # a new kind with a different dynamic tuple must extend this placement
    params, state, targets, t_acts = problem.dynamic
    dynamic = (
        jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params),
        jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state),
        jax.device_put(targets, data_sharding(mesh, ndim=targets.ndim)),
        jax.device_put(t_acts, data_sharding(mesh, ndim=t_acts.ndim)),
    )
    if z0 is not None:
        z0 = jax.device_put(z0, data_sharding(mesh, ndim=z0.ndim))
    return problem._replace(dynamic=dynamic), z0


def invert(problem: InversionProblem, icfg: InvertConfig,
           key: Optional[Array] = None,
           z0: Optional[Array] = None,
           progress_sections: Optional[List[Tuple[int, int]]] = None,
           mesh=None,
           ) -> Tuple[Array, np.ndarray, List[np.ndarray]]:
    """Run the optimization. Returns (z, loss_history, progress_frames).

    progress_sections: [(start_step, every)] — variable frame-capture
    schedule for the progress video (…optimizer.py:120-125, e.g.
    [(0, 1), (50, 5), (100, 30)] captures every step early, sparsely later).
    mesh: optional jax.sharding.Mesh — shard the z batch (and the problem's
    batch-dim data) over the mesh `data` axis, params replicated.
    """
    if z0 is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        z0 = jax.random.uniform(key, problem.z_shape, minval=-1.0, maxval=1.0)
    if mesh is not None:
        problem, z0 = shard_problem(problem, mesh, z0)
    opt = _make_opt(icfg)
    opt_state = opt.init(z0)  # after placement: slots inherit z's sharding
    z = z0

    capture = _capture_steps(icfg.steps, progress_sections)
    losses: List[np.ndarray] = []
    frames: List[np.ndarray] = []
    step = 0
    boundaries = sorted(capture) + [icfg.steps]
    # dedupe + drop 0-length chunks
    chunk_plan: List[int] = []
    prev = 0
    for b in boundaries:
        if b > prev:
            chunk_plan.append(b - prev)
            prev = b
    if prev == 0:
        chunk_plan = [icfg.steps]

    for n in chunk_plan:
        if step in capture:
            _, imgs = problem.loss_fn(z)
            frames.append(np.asarray(jax.device_get(imgs)))
        z, opt_state, chunk_losses = _run_chunk(
            z, opt_state, problem.dynamic, problem.kind, problem.statics,
            icfg, n)
        losses.append(np.asarray(jax.device_get(chunk_losses)))
        step += n
    if step in capture or capture:
        _, imgs = problem.loss_fn(z)
        frames.append(np.asarray(jax.device_get(imgs)))
    return z, np.concatenate(losses) if losses else np.zeros(0), frames


def _capture_steps(total: int, sections) -> set:
    if not sections:
        return set()
    sections = [list(s) for s in sections]
    sections[0][0] = 0  # first section always starts at 0 (…optimizer.py:232)
    out = set()
    for i in range(total):
        start, every = sections[0]
        for s, e in sections[1:]:
            if s <= i:
                start, every = s, e
        if (i - start) % every == 0:
            out.add(i)
    return out


# ---------------------------------------------------------------------------
# convenience wrappers for the four reference variants
# ---------------------------------------------------------------------------

def invert_images(params, state, targets, cfg: DCGANConfig,
                  icfg: InvertConfig, key=None, progress_sections=None,
                  mesh=None):
    return invert(image_problem(params, state, targets, cfg, icfg), icfg,
                  key=key, progress_sections=progress_sections, mesh=mesh)


def invert_video_joint(params, state, video_frames, cfg: DCGANConfig,
                       icfg: InvertConfig, key=None, mesh=None):
    """One z per frame, jointly optimized (…_optimizer_video.py:39-40):
    video_frames is time-folded (V*T, s, s, c) and inverted exactly like a
    batch of images."""
    return invert(image_problem(params, state, video_frames, cfg, icfg),
                  icfg, key=key, mesh=mesh)


def invert_video_iterative(params, state, video_frames, cfg: DCGANConfig,
                           icfg: InvertConfig, num_initial_steps: int = 500,
                           num_steps_per_frame: int = 100, key=None,
                           post_initial_lr_decay: float = 0.9, mesh=None):
    """One z per VIDEO, optimized frame-by-frame with warm starts — the
    reference schedule (…_optimizer_video_iterative.py:184-223,
    z_space_finder.py:136-158): `num_initial_steps` on frame 0 at full LR,
    ONE LR decay, then `num_steps_per_frame` refinement on EVERY frame
    (including frame 0) warm-started from the previous frame's solution.
    Returns the z trajectory (T, V, z_dim)."""
    import dataclasses

    assert video_frames.ndim == 5, "pass (V, T, s, s, c)"
    v, t = video_frames.shape[:2]
    if key is None:
        key = jax.random.PRNGKey(0)

    # initial phase: frame 0, full LR
    init_cfg = dataclasses.replace(icfg, steps=num_initial_steps,
                                   batch_size=v)
    z, _, _ = invert(image_problem(params, state, video_frames[:, 0], cfg,
                                   init_cfg), init_cfg, key=key, mesh=mesh)

    # refinement: every frame at the decayed LR
    frame_cfg = dataclasses.replace(
        icfg, steps=num_steps_per_frame,
        learning_rate=icfg.learning_rate * post_initial_lr_decay,
        batch_size=v)
    zs = []
    for frame in range(t):
        problem = image_problem(params, state, video_frames[:, frame], cfg,
                                frame_cfg)
        z, _, _ = invert(problem, frame_cfg, key=key, z0=z, mesh=mesh)
        zs.append(np.asarray(jax.device_get(z)))
    return np.stack(zs)  # (T, V, z_dim)


def invert_nested_first_frame(params, state, targets, cfg: VidGANConfig,
                              icfg: InvertConfig, key=None, mesh=None):
    return invert(
        nested_first_frame_problem(params, state, targets, cfg, icfg),
        icfg, key=key, mesh=mesh)


def apply_latent_path(params, state, z: Array, path: np.ndarray,
                      cfg: DCGANConfig) -> Array:
    """Animate a recovered latent along a hand-authored path: the path is
    applied as deltas relative to its own first entry
    (…optimizer.py:287-293). path: (T, z_dim); z: (B, z_dim).
    Returns (T, B, s, s, c) frames."""
    path = jnp.asarray(path, jnp.float32)
    deltas = path - path[0]

    def frame(delta):
        imgs, _ = dcgan.generator(params.generator, state.generator,
                                  z + delta, cfg, train=False)
        return imgs

    return jax.lax.map(frame, deltas)


def broadcast_z_forward(zs: Array, from_frame: int, vid_length: int) -> Array:
    """Copy frame `from_frame`'s latent forward to all later frames of each
    video — the whole-video inverter's interactive z-broadcast op
    (…_optimizer_video.py:216-239, incl. the hardcoded step-500 broadcast
    from frame 0). zs is time-folded (V*T, z_dim)."""
    v = zs.shape[0] // vid_length
    z3 = zs.reshape(v, vid_length, -1)
    src = z3[:, from_frame:from_frame + 1, :]
    t_idx = jnp.arange(vid_length)[None, :, None]
    out = jnp.where(t_idx >= from_frame, src, z3)
    return out.reshape(zs.shape)


def tween_z(z_a: Array, z_b: Array, steps: int) -> Array:
    """Linear z interpolation (the inverters' tween outputs,
    …_optimizer_video.py:250-287): (steps, *z.shape) for z of any rank."""
    w = jnp.linspace(0.0, 1.0, steps).reshape((steps,) + (1,) * z_a.ndim)
    return z_a[None] * (1 - w) + z_b[None] * w
