"""Sequence-parallel (time-axis) sharding tests on the 8-device virtual CPU
mesh. The interesting regime is data_parallel == B: each clip's frames
spread over the `seq` axis (one clip across multiple devices), which plain
DP cannot do. Losses must match single-device execution — SP is a pure
layout change (parallel/sp.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gifgan_tpu.core.config import DCGANConfig, TrainConfig, VidGANConfig
from gifgan_tpu.core.mesh import make_mesh
from gifgan_tpu.parallel.sp import (folded_seq_sharding, make_sp_step,
                                    shard_vid_batch, vid_d_sharding)
from gifgan_tpu.train import vid as vid_train

IMG = DCGANConfig(output_size=32, c_dim=1, z_dim=16, gf_dim=8, df_dim=8)
CFG = VidGANConfig(z_input_size=20, z_output_size=16, vid_length=16,
                   hidden_dim=32, d_filters=16, image_gan=IMG,
                   first_frame_loss_scalar=1.0)


def _batch(b):
    frames = np.tanh(np.random.default_rng(0).standard_normal(
        (b * CFG.vid_length, 32, 32, 1))).astype(np.float32)
    z = np.random.default_rng(1).uniform(-1, 1, (b, 20)).astype(np.float32)
    return frames, z


def _init_ts(key, tcfg):
    """Boosted-param train state: a random-init GAN is degenerate (fake
    activations ~1e-5, vid-D BN backward near-underflow — CLAUDE.md), which
    turns benign reduction-order noise into percent-level loss differences;
    x5 params put the nets in a healthy signal regime like the other tests."""
    ts = vid_train.init_train_state(key, CFG, tcfg)
    return ts._replace(params=jax.tree_util.tree_map(lambda x: x * 5.0,
                                                     ts.params))


def _single_device_losses(key, tcfg, frames, z, rng):
    ts = _init_ts(key, tcfg)
    _, m = vid_train.train_step(ts, jnp.asarray(frames), jnp.asarray(z),
                                rng, CFG, tcfg)
    return m


def _assert_losses_match(m_ref, m_sp, g_tol=1e-3):
    """d_loss is computed from PRE-update params — it pins the forward +
    batch-stat math tightly across layouts. g_loss/first_frame_loss are
    measured AFTER the d (and first g) Adam update, and Adam's step-1
    update is +-lr per coordinate (m_hat/sqrt(v_hat) = +-1), so layout-
    order float noise in near-zero-gradient coordinates flips update signs
    and moves the post-update losses by O(lr * sqrt(#flips)); g_tol admits
    that amplification where a layout adds collectives (TP psums)."""
    for k, tol in (("d_loss", 1e-3), ("g_loss", g_tol),
                   ("first_frame_loss", g_tol)):
        a = float(np.asarray(m_ref[k]))
        b = float(np.asarray(m_sp[k]))
        assert abs(a - b) < tol + tol * abs(a), (k, a, b)


def test_sp_placement_time_slices(key):
    """Pure-SP layout: with data == B, each device holds a contiguous
    time-slice of ONE clip (rows are b-major/t-minor)."""
    mesh = make_mesh(data_parallel=2, seq_parallel=4)
    frames, z = _batch(2)
    f_s, z_s = shard_vid_batch(mesh, jnp.asarray(frames), jnp.asarray(z))
    assert f_s.sharding.spec == P(("data", "seq"), None, None, None)
    # 2 clips x 16 frames over 8 devices -> 4 frames each; shard 0 is
    # clip 0 frames 0-3
    shard0 = f_s.addressable_shards[0]
    assert shard0.data.shape == (4, 32, 32, 1)
    np.testing.assert_array_equal(np.asarray(shard0.data), frames[:4])
    # z shards over data only
    assert z_s.addressable_shards[0].data.shape == (1, 20)


def test_sp_step_matches_single_device(key):
    """B=2 clips over a (data=2, seq=4) mesh: every device holds 4 frames
    of one clip; the step's losses match unsharded execution."""
    tcfg = TrainConfig(batch_size=2, gen_updates=2)
    frames, z = _batch(2)
    rng = jax.random.PRNGKey(7)
    m_ref = _single_device_losses(key, tcfg, frames, z, rng)

    mesh = make_mesh(data_parallel=2, seq_parallel=4)
    ts = _init_ts(key, tcfg)
    f_s, z_s = shard_vid_batch(mesh, jnp.asarray(frames), jnp.asarray(z))
    # the vid-D layout wall (data-only folded acts) is the configuration
    # the CLI/dryrun ship; parity with single-device pins it as a pure
    # layout change
    step = make_sp_step(vid_train.train_step, mesh,
                        static_args={"cfg": CFG, "tcfg": tcfg,
                                     "fold_sharding": vid_d_sharding(mesh)})
    ts, m_sp = step(ts, f_s, z_s, rng)
    _assert_losses_match(m_ref, m_sp)
    # params stay replicated
    leaf = jax.tree_util.tree_leaves(ts.params.vid_generator)[0]
    assert leaf.sharding.spec == P()


def test_sp_single_clip_over_all_devices(key):
    """The regime DP cannot reach: ONE clip, its 16 frames spread over all
    8 devices (data=1, seq=8). Loss parity with single-device."""
    tcfg = TrainConfig(batch_size=1, gen_updates=1)
    frames, z = _batch(1)
    rng = jax.random.PRNGKey(3)
    m_ref = _single_device_losses(key, tcfg, frames, z, rng)

    mesh = make_mesh(data_parallel=1, seq_parallel=8)
    ts = _init_ts(key, tcfg)
    f_s, z_s = shard_vid_batch(mesh, jnp.asarray(frames), jnp.asarray(z))
    assert f_s.addressable_shards[0].data.shape == (2, 32, 32, 1)
    step = make_sp_step(vid_train.train_step, mesh,
                        static_args={"cfg": CFG, "tcfg": tcfg})
    _, m_sp = step(ts, f_s, z_s, rng)
    _assert_losses_match(m_ref, m_sp)


def test_sp_chunked_step(key):
    """train_chunk under SP: (K, B*T, ...) stacks with batch_axis=1."""
    tcfg = TrainConfig(batch_size=2, gen_updates=1)
    K = 2
    frames = np.tanh(np.random.default_rng(0).standard_normal(
        (K, 2 * CFG.vid_length, 32, 32, 1))).astype(np.float32)
    z = np.random.default_rng(1).uniform(-1, 1, (K, 2, 20)).astype(np.float32)

    mesh = make_mesh(data_parallel=2, seq_parallel=4)
    ts = _init_ts(key, tcfg)
    f_s, z_s = shard_vid_batch(mesh, jnp.asarray(frames), jnp.asarray(z),
                               batch_axis=1)
    step = make_sp_step(vid_train.train_chunk, mesh,
                        static_args={"cfg": CFG, "tcfg": tcfg},
                        batch_axis=1)
    ts, m = step(ts, f_s, z_s, jax.random.PRNGKey(0))
    assert int(np.asarray(jax.device_get(ts.step))) == K
    assert np.isfinite(np.asarray(jax.device_get(m["d_loss"]))).all()


def test_sp_composes_with_tp(key):
    """DP x SP x TP on a (data=2, seq=2, model=2) mesh: image-GAN weights
    channel-sharded, frames time-sharded — losses still match DP-only."""
    from gifgan_tpu.parallel.tp import (place_vid_state_tp,
                                        vid_state_tp_shardings)

    tcfg = TrainConfig(batch_size=2, gen_updates=2)
    frames, z = _batch(2)
    rng = jax.random.PRNGKey(7)
    m_ref = _single_device_losses(key, tcfg, frames, z, rng)

    mesh = make_mesh(data_parallel=2, seq_parallel=2, model_parallel=2)
    ts = place_vid_state_tp(mesh, _init_ts(key, tcfg))
    f_s, z_s = shard_vid_batch(mesh, jnp.asarray(frames), jnp.asarray(z))
    step = make_sp_step(
        vid_train.train_step, mesh,
        static_args={"cfg": CFG, "tcfg": tcfg,
                     "fold_sharding": vid_d_sharding(mesh)},
        state_shardings=vid_state_tp_shardings(mesh, ts))
    _, m_sp = step(ts, f_s, z_s, rng)
    _assert_losses_match(m_ref, m_sp, g_tol=2e-2)


def test_sp_chunk_knobs_parity_and_live(key):
    """make_sp_step(pass_knobs=True): the collapse controller's traced
    Knobs ride the sequence-parallel chunked step (the --seq-parallel
    --auto-intervene CLI configuration). Knobs at the cfg's own values must
    match the cfg-baked SP program bit-for-bit; changed values must move
    the dynamics through the SAME wrapped callable."""
    tcfg = TrainConfig(batch_size=2, gen_updates=1)
    K = 2
    frames = np.tanh(np.random.default_rng(0).standard_normal(
        (K, 2 * CFG.vid_length, 32, 32, 1))).astype(np.float32)
    z = np.random.default_rng(1).uniform(-1, 1, (K, 2, 20)).astype(np.float32)
    rng = jax.random.PRNGKey(5)

    mesh = make_mesh(data_parallel=2, seq_parallel=4)
    static = {"cfg": CFG, "tcfg": tcfg,
              "fold_sharding": vid_d_sharding(mesh)}
    place = lambda: shard_vid_batch(mesh, jnp.asarray(frames),
                                    jnp.asarray(z), batch_axis=1)

    baked = make_sp_step(vid_train.train_chunk, mesh, static_args=static,
                         batch_axis=1)
    f_s, z_s = place()
    ts1, m1 = baked(_init_ts(key, tcfg), f_s, z_s, rng)

    stepk = make_sp_step(vid_train.train_chunk, mesh, static_args=static,
                         batch_axis=1, pass_knobs=True)
    f_s, z_s = place()
    ts2, m2 = stepk(_init_ts(key, tcfg), f_s, z_s, rng,
                    vid_train.make_knobs(CFG))
    for k in m1:
        np.testing.assert_array_equal(np.asarray(jax.device_get(m1[k])),
                                      np.asarray(jax.device_get(m2[k])),
                                      err_msg=k)
    # metrics are bit-equal above; params admit 1-2 ulp — the traced-knob
    # graph (live noise ops + update scale) compiles with different fusion
    # / collective-reduction orderings on the SP mesh than the baked one,
    # unlike the DP mesh where the same check holds bit-exact
    # (test_sharding.py test_sharded_chunk_knobs_parity_and_live)
    for a, b in zip(jax.tree_util.tree_leaves(ts1.params),
                    jax.tree_util.tree_leaves(ts2.params)):
        np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                   np.asarray(jax.device_get(b)),
                                   rtol=1e-6, atol=1e-9)

    hot = vid_train.make_knobs(CFG, image_noise_std=0.5,
                               activation_noise_std=0.5, d_lr_scale=0.5)
    f_s, z_s = place()
    _, m3 = stepk(_init_ts(key, tcfg), f_s, z_s, rng, hot)
    assert (float(np.asarray(jax.device_get(m3["d_loss"]))[-1]) !=
            float(np.asarray(jax.device_get(m2["d_loss"]))[-1]))
