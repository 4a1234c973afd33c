"""Trajectory-level golden regression: the N-step loss curves of fixed-seed
training runs are pinned, so any numerics change anywhere in the forward,
backward, optimizer, BN-state, or rng-plumbing path shows up as a diff —
stronger than the per-op goldens in test_golden.py, which can miss
composition bugs (wrong update order, stale BN state, rng reuse).

Goldens were generated on XLA:CPU float32 (tests always run on the forced
CPU mesh, tests/conftest.py). Tolerance 2e-3 relative absorbs XLA version
drift in reduction orderings while still catching real regressions (a wrong
update schedule moves these losses by >1e-1).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gifgan_tpu.core.config import DCGANConfig, TrainConfig, VidGANConfig
from gifgan_tpu.data.synthetic import synthetic_clips, synthetic_stills
from gifgan_tpu.train import gan, vid

IMG = DCGANConfig(output_size=32, c_dim=3, z_dim=16, gf_dim=8, df_dim=8)

DCGAN_TRAJ = [
    (1.452081, 0.581193), (1.342046, 0.604328), (1.340634, 0.57708),
    (1.350046, 0.560295), (1.29067, 0.598889), (1.285272, 0.562901),
    (1.227141, 0.598467), (1.235895, 0.581869),
]

VID_TRAJ = [
    (1.388597, 1.076318, 0.383267), (1.390352, 1.042386, 0.349431),
    (1.38597, 1.076524, 0.383604), (1.387618, 1.018866, 0.325979),
    (1.384861, 1.030052, 0.337132), (1.385941, 1.011089, 0.31813),
]


def test_dcgan_loss_trajectory_golden():
    tcfg = TrainConfig(batch_size=16, gen_updates=2)
    ts = gan.init_train_state(jax.random.PRNGKey(7), IMG, tcfg)
    data = synthetic_stills(64, size=32).astype(np.float32) / 127.5 - 1.0
    traj = []
    for i in range(len(DCGAN_TRAJ)):
        imgs = data[(i * 16) % 64:(i * 16) % 64 + 16]
        z = jax.random.uniform(jax.random.PRNGKey(100 + i), (16, IMG.z_dim),
                               minval=-1, maxval=1)
        ts, m = gan.train_step(ts, jnp.asarray(imgs), z,
                               jax.random.PRNGKey(200 + i), IMG, tcfg)
        traj.append((float(m["d_loss"]), float(m["g_loss"])))
    np.testing.assert_allclose(traj, DCGAN_TRAJ, rtol=2e-3, atol=2e-3)


def test_vid_dcgan_loss_trajectory_golden():
    cfg = VidGANConfig(z_input_size=20, z_output_size=16, vid_length=4,
                       hidden_dim=32, d_filters=16, image_gan=IMG,
                       first_frame_loss_scalar=1.0)
    tcfg = TrainConfig(batch_size=8, gen_updates=2)
    vts = vid.init_train_state(jax.random.PRNGKey(3), cfg, tcfg)
    clips = synthetic_clips(16, length=4, size=32).astype(np.float32) \
        / 127.5 - 1.0
    traj = []
    for i in range(len(VID_TRAJ)):
        frames = clips[(i * 8) % 16:(i * 8) % 16 + 8].reshape(-1, 32, 32, 3)
        z = jax.random.uniform(jax.random.PRNGKey(300 + i),
                               (8, cfg.z_input_size), minval=-1, maxval=1)
        vts, m = vid.train_step(vts, jnp.asarray(frames), z,
                                jax.random.PRNGKey(400 + i), cfg, tcfg)
        traj.append((float(m["d_loss"]), float(m["g_loss"]),
                     float(m["first_frame_loss"])))
    np.testing.assert_allclose(traj, VID_TRAJ, rtol=2e-3, atol=2e-3)


def test_train_chunk_matches_stepwise_trajectory():
    """lax.scan chunking is a pure performance transform: K chunked steps
    must produce the same losses as K separate train_step calls (the rng
    split schedule inside train_chunk is defined to match)."""
    tcfg = TrainConfig(batch_size=8, gen_updates=2)
    # two independent (but identical) states: train_chunk donates its input
    # buffers, so the stepwise run needs its own copies
    ts_a = gan.init_train_state(jax.random.PRNGKey(5), IMG, tcfg)
    ts_b = gan.init_train_state(jax.random.PRNGKey(5), IMG, tcfg)
    data = synthetic_stills(32, size=32).astype(np.float32) / 127.5 - 1.0
    k = 3
    imgs = jnp.asarray(data[:k * 8].reshape(k, 8, 32, 32, 3))
    zs = jax.random.uniform(jax.random.PRNGKey(9), (k, 8, IMG.z_dim),
                            minval=-1, maxval=1)
    root = jax.random.PRNGKey(11)

    ts_a, ms = gan.train_chunk(ts_a, imgs, zs, root, IMG, tcfg)
    keys = jax.random.split(root, k)
    step_losses = []
    for i in range(k):
        ts_b, m = gan.train_step(ts_b, imgs[i], zs[i], keys[i], IMG, tcfg)
        step_losses.append(float(m["d_loss"]))
    np.testing.assert_allclose(np.asarray(ms["d_loss"]), step_losses,
                               rtol=1e-4, atol=1e-5)
