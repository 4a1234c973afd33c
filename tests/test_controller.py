"""Runtime training knobs (train/vid.py Knobs) + the automated
collapse-intervention policy (train/controller.py).

The knobs exist so one compiled program serves every noise level / D-lr
scale (changing cfg.*_noise_std recompiles the flagship program — minutes
through the remote-compile relay); parity between the knobs path and the
cfg-baked path is therefore load-bearing, not cosmetic.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gifgan_tpu.core.config import DCGANConfig, TrainConfig, VidGANConfig
from gifgan_tpu.train import vid as vid_train
from gifgan_tpu.train.controller import CollapseController, ControllerConfig

IMG = DCGANConfig(output_size=32, c_dim=1, z_dim=12, gf_dim=8, df_dim=8)


def _cfg(**kw):
    base = dict(z_input_size=16, z_output_size=12, vid_length=4,
                hidden_dim=32, d_filters=16, image_gan=IMG,
                first_frame_loss_scalar=1.0)
    base.update(kw)
    return VidGANConfig(**base)


def _run_step(cfg, tcfg, key, knobs):
    ts = vid_train.init_train_state(key, cfg, tcfg)
    frames = jnp.tanh(jax.random.normal(key, (2 * 4, 32, 32, 1)))
    z = jax.random.uniform(key, (2, 16), minval=-1, maxval=1)
    return vid_train.train_step(ts, frames, z, key, cfg, tcfg, knobs)


# --- knobs-vs-cfg parity ---------------------------------------------------

def test_knobs_match_cfg_baked_noise(key):
    """knobs carrying exactly the cfg values == the cfg-baked program
    (same keys -> same noise draws; f32 compute -> bit-exact)."""
    cfg = _cfg(image_noise_std=0.1, activation_noise_std=0.2)
    tcfg = TrainConfig(batch_size=2, gen_updates=1)
    ts1, m1 = _run_step(cfg, tcfg, key, None)
    ts2, m2 = _run_step(cfg, tcfg, key, vid_train.make_knobs(cfg))
    for k in m1:
        np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]),
                                      err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(ts1.params),
                    jax.tree_util.tree_leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_knobs_noise_level_changes_dynamics(key):
    """Different runtime noise through the SAME traced signature must
    actually change the training trajectory (i.e. the knob is live, not
    baked from cfg)."""
    cfg = _cfg(image_noise_std=0.1, activation_noise_std=0.1)
    tcfg = TrainConfig(batch_size=2, gen_updates=1)
    _, m1 = _run_step(cfg, tcfg, key, vid_train.make_knobs(cfg))
    _, m2 = _run_step(cfg, tcfg, key,
                      vid_train.make_knobs(cfg, image_noise_std=0.5,
                                           activation_noise_std=0.5))
    assert float(m1["d_loss"]) != float(m2["d_loss"])


def test_knobs_d_lr_scale_matches_ttur(key):
    """d_lr_scale=s must reproduce tcfg.d_learning_rate = s * lr (Adam is
    lr-linear; float assoc differs by at most a few ulp)."""
    cfg = _cfg(image_noise_std=0.1, activation_noise_std=0.1)
    tcfg = TrainConfig(batch_size=2, gen_updates=1)
    tcfg_ttur = dataclasses.replace(
        tcfg, d_learning_rate=0.5 * tcfg.learning_rate)
    knobs = vid_train.make_knobs(cfg, d_lr_scale=0.5)
    ts1, _ = _run_step(cfg, tcfg, key, knobs)
    ts2, _ = _run_step(cfg, tcfg_ttur, key, None)
    for a, b in zip(jax.tree_util.tree_leaves(ts1.params.vid_discriminator),
                    jax.tree_util.tree_leaves(ts2.params.vid_discriminator)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
    # and the G side is untouched by the D-only scale
    for a, b in zip(jax.tree_util.tree_leaves(ts1.params.vid_generator),
                    jax.tree_util.tree_leaves(ts2.params.vid_generator)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_knobs_through_train_chunk(key):
    """Chunked path: knobs plumb through the scan; chunk(knobs=cfg values)
    == chunk(None)."""
    cfg = _cfg(image_noise_std=0.1, activation_noise_std=0.1)
    tcfg = TrainConfig(batch_size=2, gen_updates=1)
    K = 3
    frames = jnp.tanh(jax.random.normal(key, (K, 2 * 4, 32, 32, 1)))
    z = jax.random.uniform(key, (K, 2, 16), minval=-1, maxval=1)
    ts1 = vid_train.init_train_state(key, cfg, tcfg)
    ts2 = vid_train.init_train_state(key, cfg, tcfg)
    ts1, m1 = vid_train.train_chunk(ts1, frames, z, key, cfg, tcfg)
    ts2, m2 = vid_train.train_chunk(ts2, frames, z, key, cfg, tcfg,
                                    vid_train.make_knobs(cfg))
    np.testing.assert_array_equal(np.asarray(m1["d_loss"]),
                                  np.asarray(m2["d_loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(ts1.params),
                    jax.tree_util.tree_leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --- controller policy ------------------------------------------------------

CC = ControllerConfig(patience=3, recover_patience=4, cooldown=2,
                      noise_step=0.2, noise_max=0.5, d_lr_factor=0.5,
                      d_lr_min=0.25)


def test_controller_noise_escalation_after_patience():
    c = CollapseController(0.1, 0.1, CC)
    assert c.observe(0.01) is None
    assert c.observe(0.01) is None
    ev = c.observe(0.01)  # 3rd saturated chunk = patience
    assert ev["action"] == "raise_noise"
    assert c.image_noise == 0.3 and c.activation_noise == 0.3
    assert c.d_lr_scale == 1.0  # noise rung first, lr untouched


def test_controller_cooldown_blocks_rapid_fire():
    c = CollapseController(0.1, 0.1, CC)
    for _ in range(3):
        c.observe(0.01)
    assert c.image_noise == 0.3
    # cooldown=2: the next 2 chunks are ignored even though saturated
    assert c.observe(0.01) is None
    assert c.observe(0.01) is None
    assert c.image_noise == 0.3
    # then patience must accumulate again
    assert c.observe(0.01) is None
    assert c.observe(0.01) is None
    ev = c.observe(0.01)
    assert ev["action"] == "raise_noise" and c.image_noise == 0.5


def test_controller_escalates_to_d_lr_after_noise_max():
    c = CollapseController(0.1, 0.1, CC)
    events = [ev for _ in range(30) for ev in [c.observe(0.0)] if ev]
    actions = [e["action"] for e in events]
    assert actions[:2] == ["raise_noise", "raise_noise"]  # 0.3 then 0.5
    assert "lower_d_lr" in actions
    assert c.image_noise == 0.5 and c.d_lr_scale == 0.25
    # fully escalated: no further events, no crash
    for _ in range(10):
        assert c.observe(0.0) is None


def test_controller_healthy_loss_never_acts():
    c = CollapseController(0.1, 0.1, CC)
    for _ in range(100):
        assert c.observe(0.7) is None
    assert not c.intervened


def test_controller_midband_resets_counters():
    c = CollapseController(0.1, 0.1, CC)
    c.observe(0.01)
    c.observe(0.01)
    assert c.observe(0.2) is None   # mid-band chunk resets saturation
    assert c.observe(0.01) is None
    assert c.observe(0.01) is None
    assert c.observe(0.01)["action"] == "raise_noise"


def test_controller_deescalates_in_reverse_order():
    c = CollapseController(0.1, 0.1, CC)
    for _ in range(30):
        c.observe(0.0)  # escalate fully: noise 0.5, d_lr 0.25
    assert c.d_lr_scale == 0.25
    events = [ev for _ in range(60) for ev in [c.observe(0.8)] if ev]
    actions = [e["action"] for e in events]
    # lr restored first (two rungs), then noise stepped back to base
    assert actions[:2] == ["restore_d_lr", "restore_d_lr"]
    assert c.d_lr_scale == 1.0
    assert "lower_noise" in actions
    assert c.image_noise == 0.1 and c.activation_noise == 0.1
    assert not c.intervened


def test_restore_controller_skips_stale_tail_events(tmp_path):
    """loops._restore_controller must only replay intervention events at or
    before the restored checkpoint's step: a crash after an intervention but
    before the next checkpoint leaves post-checkpoint events in the metrics
    log that belong to a lost (about-to-be-retrained) tail (ADVICE r2)."""
    import json

    from gifgan_tpu.train.loops import _restore_controller

    path = tmp_path / "train_metrics.jsonl"
    events = [
        {"kind": "auto_intervention", "step": 100, "image_noise_std": 0.2,
         "activation_noise_std": 0.2, "d_lr_scale": 1.0},
        {"kind": "auto_intervention", "step": 300, "image_noise_std": 0.4,
         "activation_noise_std": 0.4, "d_lr_scale": 0.5},
    ]
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
        f.write('{"kind": "auto_interv')  # torn tail (kill -9 mid-write)

    c = CollapseController(0.1, 0.1, CC)
    _restore_controller(c, str(path), max_step=200)  # ckpt between events
    assert c.image_noise == 0.2 and c.d_lr_scale == 1.0

    c2 = CollapseController(0.1, 0.1, CC)
    _restore_controller(c2, str(path), max_step=300)
    assert c2.image_noise == 0.4 and c2.d_lr_scale == 0.5

    c3 = CollapseController(0.1, 0.1, CC)
    _restore_controller(c3, str(path))  # no filter: legacy replay-all
    assert c3.image_noise == 0.4 and c3.d_lr_scale == 0.5
