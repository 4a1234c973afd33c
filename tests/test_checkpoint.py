"""Checkpoint surgery tests — the reference's three surgical restore
patterns (SURVEY.md §5.4) as pytree operations."""

import jax
import jax.numpy as jnp
import numpy as np

from gifgan_tpu.core import checkpoint as ckpt
from gifgan_tpu.core.config import DCGANConfig, TrainConfig, VidGANConfig
from gifgan_tpu.models import dcgan
from gifgan_tpu.train import gan, vid as vid_train

CFG = DCGANConfig(output_size=32, c_dim=1, z_dim=12, gf_dim=8, df_dim=8)


def _tree_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)))


def test_save_restore_roundtrip(tmp_path, key):
    params, state = dcgan.init(key, CFG)
    tree = {"params": params, "state": state}
    ckpt.save(str(tmp_path), 42, tree)
    assert ckpt.latest_step(str(tmp_path)) == 42
    fresh_params, fresh_state = dcgan.init(jax.random.PRNGKey(9), CFG)
    restored = ckpt.restore(str(tmp_path), {"params": fresh_params,
                                            "state": fresh_state})
    assert _tree_equal(restored["params"], params)
    assert _tree_equal(restored["state"], state)


def test_restore_excluding_latent(tmp_path, key):
    """Pattern (a): restore all params EXCEPT z — the inversion setup
    (discriminator_activation_optimizer.py:78)."""
    params, _ = dcgan.init(key, CFG)
    z = jnp.ones((4, 12))
    ckpt.save(str(tmp_path), 0, {"model": params, "z": z})
    fresh, _ = dcgan.init(jax.random.PRNGKey(5), CFG)
    my_z = jnp.full((4, 12), 7.0)
    restored = ckpt.restore(str(tmp_path), {"model": fresh, "z": my_z},
                            exclude=("z",))
    assert _tree_equal(restored["model"], params)
    np.testing.assert_array_equal(np.asarray(restored["z"]),
                                  np.asarray(my_z))


def test_graft_image_gan_into_vid_gan(tmp_path, key):
    """Pattern (b): load a standalone image-GAN checkpoint into the nested
    subtree of the video GAN (z_model_lib.py:117-134 load_image_gan)."""
    img_params, img_state = dcgan.init(key, CFG)
    tcfg = TrainConfig(batch_size=2)
    img_ts = gan.init_train_state(key, CFG, tcfg)
    img_ts = img_ts._replace(params=img_params, state=img_state)
    ckpt.save(str(tmp_path), 100, {"params": img_ts.params,
                                   "state": img_ts.state})

    vcfg = VidGANConfig(z_input_size=16, z_output_size=12, vid_length=4,
                        hidden_dim=32, d_filters=16, image_gan=CFG)
    vid_ts = vid_train.init_train_state(jax.random.PRNGKey(3), vcfg, tcfg)
    grafted = vid_train.load_image_gan(vid_ts, str(tmp_path), step=100)
    assert _tree_equal(grafted.params.img_generator, img_params.generator)
    assert _tree_equal(grafted.params.img_discriminator,
                       img_params.discriminator)
    assert _tree_equal(grafted.state.img_generator, img_state.generator)
    # video nets untouched
    assert _tree_equal(grafted.params.vid_generator,
                       vid_ts.params.vid_generator)


def test_max_to_keep_gc(tmp_path, key):
    tree = {"x": jnp.zeros((2,))}
    for s in range(5):
        ckpt.save(str(tmp_path), s, tree, max_to_keep=3)
    assert ckpt.all_steps(str(tmp_path)) == [2, 3, 4]


def test_optimizer_reset_pattern(key):
    """Pattern (c): optimizer-state reset is just re-init (vs the reference's
    scoped re-initialize of optimizer slot variables, z_model_lib.py:180-185)."""
    tcfg = TrainConfig(batch_size=2)
    ts = gan.init_train_state(key, CFG, tcfg)
    images = jnp.zeros((2, 32, 32, 1))
    z = jnp.zeros((2, 12))
    ts, _ = gan.train_step(ts, images, z, key, CFG, tcfg)
    opt = gan.make_optimizer(tcfg)
    ts_reset = ts._replace(opt_g=opt.init(ts.params.generator),
                           opt_d=opt.init(ts.params.discriminator))
    # Adam mu should be zeros after reset, nonzero before
    mu_before = jax.tree_util.tree_leaves(ts.opt_g)[0]
    mu_after = jax.tree_util.tree_leaves(ts_reset.opt_g)[0]
    assert float(jnp.sum(jnp.abs(mu_before))) > 0
    assert float(jnp.sum(jnp.abs(mu_after))) == 0


import pytest
from gifgan_tpu.core import checkpoint


def test_restore_zero_match_raises(tmp_path):
    """A restore/graft that matches zero keys (wrong prefix/architecture)
    must raise instead of silently keeping random init (ADVICE round 1:
    the reference's tf.train.Saver raises on missing variables)."""
    d = str(tmp_path / "ck")
    checkpoint.save(d, 1, {"a": {"w": np.ones((2,))}})
    with pytest.raises(KeyError):
        checkpoint.restore(d, {"b": {"v": np.zeros((2,))}})
    with pytest.raises(KeyError):
        checkpoint.graft(d, {"outer": {"v": np.zeros((2,))}},
                         subpath="outer", ckpt_prefix="nope/")


def test_restore_partial_match_warns(tmp_path):
    d = str(tmp_path / "ck")
    checkpoint.save(d, 1, {"a": np.ones((2,))})
    target = {"a": np.zeros((2,)), "extra": np.zeros((3,))}
    with pytest.warns(UserWarning, match="1 target leaves"):
        out = checkpoint.restore(d, target)
    np.testing.assert_array_equal(out["a"], np.ones((2,)))
    np.testing.assert_array_equal(out["extra"], np.zeros((3,)))


def test_async_checkpointer_overlaps_and_propagates_errors(tmp_path):
    """save() must snapshot synchronously but write in the background (the
    pod-grade async-save upgrade, SURVEY.md §5.4); errors surface on
    wait()/next save, and the final state on disk is complete."""
    import time

    big = {"w": np.random.default_rng(0).standard_normal((256, 256, 8))
           .astype(np.float32)}
    d = str(tmp_path / "ck")
    saver = checkpoint.AsyncCheckpointer()
    t0 = time.time()
    fut = saver.save(d, 1, big)
    submit_time = time.time() - t0
    saver.wait()
    total_time = time.time() - t0
    # the snapshot+submit path must be cheaper than the full write
    assert submit_time < total_time or fut.done()
    got = checkpoint.restore(d, {"w": np.zeros_like(big["w"])})
    np.testing.assert_array_equal(got["w"], big["w"])

    # overlap: mutating the live tree after save() must not corrupt the
    # checkpoint (snapshot semantics)
    live = {"w": np.ones((64,), np.float32)}
    saver.save(d, 2, live)
    live["w"] *= 0.0
    saver.wait()
    got = checkpoint.restore(d, {"w": np.zeros((64,), np.float32)}, step=2)
    np.testing.assert_array_equal(got["w"], np.ones((64,)))

    # error propagation: unwritable destination raises on wait
    bad = str(tmp_path / "file_not_dir")
    open(bad, "w").write("x")
    saver.save(bad + "/sub", 3, live)
    with pytest.raises(Exception):
        saver.wait()
    saver.close()


def test_save_multihost_primary_writes_all_barrier(tmp_path):
    """Only process 0 writes; every process passes the pre/post barriers
    (injected here — the live path uses multihost_utils)."""
    d = str(tmp_path / "mh")
    tree = {"w": np.arange(4, dtype=np.float32)}
    events = []

    def barrier(name):
        events.append(name)

    p0 = checkpoint.save_multihost(d, 5, tree, process_index=0,
                                   barrier=barrier)
    p1 = checkpoint.save_multihost(d, 5, tree, process_index=1,
                                   barrier=barrier)
    assert p0 is not None and p1 is None
    assert events == ["ckpt_pre_5", "ckpt_post_5"] * 2
    assert checkpoint.latest_step(d) == 5
