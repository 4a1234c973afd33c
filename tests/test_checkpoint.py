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


# ---------------------------------------------------------------------------
# Fault injection — crash/barrier-failure behavior of the multi-host path
# (TODO.md round-2 testing gap). The reference has no elastic story at all
# (SURVEY.md §5.3); these pin OUR failure semantics: a died write never
# corrupts the previous step, failed saves are retryable, and followers only
# observe complete checkpoints.
# ---------------------------------------------------------------------------


def test_crash_mid_write_preserves_previous_step(tmp_path, monkeypatch):
    d = str(tmp_path)
    tree = {"w": np.arange(6.0)}
    checkpoint.save(d, 1, tree)

    def boom(*a, **k):
        raise RuntimeError("injected disk fault")

    monkeypatch.setattr(checkpoint.np, "savez", boom)
    with pytest.raises(RuntimeError, match="injected"):
        checkpoint.save(d, 2, {"w": np.arange(6.0) * 2})
    monkeypatch.undo()

    # the half-written step is invisible: latest is still 1 and loads clean
    assert checkpoint.all_steps(d) == [1]
    assert np.array_equal(checkpoint.load_flat(d)["w"], np.arange(6.0))

    # retrying the same step succeeds despite the leftover .tmp dir
    checkpoint.save(d, 2, {"w": np.arange(6.0) * 2})
    assert checkpoint.all_steps(d) == [1, 2]
    assert np.array_equal(checkpoint.load_flat(d)["w"], np.arange(6.0) * 2)


def test_async_checkpointer_surfaces_injected_fault_then_recovers(
        tmp_path, monkeypatch):
    d = str(tmp_path)
    ac = checkpoint.AsyncCheckpointer()
    real_savez = checkpoint.np.savez
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("injected ENOSPC")
        return real_savez(*a, **k)

    monkeypatch.setattr(checkpoint.np, "savez", flaky)
    ac.save(d, 1, {"w": np.ones(3)})
    with pytest.raises(OSError, match="ENOSPC"):
        ac.wait()
    # next save goes through and the checkpointer is still usable
    ac.save(d, 2, {"w": np.ones(3) * 2})
    ac.wait()
    ac.close()
    assert checkpoint.all_steps(d) == [2]


def test_multihost_barrier_failure_propagates_and_retry_is_idempotent(
        tmp_path):
    d = str(tmp_path)
    tree = {"w": np.ones(4)}

    def dead_peer_barrier(name):
        raise TimeoutError(f"peer died at {name}")

    # pre-barrier failure: nothing is written
    with pytest.raises(TimeoutError):
        checkpoint.save_multihost(d, 7, tree, process_index=0,
                                  barrier=dead_peer_barrier)
    assert checkpoint.all_steps(d) == []

    # post-barrier failure: the write landed; the retry must overwrite
    # the already-complete step without error
    seen = []

    def post_fails(name):
        seen.append(name)
        if name.startswith("ckpt_post"):
            raise TimeoutError("peer died post-write")

    with pytest.raises(TimeoutError):
        checkpoint.save_multihost(d, 7, tree, process_index=0,
                                  barrier=post_fails)
    assert checkpoint.all_steps(d) == [7]
    p = checkpoint.save_multihost(d, 7, tree, process_index=0,
                                  barrier=lambda name: None)
    assert p is not None and checkpoint.all_steps(d) == [7]
    assert np.array_equal(checkpoint.load_flat(d)["w"], np.ones(4))


def test_multihost_follower_only_sees_complete_checkpoints(tmp_path,
                                                           monkeypatch):
    """Two 'processes' (threads) with a real barrier; the primary's write is
    slowed so a racing follower WOULD observe a partial step if the post
    barrier didn't hold it back."""
    import threading
    import time as _time

    d = str(tmp_path)
    bar = threading.Barrier(2, timeout=30)
    real_savez = checkpoint.np.savez

    def slow_savez(*a, **k):
        _time.sleep(0.3)
        return real_savez(*a, **k)

    monkeypatch.setattr(checkpoint.np, "savez", slow_savez)
    results = {}

    def run(proc):
        tree = {"w": np.full(5, 3.0)}
        checkpoint.save_multihost(d, 9, tree, process_index=proc,
                                  barrier=lambda name: bar.wait())
        # after save_multihost returns, the step must be complete
        results[proc] = checkpoint.load_flat(d, 9)["w"].copy()

    t0 = threading.Thread(target=run, args=(0,))
    t1 = threading.Thread(target=run, args=(1,))
    t0.start(); t1.start(); t0.join(); t1.join()
    assert np.array_equal(results[0], np.full(5, 3.0))
    assert np.array_equal(results[1], np.full(5, 3.0))
