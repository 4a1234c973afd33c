"""Image DCGAN model + train-step tests (shapes, taps, learning smoke)."""

import jax
import jax.numpy as jnp
import numpy as np

from gifgan_tpu.core.config import DCGANConfig, TrainConfig
from gifgan_tpu.models import dcgan
from gifgan_tpu.train import gan

CFG = DCGANConfig(output_size=32, c_dim=1, z_dim=16, gf_dim=8, df_dim=8)


def test_generator_shapes(key):
    params, state = dcgan.init_generator(key, CFG)
    z = jax.random.uniform(key, (4, 16), minval=-1, maxval=1)
    x, new_state = dcgan.generator(params, state, z, CFG, train=True)
    assert x.shape == (4, 32, 32, 1)
    assert float(jnp.max(jnp.abs(x))) <= 1.0
    # BN state updated in train mode
    assert not np.allclose(np.asarray(new_state["bn0"]["mean"]),
                           np.asarray(state["bn0"]["mean"]))


def test_discriminator_shapes_and_tap(key):
    params, state = dcgan.init_discriminator(key, CFG)
    x = jax.random.normal(key, (4, 32, 32, 1))
    logits, tap, _ = dcgan.discriminator(params, state, x, CFG, train=True)
    assert logits.shape == (4, 1)
    # h2 tap: (s/8, s/8, 4*df) post-lrelu feature map (model.py:275,279)
    assert tap.shape == (4, 4, 4, 32)


def test_train_vs_inference_modes_differ(key):
    params, state = dcgan.init(key, CFG)
    z = jax.random.uniform(key, (4, 16), minval=-1, maxval=1)
    x_train, _ = dcgan.generator(params.generator, state.generator, z, CFG,
                                 train=True)
    x_inf = dcgan.sample(params, state, z, CFG)
    # fresh running stats vs batch stats -> different outputs
    assert not np.allclose(np.asarray(x_train), np.asarray(x_inf), atol=1e-4)


def test_train_step_runs_and_learns(key):
    tcfg = TrainConfig(batch_size=16, learning_rate=1e-3)
    ts = gan.init_train_state(key, CFG, tcfg)
    # toy dataset: circles-ish blobs
    k1, k2 = jax.random.split(key)
    images = jnp.tanh(jax.random.normal(k1, (16, 32, 32, 1)))

    losses = []
    for i in range(5):
        z = jax.random.uniform(jax.random.PRNGKey(i), (16, 16),
                               minval=-1, maxval=1)
        ts, metrics = gan.train_step(ts, images, z, jax.random.PRNGKey(100 + i),
                                     CFG, tcfg)
        losses.append(float(metrics["d_loss"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["g_loss"]))
    assert int(ts.step) == 5
    # D should be finding the task learnable: loss moves
    assert losses[-1] != losses[0]


def test_sample_step(key):
    tcfg = TrainConfig(batch_size=8)
    ts = gan.init_train_state(key, CFG, tcfg)
    z = jax.random.uniform(key, (8, 16), minval=-1, maxval=1)
    samples = gan.sample_step(ts, z, CFG)
    assert samples.shape == (8, 32, 32, 1)


def test_instance_noise_path(key):
    cfg = DCGANConfig(output_size=32, c_dim=1, z_dim=16, gf_dim=8, df_dim=8,
                      noise_std=0.1)
    tcfg = TrainConfig(batch_size=8)
    ts = gan.init_train_state(key, cfg, tcfg)
    images = jnp.zeros((8, 32, 32, 1))
    z = jax.random.uniform(key, (8, 16), minval=-1, maxval=1)
    ts, metrics = gan.train_step(ts, images, z, key, cfg, tcfg)
    assert np.isfinite(float(metrics["d_loss"]))


def test_train_chunk(key):
    tcfg = TrainConfig(batch_size=8)
    ts = gan.init_train_state(key, CFG, tcfg)
    K = 3
    images = jnp.tanh(jax.random.normal(key, (K, 8, 32, 32, 1)))
    z = jax.random.uniform(key, (K, 8, 16), minval=-1, maxval=1)
    ts, metrics = gan.train_chunk(ts, images, z, key, CFG, tcfg)
    assert int(ts.step) == K
    assert metrics["d_loss"].shape == (K,)
    assert np.isfinite(np.asarray(metrics["g_loss"])).all()


def test_ttur_d_learning_rate(key):
    """d_learning_rate=0 freezes D while G still moves; None matches the
    shared-LR step bit-for-bit (TTUR knob, core/config.TrainConfig)."""
    import jax.tree_util as jtu

    images = jnp.tanh(jax.random.normal(key, (8, 32, 32, 1)))
    z = jax.random.uniform(key, (8, 16), minval=-1, maxval=1)

    def one(tcfg):
        # train_step donates its input state — keep only the output
        ts = gan.init_train_state(jax.random.PRNGKey(0), CFG, tcfg)
        ts2, _ = gan.train_step(ts, images, z, jax.random.PRNGKey(1), CFG,
                                tcfg)
        return ts2

    frozen = one(TrainConfig(batch_size=8, d_learning_rate=0.0))
    init = gan.init_train_state(jax.random.PRNGKey(0), CFG,
                                TrainConfig(batch_size=8))
    for a, b in zip(jtu.tree_leaves(init.params.discriminator),
                    jtu.tree_leaves(frozen.params.discriminator)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    g_moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jtu.tree_leaves(init.params.generator),
                        jtu.tree_leaves(frozen.params.generator)))
    assert g_moved

    shared = one(TrainConfig(batch_size=8))
    explicit = one(TrainConfig(batch_size=8, d_learning_rate=2e-4))
    for a, b in zip(jtu.tree_leaves(shared.params),
                    jtu.tree_leaves(explicit.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_c3_model_equivalence(key):
    """packed_c3=True (phase-packed c=3 end layers) must compute the same
    generator images and discriminator logits as the default execution —
    it is an execution-layout choice, not a model change."""
    import dataclasses

    cfg = DCGANConfig(output_size=32, c_dim=3, z_dim=16, gf_dim=8, df_dim=8)
    cfgp = dataclasses.replace(cfg, packed_c3=True)
    params, state = dcgan.init(key, cfg)
    z = jax.random.uniform(key, (4, 16), minval=-1, maxval=1)
    img0, _ = dcgan.generator(params.generator, state.generator, z, cfg,
                              train=True)
    img1, _ = dcgan.generator(params.generator, state.generator, z, cfgp,
                              train=True)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                               rtol=1e-5, atol=1e-5)
    x = jnp.tanh(jax.random.normal(key, (4, 32, 32, 3)))
    l0, h20, _ = dcgan.discriminator(params.discriminator,
                                     state.discriminator, x, cfg, train=True)
    l1, h21, _ = dcgan.discriminator(params.discriminator,
                                     state.discriminator, x, cfgp,
                                     train=True)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h20), np.asarray(h21), rtol=1e-4,
                               atol=1e-5)
