"""Conditional (MNIST) DCGAN tests — the CPU-runnable integration fixture."""

import os
import struct

import jax
import jax.numpy as jnp
import numpy as np

from gifgan_tpu.core.config import DCGANConfig, TrainConfig
from gifgan_tpu.data.mnist import load_mnist, synthetic_digits
from gifgan_tpu.models import dcgan
from gifgan_tpu.train import gan

CFG = DCGANConfig(output_size=28, c_dim=1, z_dim=16, gf_dim=8, df_dim=8)
Y = 10


def _write_idx(tmp_path):
    """Tiny fake MNIST idx files (all 70k entries, zeros beyond a few)."""
    rng = np.random.default_rng(0)

    def images(name, n):
        data = rng.integers(0, 256, (n, 28, 28), np.uint8)
        with open(os.path.join(tmp_path, name), "wb") as f:
            f.write(b"\x00" * 16 + data.tobytes())
        return data

    def labels(name, n):
        data = rng.integers(0, 10, n).astype(np.uint8)
        with open(os.path.join(tmp_path, name), "wb") as f:
            f.write(b"\x00" * 8 + data.tobytes())
        return data

    tr_x = images("train-images-idx3-ubyte", 60000)
    tr_y = labels("train-labels-idx1-ubyte", 60000)
    images("t10k-images-idx3-ubyte", 10000)
    labels("t10k-labels-idx1-ubyte", 10000)
    return tr_x, tr_y


def test_load_mnist_shapes_and_shuffle_alignment(tmp_path):
    _write_idx(str(tmp_path))
    X, y = load_mnist(str(tmp_path))
    assert X.shape == (70000, 28, 28, 1) and y.shape == (70000, 10)
    assert 0.0 <= X.min() and X.max() <= 1.0
    np.testing.assert_allclose(y.sum(axis=1), 1.0)
    # X/y shuffled with the same seed: re-load must be deterministic
    X2, y2 = load_mnist(str(tmp_path))
    np.testing.assert_array_equal(X[:100], X2[:100])
    np.testing.assert_array_equal(y[:100], y2[:100])


def test_synthetic_digits():
    X, y = synthetic_digits(20)
    assert X.shape == (20, 28, 28, 1) and y.shape == (20, 10)
    # class-conditional structure: same-label digits more similar
    labs = y.argmax(1)
    if (labs == labs[0]).sum() > 1:
        same = X[labs == labs[0]]
        assert np.abs(same[0] - same[1]).mean() < 0.3


def test_cond_generator_discriminator_shapes(key):
    gp, gs = dcgan.init_generator_cond(key, CFG, Y)
    dp, ds = dcgan.init_discriminator_cond(key, CFG, Y)
    z = jax.random.uniform(key, (4, 16), minval=-1, maxval=1)
    y = jnp.eye(Y)[jnp.array([0, 1, 2, 3])]
    imgs, _ = dcgan.generator_cond(gp, gs, z, y, CFG, train=True)
    assert imgs.shape == (4, 28, 28, 1)
    assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0
    logits, _ = dcgan.discriminator_cond(dp, ds, imgs, y, CFG, train=True)
    assert logits.shape == (4, 1)


def test_cond_train_step_learns(key):
    tcfg = TrainConfig(batch_size=16, learning_rate=1e-3)
    ts = gan.init_cond_train_state(key, CFG, Y, tcfg)
    X, y = synthetic_digits(16, seed=1)
    images, labels = jnp.asarray(X), jnp.asarray(y)
    losses = []
    for i in range(4):
        z = jax.random.uniform(jax.random.PRNGKey(i), (16, 16),
                               minval=-1, maxval=1)
        ts, m = gan.cond_train_step(ts, images, labels, z,
                                    jax.random.PRNGKey(10 + i), CFG, tcfg)
        losses.append(float(m["d_loss"]))
        assert np.isfinite(losses[-1]) and np.isfinite(float(m["g_loss"]))
    assert losses[-1] != losses[0]
    samples = gan.cond_sample_step(ts, jax.random.uniform(
        key, (10, 16), minval=-1, maxval=1), jnp.eye(10), CFG)
    assert samples.shape == (10, 28, 28, 1)
