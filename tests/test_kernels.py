"""Pallas kernel tests: interpret mode vs pure-JAX reference vs cv2 golden."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gifgan_tpu.kernels.resize import (interp_matrix, resize_normalize,
                                       resize_normalize_ref)


def test_interp_matrix_properties():
    m = interp_matrix(8, 4)
    assert m.shape == (4, 8)
    np.testing.assert_allclose(m.sum(axis=1), np.ones(4), atol=1e-6)
    # identity when sizes match
    np.testing.assert_allclose(interp_matrix(6, 6), np.eye(6), atol=1e-6)


def test_ref_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (1, 96, 128, 3), np.uint8)
    ours = np.asarray(resize_normalize_ref(jnp.asarray(img), 64, 64,
                                           normalize=False))[0]
    theirs = cv2.resize(img[0], (64, 64), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, theirs.astype(np.float32), atol=0.75)


def test_pallas_matches_ref_interpret():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (3, 48, 80, 3), np.uint8)
    ref = np.asarray(resize_normalize_ref(jnp.asarray(img), 32, 32))
    out = np.asarray(resize_normalize(jnp.asarray(img), 32, 32,
                                      interpret=True))
    assert out.shape == (3, 32, 32, 3)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    assert ref.min() >= -1.0 and ref.max() <= 1.0


def test_pallas_upscale_and_no_normalize():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (2, 16, 16, 1), np.uint8)
    ref = np.asarray(resize_normalize_ref(jnp.asarray(img), 40, 24,
                                          normalize=False))
    out = np.asarray(resize_normalize(jnp.asarray(img), 40, 24,
                                      normalize=False, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)
    # no normalize -> still in [0, 255]
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_crop_resize_bilinear_matches_resize_ref():
    from gifgan_tpu.kernels.crop_resize import crop_resize_bilinear

    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.integers(0, 255, (2, 40, 50, 3), np.uint8))
    # full-frame box must equal plain resize (same half-pixel convention)
    boxes = jnp.asarray([[0, 0, 39, 49]], jnp.float32)
    out = crop_resize_bilinear(frames, jnp.asarray([1]), boxes, 16)
    ref = resize_normalize_ref(frames[1:2], 16, 16, normalize=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)

    # arbitrary differing boxes in one call, no recompile per shape
    boxes2 = jnp.asarray([[5, 5, 20, 30], [0, 10, 39, 19], [2, 2, 3, 3]],
                         jnp.float32)
    out2 = crop_resize_bilinear(frames, jnp.asarray([0, 1, 0]), boxes2, 16)
    assert out2.shape == (3, 16, 16, 3)
    # constant-region crop reproduces the constant
    const = jnp.full((1, 8, 8, 1), 77.0)
    out3 = crop_resize_bilinear(const, jnp.asarray([0]),
                                jnp.asarray([[2, 2, 6, 6]], jnp.float32), 4)
    np.testing.assert_allclose(np.asarray(out3), 77.0, atol=1e-4)
