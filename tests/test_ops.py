"""Numerics tests for the NN op layer against independent references
(TF-semantics checks use torch-CPU / numpy golden math, never the reference
repo's code)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gifgan_tpu.ops import nn
from gifgan_tpu.ops import image as img_ops


def test_conv2d_matches_torch(key):
    """5x5 stride-2 SAME conv vs torch (explicit SAME padding for even dims)."""
    x = jax.random.normal(key, (2, 16, 16, 3))
    p = nn.conv2d_init(key, 3, 8)
    y = nn.conv2d(p, x)
    assert y.shape == (2, 8, 8, 8)

    # torch: NCHW, OIHW. TF SAME for k=5,s=2,in=16: pad_total=3 -> (1, 2).
    xt = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
    wt = torch.tensor(np.asarray(p["w"]).transpose(3, 2, 0, 1))
    xt = F.pad(xt, (1, 2, 1, 2))
    yt = F.conv2d(xt, wt, stride=2)
    yt = yt.numpy().transpose(0, 2, 3, 1) + np.asarray(p["b"])
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)


def test_deconv2d_matches_tf_gradient_semantics(key):
    """TF conv2d_transpose IS the gradient of the SAME forward conv — verify
    against torch autograd of an explicit TF-SAME conv (independent oracle).

    Note: torch's ConvTranspose2d(padding=2, output_padding=1) is NOT
    TF-SAME — TF's effective transpose padding is (3, 2) per dim, torch's is
    (2, 3): a one-pixel shift. The reference checkpoints assume TF semantics.
    """
    x = jax.random.normal(key, (2, 8, 8, 6))      # deconv input (grad side)
    p = nn.deconv2d_init(key, 6, 4)
    y = nn.deconv2d(p, x)
    assert y.shape == (2, 16, 16, 4)

    # torch oracle: forward TF-SAME conv 16->8 with kernel w (HWIO with
    # I=4, O=6 == p["w"] (5,5,out=4,in=6)), then autograd input-grad.
    wt = torch.tensor(np.asarray(p["w"]).transpose(3, 2, 0, 1))  # (6,4,5,5)
    xt_big = torch.zeros(2, 4, 16, 16, requires_grad=True)
    yt = F.conv2d(F.pad(xt_big, (1, 2, 1, 2)), wt, stride=2)
    yt.backward(torch.tensor(np.asarray(x).transpose(0, 3, 1, 2)))
    expected = xt_big.grad.numpy().transpose(0, 2, 3, 1) + np.asarray(p["b"])
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-4)


def test_deconv_is_adjoint_of_conv(key):
    """conv2d_transpose is the exact adjoint of conv2d: <conv(x), y> == <x, deconv(y)>
    when both use the same forward kernel."""
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, 16, 16, 3))
    y = jax.random.normal(k2, (2, 8, 8, 5))
    w = jax.random.normal(k3, (5, 5, 3, 5))  # forward conv HWIO

    conv_p = {"w": w, "b": jnp.zeros((5,))}
    # deconv kernel layout [h, w, out_ch=3, in_ch=5] is the same array
    # viewed as the forward HWIO kernel.
    deconv_p = {"w": w, "b": jnp.zeros((3,))}

    lhs = jnp.vdot(nn.conv2d(conv_p, x), y)
    rhs = jnp.vdot(x, nn.deconv2d(deconv_p, y))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_conv3d_shape_and_value(key):
    x = jax.random.normal(key, (2, 16, 8, 8, 12))
    p = nn.conv3d_init(key, 12, 7)
    y = nn.conv3d(p, x)
    assert y.shape == (2, 8, 4, 4, 7)

    xt = torch.tensor(np.asarray(x).transpose(0, 4, 1, 2, 3))
    wt = torch.tensor(np.asarray(p["w"]).transpose(4, 3, 0, 1, 2))
    # TF SAME for k=3, s=2, even in: pad_total=1 -> (0, 1) per dim.
    xt = F.pad(xt, (0, 1, 0, 1, 0, 1))
    yt = F.conv3d(xt, wt, stride=2)
    yt = yt.numpy().transpose(0, 2, 3, 4, 1) + np.asarray(p["b"])
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)


def test_batch_norm_train_and_inference(key):
    x = jax.random.normal(key, (32, 10)) * 3.0 + 1.0
    params, state = nn.batch_norm_init(10)
    y, new_state = nn.batch_norm(params, state, x, train=True)
    # train mode: output is standardized per feature
    np.testing.assert_allclose(np.asarray(jnp.mean(y, 0)), np.zeros(10),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.std(y, 0)), np.ones(10),
                               atol=1e-2)
    # EMA with decay 0.9
    bm = np.asarray(jnp.mean(x, 0))
    np.testing.assert_allclose(np.asarray(new_state["mean"]), 0.1 * bm,
                               rtol=1e-5)
    # inference mode: uses running stats, state unchanged
    y2, same_state = nn.batch_norm(params, new_state, x, train=False)
    assert same_state is new_state
    expected = (np.asarray(x) - np.asarray(new_state["mean"])) / np.sqrt(
        np.asarray(new_state["var"]) + 1e-5)
    np.testing.assert_allclose(np.asarray(y2), expected, rtol=1e-4, atol=1e-4)


def test_sigmoid_ce_matches_torch(key):
    logits = jax.random.normal(key, (16, 1)) * 4
    labels = (jax.random.uniform(jax.random.PRNGKey(1), (16, 1)) > 0.5)
    labels = labels.astype(jnp.float32)
    ours = nn.sigmoid_ce(logits, labels)
    theirs = F.binary_cross_entropy_with_logits(
        torch.tensor(np.asarray(logits)), torch.tensor(np.asarray(labels)))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_lrelu_and_noise_and_std(key):
    x = jnp.array([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(np.asarray(nn.lrelu(x)), [-0.2, 0.0, 2.0])
    assert nn.add_noise(key, x, 0.0) is x
    y = nn.add_noise(key, x, 0.5)
    assert y.shape == x.shape and not np.allclose(np.asarray(y), np.asarray(x))
    batch = jax.random.normal(key, (1024, 4)) * jnp.array([1.0, 2.0, 3.0, 4.0])
    std = float(nn.get_std(batch))
    expected = np.sqrt(np.mean(np.var(np.asarray(batch), axis=0)))
    np.testing.assert_allclose(std, expected, rtol=1e-5)


def test_truncated_normal_bounds(key):
    w = nn.truncated_normal_init(key, (10000,), stddev=0.02)
    assert float(jnp.max(jnp.abs(w))) <= 0.04 + 1e-6
    assert 0.015 < float(jnp.std(w)) < 0.025


def test_image_transforms():
    x = jnp.arange(256, dtype=jnp.uint8).reshape(16, 16, 1)
    t = img_ops.transform(x)
    assert float(t.min()) >= -1.0 and float(t.max()) <= 1.0
    back = img_ops.inverse_transform(t) * 255.0
    np.testing.assert_allclose(np.asarray(back).ravel(),
                               np.arange(256, dtype=np.float32), atol=1e-3)


def test_merge_grid():
    imgs = jnp.stack([jnp.full((4, 4, 3), i, jnp.float32) for i in range(6)])
    grid = img_ops.merge_grid(imgs, 2, 3)
    assert grid.shape == (8, 12, 3)
    assert float(grid[0, 0, 0]) == 0 and float(grid[0, 5, 0]) == 1
    assert float(grid[4, 0, 0]) == 3


def test_center_crop():
    x = jnp.arange(36, dtype=jnp.float32).reshape(6, 6, 1)
    c = img_ops.center_crop(x, 4)
    assert c.shape == (4, 4, 1)
    assert float(c[0, 0, 0]) == 7.0


def test_deconv2d_subpixel_impl_identical(key):
    """The depth-to-space deconv (nn._deconv2d_subpixel) computes the exact
    same function as the dilated gradient-of-conv form — values and both
    gradients — including odd input sizes. Kept as a measured alternative
    (slower on v5e at the flagship shape, docs/PROFILE.md round 3)."""
    for m, ic, oc in [(4, 8, 5), (7, 3, 2), (16, 6, 4)]:
        kx, kp = jax.random.split(jax.random.fold_in(key, m))
        p = nn.deconv2d_init(kp, ic, oc)
        x = jax.random.normal(kx, (2, m, m, ic))
        a = nn.deconv2d(p, x, impl="dilated")
        b = nn.deconv2d(p, x, impl="subpixel")
        assert a.shape == b.shape == (2, 2 * m, 2 * m, oc)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    p = nn.deconv2d_init(key, 8, 4)
    x = jax.random.normal(key, (2, 4, 4, 8))

    def loss(p, x, impl):
        return jnp.sum(nn.deconv2d(p, x, impl=impl) ** 2)

    ga = jax.grad(loss)(p, x, "dilated")
    gb = jax.grad(loss)(p, x, "subpixel")
    np.testing.assert_allclose(np.asarray(ga["w"]), np.asarray(gb["w"]),
                               rtol=1e-4, atol=1e-4)
    gxa = jax.grad(lambda x: loss(p, x, "dilated"))(x)
    gxb = jax.grad(lambda x: loss(p, x, "subpixel"))(x)
    np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxb),
                               rtol=1e-4, atol=1e-4)


def test_set_deconv_impl_switches_default(key):
    prev = nn.set_deconv_impl("subpixel")
    try:
        assert prev == "dilated"
        p = nn.deconv2d_init(key, 3, 2)
        x = jax.random.normal(key, (1, 4, 4, 3))
        y_sub = nn.deconv2d(p, x)
        y_dil = nn.deconv2d(p, x, impl="dilated")
        np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_dil),
                                   rtol=1e-5, atol=1e-5)
    finally:
        nn.set_deconv_impl(prev)


def test_conv2d_s2d_impl_identical(key):
    """The space-to-depth phase-packed conv (nn._conv2d_s2d) computes the
    exact same function as the strided SAME conv — values and both
    gradients. It exists for the c=3 end layers where N=3 pads 128 MXU
    lanes (models/dcgan.py packed_c3; measured +7.5% fwd+bwd at the
    flagship shape, examples/conv_roofline.py 2026-08-20)."""
    for m, ic, oc in [(8, 3, 16), (16, 3, 8), (8, 6, 4)]:
        kx, kp = jax.random.split(jax.random.fold_in(key, m))
        p = nn.conv2d_init(kp, ic, oc)
        x = jax.random.normal(kx, (2, m, m, ic))
        a = nn.conv2d(p, x)
        b = nn.conv2d(p, x, impl="s2d")
        assert a.shape == b.shape == (2, m // 2, m // 2, oc)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    p = nn.conv2d_init(key, 3, 8)
    x = jax.random.normal(key, (2, 8, 8, 3))

    def loss(p, x, impl):
        return jnp.sum(nn.conv2d(p, x, impl=impl) ** 2)

    for field in ("w", "b"):
        ga = jax.grad(loss)(p, x, None)
        gb = jax.grad(loss)(p, x, "s2d")
        np.testing.assert_allclose(np.asarray(ga[field]),
                                   np.asarray(gb[field]),
                                   rtol=1e-4, atol=1e-4)
    gxa = jax.grad(lambda x: loss(p, x, None))(x)
    gxb = jax.grad(lambda x: loss(p, x, "s2d"))(x)
    np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxb),
                               rtol=1e-4, atol=1e-4)


def test_conv2d_s2d_odd_size_falls_back(key):
    """Odd spatial sizes can't phase-pack; impl='s2d' must still compute
    the correct SAME conv (via the fallback), not crash."""
    p = nn.conv2d_init(key, 3, 4)
    x = jax.random.normal(key, (2, 7, 7, 3))
    a = nn.conv2d(p, x)
    b = nn.conv2d(p, x, impl="s2d")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-6)
