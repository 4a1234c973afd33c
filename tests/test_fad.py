"""Fréchet Activation Distance (eval/fad.py)."""

import numpy as np
import pytest

import jax

from gifgan_tpu.core.config import DCGANConfig
from gifgan_tpu.eval.fad import fad, frechet_distance, gaussian_fit
from gifgan_tpu.models import dcgan


@pytest.fixture
def key():
    return jax.random.PRNGKey(3)


def test_frechet_distance_identities():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 6))
    mu, cov = gaussian_fit(x)
    assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-9)

    # pure mean shift of an identity-covariance Gaussian: FD = ||dmu||^2
    mu2 = mu + 3.0
    assert frechet_distance(mu, cov, mu2, cov) == pytest.approx(
        float(np.sum((mu - mu2) ** 2)), rel=1e-9)

    # diagonal covariances: closed form sum((sqrt(a) - sqrt(b))^2)
    a = np.diag([1.0, 4.0, 9.0])
    b = np.diag([4.0, 1.0, 1.0])
    z = np.zeros(3)
    want = np.sum((np.sqrt([1, 4, 9]) - np.sqrt([4, 1, 1])) ** 2)
    assert frechet_distance(z, a, z, b) == pytest.approx(want, rel=1e-9)


def test_frechet_distance_symmetry_and_monotonicity():
    rng = np.random.default_rng(1)
    base = rng.standard_normal((400, 5))
    near = base + 0.1 * rng.standard_normal((400, 5))
    far = 3.0 * rng.standard_normal((400, 5)) + 2.0

    mb, cb = gaussian_fit(base)
    mn, cn = gaussian_fit(near)
    mf, cf = gaussian_fit(far)
    d_near = frechet_distance(mb, cb, mn, cn)
    d_far = frechet_distance(mb, cb, mf, cf)
    assert 0 <= d_near < d_far
    assert frechet_distance(mf, cf, mb, cb) == pytest.approx(d_far, rel=1e-6)


def test_fad_separates_matched_from_shifted(key):
    """Under a (boosted) image-D embedding: FAD(real, real-like) is much
    smaller than FAD(real, degenerate constant images) — mode collapse is
    the failure the metric must flag."""
    cfg = DCGANConfig(output_size=32, c_dim=1, z_dim=10, gf_dim=8, df_dim=8)
    params, state = dcgan.init(key, cfg)
    params = params._replace(discriminator=jax.tree_util.tree_map(
        lambda x: x * 5, params.discriminator))

    rng = np.random.default_rng(2)
    real = np.tanh(rng.standard_normal((96, 32, 32, 1))).astype(np.float32)
    real2 = np.tanh(rng.standard_normal((96, 32, 32, 1))).astype(np.float32)
    collapsed = np.zeros((96, 32, 32, 1), np.float32)  # one constant image

    d_same = fad(params.discriminator, state.discriminator, real, real2,
                 cfg, batch=32)
    d_bad = fad(params.discriminator, state.discriminator, real, collapsed,
                cfg, batch=32)
    assert d_same >= 0
    assert d_bad > 5 * d_same, (d_same, d_bad)


def test_eval_fad_cli(tmp_path):
    """eval-fad end-to-end: train a tiny image GAN via the CLI, write two
    image dirs, get a JSON FAD number."""
    import json
    import os

    import imageio.v2 as imageio

    from gifgan_tpu import cli

    run_dir = str(tmp_path / "img")
    cli.main(["train-dcgan", "--run-dir", run_dir, "--c-dim", "3",
              "--output-size", "32", "--z-dim", "12", "--gf-dim", "8",
              "--df-dim", "8", "--batch-size", "8", "--epochs", "1",
              "--sample-every", "0", "--checkpoint-every", "0",
              "--steps-limit", "2", "--data-parallel", "1",
              "--dataset", "synthetic", "--dataset-size", "16"])
    rng = np.random.default_rng(0)
    for name in ("real", "fake"):
        d = tmp_path / name
        d.mkdir()
        for i in range(8):
            imageio.imwrite(str(d / f"{i}.png"),
                            rng.integers(0, 255, (32, 32, 3), np.uint8))
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        cli.main(["eval-fad", "--checkpoint",
                  os.path.join(run_dir, "checkpoints"),
                  "--real-dir", str(tmp_path / "real"),
                  "--fake-dir", str(tmp_path / "fake"),
                  "--batch-size", "8"])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["n_real"] == 8 and out["n_fake"] == 8
    assert np.isfinite(out["fad"]) and out["fad"] >= 0
