"""Data-derived expression paths (demo/derive.py): ranking, smoothing,
protocol round-trip, PCA directions, CLI.

Closes round-1 verdict item 2's code side: the reference's manual_paths
were curated from z_space_finder outputs (run_webcam_demo:46-48); these
tests pin the automated curation on synthetic trajectories.
"""

import numpy as np
import pytest

from gifgan_tpu.demo import (derive_paths, load_trajectories,
                             pca_directions, score_trajectory, smooth_path)

T, Z = 16, 24


def _smooth_traj(rng, scale=1.0):
    """A coherent motion: sine envelope along one random direction, small
    noise, random offset (trajectories need not start at zero)."""
    d = rng.standard_normal(Z)
    d /= np.linalg.norm(d)
    env = np.sin(np.pi * np.linspace(0, 1, T)) * scale
    base = rng.standard_normal(Z) * 0.3
    return (base + env[:, None] * d[None, :]
            + rng.standard_normal((T, Z)) * 0.01).astype(np.float32)


def _noisy_traj(rng, scale=1.0):
    """Same total motion magnitude but frame-to-frame noise (a failed
    inversion wandering)."""
    base = rng.standard_normal(Z) * 0.3
    return (base + rng.standard_normal((T, Z)) * scale).astype(np.float32)


def test_score_prefers_coherent_motion_over_noise():
    rng = np.random.default_rng(0)
    smooth = score_trajectory(_smooth_traj(rng, scale=1.0))
    noisy = score_trajectory(_noisy_traj(rng, scale=1.0))
    still = score_trajectory(np.zeros((T, Z), np.float32))
    assert smooth > noisy
    assert smooth > still


def test_smooth_path_zeroes_start_and_reduces_jerk():
    rng = np.random.default_rng(1)
    traj = _noisy_traj(rng)
    sm = smooth_path(traj, window=5)
    assert np.allclose(sm[0], 0.0)
    jerk = lambda p: float(np.abs(np.diff(p, n=2, axis=0)).mean())  # noqa
    assert jerk(sm) < jerk(traj - traj[0])
    # window=1 is the identity apart from re-zeroing
    assert np.allclose(smooth_path(traj, window=1), traj - traj[0])


def test_derive_paths_ranks_and_rescales():
    rng = np.random.default_rng(2)
    trajs = {"big": _smooth_traj(rng, scale=2.0),
             "small": _smooth_traj(rng, scale=0.5),
             "noise": _noisy_traj(rng, scale=2.0)}
    out = derive_paths(trajs, top_k=2, smooth_window=3, magnitude=0.8)
    assert set(out) == {"data_big", "data_small"}   # noise ranked out
    for p in out.values():
        assert p.shape == (T, Z) and p.dtype == np.float32
        assert np.allclose(p[0], 0.0)
        peak = np.sqrt((p ** 2).sum(axis=1)).max()
        assert peak == pytest.approx(0.8, rel=1e-4)


def test_load_trajectories_filters_junk(tmp_path):
    rng = np.random.default_rng(3)
    np.save(tmp_path / "clip_a.npy", _smooth_traj(rng))
    np.save(tmp_path / "clip_b_comparison.npy", _smooth_traj(rng))
    np.save(tmp_path / "scalar.npy", np.float32(3.0))
    np.save(tmp_path / "vol.npy", np.zeros((2, 3, 4), np.float32))
    (tmp_path / "notes.txt").write_text("x")
    trajs = load_trajectories(str(tmp_path))
    assert list(trajs) == ["clip_a"]
    assert trajs["clip_a"].shape == (T, Z)


def test_pca_directions_orthonormal_and_dominant():
    rng = np.random.default_rng(4)
    d0 = np.zeros(Z, np.float32)
    d0[0] = 1.0
    env = np.sin(np.pi * np.linspace(0, 1, T)).astype(np.float32)
    trajs = {f"c{i}": (env[:, None] * d0[None, :] * (1 + 0.1 * i)
                       + rng.standard_normal((T, Z)).astype(np.float32)
                       * 0.01)
             for i in range(4)}
    dirs = pca_directions(trajs, n_directions=3)
    assert dirs.shape == (3, Z)
    assert np.allclose(dirs @ dirs.T, np.eye(3), atol=1e-4)
    # the dominant direction recovers the true motion axis (sign-free)
    assert abs(float(dirs[0] @ d0)) > 0.99


def test_cli_derive_paths_roundtrip(tmp_path, capsys):
    from gifgan_tpu.cli import main
    from gifgan_tpu.serve.webcam import load_latent_paths

    rng = np.random.default_rng(5)
    tdir = tmp_path / "trajs"
    tdir.mkdir()
    for i in range(8):
        np.save(tdir / f"clip{i}.npy", _smooth_traj(rng, scale=1 + i * 0.1))
    out = tmp_path / "paths"
    main(["derive-paths", "--traj-dir", str(tdir), "--out-dir", str(out),
          "--top-k", "2", "--magnitude", "0.8", "--pca", "8"])
    loaded = load_latent_paths(str(out), z_dim=Z)
    data = [n for n in loaded if n.startswith("data_")]
    pca = [n for n in loaded if n.startswith("pca_")]
    assert len(data) == 2 and len(pca) == 8
    for name, p in loaded.items():
        assert p.shape == (T, Z)
        assert np.allclose(p[0], 0.0, atol=1e-6)


def test_derived_path_drives_webcam_backend(tmp_path):
    """The full empirical loop, CI-sized: synthetic trajectories -> derive ->
    write protocol files -> load into the webcam backend -> animate — the
    reference's manual_paths-to-run_webcam_demo hand-off, automated
    (run_webcam_demo:46-48)."""
    import pytest

    pytest.importorskip("cv2")
    import os

    import jax

    from gifgan_tpu.core.config import DCGANConfig
    from gifgan_tpu.demo import derive_paths, write_paths
    from gifgan_tpu.models import dcgan
    from gifgan_tpu.serve.webcam import WebcamBackend, load_latent_paths

    rng = np.random.default_rng(7)
    trajs = {f"clip{i}": _smooth_traj(rng, scale=1 + 0.2 * i)
             for i in range(4)}
    pdir = tmp_path / "derived"
    write_paths(str(pdir), derive_paths(trajs, top_k=2, magnitude=0.3))
    loaded = load_latent_paths(str(pdir), Z)
    assert len(loaded) == 2 and all(n.startswith("data_") for n in loaded)

    cfg = DCGANConfig(output_size=32, c_dim=3, z_dim=Z, gf_dim=8, df_dim=8)
    params, state = dcgan.init(jax.random.PRNGKey(0), cfg)
    boost = lambda t: jax.tree_util.tree_map(lambda x: x * 6.0, t)  # noqa
    params = dcgan.DCGANParams(boost(params.generator),
                               boost(params.discriminator))
    backend = WebcamBackend(params, state, cfg, str(tmp_path / "out"),
                            paths=loaded, steps=10, batch_size=4)
    face = rng.integers(0, 256, (32, 32, 3), np.uint8)
    result = backend.animate(face)
    assert set(result["paths"]) == set(loaded)
    assert all(os.path.exists(p) for p in result["paths"].values())
