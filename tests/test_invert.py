"""Inversion toolkit tests: weights, schedules, all four variants, paths,
z_finder resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gifgan_tpu.core.config import DCGANConfig, InvertConfig, VidGANConfig
from gifgan_tpu.invert import (apply_latent_path, invert_images,
                               invert_nested_first_frame, invert_video_joint)
from gifgan_tpu.invert.optimize import (_capture_steps, invert_video_iterative,
                                        normalized_weights)
from gifgan_tpu.invert.z_finder import extract_z_trajectories
from gifgan_tpu.models import dcgan, vid_dcgan

CFG = DCGANConfig(output_size=32, c_dim=1, z_dim=12, gf_dim=8, df_dim=8)


def _boosted(key):
    params, state = dcgan.init(key, CFG)
    boost = lambda t: jax.tree_util.tree_map(lambda x: x * 6.0, t)
    return dcgan.DCGANParams(boost(params.generator),
                             boost(params.discriminator)), state


def test_normalized_weights():
    w = normalized_weights(InvertConfig(pixel_l1=1.0, activation_l1=0.3,
                                        pixel_l2=0.7))
    assert abs(sum(w.values()) - 1.0) < 1e-9
    assert abs(w["pixel_l1"] - 0.5) < 1e-9


def test_capture_steps_sections():
    caps = _capture_steps(20, [(0, 1), (10, 5)])
    assert set(range(10)) <= caps
    assert 10 in caps and 15 in caps and 12 not in caps


def test_invert_images_reduces_loss(key):
    params, state = _boosted(key)
    z_true = jax.random.uniform(jax.random.PRNGKey(1), (4, 12),
                                minval=-1, maxval=1)
    target = dcgan.sample(params, state, z_true, CFG)
    icfg = InvertConfig(steps=80, learning_rate=0.1, pixel_l1=1.0,
                        activation_l1=0.3, batch_size=4)
    z, losses, _ = invert_images(params, state, target, CFG, icfg, key=key)
    assert losses[-1] < losses[0] * 0.9
    assert z.shape == (4, 12)


def test_invert_video_joint(key):
    params, state = _boosted(key)
    frames = dcgan.sample(params, state, jax.random.uniform(
        jax.random.PRNGKey(2), (8, 12), minval=-1, maxval=1), CFG)
    icfg = InvertConfig(steps=30, learning_rate=0.1, pixel_l1=1.0,
                        batch_size=8)
    z, losses, _ = invert_video_joint(params, state, frames, CFG, icfg)
    assert z.shape == (8, 12)
    assert losses[-1] <= losses[0]


def test_invert_nested_first_frame(key):
    vcfg = VidGANConfig(z_input_size=16, z_output_size=12, vid_length=4,
                        hidden_dim=32, d_filters=16, image_gan=CFG)
    params, state = vid_dcgan.init(key, vcfg)
    boost = lambda t: jax.tree_util.tree_map(lambda x: x * 6.0, t)
    params = params._replace(img_generator=boost(params.img_generator),
                             img_discriminator=boost(params.img_discriminator))
    targets = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 1),
                                 minval=-1, maxval=1)
    icfg = InvertConfig(steps=20, learning_rate=0.1, pixel_l1=1.0,
                        batch_size=2)
    z, losses, _ = invert_nested_first_frame(params, state, targets, vcfg,
                                             icfg)
    assert z.shape == (2, 16)  # VIDEO latent, not per-frame
    assert np.isfinite(losses).all()


def test_apply_latent_path(key):
    params, state = _boosted(key)
    z = jax.random.uniform(key, (2, 12), minval=-1, maxval=1)
    path = np.stack([np.zeros(12), np.full(12, 0.1), np.full(12, 0.2)])
    frames = apply_latent_path(params, state, z, path, CFG)
    assert frames.shape == (3, 2, 32, 32, 1)
    # first frame == recovered z exactly (deltas relative to path[0])
    base = dcgan.sample(params, state, z, CFG)
    np.testing.assert_allclose(np.asarray(frames[0]), np.asarray(base),
                               atol=1e-6)


def test_z_finder_resume_and_outputs(tmp_path, key):
    params, state = _boosted(key)
    icfg = InvertConfig(steps=5, learning_rate=0.1, pixel_l1=1.0,
                        batch_size=2)
    clips = {f"clip{i}.mp4": np.asarray(dcgan.sample(
        params, state, jax.random.uniform(jax.random.PRNGKey(i), (3, 12),
                                          minval=-1, maxval=1), CFG))
        for i in range(3)}

    def load_clip(path):
        return clips[os.path.basename(path)]

    out = str(tmp_path / "z")
    from gifgan_tpu.core.mesh import make_mesh

    written = extract_z_trajectories(
        params, state, CFG, icfg, sorted(clips), load_clip, out,
        batch_size=2, num_initial_steps=5, num_steps_per_frame=3,
        mesh=make_mesh(data_parallel=2, model_parallel=4))  # dp over `data`
    assert len(written) == 3
    traj = np.load(os.path.join(out, "clip0.npy"))
    assert traj.shape == (3, 12)

    # resume: nothing new
    written2 = extract_z_trajectories(
        params, state, CFG, icfg, sorted(clips), load_clip, out,
        batch_size=2, num_initial_steps=5, num_steps_per_frame=3)
    assert written2 == []

    # stop_after honored
    for f in os.listdir(out):
        os.remove(os.path.join(out, f))
    written3 = extract_z_trajectories(
        params, state, CFG, icfg, sorted(clips), load_clip, out,
        batch_size=2, num_initial_steps=5, num_steps_per_frame=3,
        stop_after=1)
    assert len(written3) == 1
