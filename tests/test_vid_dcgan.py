"""VID_DCGAN model + train-step tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gifgan_tpu.core.config import DCGANConfig, TrainConfig, VidGANConfig
from gifgan_tpu.models import vid_dcgan
from gifgan_tpu.train import vid as vid_train

from isolation import isolated

IMG = DCGANConfig(output_size=32, c_dim=1, z_dim=12, gf_dim=8, df_dim=8)
CFG = VidGANConfig(z_input_size=16, z_output_size=12, vid_length=4,
                   hidden_dim=32, d_filters=16, image_gan=IMG,
                   first_frame_loss_scalar=1.0)


def test_vid_generator_shapes(key):
    params, state = vid_dcgan.init_vid_generator(key, CFG)
    z = jax.random.uniform(key, (3, 16), minval=-1, maxval=1)
    g_out, _ = vid_dcgan.vid_generator(params, state, z, CFG, train=True)
    assert g_out.shape == (3 * 4, 12)  # time folded into batch
    assert float(jnp.max(jnp.abs(g_out))) <= 1.0


def test_vid_discriminator_shapes(key):
    params, state = vid_dcgan.init_vid_discriminator(key, CFG)
    # image-D h2 tap for 32px images: (B*T, 4, 4, 32)
    acts = jax.random.normal(key, (3 * 4, 4, 4, 32))
    logits, _ = vid_dcgan.vid_discriminator(params, state, acts, CFG,
                                            train=True)
    assert logits.shape == (3, 1)


def test_generate_videos_composition(key):
    params, state = vid_dcgan.init(key, CFG)
    z = jax.random.uniform(key, (2, 16), minval=-1, maxval=1)
    frames, g_out, _, _ = vid_dcgan.generate_videos(params, state, z, CFG,
                                                    train=False)
    assert frames.shape == (2 * 4, 32, 32, 1)
    assert g_out.shape == (2 * 4, 12)


def test_first_frame_loss_zero_when_matched(key):
    z = jax.random.uniform(key, (3, 16), minval=-1, maxval=1)
    # construct g_out whose frame-0 rows equal z[:, :12]
    g_out = jax.random.uniform(jax.random.PRNGKey(1), (12, 12))
    g_out = g_out.at[::4].set(z[:, :12])
    assert float(vid_dcgan.first_frame_loss(g_out, z, CFG)) == 0.0


def test_vid_train_step(key):
    tcfg = TrainConfig(batch_size=4, gen_updates=2)
    ts = vid_train.init_train_state(key, CFG, tcfg)
    frames = jnp.tanh(jax.random.normal(key, (4 * 4, 32, 32, 1)))
    z = jax.random.uniform(key, (4, 16), minval=-1, maxval=1)
    img_g_before = jax.tree_util.tree_leaves(ts.params.img_generator)[0].copy()
    ts, metrics = vid_train.train_step(ts, frames, z, key, CFG, tcfg)
    for k in ("d_loss", "g_loss", "first_frame_loss"):
        assert np.isfinite(float(metrics[k])), k
    # frozen image GAN: params must not move
    img_g_after = jax.tree_util.tree_leaves(ts.params.img_generator)[0]
    np.testing.assert_array_equal(np.asarray(img_g_before),
                                  np.asarray(img_g_after))
    # video nets must move
    vg_before = vid_train.init_train_state(key, CFG, tcfg).params.vid_generator
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(vg_before)[0]),
        np.asarray(jax.tree_util.tree_leaves(ts.params.vid_generator)[0]))


def test_vid_train_step_unfrozen(key):
    tcfg = TrainConfig(batch_size=2, gen_updates=1, train_img_gen=True,
                       train_img_disc=True)
    ts = vid_train.init_train_state(key, CFG, tcfg)
    # A random-init image GAN produces degenerate (~1e-8, batch-constant)
    # activations whose gradients the vid-D BatchNorm backward exactly
    # annihilates; the reference always trains on a LOADED image GAN
    # (z_model_lib.py:117-134). Scale the image nets up to a non-degenerate
    # operating point.
    boost = lambda tree: jax.tree_util.tree_map(lambda x: x * 5.0, tree)
    ts = ts._replace(params=ts.params._replace(
        img_generator=boost(ts.params.img_generator),
        img_discriminator=boost(ts.params.img_discriminator)))
    frames = jnp.tanh(jax.random.normal(key, (2 * 4, 32, 32, 1)))
    z = jax.random.uniform(key, (2, 16), minval=-1, maxval=1)
    img_g_before = jax.tree_util.tree_leaves(ts.params.img_generator)[0].copy()
    ts, _ = vid_train.train_step(ts, frames, z, key, CFG, tcfg)
    img_g_after = jax.tree_util.tree_leaves(ts.params.img_generator)[0]
    assert not np.allclose(np.asarray(img_g_before), np.asarray(img_g_after))


def test_sample_videos(key):
    tcfg = TrainConfig(batch_size=4)
    ts = vid_train.init_train_state(key, CFG, tcfg)
    z = jax.random.uniform(key, (4, 16), minval=-1, maxval=1)
    videos = vid_train.sample_videos(ts, z, CFG)
    assert videos.shape == (4, 4, 32, 32, 1)


def test_face_expression_cross_grid(key):
    """The face x expression cross-sample layout (z_model_lib.py:187-201):
    row r shares a face latent, column c shares an expression latent."""
    rows, cols = 2, 3
    kf, ke = jax.random.split(key)
    face = jax.random.uniform(kf, (rows, 1, 12), minval=-1, maxval=1)
    face = jnp.repeat(face, cols, axis=1)
    expr = jax.random.uniform(ke, (1, cols, 4), minval=-1, maxval=1)
    expr = jnp.repeat(expr, rows, axis=0)
    cross = jnp.concatenate([face, expr], axis=2).reshape(rows * cols, 16)
    assert cross.shape == (6, 16)
    np.testing.assert_array_equal(np.asarray(cross[0, :12]),
                                  np.asarray(cross[1, :12]))
    np.testing.assert_array_equal(np.asarray(cross[0, 12:]),
                                  np.asarray(cross[3, 12:]))


@isolated  # heaviest XLA:CPU compile in the suite — see isolation.py
def test_train_chunk_runs_multiple_steps(key):
    tcfg = TrainConfig(batch_size=2, gen_updates=1)
    ts = vid_train.init_train_state(key, CFG, tcfg)
    K = 3
    frames = jnp.tanh(jax.random.normal(key, (K, 2 * 4, 32, 32, 1)))
    z = jax.random.uniform(key, (K, 2, 16), minval=-1, maxval=1)
    ts, metrics = vid_train.train_chunk(ts, frames, z, key, CFG, tcfg)
    assert int(ts.step) == K
    assert metrics["d_loss"].shape == (K,)
    assert np.isfinite(np.asarray(metrics["d_loss"])).all()


@isolated  # compiles BOTH chunk programs — see isolation.py
def test_train_chunk_ids_matches_train_chunk(key):
    """train_chunk_ids (per-step in-scan gather from a device-resident
    corpus) follows the exact same trajectory as train_chunk fed the
    pre-gathered (K, B*T, ...) frame stack: the gather is bit-exact
    (DeviceCorpus matmul vs take parity) and the scan schedule is
    identical, so final params and metrics must match to f32 tolerance."""
    from gifgan_tpu.data.device import DeviceCorpus

    tcfg = TrainConfig(batch_size=2, gen_updates=1)
    # two independent (but identical) states: the chunk fns donate input
    ts_a = vid_train.init_train_state(key, CFG, tcfg)
    ts_b = vid_train.init_train_state(key, CFG, tcfg)
    K, B, T = 3, 2, CFG.vid_length
    rng = np.random.default_rng(0)
    corpus_u8 = rng.integers(0, 256, (11, T, 32, 32, 1), np.uint8)
    corpus = DeviceCorpus(corpus_u8)
    ids = jnp.asarray(rng.integers(0, 11, (K, B)), jnp.int32)

    frames = corpus.sample(ids).reshape(K, B * T, 32, 32, 1)
    z = jax.random.uniform(key, (K, B, 16), minval=-1, maxval=1)
    ts_a, m_a = vid_train.train_chunk(ts_a, frames, z, key, CFG, tcfg)
    ts_b, m_b = vid_train.train_chunk_ids(ts_b, ids, z, key, corpus.data,
                                          CFG, tcfg,
                                          sample_fn=corpus.sample_fn)
    assert int(ts_b.step) == K
    np.testing.assert_allclose(np.asarray(m_a["d_loss"]),
                               np.asarray(m_b["d_loss"]), rtol=1e-5,
                               atol=1e-6)
    a_leaves = jax.tree_util.tree_leaves(ts_a.params)
    b_leaves = jax.tree_util.tree_leaves(ts_b.params)
    for la, lb in zip(a_leaves, b_leaves):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-6)
