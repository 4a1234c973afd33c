"""recurrent_image conv-LSTM GAN tests: LSTM vs torch oracle, shapes,
variants, training smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from gifgan_tpu.core.config import RecurrentImageConfig, TrainConfig
from gifgan_tpu.models import recurrent_image as ri
from gifgan_tpu.train import recurrent as rtrain

CFG = RecurrentImageConfig(image_size=32, c_dim=1, seq_length=4,
                           base_filters=8, lstm_units=16)


def test_lstm_matches_torch(key):
    """Our BasicLSTMCell semantics vs torch.nn.LSTMCell (forget_bias folded
    into torch's bias; gate reorder TF i,j,f,o -> torch i,f,g,o)."""
    in_dim, units, b = 12, 16, 3
    p = ri.lstm_init(key, in_dim, units)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, in_dim))
    c0 = jax.random.normal(jax.random.PRNGKey(2), (b, units))
    h0 = jax.random.normal(jax.random.PRNGKey(3), (b, units))
    (c1, h1), out = ri.lstm_step(p, (c0, h0), x)
    assert out is h1

    w = np.asarray(p["w"])  # (in+units, 4*units) in TF order i,j,f,o
    wi, wj, wf, wo = np.split(w, 4, axis=1)
    # torch LSTMCell: weight_ih (4*units, in) order i,f,g,o
    w_t = np.concatenate([wi, wf, wj, wo], axis=1)
    cell = torch.nn.LSTMCell(in_dim, units)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.tensor(w_t[:in_dim].T))
        cell.weight_hh.copy_(torch.tensor(w_t[in_dim:].T))
        bias = np.zeros(4 * units, np.float32)
        bias[units:2 * units] = 1.0  # TF forget_bias=1.0
        cell.bias_ih.copy_(torch.tensor(bias))
        cell.bias_hh.zero_()
        ht, ct = cell(torch.tensor(np.asarray(x)),
                      (torch.tensor(np.asarray(h0)),
                       torch.tensor(np.asarray(c0))))
    np.testing.assert_allclose(np.asarray(h1), ht.numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), ct.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_moments_norm_per_timestep():
    x = np.random.default_rng(0).normal(2.0, 3.0, (8, 4, 4, 2)).astype(np.float32)
    # folded (B=4, T=2)
    y = np.asarray(ri.moments_norm(jnp.asarray(x), t=2))
    x5 = x.reshape(4, 2, 4, 4, 2)
    y5 = y.reshape(4, 2, 4, 4, 2)
    for t in range(2):
        for c in range(2):
            sl = y5[:, t, :, :, c]
            assert abs(sl.mean()) < 1e-5
            assert abs(sl.std() - 1.0) < 1e-2
    # per-timestep stats differ from folded-joint stats
    yj = np.asarray(ri.moments_norm(jnp.asarray(x), t=1))
    assert not np.allclose(y, yj, atol=1e-3)


def test_generator_shapes_and_range(key):
    pg, pd = ri.init(key, CFG)
    frames = jax.random.uniform(key, (2, 4, 32, 32, 1))
    out = ri.generator(pg, frames, CFG)
    assert out.shape == (2, 4, 32, 32, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_discriminator_shapes(key):
    pg, pd = ri.init(key, CFG)
    frames = jax.random.uniform(key, (2, 4, 32, 32, 1))
    logits = ri.discriminator(pd, frames, CFG)
    assert logits.shape == (2, 1)


def test_rollout(key):
    pg, pd = ri.init(key, CFG)
    first = jax.random.uniform(key, (2, 32, 32, 1))
    vid = ri.rollout(pg, first, 6, CFG)
    assert vid.shape == (2, 6, 32, 32, 1)


def test_shared_conv_variant(key):
    cfg = RecurrentImageConfig(image_size=32, c_dim=1, seq_length=4,
                               base_filters=8, lstm_units=16,
                               share_disc_conv=True)
    pg, pd = ri.init(key, cfg)
    assert "enc0" not in pg  # encoder has no own filters
    frames = jax.random.uniform(key, (2, 4, 32, 32, 1))
    out = ri.generator(pg, frames, cfg, d_params=pd)
    assert out.shape == (2, 4, 32, 32, 1)


def test_multilayer_dropout_variant(key):
    cfg = RecurrentImageConfig(image_size=32, c_dim=1, seq_length=4,
                               base_filters=8, lstm_units=16,
                               num_lstm_layers=3, lstm_dropout=0.2)
    pg, pd = ri.init(key, cfg)
    assert "lstm2" in pg
    frames = jax.random.uniform(key, (2, 4, 32, 32, 1))
    a = ri.generator(pg, frames, cfg, dropout_rng=jax.random.PRNGKey(1))
    b = ri.generator(pg, frames, cfg, dropout_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(a), np.asarray(b))  # dropout active
    c = ri.generator(pg, frames, cfg, dropout_rng=None)   # eval mode
    d = ri.generator(pg, frames, cfg, dropout_rng=None)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_train_step_runs(key):
    tcfg = TrainConfig(batch_size=2, gen_updates=2)
    ts = rtrain.init_train_state(key, CFG, tcfg)
    clips = jax.random.uniform(key, (2, 5, 32, 32, 1))  # T+1 frames
    pg_before = np.asarray(jax.tree_util.tree_leaves(ts.params_g)[0]).copy()
    ts, m = rtrain.train_step(ts, clips, key, CFG, tcfg)
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
    pg_after = np.asarray(jax.tree_util.tree_leaves(ts.params_g)[0])
    assert not np.allclose(pg_before, pg_after)
    pred = rtrain.predict(ts, clips, CFG)
    assert pred.shape == (2, 4, 32, 32, 1)


def test_pixel_loss_and_residual_modes():
    """pixel_loss_scalar adds a next-frame L1 term (metrics expose it);
    residual_prediction starts the model AT the copy-last baseline (delta
    ~0 at init) — both documented deviations from the reference loss."""
    import jax
    import jax.numpy as jnp

    from gifgan_tpu.core.config import RecurrentImageConfig, TrainConfig
    from gifgan_tpu.data.synthetic import synthetic_clips
    from gifgan_tpu.models import recurrent_image as ri
    from gifgan_tpu.train import recurrent as rt

    cfg = RecurrentImageConfig(image_size=32, c_dim=3, seq_length=4,
                               base_filters=8, lstm_units=32,
                               pixel_loss_scalar=10.0,
                               residual_prediction=True)
    tcfg = TrainConfig(batch_size=4, gen_updates=1)
    clips = jnp.asarray(
        synthetic_clips(4, length=5, size=32).astype(np.float32) / 255.0)
    ts = rt.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)

    # at init the residual decoder contributes ~0.5-centered noise only:
    # predictions sit near the input frames (the copy-last baseline)
    preds = ri.generator(ts.params_g, clips[:, :-1], cfg)
    base_mae = float(jnp.abs(preds - clips[:, :-1]).mean())
    assert base_mae < 0.2, base_mae

    ts, m = rt.train_step(ts, clips, jax.random.PRNGKey(1), cfg, tcfg)
    assert "pixel_mae" in m and np.isfinite(float(m["pixel_mae"]))
    assert float(m["g_loss"]) > float(m["g_loss_adv"])  # pixel term active


def test_adversarial_loss_scalar_weights_active_phase():
    """adversarial_loss_scalar weights G's adversarial term once the
    curriculum gate opens: with the gate open, g_loss equals
    scale*adv + pixel_scale*pixel_mae; scale 0 reduces to the pure pixel
    objective (the lever behind examples/recurrent_adv_study.py)."""
    import jax
    import jax.numpy as jnp

    from gifgan_tpu.core.config import RecurrentImageConfig, TrainConfig
    from gifgan_tpu.data.synthetic import synthetic_clips
    from gifgan_tpu.train import recurrent as rt

    tcfg = TrainConfig(batch_size=4, gen_updates=1)
    clips = jnp.asarray(
        synthetic_clips(4, length=5, size=32).astype(np.float32) / 255.0)

    losses = {}
    for scale in (0.0, 0.25, 1.0):
        cfg = RecurrentImageConfig(image_size=32, c_dim=3, seq_length=4,
                                   base_filters=8, lstm_units=32,
                                   pixel_loss_scalar=10.0,
                                   adversarial_after_steps=0,
                                   adversarial_loss_scalar=scale)
        ts = rt.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
        _, m = rt.train_step(ts, clips, jax.random.PRNGKey(1), cfg, tcfg)
        losses[scale] = m
        np.testing.assert_allclose(
            float(m["g_loss"]),
            scale * float(m["g_loss_adv"]) + 10.0 * float(m["pixel_mae"]),
            rtol=1e-5)
    # same init/data: first-G-update adv and pixel components match across
    # scales (D's update precedes G's and is scale-independent)
    np.testing.assert_allclose(float(losses[0.0]["g_loss_adv"]),
                               float(losses[1.0]["g_loss_adv"]), rtol=1e-5)

    # gate still closed (step 0 < after=5): scale contributes nothing
    cfg_gated = RecurrentImageConfig(image_size=32, c_dim=3, seq_length=4,
                                     base_filters=8, lstm_units=32,
                                     pixel_loss_scalar=10.0,
                                     adversarial_after_steps=5,
                                     adversarial_loss_scalar=1.0)
    ts = rt.init_train_state(jax.random.PRNGKey(0), cfg_gated, tcfg)
    _, m = rt.train_step(ts, clips, jax.random.PRNGKey(1), cfg_gated, tcfg)
    np.testing.assert_allclose(float(m["g_loss"]),
                               10.0 * float(m["pixel_mae"]), rtol=1e-5)
