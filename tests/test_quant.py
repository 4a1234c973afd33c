"""int8 serving-path quantization (ops/quant.py).

Three layers of evidence, strongest first:
  1. BN folding is EXACT (vs nn.linear/deconv2d + nn.batch_norm(train=False)).
  2. Each quantized layer matches a numpy int oracle exactly (the int32
     accumulator is integer math — no tolerance needed).
  3. The end-to-end quantized generators track their float oracles closely
     on boosted-param models (random-init DCGANs are degenerate — CLAUDE.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gifgan_tpu.core.config import DCGANConfig, VidGANConfig
from gifgan_tpu.models import dcgan, vid_dcgan
from gifgan_tpu.ops import nn, quant


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)


def _rand_bn(key, ch):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {"scale": 1.0 + 0.3 * jax.random.normal(k1, (ch,)),
              "bias": 0.2 * jax.random.normal(k2, (ch,))}
    state = {"mean": 0.5 * jax.random.normal(k3, (ch,)),
             "var": jnp.exp(0.5 * jax.random.normal(k4, (ch,)))}
    return params, state


def test_fold_bn_linear_exact(key):
    k1, k2, k3 = jax.random.split(key, 3)
    layer = nn.linear_init(k1, 12, 24)
    layer = {"w": layer["w"] * 5, "b": 0.1 * jax.random.normal(k2, (24,))}
    bn_p, bn_s = _rand_bn(k3, 24)
    x = jax.random.normal(key, (7, 12))

    want, _ = nn.batch_norm(bn_p, bn_s, nn.linear(layer, x), train=False)
    folded = quant.fold_bn(layer, bn_p, bn_s, out_axis=1)
    got = jnp.dot(x, folded["w"]) + folded["b"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fold_bn_deconv_exact(key):
    k1, k2 = jax.random.split(key)
    layer = dcgan_layer = nn.deconv2d_init(k1, 16, 8)
    layer = {"w": dcgan_layer["w"] * 5, "b": dcgan_layer["b"]}
    bn_p, bn_s = _rand_bn(k2, 8)
    x = jax.random.normal(key, (3, 4, 4, 16))

    want, _ = nn.batch_norm(bn_p, bn_s,
                            nn.deconv2d(layer, x, dtype=jnp.float32),
                            train=False)
    folded = quant.fold_bn(layer, bn_p, bn_s, out_axis=2)
    got = nn.deconv2d(folded, x, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_quantize_weight_grid(key):
    """Max-|w| element of each output channel maps to exactly +-127, and
    dequantization error is bounded by scale/2 everywhere."""
    w = 5 * jax.random.normal(key, (5, 5, 8, 16))
    q = quant.quantize_weight({"w": w, "b": jnp.zeros((8,))}, out_axis=2)
    assert q["wq"].dtype == jnp.int8
    wq = np.asarray(q["wq"], np.int32)
    assert (np.abs(wq).reshape(5 * 5, 8, 16).max(axis=(0, 2)) == 127).all()
    deq = wq * np.asarray(q["ws"])[None, None, :, None]
    err = np.abs(deq - np.asarray(w))
    assert (err <= 0.5 * np.asarray(q["ws"])[None, None, :, None]
            + 1e-6).all()


def test_qlinear_matches_numpy_int_oracle(key):
    """The int32 accumulation path is integer-exact: rebuild it in numpy."""
    k1, k2 = jax.random.split(key)
    x = 3 * jax.random.normal(k1, (9, 32))
    layer = {"w": 2 * jax.random.normal(k2, (32, 16)),
             "b": jnp.arange(16, dtype=jnp.float32) / 7}
    q = quant.quantize_weight(layer, out_axis=1)
    got = np.asarray(quant.qlinear(q, x))

    s_x = max(np.abs(np.asarray(x)).max() / 127.0, 1e-12)
    xq = np.clip(np.round(np.asarray(x) / s_x), -127, 127).astype(np.int64)
    acc = xq @ np.asarray(q["wq"], np.int64)
    want = acc.astype(np.float32) * (s_x * np.asarray(q["ws"])) \
        + np.asarray(layer["b"])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_qconv2d_matches_numpy_int_oracle(key):
    """qconv2d (HWIO, stride-2 SAME) against a numpy int oracle — same
    integer-exact standard as qlinear. (No serving path uses it yet — the
    generators are linear+deconv — but the layer ships, so it's pinned.)"""
    k1, k2 = jax.random.split(key)
    x = 2 * jax.random.normal(k1, (3, 8, 8, 4))
    layer = {"w": jax.random.normal(k2, (5, 5, 4, 6)),
             "b": jnp.linspace(-1, 1, 6)}
    q = quant.quantize_weight(layer, out_axis=3)
    got = np.asarray(quant.qconv2d(q, x))

    s_x = max(np.abs(np.asarray(x)).max() / 127.0, 1e-12)
    xq = np.clip(np.round(np.asarray(x) / s_x), -127, 127).astype(np.int64)
    wq = np.asarray(q["wq"], np.int64)
    # TF SAME, n=8 k=5 s=2: pad_total = (4-1)*2 + 5 - 8 = 3 -> (low 1, high 2)
    xp = np.pad(xq, ((0, 0), (1, 2), (1, 2), (0, 0)))
    acc = np.zeros((3, 4, 4, 6), np.int64)
    for i in range(5):
        for j in range(5):
            acc += np.einsum("bhwc,co->bhwo",
                             xp[:, i:i + 8:2, j:j + 8:2], wq[i, j])
    want = acc.astype(np.float32) * (s_x * np.asarray(q["ws"])) \
        + np.asarray(layer["b"])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_qdeconv2d_matches_float_on_exact_grid(key):
    """With activations and weights already ON the int8 grid (s_x = 1 by
    planting a 127, q dict built directly), the quantized deconv equals
    ops/nn.py's TF-exact float deconv EXACTLY — pins the padding/flip
    plumbing. Accumulators stay < 2^24 so the float conv is integer-exact."""
    k1, k2 = jax.random.split(key)
    x = jax.random.randint(k1, (2, 4, 4, 6), -126, 127).astype(jnp.float32)
    x = x.at[0, 0, 0, 0].set(127.0)  # forces s_x == 1 in quantize_act
    wq = jax.random.randint(k2, (5, 5, 3, 6), -15, 16)
    s_w = jnp.array([0.25, 0.5, 0.125])
    bias = jnp.array([1.0, -2.0, 0.5])
    q = {"wq": wq.astype(jnp.int8), "ws": s_w, "b": bias}
    layer = {"w": wq.astype(jnp.float32) * s_w[None, None, :, None],
             "b": bias}

    want = nn.deconv2d(layer, x, dtype=jnp.float32)
    got = quant.qdeconv2d(q, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)


def _boosted_image_gan(key, cfg):
    params, state = dcgan.init_generator(key, cfg)
    params = jax.tree_util.tree_map(lambda x: x * 5, params)
    # realistic running moments: one train-mode pass
    z = jax.random.uniform(jax.random.PRNGKey(1), (32, cfg.z_dim),
                           minval=-1, maxval=1)
    _, state = dcgan.generator(params, state, z, cfg, train=True)
    return params, state


def test_image_generator_q_tracks_float(key):
    cfg = DCGANConfig(output_size=32, c_dim=3, z_dim=25,
                      gf_dim=16, compute_dtype="float32")
    params, state = _boosted_image_gan(key, cfg)
    z = jax.random.uniform(jax.random.PRNGKey(2), (16, cfg.z_dim),
                           minval=-1, maxval=1)

    want, _ = dcgan.generator(params, state, z, cfg, train=False)
    q = quant.quantize_image_generator(params, state)
    got = jax.jit(quant.image_generator_q,
                  static_argnames="cfg")(q, z, cfg)

    assert got.shape == want.shape
    w, g = np.asarray(want, np.float64), np.asarray(got, np.float64)
    mae = np.abs(w - g).mean()
    corr = np.corrcoef(w.ravel(), g.ravel())[0, 1]
    assert mae < 0.06, mae          # output range is [-1, 1]
    assert corr > 0.995, corr


def test_folded_float_twin_matches_generator(key):
    """Isolates folding from quantization: the float twin with BN pre-folded
    must match the real generator to float precision."""
    cfg = DCGANConfig(output_size=32, c_dim=1, z_dim=10,
                      gf_dim=8, compute_dtype="float32")
    params, state = _boosted_image_gan(key, cfg)
    z = jax.random.uniform(jax.random.PRNGKey(3), (4, cfg.z_dim),
                           minval=-1, maxval=1)
    want, _ = dcgan.generator(params, state, z, cfg, train=False)
    got = quant.image_generator_folded(params, state, z, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_generate_videos_q_tracks_float(key):
    img = DCGANConfig(output_size=32, c_dim=1, z_dim=16, gf_dim=16,
                      compute_dtype="float32")
    cfg = VidGANConfig(z_input_size=20, z_output_size=16, vid_length=4,
                       hidden_dim=32, image_gan=img,
                       compute_dtype="float32")
    params, state = vid_dcgan.init(key, cfg)
    params = jax.tree_util.tree_map(lambda x: x * 5, params)
    z = jax.random.uniform(jax.random.PRNGKey(4), (6, cfg.z_input_size),
                           minval=-1, maxval=1)
    # populate running moments
    _, _, gs, igs = vid_dcgan.generate_videos(params, state, z, cfg,
                                              train=True)
    state = state._replace(vid_generator=gs, img_generator=igs)

    frames_f, gout_f, _, _ = vid_dcgan.generate_videos(params, state, z,
                                                       cfg, train=False)
    q = quant.quantize_vid_stack(params, state)
    frames_q, gout_q = jax.jit(quant.generate_videos_q,
                               static_argnames="cfg")(q, z, cfg)

    assert frames_q.shape == frames_f.shape
    assert gout_q.shape == gout_f.shape
    for a, b, tol in ((gout_f, gout_q, 0.05), (frames_f, frames_q, 0.08)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.abs(a - b).mean() < tol
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99


def test_quantized_params_are_int8_and_small(key):
    """The serving tree actually ships int8 weights (4x smaller than f32)."""
    img = DCGANConfig(output_size=32, c_dim=1, z_dim=16, gf_dim=16,
                      compute_dtype="float32")
    cfg = VidGANConfig(z_input_size=20, z_output_size=16, vid_length=4,
                       hidden_dim=32, image_gan=img)
    params, state = vid_dcgan.init(key, cfg)
    q = quant.quantize_vid_stack(params, state)
    leaves = jax.tree_util.tree_leaves(q)
    int8_bytes = sum(l.size for l in leaves if l.dtype == jnp.int8)
    other_bytes = sum(l.size * l.dtype.itemsize for l in leaves
                      if l.dtype != jnp.int8)
    assert int8_bytes > 0
    # scales + biases are O(channels); weights dominate
    assert other_bytes < int8_bytes

def test_int8_quality_eval_script(tmp_path):
    """examples/int8_quality_eval.py end-to-end at toy scale: trains a tiny
    vid run via the CLI, then compares float vs int8 sampling on the saved
    checkpoint (config auto-loaded from the run's params.json)."""
    import json
    import os
    import subprocess
    import sys

    from gifgan_tpu import cli

    run_dir = str(tmp_path / "vid")
    cli.main(["train-vid", "--run-dir", run_dir, "--c-dim", "3",
              "--vid-z-dim", "16", "--vid-length", "4",
              "--output-size", "32", "--z-dim", "12", "--gf-dim", "8",
              "--df-dim", "8", "--batch-size", "8", "--epochs", "1",
              "--sample-every", "0", "--checkpoint-every", "0",
              "--steps-limit", "2", "--data-parallel", "1",
              "--dataset", "synthetic", "--dataset-size", "16"])
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "int8_quality_eval.py")
    out = tmp_path / "q.json"
    r = subprocess.run(
        [sys.executable, script, "--checkpoint",
         os.path.join(run_dir, "checkpoints"), "--clips", "4", "--batch",
         "4", "--cpu", "--dtype", "float32", "--json", str(out)],
        capture_output=True, text=True, timeout=420, env=os.environ.copy())
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    res = json.loads(out.read_text())
    assert res["clips"] == 4
    assert res["psnr_db"] > 20  # int8 tracks float on a (barely) trained net


def test_static_calibration_matches_dynamic(key):
    """Static activation scales (calibrate_image_generator) reproduce the
    dynamic-quant forward closely on in-distribution data, install an 'as'
    scalar on every layer, and keep out-of-range inputs finite (clipping)."""
    cfg = DCGANConfig(output_size=32, c_dim=3, z_dim=25,
                      gf_dim=16, compute_dtype="float32")
    params, state = _boosted_image_gan(key, cfg)
    q = quant.quantize_image_generator(params, state)

    calib = [jax.random.uniform(jax.random.PRNGKey(i), (16, cfg.z_dim),
                                minval=-1, maxval=1) for i in (10, 11)]
    qs = quant.calibrate_image_generator(q, calib, cfg)
    assert all("as" in layer for layer in qs.values()), list(qs)
    assert all("as" not in layer for layer in q.values())  # input untouched

    z = jax.random.uniform(jax.random.PRNGKey(12), (8, cfg.z_dim),
                           minval=-1, maxval=1)
    dyn = quant.image_generator_q(q, z, cfg)
    sta = jax.jit(quant.image_generator_q,
                  static_argnames="cfg")(qs, z, cfg)
    a, b = np.asarray(dyn, np.float64), np.asarray(sta, np.float64)
    # static and dynamic use slightly different grids (calibrated max vs
    # this batch's max) — same ballpark error as quantization itself
    assert np.abs(a - b).mean() < 0.04
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99

    # 10x out-of-calibration-range input: clips, stays finite
    wild = quant.image_generator_q(qs, 10.0 * z, cfg)
    assert np.isfinite(np.asarray(wild)).all()


def test_quantize_sampler_calibrated(key):
    """vid_train.quantize_sampler(calib_batches>0) returns a tree whose
    every quantized layer carries a static scale, and the jitted sampler
    runs on it."""
    from gifgan_tpu.core.config import TrainConfig
    from gifgan_tpu.train import vid as vid_train

    img = DCGANConfig(output_size=32, c_dim=1, z_dim=16, gf_dim=16)
    cfg = VidGANConfig(z_input_size=20, z_output_size=16, vid_length=4,
                       hidden_dim=32, image_gan=img)
    ts = vid_train.init_train_state(key, cfg, TrainConfig(batch_size=4))
    q, sample_q = vid_train.quantize_sampler(ts, cfg, calib_batches=2,
                                             calib_batch_size=4)
    layers = [l for grp in q.values() for l in grp.values()]
    assert all("as" in l for l in layers), "uncalibrated layer remains"
    z = jax.random.uniform(jax.random.PRNGKey(1), (4, 20),
                           minval=-1, maxval=1)
    vids = sample_q(q, z, cfg)
    assert vids.shape == (4, 4, 32, 32, 1)
    assert np.isfinite(np.asarray(vids)).all()


def test_float_last_mixed_precision(key):
    """float_last keeps the tanh output layer in f32: the tree ships a
    float {'w','b'} h4_deconv (no 'wq'), the mixed forward tracks the float
    oracle at least as closely as full-int8 (the last layer's quantization
    error lands directly on output pixels — on the endurance-3 checkpoint
    it moved the face track-rate, docs/SERVING.md), and calibration leaves
    the float layer scale-free."""
    cfg = DCGANConfig(output_size=32, c_dim=3, z_dim=25,
                      gf_dim=16, compute_dtype="float32")
    params, state = _boosted_image_gan(key, cfg)
    z = jax.random.uniform(jax.random.PRNGKey(2), (16, cfg.z_dim),
                           minval=-1, maxval=1)
    want, _ = dcgan.generator(params, state, z, cfg, train=False)

    q_int8 = quant.quantize_image_generator(params, state)
    q_fl = quant.quantize_image_generator(params, state, float_last=True)

    assert "wq" not in q_fl["h4_deconv"]
    assert q_fl["h4_deconv"]["w"].dtype == jnp.float32
    assert "wq" in q_fl["h3_deconv"]  # everything else still int8

    fwd = jax.jit(quant.image_generator_q, static_argnames="cfg")
    w = np.asarray(want, np.float64)
    mae_int8 = np.abs(w - np.asarray(fwd(q_int8, z, cfg), np.float64)).mean()
    got_fl = np.asarray(fwd(q_fl, z, cfg), np.float64)
    mae_fl = np.abs(w - got_fl).mean()
    assert mae_fl <= mae_int8 + 1e-6, (mae_fl, mae_int8)
    assert np.corrcoef(w.ravel(), got_fl.ravel())[0, 1] > 0.995

    # static calibration: every int8 layer gains a scale, the float layer
    # stays scale-free, and the calibrated forward still runs
    zs = [jax.random.uniform(jax.random.PRNGKey(i), (8, cfg.z_dim),
                             minval=-1, maxval=1) for i in range(2)]
    qs = quant.calibrate_image_generator(q_fl, zs, cfg)
    assert "as" not in qs["h4_deconv"]
    assert all("as" in qs[n] for n in
               ("h0_lin", "h1_deconv", "h2_deconv", "h3_deconv"))
    assert np.isfinite(np.asarray(fwd(qs, z, cfg))).all()


def test_float_last_artifact_roundtrip(key, tmp_path):
    """A float_last serving tree survives the save_artifact/load_artifact
    pure-dict rebuild: structure (float h4, int8 rest) and forward output
    are preserved exactly."""
    from gifgan_tpu.core.config import TrainConfig
    from gifgan_tpu.train import vid as vid_train

    img = DCGANConfig(output_size=32, c_dim=1, z_dim=16, gf_dim=16)
    cfg = VidGANConfig(z_input_size=20, z_output_size=16, vid_length=4,
                       hidden_dim=32, image_gan=img)
    ts = vid_train.init_train_state(key, cfg, TrainConfig(batch_size=4))
    q, sample_q = vid_train.quantize_sampler(ts, cfg, float_last=True)
    quant.save_artifact(str(tmp_path / "art"), q, cfg)
    q2, cfg2 = quant.load_artifact(str(tmp_path / "art"))

    assert "wq" not in q2["img"]["h4_deconv"]
    assert q2["img"]["h3_deconv"]["wq"].dtype == jnp.int8
    z = jax.random.uniform(jax.random.PRNGKey(1), (4, 20),
                           minval=-1, maxval=1)
    np.testing.assert_array_equal(np.asarray(sample_q(q, z, cfg)),
                                  np.asarray(sample_q(q2, z, cfg2)))


def test_mse_sweep_beats_maxabs_on_outlier():
    """_mse_sweep mechanism: a lone extreme outlier drags the max-abs scale
    up and wastes bulk resolution; the argmin-MSE fraction clips it and
    lowers total error. (With int8's 127 levels the MSE win is inherently
    modest — a few tens of percent at fractions 0.85-0.95; the sweep's job
    is to take it when the data offers it and return 1.0 when it doesn't,
    which the in-distribution case below pins.)"""
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, 20000).astype(np.float32)
    x[7] = 100.0                        # analytic optimum ~0.9 for this mix
    x32 = jnp.asarray(x)
    s_max = jnp.float32(float(np.abs(x).max()) / quant.QMAX)
    mses = np.asarray(quant._mse_sweep(x32, s_max))
    best = int(np.argmin(mses))
    assert quant.MSE_FRACTIONS[best] < 1.0, quant.MSE_FRACTIONS[best]
    assert mses[best] < mses[-1]        # last fraction == 1.0 == max-abs

    # benign data: max-abs is already optimal -> the sweep returns 1.0
    y = jnp.asarray(rng.uniform(-1.0, 1.0, 20000).astype(np.float32))
    s_y = jnp.float32(float(np.abs(np.asarray(y)).max()) / quant.QMAX)
    mses_y = np.asarray(quant._mse_sweep(y, s_y))
    assert quant.MSE_FRACTIONS[int(np.argmin(mses_y))] == 1.0


def test_mse_calibration_mode(key):
    """mode='mse' installs scales at most the max-derived ones, the forward
    still runs, and error vs the float folded reference does not regress
    vs max-mode calibration on in-distribution data."""
    cfg = DCGANConfig(output_size=32, c_dim=3, z_dim=25,
                      gf_dim=16, compute_dtype="float32")
    params, state = _boosted_image_gan(key, cfg)
    q = quant.quantize_image_generator(params, state)
    calib = [jax.random.uniform(jax.random.PRNGKey(i), (16, cfg.z_dim),
                                minval=-1, maxval=1) for i in (10, 11)]
    q_max = quant.calibrate_image_generator(q, calib, cfg, margin=1.0)
    q_mse = quant.calibrate_image_generator(q, calib, cfg, mode="mse")
    for name in q_mse:
        assert float(q_mse[name]["as"]) <= float(q_max[name]["as"]) + 1e-12

    z = jax.random.uniform(jax.random.PRNGKey(12), (8, cfg.z_dim),
                           minval=-1, maxval=1)
    ref = np.asarray(quant.image_generator_folded(params, state, z, cfg),
                     np.float64)
    e_max = np.abs(np.asarray(quant.image_generator_q(q_max, z, cfg),
                              np.float64) - ref).mean()
    e_mse = np.abs(np.asarray(quant.image_generator_q(q_mse, z, cfg),
                              np.float64) - ref).mean()
    assert e_mse <= e_max * 1.15  # must not meaningfully regress


def test_bias_correction_matches_float_means(key):
    """bias_correct_vid_stack drives each quantized layer's per-channel
    output mean toward the float folded reference's on the calibration
    batches, and shrinks the stack-level output mean error."""
    img = DCGANConfig(output_size=32, c_dim=1, z_dim=16, gf_dim=16,
                      compute_dtype="float32")
    cfg = VidGANConfig(z_input_size=20, z_output_size=16, vid_length=4,
                       hidden_dim=32, image_gan=img,
                       compute_dtype="float32")
    params, state = vid_dcgan.init(key, cfg)
    params = jax.tree_util.tree_map(lambda x: x * 5, params)
    z = jax.random.uniform(jax.random.PRNGKey(4), (6, cfg.z_input_size),
                           minval=-1, maxval=1)
    _, _, gs, igs = vid_dcgan.generate_videos(params, state, z, cfg,
                                              train=True)
    state = state._replace(vid_generator=gs, img_generator=igs)

    calib = [jax.random.uniform(jax.random.PRNGKey(i),
                                (8, cfg.z_input_size), minval=-1, maxval=1)
             for i in (7, 8)]
    q = quant.quantize_vid_stack(params, state)
    qc = quant.bias_correct_vid_stack(q, params, state, calib, cfg)

    # weights and scales untouched; only biases moved
    for grp, name in quant._VID_LAYER_ORDER:
        np.testing.assert_array_equal(np.asarray(qc[grp][name]["wq"]),
                                      np.asarray(q[grp][name]["wq"]))
        np.testing.assert_array_equal(np.asarray(qc[grp][name]["ws"]),
                                      np.asarray(q[grp][name]["ws"]))

    # the guaranteed invariant: every quantized layer's per-channel
    # PRE-ACTIVATION mean over the calibration batches now matches the
    # float reference's (correcting layer k never disturbs layers above
    # it, so the whole stack converges in one forward-ordered pass)
    def layer_means(qq):
        acc = {}
        for z in calib:
            obs = {}
            quant.generate_videos_q(qq, z, cfg, obs=obs)
            quant._mean_fold(acc, jax.device_get(obs))
        return {k: v / len(calib) for k, v in acc.items()}

    qf = quant.quantize_vid_stack(
        params, state,
        float_layers=tuple(f"{g}/{n}" for g, n in quant._VID_LAYER_ORDER))
    ref = layer_means(qf)
    before = layer_means(q)
    after = layer_means(qc)
    for k in ref:
        e_b = float(np.abs(before[k] - ref[k]).mean())
        e_a = float(np.abs(after[k] - ref[k]).mean())
        scale = float(np.abs(ref[k]).mean()) + 1e-9
        assert e_a <= max(e_b, 1e-7), (k, e_b, e_a)
        assert e_a / scale < 1e-3 or e_a < 1e-5, (k, e_a, scale)


def test_fake_quant_finish_mechanism(key):
    """finish_vid_stack: (a) the fake-quant forward agrees with the real
    int8 forward on the same tree (same grids, STE is forward-transparent);
    (b) at steps=0 re-quantization is a no-op (wq unchanged); (c) a short
    finishing run reduces int8-vs-float pixel error on held-out z."""
    img = DCGANConfig(output_size=32, c_dim=1, z_dim=16, gf_dim=16,
                      compute_dtype="float32")
    cfg = VidGANConfig(z_input_size=20, z_output_size=16, vid_length=4,
                       hidden_dim=32, image_gan=img,
                       compute_dtype="float32")
    params, state = vid_dcgan.init(key, cfg)
    params = jax.tree_util.tree_map(lambda x: x * 5, params)
    zc = jax.random.uniform(jax.random.PRNGKey(4), (6, cfg.z_input_size),
                            minval=-1, maxval=1)
    _, _, gs, igs = vid_dcgan.generate_videos(params, state, zc, cfg,
                                              train=True)
    state = state._replace(vid_generator=gs, img_generator=igs)

    calib = [jax.random.uniform(jax.random.PRNGKey(i),
                                (8, cfg.z_input_size), minval=-1, maxval=1)
             for i in (7, 8)]
    q = quant.quantize_vid_stack(params, state)
    q = quant.calibrate_vid_stack(q, calib, cfg)

    # (a) fq forward == real quantized forward on the same grids
    qf = quant.quantize_vid_stack(
        params, state,
        float_layers=tuple(f"{g}/{n}" for g, n in quant._VID_LAYER_ORDER))
    wf = {g: {n: {"w": qf[g][n]["w"], "b": qf[g][n]["b"]} for n in qf[g]}
          for g in qf}
    scales = {g: {n: q[g][n]["as"] for n in q[g]} for g in q}
    z = jax.random.uniform(jax.random.PRNGKey(9), (5, cfg.z_input_size),
                           minval=-1, maxval=1)
    fq = np.asarray(quant._fq_generate_videos(wf, scales, z, cfg))
    real, _ = quant.generate_videos_q(q, z, cfg)
    np.testing.assert_allclose(fq, np.asarray(real), rtol=2e-4, atol=2e-4)

    # (b) zero-step finishing is a re-quantization no-op
    q0 = quant.finish_vid_stack(q, params, state, cfg, steps=0)
    for grp, name in quant._VID_LAYER_ORDER:
        np.testing.assert_array_equal(np.asarray(q0[grp][name]["wq"]),
                                      np.asarray(q[grp][name]["wq"]),
                                      err_msg=f"{grp}/{name}")

    # (c) finishing reduces held-out int8-vs-float pixel error
    qn = quant.finish_vid_stack(q, params, state, cfg, steps=120, batch=16,
                                lr=1e-5)
    ref, _ = quant.generate_videos_q(qf, z, cfg)      # float folded
    e0 = float(np.abs(np.asarray(real) - np.asarray(ref)).mean())
    after, _ = quant.generate_videos_q(qn, z, cfg)
    e1 = float(np.abs(np.asarray(after) - np.asarray(ref)).mean())
    assert e1 < e0, (e0, e1)
