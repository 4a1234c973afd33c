"""First-party PredNet: shapes, scan recursion, and a learning test — the
reference only VENDORED this model (prednet_reference/, unintegrated)."""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gifgan_tpu.data.synthetic import synthetic_clips
from gifgan_tpu.models import prednet

CFG = prednet.PredNetConfig(image_size=16, c_dim=3, channels=(8, 16))


def test_forward_shapes_and_finiteness():
    params = prednet.init(jax.random.PRNGKey(0), CFG)
    clips = jnp.asarray(
        synthetic_clips(4, length=6, size=16).astype(np.float32) / 255.0)
    preds, err = prednet.forward(params, clips, CFG)
    assert preds.shape == (4, 6, 16, 16, 3)
    assert np.isfinite(np.asarray(preds)).all()
    assert float(err) > 0.0


def test_prednet_learns_next_frame():
    """80 Adam steps on 16 synthetic clips must cut the layer-0 error
    well below init (the integrated-baseline capability the reference's
    vendored copy never had)."""
    params = prednet.init(jax.random.PRNGKey(0), CFG)
    clips = jnp.asarray(
        synthetic_clips(16, length=6, size=16).astype(np.float32) / 255.0)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)
    loss0 = float(prednet.loss_fn(params, clips[:8], CFG))

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(prednet.loss_fn)(params, batch, CFG)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    for i in range(80):
        idx = rng.integers(0, 16, 8)
        params, opt_state, loss = step(params, opt_state, clips[idx])
    loss_end = float(prednet.loss_fn(params, clips[:8], CFG))
    assert loss_end < 0.5 * loss0, (loss0, loss_end)


def test_prednet_study_script_smoke(tmp_path):
    """examples/train_prednet_study.py end-to-end at toy scale: runs,
    writes the JSON trace, and the held-out MAE is finite."""
    import json
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "train_prednet_study.py")
    out = tmp_path / "trace.json"
    r = subprocess.run(
        [sys.executable, script, "--steps", "4", "--eval-every", "2",
         "--train-clips", "8", "--eval-clips", "4", "--batch", "4",
         "--size", "16", "--length", "4", "--channels", "8", "16", "--cpu",
         "--out", str(out)],
        capture_output=True, text=True, timeout=420,
        env=os.environ.copy())
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    trace = json.loads(out.read_text())
    assert trace["copy_mae"] > 0
    assert trace["trace"][-1]["step"] == 4
    assert np.isfinite(trace["trace"][-1]["heldout_mae"])
