"""Benchmark: VID_DCGAN G/D train steps/sec at the reference's flagship shape.

Reference config (z_model.py:27-29,64-65; z_model_lib.py:70-76): vid_batch 64
-> inner image batch 1024 (64 clips x 16 frames) at 64x64x3, vid_z 120,
img_z 100, 1 D + 2 G updates per step (model.py:226-239).

Execution: bfloat16 activations (identical loss trajectories to float32,
measured), K steps chained into one XLA program via lax.scan (per-step host
dispatch through the device runtime otherwise costs as much as the math:
18.7 steps/s per-step vs 35.7 via this bench / 37.2 in an isolated
scan-timing probe, one v5e chip). K sweep (round 3): 20 -> 37.8 steps/s,
40 -> 39.6, 80 -> 40.6 (adopted; the 4 GB chunked frames buffer is the
practical ceiling).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference-path CPU baseline recorded in
BASELINE.json under published.cpu_reference_steps_per_sec (measured with
bench.py --cpu-reference, which runs the same shapes eagerly un-jitted the
way the reference executes: separate D/G graph executions per update).
"""

import json
import os
import sys
import time

import numpy as np


def _flagship(dtype="bfloat16"):
    from gifgan_tpu.core.config import DCGANConfig, TrainConfig, VidGANConfig

    img = DCGANConfig(output_size=64, c_dim=3, z_dim=100,
                      compute_dtype=dtype)
    cfg = VidGANConfig(z_input_size=120, z_output_size=100, vid_length=16,
                       image_gan=img, first_frame_loss_scalar=1.0,
                       compute_dtype=dtype)
    tcfg = TrainConfig(batch_size=64, disc_updates=1, gen_updates=2)
    return cfg, tcfg


def run_bench(steps: int = 4, warmup: int = 2, batch_size: int = None,
              chunk: int = 80, dtype: str = "bfloat16"):
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: first compile via the tunnel is ~6 min
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/gifgan_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from gifgan_tpu.train import vid as vid_train

    cfg, tcfg = _flagship(dtype)
    if batch_size:
        from dataclasses import replace
        tcfg = replace(tcfg, batch_size=batch_size)

    key = jax.random.PRNGKey(0)
    ts = vid_train.init_train_state(key, cfg, tcfg)

    b = tcfg.batch_size
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal(
        (chunk, b * cfg.vid_length, 64, 64, 3)).astype(np.float32))
    z = jnp.asarray(rng.uniform(-1, 1, (chunk, b, cfg.z_input_size))
                    .astype(np.float32))

    # warmup/compile. Sync by fetching a scalar — under the axon relay,
    # block_until_ready alone under-reports (async dispatch).
    for i in range(warmup):
        ts, metrics = vid_train.train_chunk(ts, frames, z,
                                            jax.random.PRNGKey(i), cfg, tcfg)
        float(np.asarray(metrics["d_loss"][-1]))

    t0 = time.perf_counter()
    for i in range(steps):
        ts, metrics = vid_train.train_chunk(ts, frames, z,
                                            jax.random.PRNGKey(100 + i),
                                            cfg, tcfg)
        float(np.asarray(metrics["d_loss"][-1]))
    dt = time.perf_counter() - t0
    return steps * chunk / dt


def run_cpu_reference(steps: int = 3):
    """Reference-execution-style baseline: same math (float32, one program
    per step like a TF session run), on CPU."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    return run_bench(steps=steps, warmup=1, chunk=1, dtype="float32")


def _prewarm(timeout_s: int = 1200, attempts: int = 3) -> bool:
    """Compile the bench program in a disposable child first: the remote
    compile tunnel occasionally hangs outright (threads parked in
    futex_wait; observed repeatedly), and a hung driver bench records
    nothing. A child can be killed and retried; the persistent compile
    cache hands the successful compile to this process. Returns True when
    a child completed."""
    import subprocess

    for _ in range(attempts):
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--prewarm-child"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        try:
            if p.wait(timeout=timeout_s) == 0:
                return True
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
    return False


def main():
    if "--cpu-reference" in sys.argv:
        val = run_cpu_reference()
        print(json.dumps({"cpu_reference_steps_per_sec": val}))
        return
    if "--prewarm-child" in sys.argv:
        run_bench(steps=1, warmup=1)
        return

    if not os.environ.get("GIFGAN_NO_PREWARM"):
        _prewarm()   # best effort; fall through to the real run regardless

    value = run_bench()
    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE.json")) as f:
            baseline = json.load(f).get("published", {}).get(
                "cpu_reference_steps_per_sec")
    except Exception:
        pass
    vs = (value / baseline) if baseline else None
    print(json.dumps({
        "metric": "vid_dcgan_train_steps_per_sec_b64_64x64x16",
        "value": round(value, 4),
        "unit": "steps/sec",
        "vs_baseline": round(vs, 3) if vs else None,
    }))


if __name__ == "__main__":
    main()
