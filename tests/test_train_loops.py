"""End-to-end training loop tests: artifacts, cadence, resume semantics."""

import os

import numpy as np
import pytest

from gifgan_tpu.core import checkpoint as ckpt
from gifgan_tpu.core.config import (DCGANConfig, RecurrentImageConfig,
                                    TrainConfig, VidGANConfig)
from gifgan_tpu.data.synthetic import synthetic_clips, synthetic_stills
from gifgan_tpu.train import loops

IMG = DCGANConfig(output_size=32, c_dim=3, z_dim=16, gf_dim=8, df_dim=8)


def stills_iter():
    data = synthetic_stills(32, size=32).astype(np.float32) / 127.5 - 1.0
    def it():
        for i in range(2):
            yield data[i * 16:(i + 1) * 16]
    return it


def test_train_dcgan_loop_artifacts_and_resume(tmp_path):
    pytest.importorskip("imageio")
    tcfg = TrainConfig(batch_size=16, epochs=2, sample_every=2,
                       checkpoint_every=2, run_dir=str(tmp_path / "run"))
    ts = loops.train_dcgan(stills_iter(), IMG, tcfg, steps_limit=3)
    assert int(ts.step) == 3
    run = tmp_path / "run"
    assert (run / "params.json").exists()
    assert (run / "train_metrics.jsonl").exists()
    assert any(f.startswith("train_") and f.endswith(".png")
               for f in os.listdir(run))
    steps = ckpt.all_steps(str(run / "checkpoints"))
    assert 3 in steps

    # resume continues from the saved step
    ts2 = loops.train_dcgan(stills_iter(), IMG, tcfg, steps_limit=5)
    assert int(ts2.step) == 5


def test_train_vid_loop_with_image_gan_graft(tmp_path):
    pytest.importorskip("cv2")
    # first make an image-GAN checkpoint
    tcfg_img = TrainConfig(batch_size=16, epochs=1, sample_every=0,
                           checkpoint_every=0,
                           run_dir=str(tmp_path / "img_run"))
    loops.train_dcgan(stills_iter(), IMG, tcfg_img, steps_limit=1)
    img_ckpt = str(tmp_path / "img_run" / "checkpoints")

    cfg = VidGANConfig(z_input_size=20, z_output_size=16, vid_length=4,
                       hidden_dim=32, d_filters=16, image_gan=IMG,
                       first_frame_loss_scalar=1.0)
    tcfg = TrainConfig(batch_size=8, epochs=2, sample_every=2,
                       checkpoint_every=2, run_dir=str(tmp_path / "vid_run"))

    clips = synthetic_clips(8, length=4, size=32).astype(np.float32)
    folded = clips.reshape(-1, 32, 32, 3) / 127.5 - 1.0

    def clips_iter():
        yield folded

    ts = loops.train_vid_dcgan(lambda: clips_iter(), cfg, tcfg,
                               image_gan_ckpt=img_ckpt, steps_limit=2)
    assert int(ts.step) == 2
    run = tmp_path / "vid_run"
    assert any(f.startswith("sample_") and f.endswith(".mp4")
               for f in os.listdir(run))
    assert any(f.startswith("cross_sample_") for f in os.listdir(run))

    # the grafted image generator came from the image-GAN checkpoint
    import jax
    flat = ckpt.load_flat(img_ckpt)
    leaf = flat["params/generator/h0_lin/w"]
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(ts.params.img_generator["h0_lin"]["w"])),
        leaf)


def test_train_recurrent_refuses_overwrite(tmp_path):
    cfg = RecurrentImageConfig(image_size=32, c_dim=3, seq_length=4,
                               base_filters=8, lstm_units=16)
    tcfg = TrainConfig(batch_size=4, epochs=3, sample_every=0,
                       checkpoint_every=0, run_dir=str(tmp_path / "r"))
    clips = synthetic_clips(4, length=5, size=32).astype(np.float32) / 255.0

    def it():
        yield clips

    loops.train_recurrent(lambda: it(), cfg, tcfg, steps_limit=1)
    with pytest.raises(RuntimeError, match="exists"):
        loops.train_recurrent(lambda: it(), cfg, tcfg, resume=False,
                              steps_limit=1)
    # resume path works
    ts = loops.train_recurrent(lambda: it(), cfg, tcfg, resume=True,
                               steps_limit=2)
    assert int(ts.step) == 2


def test_video_grid_pads_remainder(tmp_path):
    pytest.importorskip("cv2")
    from gifgan_tpu.data.video import decode_clip
    from gifgan_tpu.train.loops import _write_video_grid

    videos = np.random.default_rng(0).uniform(
        -1, 1, (12, 3, 16, 16, 3)).astype(np.float32)
    path = str(tmp_path / "grid.mp4")
    _write_video_grid(videos, 8, path)
    clip = decode_clip(path, 3, None, strict=False) if False else None
    import cv2

    cap = cv2.VideoCapture(path)
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    assert (w, h) == (8 * 16, 2 * 16)  # 2 rows (ceil 12/8), none dropped


def test_cross_grid_orientation():
    from gifgan_tpu.train.loops import cross_sample_z

    rng = np.random.default_rng(0)
    cross = cross_sample_z(2, 8, 20, 16, rng)  # 2 faces x 8 expressions
    assert cross.shape == (16, 20)
    # row-major: entries 0..7 share face dims, 0 and 8 share expression dims
    np.testing.assert_array_equal(cross[0, :16], cross[7, :16])
    np.testing.assert_array_equal(cross[0, 16:], cross[8, 16:])


def test_train_vid_loop_chunked(tmp_path):
    pytest.importorskip("cv2")
    cfg = VidGANConfig(z_input_size=20, z_output_size=16, vid_length=4,
                       hidden_dim=32, d_filters=16, image_gan=IMG,
                       first_frame_loss_scalar=1.0)
    tcfg = TrainConfig(batch_size=4, epochs=4, sample_every=0,
                       checkpoint_every=0, run_dir=str(tmp_path / "vc"))
    clips = synthetic_clips(8, length=4, size=32).astype(np.float32)
    folded = clips.reshape(2, 4 * 4, 32, 32, 3) / 127.5 - 1.0

    def it():
        yield folded[0]
        yield folded[1]

    ts = loops.train_vid_dcgan(lambda: it(), cfg, tcfg, chunk=2,
                               steps_limit=4)
    assert int(ts.step) == 4  # 2 chunks of 2 per... epochs x 2 batches


def test_train_vid_loop_chunked_flushes_partial(tmp_path):
    """An epoch tail smaller than `chunk` must still be trained and logged,
    not dropped (ADVICE round 1)."""
    pytest.importorskip("cv2")
    cfg = VidGANConfig(z_input_size=20, z_output_size=16, vid_length=4,
                       hidden_dim=32, d_filters=16, image_gan=IMG,
                       first_frame_loss_scalar=1.0)
    tcfg = TrainConfig(batch_size=4, epochs=1, sample_every=0,
                       checkpoint_every=0, run_dir=str(tmp_path / "vp"))
    clips = synthetic_clips(12, length=4, size=32).astype(np.float32)
    folded = clips.reshape(3, 4 * 4, 32, 32, 3) / 127.5 - 1.0

    def it(_seed=0):
        yield from folded

    ts = loops.train_vid_dcgan(it, cfg, tcfg, chunk=2)
    assert int(ts.step) == 3  # 1 full chunk of 2 + flushed partial of 1


def test_train_vid_loop_chunk_used_on_mesh(tmp_path):
    """--chunk must not be silently ignored on a multi-device run (ADVICE
    round 1): the mesh path goes through train_chunk with batch_axis=1."""
    pytest.importorskip("cv2")
    import jax
    from gifgan_tpu.core.mesh import make_mesh

    mesh = make_mesh(jax.devices("cpu")[:2], data_parallel=2)
    cfg = VidGANConfig(z_input_size=20, z_output_size=16, vid_length=4,
                       hidden_dim=32, d_filters=16, image_gan=IMG,
                       first_frame_loss_scalar=1.0)
    tcfg = TrainConfig(batch_size=4, epochs=1, sample_every=0,
                       checkpoint_every=0, run_dir=str(tmp_path / "vm"))
    clips = synthetic_clips(16, length=4, size=32).astype(np.float32)
    folded = clips.reshape(4, 4 * 4, 32, 32, 3) / 127.5 - 1.0

    def it(_seed=0):
        yield from folded

    ts = loops.train_vid_dcgan(it, cfg, tcfg, chunk=2, mesh=mesh)
    assert int(np.asarray(jax.device_get(ts.step))) == 4
    # metrics were logged at chunk granularity (steps 2 and 4)
    import json
    lines = [json.loads(l) for l in
             open(tmp_path / "vm" / "train_metrics.jsonl")]
    assert [l["step"] for l in lines] == [2, 4]


def test_resume_does_not_replay_rng_stream(tmp_path):
    """A resumed run must continue with fresh z/noise draws, not replay the
    stream already consumed before the checkpoint (ADVICE round 1)."""
    import json
    tcfg = TrainConfig(batch_size=16, epochs=4, sample_every=0,
                       checkpoint_every=1, run_dir=str(tmp_path / "rr"),
                       seed=7)
    loops.train_dcgan(stills_iter(), IMG, tcfg, steps_limit=1)
    # segment 2 resumes from step 1 and runs step 2
    loops.train_dcgan(stills_iter(), IMG, tcfg, steps_limit=2)
    lines = [json.loads(l) for l in
             open(tmp_path / "rr" / "train_metrics.jsonl")]
    by_step = {}
    for l in lines:
        by_step.setdefault(l["step"], []).append(l)
    # fresh-run comparison: same seed, 2 steps without interruption
    tcfg2 = TrainConfig(batch_size=16, epochs=4, sample_every=0,
                        checkpoint_every=0, run_dir=str(tmp_path / "rr2"),
                        seed=7)
    loops.train_dcgan(stills_iter(), IMG, tcfg2, steps_limit=2)
    lines2 = [json.loads(l) for l in
              open(tmp_path / "rr2" / "train_metrics.jsonl")]
    step2_fresh = [l for l in lines2 if l["step"] == 2][0]
    step2_resumed = by_step[2][0]
    # the resumed step-2 must NOT equal a replayed step (which would happen
    # if the rng stream restarted); it differs from the uninterrupted run's
    # step-2 because the key stream was re-seeded by fold_in(step)
    assert step2_resumed["g_loss"] != step2_fresh["g_loss"]


def test_train_dcgan_chunked_and_mesh_chunk(tmp_path):
    """Image-GAN chunking: partial-tail flush and mesh path parity with the
    vid loop's semantics."""
    import jax
    from gifgan_tpu.core.mesh import make_mesh

    tcfg = TrainConfig(batch_size=16, epochs=1, sample_every=0,
                       checkpoint_every=0, run_dir=str(tmp_path / "ic"))
    data = synthetic_stills(48, size=32).astype(np.float32) / 127.5 - 1.0

    def it(_seed=0):
        for i in range(3):
            yield data[i * 16:(i + 1) * 16]

    ts = loops.train_dcgan(it, IMG, tcfg, chunk=2)
    assert int(np.asarray(jax.device_get(ts.step))) == 3  # 2 + flushed 1

    mesh = make_mesh(jax.devices("cpu")[:2], data_parallel=2)
    tcfg2 = TrainConfig(batch_size=16, epochs=1, sample_every=0,
                        checkpoint_every=0, run_dir=str(tmp_path / "im"))
    ts2 = loops.train_dcgan(it, IMG, tcfg2, chunk=2, mesh=mesh)
    assert int(np.asarray(jax.device_get(ts2.step))) == 3


def test_chunked_cadence_fires_after_tail_shift():
    """Checkpoint/sample cadence must fire when a chunk CROSSES a multiple,
    even after an epoch-tail partial flush shifts step off the grid
    (round-2 review finding)."""
    from gifgan_tpu.train.loops import _crossed

    assert _crossed(499, 500, 500)
    assert _crossed(495, 505, 500)     # chunk of 10 crossing 500
    assert not _crossed(500, 505, 500)
    assert _crossed(130, 150, 150)     # tail-shifted grid
    assert not _crossed(150, 170, 500)
    assert not _crossed(0, 10, 0)      # disabled cadence


def test_train_dcgan_stills_u8_matches_host_iterator(tmp_path):
    """Device-corpus fast path (stills_u8) must consume the SAME batches in
    the SAME order/grouping as a host iterator replaying its per-epoch id
    permutation. The host run here yields the exact arrays the device path
    gathers (DeviceCorpus value-parity vs numpy scaling is test_data.py's
    job; the /127.5 reciprocal-multiply ulp difference amplifies chaotically
    through the degenerate tiny-GAN's Adam updates, so plumbing parity needs
    bit-identical pixels), hence final params must match bit-exactly — for
    both the per-step and the chunked (K-as-one-program) paths."""
    import jax
    from gifgan_tpu.data.device import DeviceCorpus

    data_u8 = synthetic_stills(32, size=32)
    assert data_u8.dtype == np.uint8
    corpus = DeviceCorpus(data_u8)

    def host_iter(epoch_seed):
        perm = np.random.default_rng(epoch_seed).permutation(len(data_u8))
        for i in range(len(data_u8) // 16):
            yield np.asarray(corpus.sample(perm[i * 16:(i + 1) * 16]))

    for chunk in (1, 2):
        tag = f"c{chunk}"
        tcfg_a = TrainConfig(batch_size=16, epochs=1, sample_every=0,
                             checkpoint_every=0,
                             run_dir=str(tmp_path / f"dev_{tag}"))
        ts_dev = loops.train_dcgan(None, IMG, tcfg_a, chunk=chunk,
                                   stills_u8=data_u8)
        tcfg_b = TrainConfig(batch_size=16, epochs=1, sample_every=0,
                             checkpoint_every=0,
                             run_dir=str(tmp_path / f"host_{tag}"))
        ts_host = loops.train_dcgan(host_iter, IMG, tcfg_b, chunk=chunk)
        assert int(np.asarray(jax.device_get(ts_dev.step))) == 2
        a = jax.device_get(ts_dev.params)
        b = jax.device_get(ts_host.params)
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(la, lb)


def test_train_vid_dcgan_clips_u8_matches_host_iterator(tmp_path):
    """Vid-loop device-corpus path (clips_u8): same clip ids, order, chunk
    grouping and time-folding as a host iterator replaying the per-epoch
    permutation over bit-identical pixels -> bit-exact final params (see
    the image-loop twin above for why pixels must be bit-identical)."""
    import jax
    from gifgan_tpu.data.device import DeviceCorpus

    cfg = VidGANConfig(z_input_size=20, z_output_size=16, vid_length=4,
                       hidden_dim=32, d_filters=16, image_gan=IMG)
    data_u8 = synthetic_clips(16, length=4, size=32)
    corpus = DeviceCorpus(data_u8)

    def host_iter(epoch_seed):
        perm = np.random.default_rng(epoch_seed).permutation(len(data_u8))
        for i in range(len(data_u8) // 8):
            g = np.asarray(corpus.sample(perm[i * 8:(i + 1) * 8]))
            yield g.reshape(-1, *g.shape[2:])     # time folds into batch

    for chunk in (1, 2):
        tag = f"c{chunk}"
        tcfg_a = TrainConfig(batch_size=8, epochs=1, sample_every=0,
                             checkpoint_every=0,
                             run_dir=str(tmp_path / f"dev_{tag}"))
        ts_dev = loops.train_vid_dcgan(None, cfg, tcfg_a, chunk=chunk,
                                       clips_u8=data_u8)
        tcfg_b = TrainConfig(batch_size=8, epochs=1, sample_every=0,
                             checkpoint_every=0,
                             run_dir=str(tmp_path / f"host_{tag}"))
        ts_host = loops.train_vid_dcgan(host_iter, cfg, tcfg_b, chunk=chunk)
        assert int(np.asarray(jax.device_get(ts_dev.step))) == 2
        a = jax.device_get(ts_dev.params)
        b = jax.device_get(ts_host.params)
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(la, lb)


def test_train_vid_dcgan_clips_u8_rejects_bad_shapes(tmp_path):
    cfg = VidGANConfig(z_input_size=20, z_output_size=16, vid_length=4,
                       hidden_dim=32, d_filters=16, image_gan=IMG)
    tcfg = TrainConfig(batch_size=8, epochs=1, sample_every=0,
                       checkpoint_every=0, run_dir=str(tmp_path / "r"))
    with pytest.raises(ValueError, match="vid_length"):
        loops.train_vid_dcgan(None, cfg, tcfg,
                              clips_u8=synthetic_clips(8, length=6, size=32))
    with pytest.raises(ValueError, match="batch_size"):
        loops.train_vid_dcgan(None, cfg, tcfg,
                              clips_u8=synthetic_clips(4, length=4, size=32))


def test_train_dcgan_stills_u8_rejects_small_corpus_and_runs_on_mesh(
        tmp_path):
    """The corpus smaller than a batch is still rejected; a mesh is now
    SUPPORTED (DeviceCorpus mesh-aware mode: corpus replicated, sampled
    batches sharded over `data`)."""
    import jax
    from gifgan_tpu.core.mesh import make_mesh

    data_u8 = synthetic_stills(8, size=32)
    tcfg = TrainConfig(batch_size=16, epochs=1, sample_every=0,
                       checkpoint_every=0, run_dir=str(tmp_path / "r"))
    with pytest.raises(ValueError, match="batch_size"):
        loops.train_dcgan(None, IMG, tcfg, stills_u8=data_u8)

    mesh = make_mesh(jax.devices("cpu")[:2], data_parallel=2)
    tcfg2 = TrainConfig(batch_size=8, epochs=1, sample_every=0,
                        checkpoint_every=0, run_dir=str(tmp_path / "m"))
    ts = loops.train_dcgan(None, IMG, tcfg2, mesh=mesh,
                           stills_u8=synthetic_stills(16, size=32),
                           steps_limit=2)
    assert int(ts.step) == 2


def test_train_vid_fsdp_cli(tmp_path):
    """train-vid --fsdp on the virtual 8-device mesh: the ZeRO-3 layout
    trains end-to-end through the CLI (checkpoint written, resume intact)."""
    from gifgan_tpu import cli

    run_dir = str(tmp_path / "vid_fsdp")
    cli.main(["train-vid", "--run-dir", run_dir, "--c-dim", "3",
              "--vid-z-dim", "16", "--vid-length", "4",
              "--output-size", "32", "--z-dim", "12", "--gf-dim", "8",
              "--df-dim", "8", "--batch-size", "8", "--epochs", "1",
              "--sample-every", "0", "--checkpoint-every", "2",
              "--steps-limit", "2", "--data-parallel", "8",
              "--fsdp", "--fsdp-min-size", "256", "--chunk", "2",
              "--dataset", "synthetic", "--dataset-size", "16"])
    import os

    from gifgan_tpu.core import checkpoint as ckpt

    assert ckpt.latest_step(os.path.join(run_dir, "checkpoints")) == 2


def test_train_vid_auto_intervene_on_mesh_and_resume(tmp_path):
    """--auto-intervene in the standard training loop: the controller's
    traced Knobs ride the sharded chunked step (dp.make_sharded_step
    pass_knobs), every chunk record carries the live knob values, and a
    resume restores the last intervention's levels from the metrics log."""
    import json
    import os

    from gifgan_tpu import cli
    from gifgan_tpu.core import checkpoint as ckpt

    run_dir = str(tmp_path / "vid_ai_mesh")
    argv = ["train-vid", "--run-dir", run_dir, "--c-dim", "3",
            "--vid-z-dim", "16", "--vid-length", "4",
            "--output-size", "32", "--z-dim", "12", "--gf-dim", "8",
            "--df-dim", "8", "--batch-size", "8", "--epochs", "1",
            "--sample-every", "0", "--checkpoint-every", "2",
            "--data-parallel", "8", "--device-corpus", "--chunk", "2",
            "--image-noise", "0.1", "--activation-noise", "0.1",
            "--dataset", "synthetic", "--dataset-size", "16",
            "--auto-intervene"]
    cli.main(argv + ["--steps-limit", "2"])
    mpath = os.path.join(run_dir, "train_metrics.jsonl")
    recs = [json.loads(ln) for ln in open(mpath)]
    chunks = [r for r in recs if "d_loss" in r and "kind" not in r]
    assert chunks
    for r in chunks:  # live knob values logged alongside the diagnostics
        assert r["image_noise_std"] == 0.1
        assert r["d_lr_scale"] == 1.0

    # simulate a prior intervention, then resume: chunk records must carry
    # the restored levels, not the configured base
    with open(mpath, "a") as f:
        f.write(json.dumps({
            "kind": "auto_intervention", "action": "raise_noise",
            "step": 2, "d_loss": 0.01, "image_noise_std": 0.3,
            "activation_noise_std": 0.3, "d_lr_scale": 0.5}) + "\n")
    cli.main(argv + ["--steps-limit", "4"])
    assert ckpt.latest_step(os.path.join(run_dir, "checkpoints")) == 4
    recs2 = [json.loads(ln) for ln in open(mpath)]
    resumed = [r for r in recs2
               if "d_loss" in r and "kind" not in r and r["step"] > 2]
    assert resumed
    for r in resumed:
        assert r["image_noise_std"] == 0.3
        assert r["d_lr_scale"] == 0.5


def test_train_vid_device_corpus_on_mesh(tmp_path):
    """train-vid --device-corpus --data-parallel 8: the HBM-resident ids-only
    data path now composes with the mesh (corpus replicated, sampled chunks
    sharded over `data`); runs end-to-end through the CLI with chunking."""
    import os

    from gifgan_tpu import cli
    from gifgan_tpu.core import checkpoint as ckpt

    run_dir = str(tmp_path / "vid_dc_mesh")
    cli.main(["train-vid", "--run-dir", run_dir, "--c-dim", "3",
              "--vid-z-dim", "16", "--vid-length", "4",
              "--output-size", "32", "--z-dim", "12", "--gf-dim", "8",
              "--df-dim", "8", "--batch-size", "8", "--epochs", "1",
              "--sample-every", "0", "--checkpoint-every", "2",
              "--steps-limit", "2", "--data-parallel", "8",
              "--device-corpus", "--chunk", "2",
              "--dataset", "synthetic", "--dataset-size", "16"])
    assert ckpt.latest_step(os.path.join(run_dir, "checkpoints")) == 2
