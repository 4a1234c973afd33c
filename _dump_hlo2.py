import sys, functools
import jax, jax.numpy as jnp, numpy as np
from gifgan_tpu.core.cache import enable_compile_cache
from gifgan_tpu.core.config import DCGANConfig, TrainConfig, VidGANConfig
from gifgan_tpu.train import vid as vid_train
from gifgan_tpu.data.device import DeviceCorpus
from gifgan_tpu.data.synthetic import synthetic_clips

enable_compile_cache()
img = DCGANConfig(output_size=64, c_dim=3, z_dim=100, compute_dtype="bfloat16")
cfg = VidGANConfig(z_input_size=120, z_output_size=100, vid_length=16,
                   image_gan=img, first_frame_loss_scalar=1.0,
                   compute_dtype="bfloat16")
tcfg = TrainConfig(batch_size=64, disc_updates=1, gen_updates=2)
B, T, K = 64, 16, 5
ts = vid_train.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
z = jax.random.uniform(jax.random.PRNGKey(1), (K, B, cfg.z_input_size), minval=-1.0, maxval=1.0)
corpus = DeviceCorpus(synthetic_clips(64, length=T, size=64))
ids = jnp.zeros((K, B), jnp.int32)
knobs = vid_train.make_knobs(cfg, image_noise_std=0.5, activation_noise_std=0.5, d_lr_scale=1.0)
sample_fn = functools.partial(corpus.fold_sample_fn, out_dtype=None)
lo = vid_train.train_chunk_ids.lower(ts, ids, z, jax.random.PRNGKey(2),
                                     corpus.data, cfg, tcfg,
                                     sample_fn=sample_fn, knobs=knobs)
txt = lo.compile().as_text()
open("/tmp/endurance_hlo_fold.txt", "w").write(txt)
print("lines:", txt.count("\n"))
