"""gifgan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) GIF-GAN framework.

A from-scratch rebuild of the capabilities of the ord-nas/gif-gan reference
stack (see SURVEY.md): GIF/video data engineering (face detection, track
association, stabilization, crop/resize), GAN training (image DCGAN, the
nested "recurrent-z" video GAN, frame-conditioned recurrent video GAN),
latent-optimization (GAN inversion) tooling, serving, and evaluation —
designed TPU-first: functional pytree state, jitted fused train steps,
data-parallel sharding over a `jax.sharding.Mesh`, and Pallas kernels for the
hot image transforms.
"""

__version__ = "0.1.0"
