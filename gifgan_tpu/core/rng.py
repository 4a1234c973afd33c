"""PRNG plumbing.

The reference draws np.random uniforms ad hoc in the train loop
(model.py:203-204, z_model_lib.py:214-215). Here randomness is explicit: a
single seed fans out through `jax.random.split`, and every jitted step takes
its key as an argument, so runs are reproducible and sharding-safe.
"""

from __future__ import annotations

import jax


class PRNGSequence:
    """An infinite, splittable stream of PRNG keys (host-side convenience)."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def __next__(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def next(self):
        return next(self)

    def take(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs


def uniform_z(key, shape, dtype=None):
    """z ~ U[-1, 1], the reference's latent prior (model.py:203-204)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    return jax.random.uniform(key, shape, dtype=dtype, minval=-1.0, maxval=1.0)
