"""Fréchet Activation Distance (FAD): automated distributional quality.

The reference's quality evidence is the face-track-rate metric plus human
MTurk surveys (survey_samples_test_results, firebase/) — there is no
automated distribution-level metric. This adds one, in the project's own
feature space: the image discriminator's h2 activation tap — the SAME
(s/8, s/8, 4*df) feature map the entire latent-optimization and video-GAN
stack is built on (reference model.py:279, z_model_lib.py:384-418) — is
spatially pooled to a (B, 4*df) embedding, and real/generated sets are
compared with the Fréchet distance between their Gaussian fits, exactly the
FID construction but with the in-domain tap instead of InceptionV3 (no
pretrained external network exists in this environment, and the tap is the
feature space the models themselves optimize against).

FAD(real, real) ≈ 0; it grows with mode collapse (shrunk covariance) and
distribution shift (moved mean) — the two GAN failure modes the std
diagnostics (ops/nn.py get_std) watch per-step; FAD is the corpus-level
version. Complements track-rate: track-rate asks "is there a stable face",
FAD asks "does the sample distribution match the data".
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from gifgan_tpu.core.config import DCGANConfig
from gifgan_tpu.models import dcgan

Array = jax.Array


def h2_features(params: Dict, state: Dict, images: Array,
                cfg: DCGANConfig) -> Array:
    """(B, s, s, c) images in [-1, 1] -> (B, 4*df) pooled h2 embeddings
    (inference-mode discriminator, spatial mean pool)."""
    _, h2, _ = dcgan.discriminator(params, state, images, cfg, train=False)
    return jnp.mean(h2.astype(jnp.float32), axis=(1, 2))


def gaussian_fit(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mean (D,), covariance (D, D)); N must be > 1."""
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(axis=0)
    cov = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(cov)


def frechet_distance(mu1: np.ndarray, cov1: np.ndarray,
                     mu2: np.ndarray, cov2: np.ndarray) -> float:
    """||mu1-mu2||^2 + tr(c1 + c2 - 2 (c1 c2)^(1/2)) — the FID formula.

    The matrix square root is computed as c1^(1/2) c2 c1^(1/2) via
    symmetric eigendecompositions (no scipy.linalg.sqrtm iteration;
    eigenvalues clipped at 0 against numerical negatives)."""
    d2 = float(np.sum((mu1 - mu2) ** 2))
    w1, v1 = np.linalg.eigh(cov1)
    s1 = (v1 * np.sqrt(np.clip(w1, 0, None))) @ v1.T     # c1^(1/2)
    m = s1 @ cov2 @ s1                                    # symmetric PSD
    wm = np.clip(np.linalg.eigvalsh(m), 0, None)
    tr_sqrt = float(np.sum(np.sqrt(wm)))                  # tr((c1 c2)^(1/2))
    # clamp: identical distributions can land at ~-1e-12 in floats
    return max(0.0, d2 + float(np.trace(cov1) + np.trace(cov2))
               - 2.0 * tr_sqrt)


def fad(params: Dict, state: Dict, real: np.ndarray, fake: np.ndarray,
        cfg: DCGANConfig, batch: int = 256) -> float:
    """FAD between two image sets ((N, s, s, c) in [-1, 1]) under the
    image-D h2 embedding. Feature extraction is batched/jitted; the
    Gaussian fit and Fréchet formula run on host in float64."""
    feat_fn = jax.jit(h2_features, static_argnames="cfg")

    def embed(x):
        out = []
        for i in range(0, len(x), batch):
            out.append(np.asarray(feat_fn(params, state,
                                          jnp.asarray(x[i:i + batch]), cfg)))
        return np.concatenate(out)

    mu_r, cov_r = gaussian_fit(embed(real))
    mu_f, cov_f = gaussian_fit(embed(fake))
    return frechet_distance(mu_r, cov_r, mu_f, cov_f)
