"""Fixed-seed golden-sample regression tests (SURVEY.md §4): numerical drift
in any layer changes these fingerprints. Goldens were generated on XLA:CPU
float32 (highest matmul precision, set in conftest); tolerances absorb
platform fusion differences."""

import jax
import jax.numpy as jnp
import numpy as np

from gifgan_tpu.core.config import DCGANConfig, VidGANConfig
from gifgan_tpu.models import dcgan, vid_dcgan

CFG = DCGANConfig(output_size=32, c_dim=1, z_dim=8, gf_dim=8, df_dim=8)
VCFG = VidGANConfig(z_input_size=12, z_output_size=8, vid_length=2,
                    hidden_dim=16, d_filters=8, image_gan=CFG)

# fingerprint: mean, std, and 4 probe pixels of G(z) at seed 0
GOLDEN_IMG = {
    "mean": 2.385908373980783e-06,
    "std": 7.833330528228544e-06,
    "probes": [-1.0756838264569524e-06, -1.214798612636514e-05,
               -7.386115612462163e-06, 1.0479380762262736e-05],
}
GOLDEN_VID_GOUT = {
    "mean": 6.843813480372773e-07,
    "std": 8.852191967889667e-06,
    "probes": [2.5855383682937827e-06, 1.487119675402937e-06,
               -1.628913560125511e-05, -6.408069566532504e-06],
}


def _fingerprint_img():
    params, state = dcgan.init(jax.random.PRNGKey(0), CFG)
    z = jax.random.uniform(jax.random.PRNGKey(1), (2, 8), minval=-1, maxval=1)
    x = np.asarray(dcgan.sample(params, state, z, CFG))
    return {"mean": float(x.mean()), "std": float(x.std()),
            "probes": [float(x[0, 0, 0, 0]), float(x[0, 16, 16, 0]),
                       float(x[1, 8, 24, 0]), float(x[1, 31, 31, 0])]}


def _fingerprint_vid():
    params, state = vid_dcgan.init(jax.random.PRNGKey(0), VCFG)
    z = jax.random.uniform(jax.random.PRNGKey(1), (2, 12), minval=-1,
                           maxval=1)
    g_out, _ = vid_dcgan.vid_generator(params.vid_generator,
                                       state.vid_generator, z, VCFG,
                                       train=False)
    g = np.asarray(g_out)
    return {"mean": float(g.mean()), "std": float(g.std()),
            "probes": [float(g[0, 0]), float(g[1, 3]), float(g[2, 5]),
                       float(g[3, 7])]}


def _check(actual, golden, rtol=2e-3, atol=1e-7):
    np.testing.assert_allclose(actual["mean"], golden["mean"], rtol=rtol,
                               atol=atol)
    np.testing.assert_allclose(actual["std"], golden["std"], rtol=rtol,
                               atol=atol)
    np.testing.assert_allclose(actual["probes"], golden["probes"], rtol=rtol,
                               atol=atol)


def test_image_generator_golden():
    _check(_fingerprint_img(), GOLDEN_IMG)


def test_vid_generator_golden():
    _check(_fingerprint_vid(), GOLDEN_VID_GOUT)


if __name__ == "__main__":
    # regenerate goldens
    print("GOLDEN_IMG =", _fingerprint_img())
    print("GOLDEN_VID_GOUT =", _fingerprint_vid())
