"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Kernel/numerics tests run on CPU; sharding tests exercise pjit over the
8-device mesh (SURVEY.md §4's test strategy for the TPU build). Bench runs
separately on the real chip.

Note: this image's sitecustomize registers the axon TPU PJRT plugin at
interpreter startup and overrides jax_platforms, so we must update the jax
config (not just the env var) before any backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Round-5 suite-time findings (verdict item 3, measured then REVERTED —
# don't re-try these):
#   * LLVM -O1 + --xla_llvm_disable_expensive_passes cut compile CPU ~40%
#     (test_vid_dcgan 145->86 s user) BUT (a) changed float codegen
#     (FMA/vectorization) enough to break the committed loss-trajectory
#     golden and a sharding-parity tolerance — these flags are NOT
#     numerics-transparent — and (b) slowed the execution-bound tests, so
#     the full suite only went 45->41 min. Numerics integrity wins.
#   * A per-child persistent XLA:CPU cache (JAX_COMPILATION_CACHE_DIR in
#     the subprocess smokes) saves just 30-40 s per ~280 s endurance
#     smoke: those tests are EXECUTION-bound, not compile-bound.
#   * pytest-xdist cannot help at nproc=1 (this host); on a multi-core
#     host `-n 2 --dist loadfile` is the right config (module-scoped
#     fixtures and the cache-clear boundary are per-worker-safe).
# Net: the suite's ~40-45 min is CPU-bound work (durations: the three
# endurance subprocess smokes alone are ~14 min of real execution); a
# <25 min wall needs >=2 cores, not flags.
os.environ["XLA_FLAGS"] = _flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _free_compiled_programs_between_modules():
    """Release every cached compiled program at module boundaries.

    A full single-process suite run reproducibly segfaults inside XLA:CPU
    compilation (`backend_compile_and_load`) once ~330 programs have been
    compiled — and the crash follows the ACCUMULATION, not any particular
    program: isolating the heaviest compiles into child processes
    (tests/isolation.py) just moved the crash to the next (tiny!) compile
    in the last module (jax.random.uniform, 2026-08-20 run A). Dropping
    the executable caches between modules keeps the process far from the
    wall; shared small programs recompile per module (seconds each), which
    is noise against the suite's compile-dominated runtime.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
