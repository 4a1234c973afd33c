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
# The suite is XLA:CPU-compile-dominated on this 1-core host (round-4
# verdict item 3: ~45 min). Dialing LLVM down to -O1 and skipping the
# expensive-pass set cuts measured compile CPU ~40% (test_vid_dcgan.py:
# 145 s -> 86 s user time) without touching float semantics — these are
# optimization-LEVEL flags, not fast-math; every numeric tolerance in the
# suite still holds. Runtime of the compiled code is slower, but the suite
# spends its time compiling, not running. Set before first jax import;
# tests/isolation.py children inherit via os.environ.
for _f in ("--xla_llvm_disable_expensive_passes=true",
           "--xla_backend_optimization_level=1"):
    if _f.split("=")[0] not in _flags:
        _flags += " " + _f
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
