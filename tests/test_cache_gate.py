"""The persistent compile cache must stay OFF for CPU-backed processes.

Root cause of the 2026-08-19 full-suite crashes (three runs: SIGABRT then
SIGSEGV x2, always at the heaviest-compile test): tests/test_cli.py runs
the CLI IN-PROCESS, cli.main() used to enable the persistent compile cache
process-wide, and from then on every test wrote XLA:CPU executables into
~/.cache/gifgan_jax_cache — the serialize of the biggest one segfaulted
inside jax's put_executable_and_time. (Each affected file passed
standalone because nothing had enabled the cache in those runs.) Caching
CPU executables is also wrong across machines: entries aren't keyed by the
exact host feature set, so a carried-over cache dir feeds foreign AOT
results back to XLA (observed "could lead to SIGILL" load errors).

The cache exists for one thing — the ~350 s flagship TPU compiles through
the remote-compile tunnel — so core/cache.py now no-ops on CPU. This test
pins that gate in the exact environment that used to crash: the pytest
process (conftest forces the CPU platform) after an in-process CLI run.
"""

import os

import jax

from gifgan_tpu import cli
from gifgan_tpu.core import cache


def test_cpu_platform_detected_under_the_test_harness():
    # conftest.py sets JAX_PLATFORMS=cpu AND jax.config jax_platforms
    assert cache.cpu_platform()


def test_enable_compile_cache_is_a_noop_on_cpu():
    before = jax.config.jax_compilation_cache_dir
    cache.enable_compile_cache()
    assert jax.config.jax_compilation_cache_dir == before
    # and the gate didn't flip any persistence knobs on
    assert not jax.config.jax_compilation_cache_dir


def test_inprocess_cli_does_not_enable_the_cache(capsys):
    """cli.main() used to set JAX_COMPILATION_CACHE_DIR process-wide; after
    an in-process CLI invocation (the test_cli.py pattern) neither the env
    nor the live jax config may point at a cache dir. `--help` is enough:
    _enable_compile_cache runs before argument parsing."""
    had_env = "JAX_COMPILATION_CACHE_DIR" in os.environ
    try:
        cli.main(["--help"])
    except SystemExit:
        pass
    capsys.readouterr()
    assert ("JAX_COMPILATION_CACHE_DIR" in os.environ) == had_env
    assert not jax.config.jax_compilation_cache_dir
