"""LIVE multi-process distributed test: two real jax.distributed processes
(CPU backend, gloo collectives) run a process-spanning mesh reduction and a
save_multihost with the live multihost_utils barrier — the exact runtime
path a TPU pod takes. Complements the injected-barrier unit tests in
tests/test_checkpoint.py. (The reference has no distributed runtime at all:
SURVEY.md §2.9.)"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = os.path.join(os.path.dirname(__file__), "multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_and_multihost_checkpoint(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", _CHILD, str(pid), str(port),
             str(tmp_path / "ckpt")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=220)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out[-3000:]}"
        assert f"CHILD_OK {pid}" in out, out[-3000:]
    assert (tmp_path / "ckpt").is_dir()
