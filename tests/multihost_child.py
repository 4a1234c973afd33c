"""Child process for the LIVE multi-host test (tests/test_multihost_live.py).

Runs as one of two real `jax.distributed` processes on the CPU backend
(gloo collectives), exercising the exact code paths a TPU pod uses:
process-spanning global mesh, a jitted reduction over it, the live
multihost_utils barrier inside core.checkpoint.save_multihost, and
process_shard input sharding. The reference has no multi-host story at all
(SURVEY.md §2.9/§5.8); the injected-barrier unit tests cover semantics,
this covers the live runtime.

Usage: python multihost_child.py <pid> <port> <ckpt_dir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid, port, ckpt_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from gifgan_tpu.parallel.distributed import (global_batch_to_local,
                                                 initialize, process_shard)

    assert initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2
    assert jax.device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # input sharding helpers
    shard = process_shard(list(range(10)))
    assert shard == list(range(10))[pid::2], shard
    assert global_batch_to_local(8) == 4

    # global data-parallel mesh spanning both processes; each process
    # contributes a distinct local batch, the jitted global sum must see all
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    local = np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 100.0 * pid
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data"))
    total = jax.jit(lambda x: jnp.sum(x),
                    out_shardings=NamedSharding(mesh, P()))(garr)
    got = float(np.asarray(total))
    want = float(np.arange(12).sum() * 2 + 100.0 * 12)  # both halves
    assert abs(got - want) < 1e-3, (got, want)

    # live multihost checkpoint: primary writes, default (live) barrier
    from gifgan_tpu.core.checkpoint import latest_step, restore, \
        save_multihost

    tree = {"w": np.arange(5, dtype=np.float32), "b": np.float32(2.5)}
    path = save_multihost(ckpt_dir, step=7, tree=tree)
    if pid == 0:
        assert path is not None and os.path.exists(path), path
    else:
        assert path is None
    # post-save barrier guarantees visibility on every process
    assert latest_step(ckpt_dir) == 7
    got_tree = restore(ckpt_dir, {"w": np.zeros(5, np.float32),
                                  "b": np.float32(0.0)})
    np.testing.assert_array_equal(got_tree["w"], tree["w"])
    assert float(got_tree["b"]) == 2.5

    print(f"CHILD_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
