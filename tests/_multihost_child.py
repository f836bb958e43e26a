"""Child process for tests/test_multihost.py — one JAX multi-controller
process of a 2-process CPU "fleet".

Run as: python tests/_multihost_child.py <coordinator_port> <process_id>

Exercises the REAL `jax.distributed` path that `parallel.distributed`
wires for multi-host slices (SURVEY §5.8): initialize against a localhost
coordinator, verify the global runtime spans both processes, build the
shared `global_data_mesh`, and run a cross-process collective (a psum'd
reduction over a globally-sharded array) whose value proves both hosts'
shards participated.
"""

import sys

import numpy as np


def main() -> int:
    port, pid = int(sys.argv[1]), int(sys.argv[2])

    from cartslam_tpu.parallel.distributed import (
        global_data_mesh,
        initialize_multihost,
    )

    assert initialize_multihost(
        {
            "coordinator": f"localhost:{port}",
            "num_processes": 2,
            "process_id": pid,
        }
    )

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == 2 * n_local, (n_global, n_local)

    mesh = global_data_mesh()
    assert mesh.shape["data"] == n_global

    # Each process contributes its shard of a global [n_global] array whose
    # entries are the global device index; the jitted sum must see ALL of
    # them — a genuine DCN-analogue (gloo) cross-process collective.
    sharding = NamedSharding(mesh, P("data"))
    local_rows = (np.arange(n_local) + pid * n_local).astype(np.float32)
    arr = jax.make_array_from_process_local_data(
        sharding, local_rows, (n_global,)
    )
    total = jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P())
    )(arr)
    want = n_global * (n_global - 1) / 2
    got = float(np.asarray(total))
    assert got == want, (got, want)

    print(f"MULTIHOST_OK {pid} {n_global}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
