"""Multi-process bootstrap smoke worker: distributed_init + pod_mesh + psum.

One process of an N-process jax.distributed job (CPU backend here; the same
code path bootstraps multi-host TPU pods — parallel/mesh.py docstrings).
Each process contributes its local device(s) to the global pod mesh, places
its shard of a scenario batch, and participates in a cross-process psum.

Usage: python tools/distributed_worker.py <coordinator> <num_procs> <pid>
Prints one JSON line with the psum result; exit 0 on success.

Run standalone for a 2-process check:
    python tools/distributed_worker.py 127.0.0.1:9911 2 0 &
    python tools/distributed_worker.py 127.0.0.1:9911 2 1
(tests/test_distributed.py does exactly this.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from g1_locomotion_tpu.parallel import mesh as pmesh

    # The bootstrap under test: jax.distributed.initialize via the helper.
    pmesh.distributed_init(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=pid,
    )
    assert jax.process_count() == num_procs, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == num_procs * n_local, (n_global, n_local)

    mesh = pmesh.pod_mesh()
    sharding = pmesh.batch_spec(mesh)

    # Each process feeds its addressable shard: process p contributes
    # rows [p*local, (p+1)*local) with value (global_row + 1).
    local_rows = np.arange(pid * n_local, (pid + 1) * n_local, dtype=np.float64)
    local = (local_rows + 1.0).reshape(n_local, 1)
    global_arr = jax.make_array_from_process_local_data(
        sharding, local, global_shape=(n_global, 1)
    )

    # Cross-process reduction: sum over the sharded axis (XLA inserts the
    # all-reduce over the pod mesh).
    total = jax.jit(lambda a: a.sum())(global_arr)
    expect = float(n_global * (n_global + 1) / 2)
    got = float(np.asarray(total))
    ok = abs(got - expect) < 1e-9
    print(json.dumps({"pid": pid, "psum": got, "expect": expect, "ok": ok}),
          flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
