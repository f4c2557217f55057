"""Multi-process bootstrap smoke worker: distributed_init + pod_mesh + psum.

One process of an N-process jax.distributed job (CPU backend here; the same
code path bootstraps multi-host TPU pods — parallel/mesh.py docstrings).
Each process contributes its local device(s) to the global pod mesh, places
its shard of a scenario batch, and participates in a cross-process psum.

Usage: python tools/distributed_worker.py <coordinator> <num_procs> <pid> [sweep]
Prints one JSON line with the psum result; exit 0 on success.

With the optional ``sweep`` mode the worker runs the ACTUAL config-5 path —
parallel/sweep.run_sweep (full fused engine rollout, domain-randomized
batch) on the cross-process pod mesh — and prints the psum'd SweepStats,
which tests/test_distributed.py compares against a single-process run of
the identical batch.

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


def run_sweep_mode(pmesh):
    """The config-5 path across processes: run_sweep on the pod mesh."""
    import jax.numpy as jnp

    from g1_locomotion_tpu.engine import tick as eng
    from g1_locomotion_tpu.models.robot import load_robot
    from g1_locomotion_tpu.parallel import sweep
    from g1_locomotion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64
    model = load_robot("g1_23dof", dtype=dtype)
    cfg = eng.EngineConfig()
    base = eng.default_scenario(dtype)
    # Every process draws the SAME batch from the shared key; shard_batch
    # then feeds each process's addressable rows (parallel/mesh.py).
    params = sweep.randomize(
        sweep.SweepSpec(n_scenarios=8), jax.random.PRNGKey(0), base
    )
    mesh = pmesh.pod_mesh()
    final, (com_start, min_z), stats = sweep.run_sweep(
        model, cfg, params, n_periods=2, mesh=mesh
    )
    jax.block_until_ready(stats)
    out = {
        "pid": jax.process_index(),
        "n": float(stats.n),
        "com_drift_sum": float(stats.com_drift_sum),
        "tau_max": float(stats.tau_max),
        "fell_count": float(stats.fell_count),
        "ok": bool(float(stats.n) == 8.0),
    }
    print(json.dumps(out), flush=True)
    sys.exit(0 if out["ok"] else 1)


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

    if "sweep" in sys.argv[4:]:
        run_sweep_mode(pmesh)
        return

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
