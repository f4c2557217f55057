"""Device mesh + sharding helpers for scenario parallelism.

The reference's only concurrency is two ROS processes on one machine
(SURVEY.md §2.7); the TPU-native scale-out story is **scenario data
parallelism**: every per-scenario cascade (gait -> MPC -> WBID -> rollout) is
independent, so batches shard over a 1-D ``('scenario',)`` mesh with zero
per-tick collectives — collectives appear only in sweep-statistics reductions
(psum) and cross-host reporting (all_gather), riding ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenario"


def scenario_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or given) devices, axis name 'scenario'."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (SCENARIO_AXIS,))


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (the NCCL/MPI-equivalent bootstrap; the
    reference's transport was single-machine ROS TCPROS, SURVEY.md §2.7).

    On TPU pods with standard env configuration the arguments are inferred;
    pass them explicitly elsewhere. Call once per process before any jax op.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


_BARRIER_SEQ = [0]


def coordination_barrier(name: str, timeout_s: int = 3600) -> None:
    """Block until every process of the job reaches this barrier — via the
    coordination service (no device collective involved).

    Needed around COMPILE SKEW: the CPU Gloo backend establishes its
    communicator contexts at the first collective with a fixed ~30 s
    key-exchange window, so if one process compiles the sharded program
    minutes faster than another (cold vs warm persistent cache), the early
    process times out waiting in Gloo init and the whole job dies at the
    shutdown barrier (round-4 failure of the 2-process sweep test). AOT
    compile + this barrier + execute closes the window. No-op
    single-process."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return
    _BARRIER_SEQ[0] += 1
    client.wait_at_barrier(
        f"{name}_{_BARRIER_SEQ[0]}", timeout_in_ms=timeout_s * 1000
    )


def pod_mesh() -> Mesh:
    """Scenario mesh over every device of every host in the job.

    jax.devices() is global after distributed_init; each host feeds its
    addressable shard of the scenario batch. The per-tick cascade is
    collective-free, so cross-host traffic is only the psum'd sweep
    statistics — DCN-light by construction (BASELINE: >=80% scaling
    efficiency target).
    """
    return Mesh(np.array(jax.devices()), (SCENARIO_AXIS,))


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place a batched pytree with its leading axis sharded over the mesh.

    Single-process: a plain device_put. Multi-process (after
    distributed_init): every process is assumed to hold the SAME full batch
    (deterministic construction from a shared PRNG key — parallel/sweep.py's
    randomize); each process contributes the shards its local devices own
    via make_array_from_callback, the standard multi-host ingestion path."""
    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree
        )

    def place(x):
        xn = np.asarray(x)
        return jax.make_array_from_callback(
            xn.shape, sharding, lambda idx: xn[idx]
        )

    return jax.tree_util.tree_map(place, tree)


def batch_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(SCENARIO_AXIS))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_COLLECTIVES = {
    "sum": lambda s, ax: jax.lax.psum(s, ax),
    "max": lambda s, ax: jax.lax.pmax(s, ax),
    "min": lambda s, ax: jax.lax.pmin(s, ax),
}


def sharded_vmap(
    mesh: Mesh,
    fn: Callable,
    *,
    reduce_fn: Optional[Callable] = None,
    reduce_ops: Any = None,
):
    """vmap fn over the leading axis and shard it over the scenario mesh with
    ``shard_map``; optionally reduce the outputs with a cross-device statistic.

    fn: per-scenario function (single sample). reduce_fn (optional): maps the
    local vmapped output -> statistics, which are then reduced over the mesh
    (the reference's /mpc_statistics aggregation, TPU-style). reduce_ops
    (optional): a pytree matching reduce_fn's output whose leaves name the
    cross-device collective for that statistic — 'sum' (default), 'max', or
    'min'. A max-statistic psum'd over n devices would report up to n x the
    true maximum, so non-additive statistics must be tagged here.
    """
    from jax import shard_map

    vf = jax.vmap(fn)

    if reduce_fn is None:
        def sharded(*args):
            return shard_map(
                vf,
                mesh=mesh,
                in_specs=P(SCENARIO_AXIS),
                out_specs=P(SCENARIO_AXIS),
                check_vma=False,
            )(*args)
        return jax.jit(sharded)

    def local(*args):
        out = vf(*args)
        stats = reduce_fn(out)
        if reduce_ops is None:
            stats = jax.tree_util.tree_map(
                lambda s: jax.lax.psum(s, SCENARIO_AXIS), stats
            )
        else:
            stats = jax.tree_util.tree_map(
                lambda s, op: _COLLECTIVES[op](s, SCENARIO_AXIS),
                stats,
                reduce_ops,
            )
        return out, stats

    def sharded(*args):
        return shard_map(
            local,
            mesh=mesh,
            in_specs=P(SCENARIO_AXIS),
            out_specs=(P(SCENARIO_AXIS), P()),
            check_vma=False,
        )(*args)

    return jax.jit(sharded)
