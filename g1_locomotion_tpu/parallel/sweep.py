"""Scenario sweeps: domain randomization + sharded batched rollouts.

Implements BASELINE.json configs 3 and 5: thousands of vmapped SRBD-MPC
scenarios per chip (velocity commands x gait timings x mass/friction
randomization), sharded over a scenario mesh, with psum-reduced sweep
statistics — the TPU-native replacement for the reference's single-robot
ROS loop.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.models.robot import RobotModel
from g1_locomotion_tpu.parallel import mesh as pmesh


class SweepSpec(NamedTuple):
    """Randomization ranges for a domain-randomized sweep."""

    n_scenarios: int = 4096
    v_cmd_x: tuple = (-0.2, 0.5)     # m/s forward command range
    v_cmd_y: tuple = (-0.1, 0.1)
    mass_scale: tuple = (0.9, 1.1)   # body-mass randomization
    friction: tuple = (0.5, 1.0)     # cone friction range
    swing_duration: tuple = (0.20, 0.32)
    step_length: tuple = (0.05, 0.15)


def randomize(
    spec: SweepSpec, key: jax.Array, base: eng.ScenarioParams
) -> eng.ScenarioParams:
    """Draw a batch of ScenarioParams (leading axis = scenario)."""
    B = spec.n_scenarios
    ks = jax.random.split(key, 6)
    dtype = base.v_cmd.dtype

    def u(k, lohi, shape=(B,)):
        return jax.random.uniform(
            k, shape, dtype, minval=lohi[0], maxval=lohi[1]
        )

    v_cmd = jnp.stack([u(ks[0], spec.v_cmd_x), u(ks[1], spec.v_cmd_y)], axis=1)
    mass = base.srbd.mass * u(ks[2], spec.mass_scale)
    inertia = base.srbd.inertia[None] * u(ks[2], spec.mass_scale)[:, None, None]
    mu = u(ks[3], spec.friction)
    swing_d = u(ks[4], spec.swing_duration)
    step_l = u(ks[5], spec.step_length)

    def tile(x):
        return jnp.broadcast_to(x, (B,) + jnp.shape(x))

    # Tile every leaf to the batch, then overwrite the randomized fields.
    batched = jax.tree_util.tree_map(tile, base)
    return batched._replace(
        srbd=batched.srbd._replace(mass=mass, inertia=inertia),
        wbid_gains=batched.wbid_gains._replace(mu=mu),
        gait=batched.gait._replace(swing_duration=swing_d),
        steps=batched.steps._replace(step_length=step_l),
        v_cmd=v_cmd,
    )


class SweepStats(NamedTuple):
    """psum-reduced statistics over the scenario axis (the TPU analogue of the
    reference's pal_statistics topics)."""

    n: jnp.ndarray
    com_drift_sum: jnp.ndarray
    tau_max: jnp.ndarray
    fell_count: jnp.ndarray  # base below 0.4 m


def run_sweep(
    model: RobotModel,
    cfg: eng.EngineConfig,
    batch_params: eng.ScenarioParams,
    n_periods: int,
    mesh=None,
    states0: "eng.EngineState | None" = None,
    com_ref=None,
):
    """Run a sharded batched rollout and reduce sweep statistics.

    Returns (final_states, (com_start, min_z), stats) with stats reduced
    over the mesh; com_start/min_z are per-scenario (un-reduced) chunk
    aggregates for exact chunked accumulation. states0 (optional): batched
    EngineState to resume from (leading axis = scenario) — the
    checkpoint/resume path for long sweeps; the returned final states are
    the next chunk's states0.

    com_ref (optional, (B, 3)): per-scenario CoM drift origin. A chunked
    sweep must measure every chunk's drift from the WHOLE RUN's first tick
    (thread the first chunk's returned com_start through), so the final
    chunk's com_drift statistic equals an unchunked run's exactly — summing
    per-chunk |Δcom| values does not (|a+b| ≠ |a|+|b|; VERDICT round 2).
    fell is similarly a whole-chunk min-height test so chunked runs can OR
    it across chunks.
    """
    mesh = mesh or pmesh.scenario_mesh()
    rollout = eng.make_rollout(model, cfg)
    use_ref = com_ref is not None

    def per_scenario(params: eng.ScenarioParams, state: eng.EngineState,
                     ref: jnp.ndarray):
        final, logs = rollout(state, params, n_periods)
        com = logs.com.reshape(-1, 3)
        origin = ref if use_ref else com[0]
        drift = jnp.linalg.norm(com[-1] - origin)
        # Fell if the CoM height ever dropped below the band at ANY tick of
        # the chunk (not just the final state). The per-scenario chunk
        # minimum is also returned un-reduced so chunked runs can take an
        # element-wise min across chunks — exactly the whole-run minimum.
        min_z = jnp.min(com[:, 2])
        fell = (min_z < 0.4).astype(com.dtype)
        return (final, com[0], min_z), (drift, jnp.max(jnp.abs(logs.tau)), fell)

    def reduce_fn(out):
        _, (drift, tau_max, fell) = out
        return SweepStats(
            n=jnp.asarray(drift.shape[0], drift.dtype),
            com_drift_sum=jnp.sum(drift),
            tau_max=jnp.max(tau_max),
            fell_count=jnp.sum(fell),
        )

    reduce_ops = SweepStats(n="sum", com_drift_sum="sum", tau_max="max",
                            fell_count="sum")
    f = pmesh.sharded_vmap(mesh, per_scenario, reduce_fn=reduce_fn,
                           reduce_ops=reduce_ops)
    B = batch_params.v_cmd.shape[0]
    dtype = batch_params.v_cmd.dtype
    if states0 is None:
        state0 = eng.init_state(model, cfg, dtype)
        states0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), state0
        )
    if com_ref is None:
        com_ref = jnp.zeros((B, 3), dtype)  # unused when use_ref is False
    batch_params = pmesh.shard_batch(mesh, batch_params)
    states0 = pmesh.shard_batch(mesh, states0)
    com_ref = pmesh.shard_batch(mesh, com_ref)
    if jax.process_count() > 1:
        # Multi-process: AOT-compile first (local, no collectives), then
        # sync at a coordination barrier so every process enters the Gloo
        # context setup together (see pmesh.coordination_barrier).
        compiled = f.lower(batch_params, states0, com_ref).compile()
        pmesh.coordination_barrier("run_sweep_compiled")
        ((final, com_start, min_z), _), stats = compiled(
            batch_params, states0, com_ref
        )
    else:
        ((final, com_start, min_z), _), stats = f(
            batch_params, states0, com_ref
        )
    return final, (com_start, min_z), stats
