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
):
    """Run a sharded batched rollout and reduce sweep statistics.

    Returns (final_states, stats) with stats reduced over the mesh.
    states0 (optional): batched EngineState to resume from (leading axis =
    scenario) — the checkpoint/resume path for long sweeps; the returned
    final states are the next chunk's states0.
    """
    mesh = mesh or pmesh.scenario_mesh()
    rollout = eng.make_rollout(model, cfg)

    def per_scenario(params: eng.ScenarioParams, state: eng.EngineState):
        final, logs = rollout(state, params, n_periods)
        com = logs.com.reshape(-1, 3)
        drift = jnp.linalg.norm(com[-1] - com[0])
        fell = (final.q[2] < 0.4).astype(com.dtype)
        return final, (drift, jnp.max(jnp.abs(logs.tau)), fell)

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
    if states0 is None:
        B = batch_params.v_cmd.shape[0]
        state0 = eng.init_state(model, cfg, batch_params.v_cmd.dtype)
        states0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), state0
        )
    batch_params = pmesh.shard_batch(mesh, batch_params)
    states0 = pmesh.shard_batch(mesh, states0)
    (final, _), stats = f(batch_params, states0)
    return final, stats
