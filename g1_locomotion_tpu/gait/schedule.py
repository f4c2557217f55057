"""Phase-based gait schedule: contact flags over the MPC horizon.

TPU-native replacement for the gait scheduler inside the reference's C++
``mpc_to_wbid_node`` (SURVEY.md §2.3: the node advances a walking schedule and
publishes per-contact ``active`` flags that the sim consumes as the
contact-switching signal, ros_run_simulation.py:214-216). Here the schedule is
a pure function of time — vmappable over scenarios with different timings.

Cycle structure (walking): a period T with two single-support swings and two
double-support intervals:

    [DS][left-swing][DS][right-swing]   (fractions configurable)

Contact order matches the reference: [L-heel, L-toe, R-heel, R-toe]
(ros_run_simulation.py:65).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class GaitConfig(NamedTuple):
    """Gait timing (a pytree of scalars — randomizable per scenario)."""

    swing_duration: jnp.ndarray  # s (reference: 0.25, ros_run_simulation.py:148)
    double_support_duration: jnp.ndarray  # s between swings
    start_time: jnp.ndarray  # gait starts after an initial stand phase
    n_steps: jnp.ndarray  # total number of steps before standing again


def default_gait(dtype=jnp.float32) -> GaitConfig:
    return GaitConfig(
        swing_duration=jnp.asarray(0.25, dtype),
        double_support_duration=jnp.asarray(0.25, dtype),
        start_time=jnp.asarray(0.5, dtype),
        n_steps=jnp.asarray(8, dtype),
    )


def cycle_period(cfg: GaitConfig) -> jnp.ndarray:
    return 2.0 * (cfg.swing_duration + cfg.double_support_duration)


def phase_info(cfg: GaitConfig, t: jnp.ndarray):
    """Decompose time into (step_index, in_swing, swing_is_left, swing_progress).

    Steps alternate: even step index -> left foot swings (right stance) — the
    walking-demo convention. Before start_time and after n_steps, both feet
    stand (double support).
    """
    half = cfg.swing_duration + cfg.double_support_duration  # one step
    tau = t - cfg.start_time
    step_idx = jnp.floor(tau / half)
    in_gait = (tau >= 0.0) & (step_idx < cfg.n_steps)
    t_in_step = tau - step_idx * half
    # Each step: [DS (ds_dur)][swing (swing_dur)]
    in_swing = in_gait & (t_in_step >= cfg.double_support_duration)
    progress = jnp.clip(
        (t_in_step - cfg.double_support_duration) / cfg.swing_duration, 0.0, 1.0
    )
    swing_is_left = jnp.mod(step_idx, 2.0) < 0.5
    return step_idx, in_swing, swing_is_left, progress


def contact_flags(cfg: GaitConfig, t: jnp.ndarray) -> jnp.ndarray:
    """(4,) flags [L-heel, L-toe, R-heel, R-toe] at time t."""
    _, in_swing, swing_is_left, _ = phase_info(cfg, t)
    left_up = in_swing & swing_is_left
    right_up = in_swing & ~swing_is_left
    left = jnp.where(left_up, 0.0, 1.0)
    right = jnp.where(right_up, 0.0, 1.0)
    return jnp.stack([left, left, right, right]).astype(jnp.result_type(t, jnp.float32))


def contact_horizon(
    cfg: GaitConfig, t: jnp.ndarray, horizon: int, dt_mpc: float
) -> jnp.ndarray:
    """(N, 4) contact flags over the MPC horizon starting at t."""
    ts = t + dt_mpc * jnp.arange(horizon, dtype=jnp.result_type(t, jnp.float32))
    import jax

    return jax.vmap(lambda tk: contact_flags(cfg, tk))(ts)
