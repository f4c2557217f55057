"""Footstep planning: landing positions for the swing foot.

TPU-native equivalent of the footstep planner inside the reference's
``mpc_to_wbid_node`` (SURVEY.md §2.3: the node publishes ``landing_position``,
consumed at ros_run_simulation.py:218). Two planners:

* :func:`fixed_plan` — the walking-demo behavior (BASELINE.json config 1):
  a straight-line forward plan with constant step length.
* :func:`raibert` — velocity-tracking heuristic for commanded velocities
  (the domain-randomization sweeps command arbitrary velocities).

Both are pure functions -> vmappable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FootstepConfig(NamedTuple):
    step_length: jnp.ndarray   # m forward per step
    step_width: jnp.ndarray    # lateral half-distance between feet (y offset)
    raibert_gain: jnp.ndarray  # feedback gain on velocity error (raibert())
    dcm_scale: jnp.ndarray     # lateral-placement feedback gain on the
                               # predicted-vs-nominal touchdown DCM error
                               # (gait/schedule.predict_touchdown_dcm;
                               # 1 = deadbeat, 0 = fixed plan)
    dcm_scale_x: jnp.ndarray = jnp.nan  # sagittal-placement gain; NaN
                               # (default) = follow dcm_scale. Split knob:
                               # the slow-gait envelope needs damped LATERAL
                               # placement (over-stepping at small nominal
                               # steps) with full sagittal capture (round-3
                               # sweep: dcm 0.8 both-axes is stable at
                               # 0.05 m/s but walks in place)
    final_widen: jnp.ndarray = 0.0  # terminal stance widening [m]: the last
                               # TWO landings of the gait go this much
                               # further outboard, so the walk tail and the
                               # settle stand on a wider support base while
                               # the gait itself keeps its nominal geometry
                               # (the human terminal-capture strategy).
                               # 0 = disabled (flagship default).
    dcm_err_gain: jnp.ndarray = 0.0  # state-scheduled lateral DCM gain
                               # [1/m]: the effective placement gain becomes
                               # dcm_scale + dcm_err_gain*|xi_pred - xi_nom|
                               # — ON the periodic orbit (error ~ 0) the
                               # feedback slope is exactly dcm_scale (the
                               # validated behavior is preserved), while a
                               # large transfer miss steps PROPORTIONALLY
                               # harder. Round-5 lever against the
                               # point-like dcm_scale knife edge
                               # (docs/ROBUSTNESS.md): the fixed gain must
                               # trade on-orbit smoothness against capture
                               # authority; the schedule decouples them.
                               # 0 = disabled (bit-neutral).
    dcm_corr_max: jnp.ndarray = 1.0  # cap [m] on the scheduled lateral DCM
                               # correction (safety for the schedule; the
                               # 1 m default never binds — the separation
                               # clip is tighter).


def default_footsteps(dtype=jnp.float32) -> FootstepConfig:
    return FootstepConfig(
        step_length=jnp.asarray(0.10, dtype),
        step_width=jnp.asarray(0.12, dtype),
        raibert_gain=jnp.asarray(0.03, dtype),
        dcm_scale=jnp.asarray(1.0, dtype),
        dcm_scale_x=jnp.asarray(jnp.nan, dtype),
        final_widen=jnp.asarray(0.0, dtype),
        dcm_err_gain=jnp.asarray(0.0, dtype),
        dcm_corr_max=jnp.asarray(1.0, dtype),
    )


def dcm_scale_sagittal(cfg: FootstepConfig) -> jnp.ndarray:
    """Sagittal DCM-placement gain: dcm_scale_x, or dcm_scale where NaN."""
    return jnp.where(
        jnp.isnan(cfg.dcm_scale_x), cfg.dcm_scale, cfg.dcm_scale_x
    )


def fixed_plan(
    cfg: FootstepConfig,
    step_idx: jnp.ndarray,
    swing_is_left: jnp.ndarray,
    x0_foot: jnp.ndarray,  # (2,) initial foot x,y at gait start (per side)
) -> jnp.ndarray:
    """Landing (x, y, z=0) for the given step of a straight-line walk.

    Step k advances the swinging foot to ``start + (k//2 + 1) * step_length``
    so feet leapfrog forward alternately.
    """
    advance = (jnp.floor(step_idx / 2.0) + 1.0) * cfg.step_length
    x = x0_foot[0] + advance
    y = jnp.where(swing_is_left, cfg.step_width, -cfg.step_width)
    return jnp.stack([x, y, jnp.zeros_like(x)])


def raibert(
    cfg: FootstepConfig,
    com_pos: jnp.ndarray,     # (3,)
    com_vel: jnp.ndarray,     # (3,)
    v_cmd: jnp.ndarray,       # (2,) commanded planar velocity
    swing_is_left: jnp.ndarray,
    stance_duration: jnp.ndarray,
) -> jnp.ndarray:
    """Raibert touchdown: p = p_com + v*T/2 + k*(v - v_cmd), lateral offset."""
    p_xy = (
        com_pos[:2]
        + com_vel[:2] * (stance_duration / 2.0)
        + cfg.raibert_gain * (com_vel[:2] - v_cmd)
    )
    y_off = jnp.where(swing_is_left, cfg.step_width, -cfg.step_width)
    return jnp.stack([p_xy[0], p_xy[1] + y_off, jnp.zeros_like(p_xy[0])])
