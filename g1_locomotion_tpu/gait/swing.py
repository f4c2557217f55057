"""Swing-foot trajectory: sextic-z profile + sine-eased xy — closed-form in phase.

Reimplements the reference's ``SwingTrajectory`` (g1_mujoco_sim/src/
swing_trajectory.py) as pure functions of cycle progress, trivially vmappable:

* z(t): 6th-order polynomial through (start, mid = apex, end) with zero
  boundary velocity/acceleration except a -0.02 m/s terminal z-velocity for a
  firm touchdown (swing_trajectory.py:38-52).
* x,y(t): sine-eased phase covering 80% of the distance in the first half
  cycle, linear remainder (swing_trajectory.py:54-67).

The 7x7 Vandermonde-style system the reference solves per swing has a constant
matrix; its inverse is precomputed here at import time, so coefficient
computation is a single (7x7)@(7,) matvec on device.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

# Boundary conditions matrix for z(t) = sum c_k t^k, t in [0, 1]:
# rows: z(0), z'(0), z''(0), z(1/2), z(1), z'(1), z''(1)
_A = np.array(
    [
        [1, 0, 0, 0, 0, 0, 0],
        [0, 1, 0, 0, 0, 0, 0],
        [0, 0, 2, 0, 0, 0, 0],
        [1, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625],
        [1, 1, 1, 1, 1, 1, 1],
        [0, 1, 2, 3, 4, 5, 6],
        [0, 0, 2, 6, 12, 20, 30],
    ]
)
_A_INV = np.linalg.inv(_A)

TOUCHDOWN_ZVEL = -0.02  # m/s (swing_trajectory.py:50)
XY_FIRST_HALF_FRACTION = 0.80  # (swing_trajectory.py:58)


class SwingParams(NamedTuple):
    """One swing's boundary data (a pytree — vmappable over scenarios)."""

    p_start: jnp.ndarray  # (3,) lift-off position (world)
    p_end: jnp.ndarray    # (3,) landing position (world)
    z_apex: jnp.ndarray   # scalar apex height *above z=0 reference* (the
                          # reference passes max height directly as the mid
                          # waypoint, ros_run_simulation.py:294,307)


def z_coefficients(params: SwingParams) -> jnp.ndarray:
    b = jnp.stack(
        [
            params.p_start[2],
            jnp.zeros_like(params.z_apex),
            jnp.zeros_like(params.z_apex),
            params.z_apex,
            params.p_end[2],
            jnp.asarray(TOUCHDOWN_ZVEL, params.p_start.dtype),
            jnp.zeros_like(params.z_apex),
        ]
    )
    return jnp.asarray(_A_INV, params.p_start.dtype) @ b


def xy_phase(s: jnp.ndarray) -> jnp.ndarray:
    """Sine-eased progress: 80% of distance in first half-cycle, linear rest."""
    first = XY_FIRST_HALF_FRACTION * jnp.sin(jnp.pi * s)
    second = XY_FIRST_HALF_FRACTION + (s - 0.5) * (1 - XY_FIRST_HALF_FRACTION) * 2.0
    return jnp.where(s <= 0.5, first, second)


def xy_phase_rate(s: jnp.ndarray) -> jnp.ndarray:
    """d(phase)/ds for velocity feedforward."""
    first = XY_FIRST_HALF_FRACTION * jnp.pi * jnp.cos(jnp.pi * s)
    second = jnp.full_like(s, (1 - XY_FIRST_HALF_FRACTION) * 2.0)
    return jnp.where(s <= 0.5, first, second)


def xy_phase_accel(s: jnp.ndarray) -> jnp.ndarray:
    """d2(phase)/ds2 — the xy acceleration profile of the sine-eased swing
    (zero in the linear second half). Drives the swing-limb momentum preview
    (gait/planner.py hdot_geom): the lateral foot acceleration is the
    dominant unmodeled angular-momentum rate of the SRBD."""
    first = -XY_FIRST_HALF_FRACTION * jnp.pi**2 * jnp.sin(jnp.pi * s)
    return jnp.where(s <= 0.5, first, jnp.zeros_like(s))


def evaluate(
    params: SwingParams, s: jnp.ndarray, swing_duration
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(position, velocity, acceleration) of the swing foot at cycle progress
    s in [0,1]. Velocities/accelerations are in world units (divided by the
    swing duration), matching the feedforward the reference sends to the WBID
    swing task (ros_run_simulation.py:250-262: z only; xy velocity is zeroed
    there, we provide it for completeness but the engine mirrors the reference).
    """
    dtype = params.p_start.dtype
    s = jnp.clip(s, 0.0, 1.0)
    coeff = z_coefficients(params)
    powers = jnp.stack([s**k for k in range(7)])
    dpowers = jnp.stack(
        [jnp.zeros_like(s)] + [k * s ** (k - 1) for k in range(1, 7)]
    )
    ddpowers = jnp.stack(
        [jnp.zeros_like(s), jnp.zeros_like(s)]
        + [k * (k - 1) * s ** (k - 2) for k in range(2, 7)]
    )
    z = coeff @ powers
    dz = (coeff @ dpowers) / swing_duration
    ddz = (coeff @ ddpowers) / swing_duration**2

    ph = xy_phase(s)
    dph = xy_phase_rate(s) / swing_duration
    ddph = xy_phase_accel(s) / swing_duration**2
    xy = (1 - ph) * params.p_start[:2] + ph * params.p_end[:2]
    dxy = dph * (params.p_end[:2] - params.p_start[:2])
    ddxy = ddph * (params.p_end[:2] - params.p_start[:2])

    pos = jnp.concatenate([xy, z[None]])
    vel = jnp.concatenate([dxy, dz[None]])
    acc = jnp.concatenate([ddxy, ddz[None]])
    return pos, vel, acc
