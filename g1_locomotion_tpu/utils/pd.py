"""Standalone joint-space PD controller — bring-up utility.

Parity with the reference's ``PD_controller.py`` (SURVEY.md §2.1 row 7: a
per-joint PD used for bring-up, not part of the main pipeline). Used here for
the same purpose: settling a robot onto the ground before engaging the MPC
cascade (engine/mujoco_bridge.py) and as a baseline in experiments.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PDGains(NamedTuple):
    kp: jnp.ndarray  # (nj,) or scalar
    kd: jnp.ndarray  # (nj,) or scalar


def default_gains(dtype=jnp.float32) -> PDGains:
    # Conservative whole-body bring-up gains (reference PD_controller.py:16-31
    # uses per-joint values of this order).
    return PDGains(kp=jnp.asarray(300.0, dtype), kd=jnp.asarray(10.0, dtype))


def pd_torques(
    gains: PDGains,
    q_des: jnp.ndarray,
    q: jnp.ndarray,
    dq: jnp.ndarray,
    dq_des=0.0,
    tau_max=None,
) -> jnp.ndarray:
    """tau = Kp (q_des - q) + Kd (dq_des - dq), optionally clipped."""
    tau = gains.kp * (q_des - q) + gains.kd * (dq_des - dq)
    if tau_max is not None:
        tau = jnp.clip(tau, -tau_max, tau_max)
    return tau
