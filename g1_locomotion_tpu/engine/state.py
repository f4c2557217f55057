"""Whole-body and SRBD state containers + canonical initial configurations.

The standing configuration reproduces the reference's ``q_init``
(g1_mujoco_sim/src/config.py:2-39: base z = 0.793 - 0.113 = 0.68, hips -0.6,
knees 1.2, ankles -0.6) translated into this framework's scalar-first
quaternion layout.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from g1_locomotion_tpu.models.robot import RobotModel

# Joint-name -> standing angle; everything else zero.
_STAND_ANGLES = {
    "left_hip_pitch_joint": -0.6,
    "left_knee_joint": 1.2,
    "left_ankle_pitch_joint": -0.6,
    "right_hip_pitch_joint": -0.6,
    "right_knee_joint": 1.2,
    "right_ankle_pitch_joint": -0.6,
}

_STAND_BASE_Z = 0.793 - 0.113  # = 0.68, reference config.py:6


def q_init_standing(model: RobotModel, dtype=None) -> jnp.ndarray:
    """q = [pos(3), quat wxyz(4), joints(nj)] standing pose."""
    dtype = dtype or model.mass.dtype
    qj = [_STAND_ANGLES.get(name, 0.0) for name in model.joint_names]
    return jnp.array(
        [0.0, 0.0, _STAND_BASE_Z, 1.0, 0.0, 0.0, 0.0] + qj, dtype=dtype
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WholeBodyState:
    """Full robot state: configuration + generalized velocity (model layout)."""

    q: jnp.ndarray  # (nq,)
    v: jnp.ndarray  # (nv,)


def standing_state(model: RobotModel, dtype=None) -> WholeBodyState:
    q = q_init_standing(model, dtype)
    return WholeBodyState(q=q, v=jnp.zeros(model.nv, dtype=q.dtype))
