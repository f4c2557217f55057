"""Typed message contracts — the g1_msgs equivalents as JAX pytrees.

The reference serializes four ROS message types over TCPROS
(g1_msgs/msg/*.msg; SURVEY.md §2.1 row 8): ``State`` (13-dim SRBD state),
``ContactPoint`` (name/position/force/active), ``SRBD_state`` (horizon of
states + contacts + landing position) and ``Feet_reference``. In the TPU-native
design these cross no wire on the common path — they are plain pytree
dataclasses passed between jitted stages — but the *shapes and semantics* are
preserved so reference-side tooling/logs can be converted losslessly.

Field-order conventions match the reference exactly:
* SRBD state vector layout per State.msg / callback_mpc_solution
  (ros_run_simulation.py:198-211): orientation(rpy), position, angular_velocity,
  linear_velocity, gravity.
* Contact order: L-heel, L-toe, R-heel, R-toe (ros_run_simulation.py:65).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

CONTACT_NAMES: Tuple[str, ...] = (
    "left_foot_line_contact_lower",
    "left_foot_line_contact_upper",
    "right_foot_line_contact_lower",
    "right_foot_line_contact_upper",
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class State:
    """g1_msgs/State — one 13-dim SRBD state sample."""

    orientation: jnp.ndarray      # (3,) rpy [rad]
    position: jnp.ndarray         # (3,) CoM [m]
    angular_velocity: jnp.ndarray # (3,) [rad/s]
    linear_velocity: jnp.ndarray  # (3,) [m/s]
    gravity: jnp.ndarray          # scalar [m/s^2], -9.80665

    def to_vector(self) -> jnp.ndarray:
        """Pack into the 13-vector layout of SURVEY.md §2.3."""
        return jnp.concatenate(
            [
                self.orientation,
                self.position,
                self.angular_velocity,
                self.linear_velocity,
                jnp.atleast_1d(self.gravity),
            ]
        )

    @staticmethod
    def from_vector(x: jnp.ndarray) -> "State":
        return State(
            orientation=x[0:3],
            position=x[3:6],
            angular_velocity=x[6:9],
            linear_velocity=x[9:12],
            gravity=x[12],
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ContactPoint:
    """g1_msgs/ContactPoint — position + force + active flag (name is static
    by index, CONTACT_NAMES)."""

    position: jnp.ndarray  # (3,)
    force: jnp.ndarray     # (3,)
    active: jnp.ndarray    # scalar 0/1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SRBDState:
    """g1_msgs/SRBD_state — the /srbd_current and /mpc_solution payload."""

    states_horizon: jnp.ndarray    # (H, 13) stacked State vectors
    contact_positions: jnp.ndarray # (4, 3)
    contact_forces: jnp.ndarray    # (4, 3)
    contact_active: jnp.ndarray    # (4,)
    landing_position: jnp.ndarray  # (3,)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FeetReference:
    """g1_msgs/Feet_reference — left/right foot position references."""

    left: jnp.ndarray   # (3,)
    right: jnp.ndarray  # (3,)


def srbd_current_from_engine(model, q, v, forces, body_X=None) -> SRBDState:
    """Build the /srbd_current message content from the engine state — the
    publish_current_state analogue (ros_run_simulation.py:21-79)."""
    from g1_locomotion_tpu.engine.tick import srbd_state_from_wholebody
    from g1_locomotion_tpu.models import robot as rb
    from g1_locomotion_tpu.wbid.stack import StackIndices

    if body_X is None:
        body_X = rb.fk(model, q)
    idx = StackIndices.from_model(model)
    x = srbd_state_from_wholebody(model, q, v, body_X)
    cpos = jnp.stack([rb.frame_pose(model, body_X, f).p for f in idx.contacts])
    return SRBDState(
        states_horizon=x[None, :],
        contact_positions=cpos,
        contact_forces=jnp.asarray(forces).reshape(4, 3),
        contact_active=jnp.ones(4, x.dtype),
        landing_position=jnp.zeros(3, x.dtype),
    )
