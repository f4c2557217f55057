"""Whole-body contact plant: constrained forward dynamics in pure JAX.

This is the framework's physics stand-in for MuJoCo (the reference steps
``mujoco.mj_step`` at 1 kHz, ros_run_simulation.py:419): torque-driven
floating-base forward dynamics with the gait's active contact points pinned by
bilateral position constraints (a heel+toe point pair reproduces the foot's
*line* contact — rotation about the heel-toe line stays free, so lateral
tipping is physical). Solved as one KKT system per tick:

    [ M   J_aᵀ ] [ a ]   [ S tau - h          ]
    [ J_a  -eps ] [ -f ] = [ -Jdot v - stabilization ]

with Baumgarte stabilization driving contact-point drift to zero. Inactive
contacts are masked to identity rows (f = 0) keeping shapes static.

Caveat (validated in tests): bilateral pins can pull (f_z < 0) where a real
ground cannot — closed-loop tests assert normal forces stay positive, and
MuJoCo remains the host-side oracle for final validation.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from g1_locomotion_tpu.models import dynamics as dyn
from g1_locomotion_tpu.models import robot as rb
from g1_locomotion_tpu.models.robot import RobotModel
from g1_locomotion_tpu.wbid.stack import StackIndices, _frames_drift

NCP = 4  # contact points (L-heel, L-toe, R-heel, R-toe)


class PlantConfig(NamedTuple):
    dt: float = 0.001
    baumgarte_freq: float = 40.0  # rad/s of the stabilization dynamics
    kkt_reg: float = 1e-9


def constrained_step(
    model: RobotModel,
    idx: StackIndices,
    cfg: PlantConfig,
    q: jnp.ndarray,
    v: jnp.ndarray,
    tau: jnp.ndarray,          # (nj,) actuated torques (clipped to limits here)
    active: jnp.ndarray,       # (NCP,) 0/1 contact flags
    anchors: jnp.ndarray,      # (NCP, 3) world pin positions
    body_X=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One 1 kHz physics tick. Returns (q_next, v_next, contact_forces (NCP,3))."""
    dtype = q.dtype
    nv = model.nv

    tau = jnp.clip(tau, -model.tau_max, model.tau_max)
    if body_X is None:
        body_X = rb.fk(model, q)

    M = dyn.crba(model, q, body_X)
    h = dyn.bias_force(model, q, v, body_X=body_X)
    S_tau = jnp.concatenate([jnp.zeros(6, dtype), tau])

    # Per-contact jacobians, drifts (one shared jvp pass), position errors.
    w = 2.0 * cfg.baumgarte_freq
    w2 = cfg.baumgarte_freq**2
    drifts = _frames_drift(model, q, v, idx.contacts, rows=slice(0, 3))  # (12,)
    Js = []
    rhs_c = []
    for i, f in enumerate(idx.contacts):
        Jp = rb.frame_jacobian(model, q, body_X, f)[:3]
        p = rb.frame_pose(model, body_X, f).p
        e = p - anchors[i]
        rhs_c.append(-(drifts[3 * i : 3 * i + 3] + w * (Jp @ v) + w2 * e))
        Js.append(Jp)
    J = jnp.concatenate(Js, axis=0)           # (12, nv)
    b_c = jnp.concatenate(rhs_c)              # (12,)

    mask = jnp.repeat(active, 3)              # (12,)
    J_m = J * mask[:, None]
    b_m = b_c * mask

    nc = 3 * NCP
    K = jnp.zeros((nv + nc, nv + nc), dtype)
    K = K.at[:nv, :nv].set(M)
    K = K.at[:nv, nv:].set(J_m.T)
    K = K.at[nv:, :nv].set(J_m)
    # Inactive rows become lambda_i = 0; active rows get a tiny relaxation.
    # The relaxation must clear the dtype's epsilon: the heel+toe pin pairs
    # make the active block near-redundant, and an eps below f32 resolution
    # lets the LU go singular mid-rollout (observed: NaN q at ~tick 15 of an
    # f32 standing rollout; f64 is untouched at the configured 1e-9).
    reg = cfg.kkt_reg if dtype == jnp.float64 else max(cfg.kkt_reg, 1e-5)
    diag = jnp.where(mask > 0.5, -reg, -1.0)
    K = K.at[nv:, nv:].set(jnp.diag(diag))
    rhs = jnp.concatenate([S_tau - h, b_m])

    sol = jnp.linalg.solve(K, rhs)
    a = sol[:nv]
    forces = (-sol[nv:]).reshape(NCP, 3) * active[:, None]
    # NOTE K row convention: [J_m, -eps] [a; lam] = b with lam = -f  =>
    # contact force on the robot is f = -lam.

    v_next = v + cfg.dt * a
    # Keep post-fall dynamics finite: a toppled scenario in a sweep should
    # report as fallen, not poison the batch statistics with NaNs.
    v_next = jnp.clip(v_next, -100.0, 100.0)
    q_next = rb.integrate_q(model, q, v_next, cfg.dt)
    return q_next, v_next, forces


def anchors_from_state(
    model: RobotModel, idx: StackIndices, q: jnp.ndarray
) -> jnp.ndarray:
    body_X = rb.fk(model, q)
    return jnp.stack([rb.frame_pose(model, body_X, f).p for f in idx.contacts])
