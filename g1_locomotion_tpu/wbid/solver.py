"""WBID solve + inverse-dynamics torque extraction.

The per-tick flow mirrors the reference (SURVEY.md §2.4): updateModel ->
setReference -> solveQP -> getInverseDynamics (wbid.py:227-324), fused into one
pure function. Torques: tau = RNEA(q, dq, qddot) - sum_i Jc_i^T f_i, actuated
part tau[6:] to the motors (wbid.py:316-324, ros_run_simulation.py:413-417).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from g1_locomotion_tpu.models import dynamics as dyn
from g1_locomotion_tpu.models.robot import RobotModel
from g1_locomotion_tpu.ops import qp as qplib
from g1_locomotion_tpu.wbid.stack import NF, NX_F, StackIndices, build_qp
from g1_locomotion_tpu.wbid.tasks import WBIDGains, WBIDReferences


class WBIDConfig(NamedTuple):
    dt: float = 0.001  # control tick (ros_run_simulation.py:172)
    qp: qplib.QPConfig = qplib.QPConfig(
        iters=50, scaling_iters=3, rho=0.1, rho_segments=2
    )
    # OpenSoT-style strict priority levels (the ``/`` operator) instead of
    # the reference's single weighted sum (wbid.py:167-182): feet / motion /
    # posture solved as a lexicographic cascade (wbid/ihqp.py). ~3x the QP
    # cost; the production engine keeps the weighted sum.
    strict_hierarchy: bool = False
    # Op-count-lean task-stack assembly (stack.build_qp fast=True): batched
    # multi-frame Jacobians, A_G-based momentum, template constraint rows —
    # mathematically identical blocks, ~5x fewer XLA ops. The B=1 serving
    # tick is op-launch-bound in the assembly (round-5 decomposition:
    # build_qp 1.38 ms of the 1.59 ms tick), so this is the serving-latency
    # lever; default OFF to keep the validated walking bundles' op schedule
    # bit-identical (closed-loop walking is chaotic at the ulp level,
    # CLAUDE.md).
    fast_stack: bool = False


class WBIDSolution(NamedTuple):
    qddot: jnp.ndarray          # (nv,)
    forces: jnp.ndarray         # (NF, 3) contact forces
    tau: jnp.ndarray            # (nj,) actuated torques
    base_wrench_res: jnp.ndarray  # (6,) dynamic-feasibility residual (~0)
    pri_res: jnp.ndarray
    dua_res: jnp.ndarray


def solve(
    model: RobotModel,
    idx: StackIndices,
    cfg: WBIDConfig,
    gains: WBIDGains,
    q: jnp.ndarray,
    v: jnp.ndarray,
    refs: WBIDReferences,
    body_X=None,
) -> WBIDSolution:
    if cfg.strict_hierarchy:
        from g1_locomotion_tpu.wbid.ihqp import solve_ihqp

        return solve_ihqp(model, idx, cfg, gains, q, v, refs, body_X=body_X)
    H, g, C, l, u, (M, h, Jc_T) = build_qp(
        model, idx, gains, q, v, refs, cfg.dt, body_X=body_X,
        fast=cfg.fast_stack,
    )
    sol = qplib.solve_qp(H, g, C, l, u, cfg=cfg.qp)

    nv = model.nv
    qddot = sol.x[:nv]
    forces = sol.x[nv:].reshape(NF, 3)

    # tau = RNEA(q, v, qddot) - Jc^T f (wbid.py:316-324). Clipped to the
    # actuator limits: the QP's torque rows hold within ADMM tolerance
    # (~0.5 N.m worst-case slack on ~20 of 6500 walking ticks), and a real
    # motor saturates at the limit — same clip the MuJoCo bridge applies.
    tau_full = dyn.rnea(model, q, v, qddot, body_X=body_X) - Jc_T @ sol.x[nv:]
    base_res = tau_full[0:6]
    tau_act = jnp.clip(tau_full[6:], -model.tau_max, model.tau_max)
    return WBIDSolution(
        qddot=qddot,
        forces=forces,
        tau=tau_act,
        base_wrench_res=base_res,
        pri_res=sol.pri_res,
        dua_res=sol.dua_res,
    )
