"""Strict-hierarchy iHQP: OpenSoT's multi-level ``/`` operator, TPU-style.

The reference composes its WBID stack as a single weighted sum (wbid.py:
167-182) — matched by :func:`stack.build_qp`. OpenSoT's ``iHQP`` additionally
supports strict priority levels (``stack1 / stack2``): lower levels may not
degrade the optimum achieved by higher levels. This module provides that
capability for the same task stack.

TPU design: the classical nullspace-projection cascade needs a dynamic-rank
basis per level — shape-dynamic, not jittable. Instead each level k is solved
as a full QP whose cost adds the previous levels' task rows PINNED to their
achieved values with a large weight ratio (``pin_ratio``):

    x_k* = argmin  sum_{i in level k} w_i ||A_i x - b_i||^2
                 + pin * sum_{j < k} w_j ||A_j x - (A_j x_{k-1}*)||^2
           s.t.   l <= C x <= u

This is lexicographic optimization to O(1/pin) accuracy with static shapes,
K sequential calls into the shared batched ADMM (ops/qp.py) — the same
solver-sharing the single-level path uses. Levels follow the OpenSoT
convention for this stack: 0 = feet (contact/swing), 1 = CoM/base/momentum/
wrench tracking, 2 = posture/regularization.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from g1_locomotion_tpu.models import dynamics as dyn
from g1_locomotion_tpu.models.robot import RobotModel
from g1_locomotion_tpu.ops import qp as qplib
from g1_locomotion_tpu.wbid.solver import WBIDSolution
from g1_locomotion_tpu.wbid.stack import NF, StackIndices, build_qp
from g1_locomotion_tpu.wbid.tasks import WBIDGains, WBIDReferences

N_LEVELS = 3
PIN_RATIO = 1e3   # lexicographic to ~0.1%
REG_QDD = 1e-2    # per-level qddot regularizer: keeps DOFs a
                  # given level's tasks barely observe (e.g. arms in the
                  # CoM/momentum level, where posture — a LOWER level — no
                  # longer competes) from being spent freely on marginal
                  # task improvements; the OpenSoT iHQP has the same
                  # per-level eps-regularization for the same reason
REG_F = 1e-8      # forces carry gravity (mg scale) — no meaningful pull

# The cascade is not a hot path (an offline / analysis capability — the
# reference's own stack runs single-level, wbid.py:224): solve each level
# tightly so pin values don't accumulate ADMM noise.
IHQP_QP = qplib.QPConfig(
    iters=150, scaling_iters=3, rho=0.1, rho_segments=4,
    matmul_inverse=False, polish_rounds=3,
)


def solve_ihqp(
    model: RobotModel,
    idx: StackIndices,
    cfg,
    gains: WBIDGains,
    q: jnp.ndarray,
    v: jnp.ndarray,
    refs: WBIDReferences,
    body_X=None,
) -> WBIDSolution:
    """Strict-hierarchy WBID solve (drop-in for :func:`wbid.solver.solve`)."""
    H, g, C, l, u, (M, h, Jc_T), (A_all, b_all, w_all, levels) = build_qp(
        model, idx, gains, q, v, refs, cfg.dt, body_X=body_X, with_blocks=True
    )
    dtype = q.dtype
    nx = A_all.shape[1]
    nv = model.nv

    x = jnp.zeros(nx, dtype)
    pri = jnp.zeros((), dtype)
    dua = jnp.zeros((), dtype)
    solved_mask = np.zeros(A_all.shape[0], dtype=bool)
    for k in range(N_LEVELS):
        lvl_mask = levels == k  # static numpy mask
        if not lvl_mask.any():
            continue
        # Current level at weight w; previous levels pinned to achieved values.
        w_k = jnp.where(jnp.asarray(lvl_mask), w_all, 0.0)
        w_pin = jnp.where(
            jnp.asarray(solved_mask), w_all * jnp.asarray(PIN_RATIO, dtype), 0.0
        )
        b_k = jnp.where(jnp.asarray(solved_mask), A_all @ x, b_all)
        w_tot = w_k + w_pin
        AW = A_all * w_tot[:, None]
        reg = jnp.concatenate(
            [jnp.full((nv,), REG_QDD, dtype), jnp.full((nx - nv,), REG_F, dtype)]
        )
        H_k = AW.T @ A_all + jnp.diag(reg)
        g_k = -(AW.T @ b_k)
        sol = qplib.solve_qp(H_k, g_k, C, l, u, cfg=IHQP_QP)
        x = sol.x
        pri = jnp.maximum(pri, sol.pri_res)
        dua = jnp.maximum(dua, sol.dua_res)
        solved_mask = solved_mask | lvl_mask

    qddot = x[:nv]
    forces = x[nv:].reshape(NF, 3)
    tau_full = dyn.rnea(model, q, v, qddot, body_X=body_X) - Jc_T @ x[nv:]
    tau_act = jnp.clip(tau_full[6:], -model.tau_max, model.tau_max)
    return WBIDSolution(
        qddot=qddot,
        forces=forces,
        tau=tau_act,
        base_wrench_res=tau_full[0:6],
        pri_res=pri,
        dua_res=dua,
    )
