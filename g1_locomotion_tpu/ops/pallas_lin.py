"""Pallas TPU kernel for the recursive Cholesky-inverse base case.

The matmul-only SPD inverse (ops/lin.py) recurses down to (B, n<=30, n<=30)
base blocks. Under plain XLA those base blocks lower to ~60 sequential
(B, j)-shaped VPU ops whose natural layout puts the 30-wide matrix dimension
on the 128-lane axis — 77% of every vector register idles, and each tiny op
round-trips through HBM-adjacent layouts the fusion pass cannot always
eliminate (TODO round-2 item 5; SURVEY §2.2 wants the QP hot path "as Pallas
kernels").

This kernel flips the layout: the BATCH rides the 128-lane axis and the
matrix rows ride sublanes, so every unrolled Cholesky/substitution step is a
full-width VPU op over 128 independent QP instances:

    K (B, n, n)  ->  transpose (n, n, B)  ->  grid over B/128 lane-tiles
    per tile: K_tile (n, n, 128) in VMEM, fully unrolled in-register
    factor + forward substitution, one write of W = L^-1.

The recursion's combine steps (L21, Schur complement, W2 L21 W1) stay in XLA
— they are genuine batched matmuls and belong on the MXU.

Reference contract: the QP KKT solves this accelerates implement the
qpOASES/OSQP role of the reference's WBID/MPC solvers
(/root/reference/g1_mujoco_sim/src/wbid.py:184-227 solves per-tick QPs via
OpenSoT; the MPC node's solver is qpOASES per SURVEY §2.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 128  # batch elements per grid step (one full lane register)


def _chol_inv_kernel(k_ref, w_ref, *, n: int):
    """One lane-tile: W = L^-1 with K = L L' for 128 SPD matrices.

    k_ref/w_ref: (n, n, LANE_TILE) VMEM refs, batch on the lane axis.
    Fully unrolled (n is a trace-time constant <= 32): every step is an
    (rows, 128)-shaped VPU op with all 128 lanes doing useful work. All
    intermediate values are kept >= 2-D (TPU vector registers are
    sublane x lane tiles; 1-D values force degenerate layouts).
    """
    K = k_ref[:]  # (n, n, TB)
    dtype = K.dtype
    TB = K.shape[-1]

    # --- Cholesky factor, column-by-column (unrolled; j is static) ---------
    # L is stored as COLUMNS: L_cols[k][i] == L[i, k] (both loops below read
    # whole columns). Each column is an (n, TB) value.
    L_cols = [None] * n
    inv_d = [None] * n  # (1, TB) reciprocals of the diagonal
    for j in range(n):
        d = K[j, j : j + 1, :]  # (1, TB)
        for k in range(j):
            Lkj = L_cols[k][j : j + 1]
            d = d - Lkj * Lkj
        d = jnp.sqrt(jnp.maximum(d, jnp.asarray(1e-30, dtype)))
        rd = 1.0 / d
        inv_d[j] = rd
        parts = [jnp.zeros((j, TB), dtype), d] if j else [d]
        if j + 1 < n:
            s = K[j + 1 :, j, :]  # (n-j-1, TB)
            for k in range(j):
                s = s - L_cols[k][j + 1 :] * L_cols[k][j : j + 1]
            parts.append(s * rd)
        L_cols[j] = jnp.concatenate(parts, axis=0)  # (n, TB)

    # --- Forward substitution: W = L^-1 (unrolled) --------------------------
    # Row i of W: W[i, :] = (e_i - sum_{k<i} L[i,k] W[k, :]) / L[i,i].
    W_rows = [None] * n
    for i in range(n):
        acc = jnp.zeros((n, TB), dtype)
        for k in range(i):
            acc = acc + L_cols[k][i : i + 1] * W_rows[k]
        # e_i - acc without a scatter: splice the diagonal element. Mosaic
        # rejects zero-size vector slices, so the head/tail parts only exist
        # when nonempty.
        parts = []
        if i > 0:
            parts.append(-acc[:i])
        parts.append(1.0 - acc[i : i + 1])
        if i + 1 < n:
            parts.append(-acc[i + 1 :])
        row = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        W_rows[i] = row * inv_d[i]

    w_ref[:] = jnp.concatenate(
        [r[None] for r in W_rows], axis=0
    )  # (n, n, TB)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_inverse_base(K: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """W = L^-1 for batched SPD K (B, n, n), n <= 32 — Pallas TPU path.

    Drop-in replacement for ops.lin._chol_inv_base on the (B, n, n) layout.
    Pads B up to a multiple of 128 with identity matrices (their inverse is
    well-conditioned, so the padding lanes never produce inf/nan that could
    slow the VPU) and transposes batch onto the lane axis.
    """
    B, n, n2 = K.shape
    assert n == n2 and n <= 32, (n, "base kernel is for blocks <= 32")
    dtype = K.dtype

    Bp = ((B + LANE_TILE - 1) // LANE_TILE) * LANE_TILE
    if Bp != B:
        pad = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (Bp - B, n, n))
        K = jnp.concatenate([K, pad], axis=0)

    Kt = jnp.transpose(K, (1, 2, 0))  # (n, n, Bp) — batch on lanes

    out = pl.pallas_call(
        functools.partial(_chol_inv_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), dtype),
        grid=(Bp // LANE_TILE,),
        in_specs=[
            pl.BlockSpec(
                (n, n, LANE_TILE),
                lambda b: (0, 0, b),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (n, n, LANE_TILE), lambda b: (0, 0, b), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(Kt)

    W = jnp.transpose(out, (2, 0, 1))  # back to (Bp, n, n)
    return W[:B]


# ---------------------------------------------------------------------------
# Single-instance fused linear solve — the serving-latency kernel.
# ---------------------------------------------------------------------------
#
# Round-4 latency decomposition (tools/exp_latency_split.py, on-chip): the
# single N=10 MPC solve spends ~0.9 ms PER POLISH ROUND, almost all of it in
# ``spd_inverse(S)`` — a recursion of dozens of tiny XLA ops whose kernel
# launch overheads, not FLOPs, set the latency floor (the whole solve is
# ~4.5 MFLOP). The polish only needs S^{-1} @ rhs for ONE right-hand side,
# so this kernel fuses the entire solve — Gauss-Jordan elimination on the
# augmented [K | b] — into ONE Pallas launch: m fori_loop steps of full
# (m, m+1) VPU ops in VMEM. No pivoting: the polish systems are SPD +
# ridge regularization (diagonally positive), where unpivoted elimination
# is stable (equivalent to LDL^T).


def _gj_solve_kernel(aug_ref, x_ref, *, mp: int, n_lanes: int):
    """Eliminate the (mp, n_lanes) augmented system [K | b | pad] in place.

    Tile-aligned: mp is a multiple of 8 (sublanes), n_lanes of 128 (lanes);
    padded rows carry an identity diagonal so their elimination steps are
    no-ops. After mp steps the matrix part is diagonal and
    x = aug[:, mp] / diag (the b column sits at lane index mp).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (mp, n_lanes), 1)

    def body(j, _):
        aug = aug_ref[:]
        pivrow = aug_ref[pl.ds(j, 1), :]  # (1, n_lanes)
        # Pivot element / column j via masked full-width reductions (dynamic
        # lane slicing is slower than a masked sum on TPU).
        pivel = jnp.sum(
            jnp.where(cols[0:1] == j, pivrow, 0.0), axis=1, keepdims=True
        )  # (1, 1)
        colj = jnp.sum(
            jnp.where(cols == j, aug, 0.0), axis=1, keepdims=True
        )  # (mp, 1)
        f = colj / pivel
        f = jnp.where(rows == j, jnp.zeros_like(f), f)
        aug_ref[:] = aug - f * pivrow
        return 0

    jax.lax.fori_loop(0, mp, body, 0)
    aug = aug_ref[:]
    diag = jnp.sum(
        jnp.where(cols == rows, aug, 0.0), axis=1, keepdims=True
    )
    b_col = jnp.sum(
        jnp.where(cols == mp, aug, 0.0), axis=1, keepdims=True
    )
    x_ref[:] = jnp.broadcast_to(b_col / diag, x_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gj_solve(K: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """x = K^{-1} b for a single SPD system (m, m) — one fused TPU kernel.

    Built for single-robot serving latency (QPConfig.polish_kernel): the
    polish Schur solve under XLA is a recursion of dozens of tiny kernels
    whose launch overheads cost ~0.9 ms/round at B=1 (round-4 latency
    decomposition). Unpivoted Gauss-Jordan is stable on these SPD + ridge
    systems (equivalent to LDL^T). For batched throughput keep the
    matmul-recursive ``spd_inverse`` (MXU-bound, amortized over the batch).
    """
    m = K.shape[0]
    dtype = K.dtype
    mp = ((m + 7) // 8) * 8
    n_lanes = ((mp + 1 + 127) // 128) * 128
    # Padded augmented system: [K | b] with an identity diagonal on the
    # padding rows/cols (their pivots are 1, their eliminations no-ops).
    aug = jnp.zeros((mp, n_lanes), dtype)
    aug = aug.at[:m, :m].set(K)
    pad_idx = jnp.arange(m, mp)
    aug = aug.at[pad_idx, pad_idx].set(1.0)
    aug = aug.at[:m, mp].set(b)
    x = pl.pallas_call(
        functools.partial(_gj_solve_kernel, mp=mp, n_lanes=n_lanes),
        out_shape=jax.ShapeDtypeStruct((mp, 128), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(aug)
    return x[:m, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gj_inverse(K: jnp.ndarray, interpret: bool = False):
    """K^{-1} for a single SPD system (m, m) — one fused TPU kernel.

    Same elimination as :func:`gj_solve` on the augmented [K | I]: after mp
    steps the right block holds D^{-1}-scaled rows of the inverse. Used by
    the serving-latency QP path (QPConfig.polish_kernel) for the per-segment
    ADMM K-inverses and the polish Hr^{-1}, where the spd_inverse recursion's
    op-launch overheads dominate at B=1.
    """
    m = K.shape[0]
    dtype = K.dtype
    mp = ((m + 7) // 8) * 8
    n_lanes = ((2 * mp + 127) // 128) * 128
    aug = jnp.zeros((mp, n_lanes), dtype)
    aug = aug.at[:m, :m].set(K)
    pad_idx = jnp.arange(m, mp)
    aug = aug.at[pad_idx, pad_idx].set(1.0)
    aug = aug.at[:mp, mp : 2 * mp].set(jnp.eye(mp, dtype=dtype))

    def kernel(aug_ref, out_ref, *, mp: int, n_lanes: int):
        rows = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (mp, n_lanes), 1)

        def body(j, _):
            aug = aug_ref[:]
            pivrow = aug_ref[pl.ds(j, 1), :]
            pivel = jnp.sum(
                jnp.where(cols[0:1] == j, pivrow, 0.0), axis=1,
                keepdims=True,
            )
            colj = jnp.sum(
                jnp.where(cols == j, aug, 0.0), axis=1, keepdims=True
            )
            f = colj / pivel
            f = jnp.where(rows == j, jnp.zeros_like(f), f)
            aug_ref[:] = aug - f * pivrow
            return 0

        jax.lax.fori_loop(0, mp, body, 0)
        aug = aug_ref[:]
        diag = jnp.sum(
            jnp.where(cols == rows, aug, 0.0), axis=1, keepdims=True
        )
        out_ref[:] = aug[:, mp : 2 * mp] / diag

    out = pl.pallas_call(
        functools.partial(kernel, mp=mp, n_lanes=n_lanes),
        out_shape=jax.ShapeDtypeStruct((mp, mp), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(aug)
    return out[:m, :m]


# ---------------------------------------------------------------------------
# Single-instance fused ADMM iteration loop — the serving-latency kernel for
# the WHOLE solver loop, not just its inverses.
# ---------------------------------------------------------------------------
#
# With the Gauss-Jordan kernels above, the B=1 solve's remaining latency is
# the ADMM loop itself: each of the ~25-50 iterations is ~6 tiny XLA ops
# (two matvecs, one Kinv apply, clips) whose launch overheads dominate at
# these sizes (the WBID QP is n=41, m~60; the round-4 tick decomposition).
# This kernel runs the ENTIRE segment — `num` iterations of the relaxed
# ADMM update — inside one Pallas launch with K^{-1}, A, A^T and all
# vectors resident in VMEM. Matvecs ride the MXU at Precision.HIGHEST (the
# ill-conditioned QPs corrupt under reduced-precision passes, ops/qp.py).


def _admm_kernel(
    kinv_ref, a_ref, at_ref, q_ref, l_ref, u_ref, rho_ref,
    x_ref, z_ref, y_ref, xo_ref, zo_ref, yo_ref,
    *, num: int, sigma: float, alpha: float,
):
    Kinv = kinv_ref[:]   # (np, np), zero outside the live n x n block
    A = a_ref[:]         # (mp, np)
    AT = at_ref[:]       # (np, mp)
    qv = q_ref[:]        # (1, np)
    lv = l_ref[:]
    uv = u_ref[:]        # (1, mp)
    rho = rho_ref[:]     # (1, mp), padding lanes = 1 (never divide by 0)
    hi = jax.lax.Precision.HIGHEST

    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - qv + jnp.dot(rho * z - y, A, precision=hi)
        # kinv_ref holds Kinv^T, so rhs @ Kinv^T sums the exact same
        # products as the XLA path's Kinv @ rhs (GJ output is not exactly
        # symmetric in floating point — padding the transpose keeps the
        # two paths element-for-element identical).
        x_t = jnp.dot(rhs, Kinv, precision=hi)
        z_t = jnp.dot(x_t, AT, precision=hi)
        x_n = alpha * x_t + (1.0 - alpha) * x
        z_ax = alpha * z_t + (1.0 - alpha) * z
        z_n = jnp.clip(z_ax + y / rho, lv, uv)
        y_n = y + rho * (z_ax - z_n)
        return (x_n, z_n, y_n)

    x, z, y = jax.lax.fori_loop(
        0, num, body, (x_ref[:], z_ref[:], y_ref[:])
    )
    xo_ref[:] = x
    zo_ref[:] = z
    yo_ref[:] = y


@functools.partial(
    jax.jit, static_argnames=("num", "sigma", "alpha", "interpret")
)
def admm_iterate(
    Kinv: jnp.ndarray,   # (n, n) precomputed K^{-1} (SPD)
    A: jnp.ndarray,      # (m, n)
    q: jnp.ndarray,      # (n,)
    l: jnp.ndarray,      # (m,)
    u: jnp.ndarray,      # (m,)
    rho_vec: jnp.ndarray,  # (m,)
    x: jnp.ndarray,      # (n,)
    z: jnp.ndarray,      # (m,)
    y: jnp.ndarray,      # (m,)
    num: int,
    sigma: float,
    alpha: float,
    interpret: bool = False,
):
    """`num` relaxed-ADMM iterations for ONE QP in one fused TPU kernel.

    Matches the update of ops.qp._solve_qp_impl.iterate with a
    precomputed-inverse solver (the x-update runs as rhs @ Kinv^T, which
    sums the same products as Kinv @ rhs); returns (x, z, y). Runs at
    Precision.HIGHEST regardless of QPConfig.iter_precision (see the
    QPConfig field note). Zero padding keeps the
    dead lanes inert: padded rho is 1, padded l = u = 0, so padded z/y stay
    exactly 0 through every iteration.
    """
    m, n = A.shape
    dtype = A.dtype
    np_ = ((n + 127) // 128) * 128
    mp_ = ((m + 127) // 128) * 128

    def padm(M, r, c):
        out = jnp.zeros((r, c), dtype)
        return out.at[: M.shape[0], : M.shape[1]].set(M)

    def padv(v, c, fill=0.0):
        out = jnp.full((1, c), fill, dtype)
        return out.at[0, : v.shape[0]].set(v)

    outs = pl.pallas_call(
        functools.partial(
            _admm_kernel, num=num, sigma=float(sigma), alpha=float(alpha)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, np_), dtype),
            jax.ShapeDtypeStruct((1, mp_), dtype),
            jax.ShapeDtypeStruct((1, mp_), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(
        padm(Kinv.T, np_, np_), padm(A, mp_, np_), padm(A.T, np_, mp_),
        padv(q, np_), padv(l, mp_), padv(u, mp_), padv(rho_vec, mp_, 1.0),
        padv(x, np_), padv(z, mp_), padv(y, mp_),
    )
    return outs[0][0, :n], outs[1][0, :m], outs[2][0, :m]
