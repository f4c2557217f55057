"""Batched dense QP solver (OSQP-style ADMM) — pure JAX, jit/vmap-native.

This is the TPU-native replacement for the reference's per-tick CPU QP solves:
qpOASES/OSQP inside the SRBD MPC node (SURVEY.md §2.3, BASELINE.json) and
eiQuadProg/qpOASES behind OpenSoT's iHQP for WBID (reference wbid.py:224).
One solver serves both problems; thousands of instances run per chip via
``vmap``, and the factorization/back-substitution matmuls map onto the MXU.

Problem form (OSQP):
    min  0.5 xᵀ P x + qᵀ x    s.t.  l <= A x <= u

Design for XLA:
* Fixed iteration count (static shapes, no data-dependent control flow).
* One Cholesky factorization of K = P + sigma*I + Aᵀ diag(rho) A per solve;
  each iteration is two triangular solves + matvecs -> batched MXU work.
* Per-row rho: equality rows (l == u) get a stiffer penalty, as in OSQP.
* Optional Ruiz equilibration (fixed sweeps) for conditioning under contact
  switching (SURVEY.md §7 "hard parts").
* Optional polish step: active-set detection + one masked KKT solve to push
  KKT residuals to ~machine precision while keeping static shapes.

All functions are single-problem; wrap in ``jax.vmap`` for batching (see
``solve_batch``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from g1_locomotion_tpu.ops.lin import spd_inverse


class QPSolution(NamedTuple):
    x: jnp.ndarray  # (n,) primal
    z: jnp.ndarray  # (m,) projected constraint values
    y: jnp.ndarray  # (m,) dual
    pri_res: jnp.ndarray  # scalar ||Ax - z||_inf
    dua_res: jnp.ndarray  # scalar ||Px + q + A'y||_inf


class QPConfig(NamedTuple):
    iters: int = 60
    rho: float = 0.1
    rho_eq_scale: float = 1e3
    sigma: float = 1e-6
    alpha: float = 1.6
    scaling_iters: int = 5  # Ruiz sweeps (0 = off)
    polish: bool = True
    polish_reg: float = 1e-9
    rho_segments: int = 4  # spectral rho updates + refactor between segments
    matmul_inverse: bool = True  # matmul-only SPD inverse instead of Cholesky
    # (XLA's batched cholesky/trisolve are sequential and 40-230 ms per
    # batched call on TPU; the recursive Schur inverse is MXU-bound)
    polish_rounds: int = 3  # active-set re-detection rounds (1 = cheapest)
    polish_refine: int = 0  # iterative-refinement passes on the polish KKT
    # solve (LU path only): x += K^-1 (rhs - K x), reusing the factors.
    # Buys ~1 digit of f32 accuracy per pass on the ill-conditioned walking
    # KKTs — the f32/TPU knife-edge mitigation (round-3: the f64-validated
    # walk falls at plain f32 on-chip).
    polish_kernel: bool = False  # single-instance serving-latency path: the
    # polish KKT Schur solve runs as ONE fused Pallas Gauss-Jordan kernel
    # (ops/pallas_lin.gj_solve) instead of the spd_inverse recursion —
    # round-4 decomposition: each polish round costs ~0.9 ms of op-launch
    # overhead at B=1, ~all of the single-solve latency-budget miss. Only
    # for unbatched (B=1) serving on TPU; batched throughput keeps the
    # MXU-amortized inverse. Matmul path only.
    iter_precision: str = "highest"  # matmul precision for the ADMM iteration
    # loop only (factorization/polish always run at highest). NOTE: ignored
    # when polish_kernel=True — the fused Pallas ADMM kernel runs HIGHEST
    # only (its matvecs are launch-bound at B=1, so there is nothing to buy
    # with reduced precision there). TPU f32
    # "highest" = 6 bf16 MXU passes; "high" = 3 passes. Profiling (round 2)
    # showed the iteration matvecs at highest precision are ~78% of the MPC
    # solve; the iterations only need to land in the right active-set basin —
    # the polish's exact masked KKT solve at highest precision restores
    # full accuracy.


def _inf_norm(v):
    return jnp.max(jnp.abs(v))


BIG = 1e20  # sentinel for +-infinity bounds


def _ruiz_equilibrate(P, q, A, l, u, iters: int):
    """Modified Ruiz equilibration on the stacked KKT matrix [[P, Aᵀ], [A, 0]].

    Returns scaled (P, q, A, l, u) and the diagonal scalings (d, e, c) with
    x = d * x_scaled, y = c⁻¹ e * y_scaled... (we only need to unscale at the
    end: x* = d ⊙ x̂, y* = (e ⊙ ŷ) / c).
    """
    n, m = P.shape[0], A.shape[0]
    d = jnp.ones(n, P.dtype)
    e = jnp.ones(m, P.dtype)
    c = jnp.asarray(1.0, P.dtype)
    # Track (un)bounded rows so scaling can't overflow the +-BIG sentinels
    # (critical in float32, where repeated row scalings of 1e20 reach inf).
    l_unb = l < -0.5 * BIG
    u_unb = u > 0.5 * BIG
    # OSQP-style clamps keep repeated sweeps from overflowing float32.
    MIN_S, MAX_S = 1e-4, 1e4
    for _ in range(iters):
        # Column norms of the scaled KKT blocks.
        Pn = jnp.max(jnp.abs(P), axis=0)
        An = jnp.max(jnp.abs(A), axis=0)  # (n,)
        ATn = jnp.max(jnp.abs(A), axis=1)  # (m,)
        # All-zero rows/columns (e.g. padding rows for inactive contacts) must
        # stay unscaled, or e/d diverge to inf across sweeps (0*inf = NaN).
        col_norm = jnp.maximum(Pn, An)
        delta_d = jnp.where(
            col_norm > 1e-12,
            jnp.clip(1.0 / jnp.sqrt(jnp.maximum(col_norm, 1e-12)), MIN_S, MAX_S),
            1.0,
        )
        delta_e = jnp.where(
            ATn > 1e-12,
            jnp.clip(1.0 / jnp.sqrt(jnp.maximum(ATn, 1e-12)), MIN_S, MAX_S),
            1.0,
        )
        P = P * delta_d[:, None] * delta_d[None, :]
        q = q * delta_d
        A = A * delta_e[:, None] * delta_d[None, :]
        d = d * delta_d
        e = e * delta_e
        # Cost scaling.
        gamma = jnp.clip(
            1.0
            / jnp.maximum(
                jnp.maximum(jnp.mean(jnp.max(jnp.abs(P), axis=0)), _inf_norm(q)), 1e-12
            ),
            MIN_S,
            MAX_S,
        )
        P = P * gamma
        q = q * gamma
        c = c * gamma
    l = jnp.where(l_unb, -BIG, e * jnp.where(l_unb, 0.0, l))
    u = jnp.where(u_unb, BIG, e * jnp.where(u_unb, 0.0, u))
    return P, q, A, l, u, d, e, c


def _build_K(P, A, rho_vec, sigma):
    return (
        P
        + sigma * jnp.eye(P.shape[0], dtype=P.dtype)
        + (A.T * rho_vec[None, :]) @ A
    )


def _make_solver(K, matmul_inverse: bool, polish_kernel: bool = False):
    """Return a solve(rhs) closure: precomputed matmul inverse (TPU fast
    path) or Cholesky factorization (reference path). polish_kernel routes
    the inverse through the single-instance fused Gauss-Jordan kernel
    (serving-latency path, B=1)."""
    if matmul_inverse:
        if polish_kernel:
            from g1_locomotion_tpu.ops.pallas_lin import gj_inverse

            Kinv = gj_inverse(K)
        else:
            Kinv = spd_inverse(K)
        return lambda b: Kinv @ b
    L = jnp.linalg.cholesky(K)

    def solve(b):
        w = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, w, lower=False)

    return solve


def solve_qp(
    P: jnp.ndarray,
    q: jnp.ndarray,
    A: jnp.ndarray,
    l: jnp.ndarray,
    u: jnp.ndarray,
    cfg: QPConfig = QPConfig(),
    x0: Optional[jnp.ndarray] = None,
    y0: Optional[jnp.ndarray] = None,
) -> QPSolution:
    """Solve one dense QP. All shapes static; safe under jit/vmap/scan."""
    # ADMM convergence is precision-sensitive: on TPU, default f32 matmuls use
    # reduced-precision passes that stall the iteration — force full precision
    # for the solver's linear algebra (the arrays stay f32; only the MXU
    # accumulation mode changes).
    with jax.default_matmul_precision("highest"):
        return _solve_qp_impl(P, q, A, l, u, cfg, x0, y0)


def _solve_qp_impl(P, q, A, l, u, cfg, x0, y0) -> QPSolution:
    n = P.shape[0]
    m = A.shape[0]
    dtype = P.dtype

    if cfg.scaling_iters > 0:
        P_s, q_s, A_s, l_s, u_s, d, e, c = _ruiz_equilibrate(
            P, q, A, l, u, cfg.scaling_iters
        )
    else:
        P_s, q_s, A_s, l_s, u_s = P, q, A, l, u
        d = jnp.ones(n, dtype)
        e = jnp.ones(m, dtype)
        c = jnp.asarray(1.0, dtype)

    is_eq = jnp.abs(u_s - l_s) < 1e-12
    # rho must track the cost scaling c (the scaled objective is c·(...)): an
    # unscaled rho is off by 1/c relative to the curvature and stalls ADMM.
    rho_vec = (c * jnp.where(is_eq, cfg.rho * cfg.rho_eq_scale, cfg.rho)).astype(
        dtype
    )

    # Scaled variables: x̂ = x/d, ŷ = c·y/e (inverse of the unscaling below).
    x = jnp.zeros(n, dtype) if x0 is None else x0 / d
    z = A_s @ x
    y = jnp.zeros(m, dtype) if y0 is None else y0 * c / e

    def iterate(carry, solve, rho_vec, num):
        def body(_, carry):
            x, z, y = carry
            rhs = cfg.sigma * x - q_s + A_s.T @ (rho_vec * z - y)
            x_t = solve(rhs)
            z_t = A_s @ x_t
            x_n = cfg.alpha * x_t + (1 - cfg.alpha) * x
            z_ax = cfg.alpha * z_t + (1 - cfg.alpha) * z
            z_n = jnp.clip(z_ax + y / rho_vec, l_s, u_s)
            y_n = y + rho_vec * (z_ax - z_n)
            return (x_n, z_n, y_n)

        with jax.default_matmul_precision(cfg.iter_precision):
            return jax.lax.fori_loop(0, num, body, carry)

    # Segmented ADMM: between segments apply the OSQP spectral rho update
    # rho *= sqrt(pri_res/dua_res) and refactor. Each refactor is one batched
    # Cholesky — cheap relative to the iteration matvecs at these sizes.
    segs = max(1, cfg.rho_segments)
    per = max(1, cfg.iters // segs)
    for s in range(segs):
        num = per if s < segs - 1 else cfg.iters - per * (segs - 1)
        if cfg.polish_kernel and cfg.matmul_inverse:
            # Serving-latency path: the whole segment — K^{-1} and all
            # `num` iterations — runs as two fused Pallas launches instead
            # of ~6*num tiny XLA ops (the B=1 tick's dominant launch
            # overhead after the GJ polish kernels, round-4 decomposition).
            # Iterations run at HIGHEST precision (the kernel's only mode).
            from g1_locomotion_tpu.ops.pallas_lin import (
                admm_iterate as _admm_fused,
                gj_inverse as _gj_inv,
            )

            Kinv = _gj_inv(_build_K(P_s, A_s, rho_vec, cfg.sigma))
            x, z, y = _admm_fused(
                Kinv, A_s, q_s, l_s, u_s, rho_vec, x, z, y,
                num, cfg.sigma, cfg.alpha,
            )
        else:
            solve = _make_solver(
                _build_K(P_s, A_s, rho_vec, cfg.sigma), cfg.matmul_inverse,
                cfg.polish_kernel,
            )
            x, z, y = iterate((x, z, y), solve, rho_vec, num)
        if s < segs - 1:
            Ax = A_s @ x
            pri = _inf_norm(Ax - z) / jnp.maximum(
                jnp.maximum(_inf_norm(Ax), _inf_norm(z)), 1e-6
            )
            dua = _inf_norm(P_s @ x + q_s + A_s.T @ y) / jnp.maximum(
                jnp.maximum(
                    _inf_norm(P_s @ x), jnp.maximum(_inf_norm(q_s), _inf_norm(A_s.T @ y))
                ),
                1e-6,
            )
            scale = jnp.clip(jnp.sqrt(pri / jnp.maximum(dua, 1e-12)), 1e-2, 1e2)
            # Cumulative clamp: runaway rho makes the K factorization
            # numerically singular in float32.
            rho_vec = jnp.clip(rho_vec * scale, 1e-4, 1e6)

    if cfg.polish:
        x, y = _polish(P_s, q_s, A_s, l_s, u_s, x, y, cfg, rounds=cfg.polish_rounds)
        z = jnp.clip(A_s @ x, l_s, u_s)

    # Unscale.
    x_out = d * x
    y_out = e * y / c
    z_out = z / e

    pri_res = _inf_norm(A @ x_out - z_out)
    dua_res = _inf_norm(P @ x_out + q + A.T @ y_out)
    return QPSolution(x=x_out, z=z_out, y=y_out, pri_res=pri_res, dua_res=dua_res)


def _polish(P, q, A, l, u, x, y, cfg: QPConfig, rounds: int = 3):
    """Iterative active-set polish with static shapes.

    Each round: guess the active set from dual signs *and* primal slacks of the
    current iterate, solve the equality-KKT system where inactive rows are
    masked to identity (forcing their dual to 0), and keep the result only if
    the KKT residual improved. Re-detecting from the polished point fixes
    weakly-active rows that ADMM's duals misclassify.
    """
    n, m = P.shape[0], A.shape[0]
    dtype = P.dtype
    eye_n = jnp.eye(n, dtype=dtype)
    eye_m = jnp.eye(m, dtype=dtype)
    # Hr is constant across rounds — compute its inverse once (matmul path).
    if cfg.matmul_inverse and cfg.polish_kernel:
        from g1_locomotion_tpu.ops.pallas_lin import gj_inverse

        Hr_inv = gj_inverse(P + cfg.polish_reg * eye_n)
    elif cfg.matmul_inverse:
        Hr_inv = spd_inverse(P + cfg.polish_reg * eye_n)
    else:
        Hr_inv = None

    def kkt(xx, yy):
        zz = jnp.clip(A @ xx, l, u)
        comp_low = jnp.minimum(yy, 0.0) * (A @ xx - l)
        comp_up = jnp.maximum(yy, 0.0) * (A @ xx - u)
        return jnp.maximum(
            jnp.maximum(_inf_norm(A @ xx - zz), _inf_norm(P @ xx + q + A.T @ yy)),
            jnp.maximum(_inf_norm(comp_low), _inf_norm(comp_up)),
        )

    best = kkt(x, y)
    for _ in range(rounds):
        Ax = A @ x
        span = jnp.maximum(jnp.abs(u - l), 1.0)
        slack_tol = 10.0 * jnp.maximum(best, 1e-12)
        low_active = (y < -1e-10) | (Ax - l < jnp.minimum(slack_tol, 1e-4 * span))
        upp_active = (y > 1e-10) | (u - Ax < jnp.minimum(slack_tol, 1e-4 * span))
        # A row can't be active on both sides unless it's an equality.
        is_eq = jnp.abs(u - l) < 1e-12
        upp_active = jnp.where(is_eq, upp_active, upp_active & ~low_active)
        active = low_active | upp_active
        b_act = jnp.where(low_active, l, jnp.where(upp_active, u, 0.0))

        mask = active.astype(dtype)
        A_m = A * mask[:, None]
        reg = cfg.polish_reg
        b_t = b_act * mask
        if cfg.matmul_inverse:
            # KKT solve via SPD Schur complement (matmul-only — LU on TPU is
            # the slowest primitive we measured):
            #   [Hr  Amᵀ][x]   [-q ]      Hr = P + reg I (SPD)
            #   [Am  -Dm][y] = [ b̃ ]      Dm = diag(1-mask) + reg I (SPD)
            #   y = (Am Hr⁻¹ Amᵀ + Dm)⁻¹ (Am Hr⁻¹(-q) - b̃); x = Hr⁻¹(-q - Amᵀy)
            AmHi = A_m @ Hr_inv
            S = AmHi @ A_m.T + jnp.diag(1.0 - mask) + reg * eye_m
            rhs_y = AmHi @ (-q) - b_t
            if cfg.polish_kernel:
                from g1_locomotion_tpu.ops.pallas_lin import gj_solve

                y_p = gj_solve(S, rhs_y)
            else:
                y_p = spd_inverse(S) @ rhs_y
            x_p = Hr_inv @ (-q - A_m.T @ y_p)
        else:
            # Reference path: exact indefinite-KKT LU solve (+ optional
            # iterative refinement reusing the factors — cfg.polish_refine).
            top = jnp.concatenate([P + reg * eye_n, A_m.T], axis=1)
            bot = jnp.concatenate(
                [A_m, -jnp.diag(1.0 - mask) - reg * eye_m], axis=1
            )
            Kkt = jnp.concatenate([top, bot], axis=0)
            rhs = jnp.concatenate([-q, b_t])
            if cfg.polish_refine == 0:
                sol = jnp.linalg.solve(Kkt, rhs)  # bit-stable default path
            else:
                lu_piv = jax.scipy.linalg.lu_factor(Kkt)
                sol = jax.scipy.linalg.lu_solve(lu_piv, rhs)
                for _ in range(cfg.polish_refine):
                    r = rhs - Kkt @ sol
                    sol = sol + jax.scipy.linalg.lu_solve(lu_piv, r)
            x_p, y_p = sol[:n], sol[n:]
        res_p = kkt(x_p, y_p)
        better = res_p < best
        x = jnp.where(better, x_p, x)
        y = jnp.where(better, y_p, y)
        best = jnp.minimum(best, res_p)
    return x, y


def solve_batch(P, q, A, l, u, cfg: QPConfig = QPConfig(), x0=None, y0=None):
    """vmapped batch solve over the leading axis of every argument.

    x0/y0 (optional) warm starts are batched over the same leading axis."""
    fn = lambda P, q, A, l, u, x0, y0: solve_qp(P, q, A, l, u, cfg, x0=x0, y0=y0)
    in_axes = (0, 0, 0, 0, 0, None if x0 is None else 0, None if y0 is None else 0)
    return jax.vmap(fn, in_axes=in_axes)(P, q, A, l, u, x0, y0)


def kkt_residuals(P, q, A, l, u, x, y):
    """Primal/dual feasibility + complementarity residuals (for tests/metrics)."""
    Ax = A @ x
    pri = jnp.maximum(jnp.max(Ax - u), jnp.max(l - Ax))
    pri = jnp.maximum(pri, 0.0)
    dua = _inf_norm(P @ x + q + A.T @ y)
    comp_low = jnp.minimum(y, 0.0) * (Ax - l)
    comp_up = jnp.maximum(y, 0.0) * (Ax - u)
    comp = jnp.maximum(_inf_norm(comp_low), _inf_norm(comp_up))
    return pri, dua, comp
