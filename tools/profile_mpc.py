#!/usr/bin/env python3
"""Per-stage cost profile of the batched MPC solve on the current backend.

Decomposes the N=10, mb=1 solve (the bench.py headline) by timing config
ablations and raw primitives with the slope method, all in ONE process:

    full            the bench configuration (iters=60, 2 segments, polish)
    no_polish       polish disabled
    seg1            rho_segments=1 (single K factorization)
    assemble_only   iters=0, no polish (QP build + K inverse path)
    inv120 / inv200 raw spd_inverse on (B,120,120) / (B,200,200)
    iter_only       60 ADMM iterations given a precomputed K inverse

Usage: python tools/profile_mpc.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import g1_locomotion_tpu  # noqa: F401  (sets matmul precision)
from g1_locomotion_tpu.models import srbd
from g1_locomotion_tpu.mpc import solver as mpc
from g1_locomotion_tpu.ops import lin
from g1_locomotion_tpu.ops.qp import QPConfig


def slope_time(fn, *args):
    """Time fn(*args, reps) at reps=1/5, return per-rep seconds."""

    @jax.jit
    def rep(reps, *a):
        def body(i, carry):
            out = fn(carry, *a)
            return out

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    ts = {}
    for reps in (1, 5):
        _ = np.asarray(rep(reps, *args))
        t0 = time.perf_counter()
        _ = np.asarray(rep(reps, *args))
        ts[reps] = time.perf_counter() - t0
    return (ts[5] - ts[1]) / 4.0


def main():
    dtype = jnp.float32
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    N = 10

    com = jnp.array([0.0527, 0.0, 0.598], dtype)
    feet = jnp.array(
        [[-0.05, 0.12, 0.0], [0.12, 0.12, 0.0], [-0.05, -0.12, 0.0], [0.12, -0.12, 0.0]],
        dtype,
    )
    x0 = jnp.zeros(13, dtype).at[3:6].set(com).at[12].set(srbd.GRAVITY)
    x_ref = jnp.tile(x0[None], (N, 1))
    c_hor = jnp.tile(feet[None], (N, 1, 1))
    p_hor = jnp.tile(com[None], (N, 1))
    key = jax.random.PRNGKey(0)
    pattern = jax.random.randint(key, (B,), 0, 3)
    stand = jnp.ones((N, 4), dtype)
    left_up = stand.at[:, 0].set(0.0).at[:, 1].set(0.0)
    right_up = stand.at[:, 2].set(0.0).at[:, 3].set(0.0)
    contact = jnp.stack([stand, left_up, right_up])[pattern]
    x0s = jnp.tile(x0[None], (B, 1))
    x0s = x0s.at[:, 4].add(
        jax.random.uniform(key, (B,), dtype, minval=-0.03, maxval=0.03)
    )

    weights = mpc.default_weights(dtype)
    params = srbd.default_params(dtype)

    def mpc_variant(qp_cfg):
        cfg = mpc.MPCConfig(horizon=N, qp=qp_cfg)

        def fn(carry, x0s, contact):
            sols = jax.vmap(
                lambda x, c: mpc.solve(
                    cfg, weights, params, x + carry * 1e-20, x_ref, c, c_hor, p_hor
                )
            )(x0s, contact)
            return jnp.sum(sols.u0[:, 2::3]) * 1e-24

        return fn

    base_qp = mpc.MPCConfig().qp
    results = {}
    variants = {
        "full": base_qp,
        "no_polish": base_qp._replace(polish=False),
        "seg1": base_qp._replace(rho_segments=1),
        "assemble_only": base_qp._replace(iters=2, rho_segments=1, polish=False),
        "polish3": base_qp._replace(polish_rounds=3),
    }
    for name, qp_cfg in variants.items():
        dt = slope_time(mpc_variant(qp_cfg), x0s, contact)
        results[name] = dt
        print(f"{name:14s} {dt*1e3:8.2f} ms/batch  {B/dt:10.0f} solves/s", flush=True)

    # Raw primitives.
    for n in (120, 200):
        Ks = jax.random.normal(key, (B, n, n), dtype) * 0.1
        Ks = jnp.einsum("bij,bkj->bik", Ks, Ks) + 10.0 * jnp.eye(n, dtype=dtype)

        def inv_fn(carry, Ks):
            Kinv = lin.spd_inverse(Ks + carry * 1e-20)
            return jnp.sum(Kinv[:, 0, 0]) * 1e-24

        dt = slope_time(inv_fn, Ks)
        print(f"inv{n:<11d} {dt*1e3:8.2f} ms/batch", flush=True)

    # Iteration loop with fixed inverse: 60 iterations of the ADMM core.
    n, m = 120, 200
    Kinv = jnp.eye(n, dtype=dtype)[None].repeat(B, 0)
    A = jax.random.normal(key, (B, m, n), dtype)
    l = -jnp.ones((B, m), dtype)
    u = jnp.ones((B, m), dtype)
    q = jnp.ones((B, n), dtype)

    def iter_fn(carry, Kinv, A, q, l, u):
        def one(Kinv, A, q, l, u):
            x = jnp.zeros(n, dtype) + carry * 1e-20
            z = jnp.zeros(m, dtype)
            y = jnp.zeros(m, dtype)

            def body(_, xzy):
                x, z, y = xzy
                rhs = -q + A.T @ (z - y)
                x_t = Kinv @ rhs
                z_t = A @ x_t
                z_n = jnp.clip(z_t + y, l, u)
                y_n = y + z_t - z_n
                return (x_t, z_n, y_n)

            x, z, y = jax.lax.fori_loop(0, 60, body, (x, z, y))
            return jnp.sum(x)

        return jnp.sum(jax.vmap(one)(Kinv, A, q, l, u)) * 1e-24

    dt = slope_time(iter_fn, Kinv, A, q, l, u)
    print(f"{'iter60_only':14s} {dt*1e3:8.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
