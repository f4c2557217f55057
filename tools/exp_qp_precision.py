#!/usr/bin/env python3
"""Quality/speed sweep of ADMM iteration precision + iteration count on the
current backend (run on TPU). Reference solution: iters=200/scaling/polish at
highest precision, same f32 inputs. Prints one line per variant.

Usage: python tools/exp_qp_precision.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import g1_locomotion_tpu  # noqa: F401
from g1_locomotion_tpu.models import srbd
from g1_locomotion_tpu.mpc import solver as mpc
from g1_locomotion_tpu.ops.qp import QPConfig


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

    def run(qp_cfg):
        cfg = mpc.MPCConfig(horizon=N, qp=qp_cfg)
        f = jax.jit(
            jax.vmap(
                lambda x, c: mpc.solve(cfg, weights, params, x, x_ref, c, c_hor, p_hor)
            )
        )
        sols = jax.block_until_ready(f(x0s, contact))
        # slope timing
        @jax.jit
        def rep(reps):
            def body(i, carry):
                s = jax.vmap(
                    lambda x, c: mpc.solve(
                        cfg, weights, params, x + carry * 1e-20, x_ref, c, c_hor, p_hor
                    )
                )(x0s, contact)
                return jnp.sum(s.u0) * 1e-24
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        ts = {}
        for reps in (1, 5):
            _ = np.asarray(rep(reps))
            t0 = time.perf_counter()
            _ = np.asarray(rep(reps))
            ts[reps] = time.perf_counter() - t0
        dt = (ts[5] - ts[1]) / 4.0
        return sols, dt

    ref_cfg = QPConfig(iters=200, scaling_iters=3, rho=1.0, rho_segments=4,
                       polish_rounds=3)
    ref_sols, _ = run(ref_cfg)
    u_ref = np.asarray(ref_sols.u0)

    base = mpc.MPCConfig().qp
    variants = {
        "base_highest": base,
        "iter_high": base._replace(iter_precision="high"),
        "iter_default": base._replace(iter_precision="default"),
        "i40_high_p2": base._replace(iters=40, iter_precision="high",
                                     polish_rounds=2),
        "i30_high_p2": base._replace(iters=30, iter_precision="high",
                                     polish_rounds=2),
        "i40_default_p2": base._replace(iters=40, iter_precision="default",
                                        polish_rounds=2),
    }
    for name, qp_cfg in variants.items():
        sols, dt = run(qp_cfg)
        u = np.asarray(sols.u0)
        err = np.abs(u - u_ref).max()
        err_m = np.abs(u - u_ref).mean()
        dua = float(np.asarray(sols.dua_res).max())
        print(
            f"{name:16s} {dt*1e3:8.2f} ms  {B/dt:9.0f}/s  "
            f"max|du0|={err:9.3e}  mean={err_m:9.3e}  dua_max={dua:9.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
