"""Single-solve latency decomposition on-chip: where do the 2.5 ms go?

Times the N=10 MPC solve (chained-solve slope, B=1) across QP-config
variants that remove one stage at a time: ADMM iteration count, polish
rounds, Ruiz scaling. If latency scales ~linearly with the iteration count
at fixed tiny FLOPs, the solve is op-launch-bound and fusing the iteration
loop into one Pallas kernel is the latency lever; if polish dominates, the
masked-KKT factorization is.

Usage: python tools/exp_latency_split.py
"""

import json
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
    N = 10
    weights = mpc.default_weights(dtype)
    params = srbd.default_params(dtype)
    com = jnp.array([0.0527, 0.0, 0.598], dtype)
    feet = jnp.array(
        [[-0.05, 0.12, 0.0], [0.12, 0.12, 0.0],
         [-0.05, -0.12, 0.0], [0.12, -0.12, 0.0]], dtype)
    x0 = jnp.zeros(13, dtype).at[3:6].set(com).at[12].set(srbd.GRAVITY)
    x_ref = jnp.tile(x0[None], (N, 1))
    contact = jnp.ones((N, 4), dtype)
    c_hor = jnp.tile(feet[None], (N, 1, 1))
    p_hor = jnp.tile(com[None], (N, 1))

    base = QPConfig(iters=20, scaling_iters=0, rho=1.0, rho_segments=2,
                    polish_rounds=2, iter_precision="high")
    variants = {
        "bench_i20_p2": base,
        "i20_p2_kernel": base._replace(polish_kernel=True),
        "i5_p2": base._replace(iters=5),
        "i40_p2": base._replace(iters=40),
        "i20_p0": base._replace(polish_rounds=0),
        "i20_p1": base._replace(polish_rounds=1),
        "i5_p0": base._replace(iters=5, polish_rounds=0),
    }

    for name, qp_cfg in variants.items():
        cfg = mpc.MPCConfig(horizon=N, qp=qp_cfg)

        @jax.jit
        def chain(x0, k):
            def body(i, x):
                sol = mpc.solve(cfg, weights, params, x, x_ref, contact,
                                c_hor, p_hor)
                return x + 1e-9 * jnp.pad(sol.u0, (0, 1))
            return jax.lax.fori_loop(0, k, body, x0)

        ks = (2, 22)
        ts = {}
        for k in ks:
            _ = np.asarray(chain(x0, k))
            t0 = time.perf_counter()
            _ = np.asarray(chain(x0, k))
            ts[k] = time.perf_counter() - t0
        ms = (ts[ks[1]] - ts[ks[0]]) / (ks[1] - ks[0]) * 1e3
        print(json.dumps({"variant": name, "ms_per_solve": round(ms, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
# appended variants run when "kernel" passed: the fused-polish serving path
