#!/usr/bin/env python3
"""Single-solve MPC latency (the reference's per-tick budget metric).

BASELINE: p99 solve latency < 2 ms control-tick budget (the reference's CPU
solve takes 2-7.6 ms). Measures the *on-device* latency of one sequential MPC
solve by chaining k data-dependent solves inside one jitted program and taking
the slope between two chain lengths — excludes host/tunnel dispatch, which
dominates naive timing on remote TPU runtimes.

Prints one JSON line: {"metric": "mpc_solve_latency_ms", ...}.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from g1_locomotion_tpu.models import srbd
    from g1_locomotion_tpu.mpc import solver as mpc

    dtype = jnp.float32
    from g1_locomotion_tpu.ops.qp import QPConfig

    # The SERVING configuration: the bench.py throughput QP settings plus
    # the fused single-instance Gauss-Jordan kernels (polish_kernel) that
    # remove the op-launch-bound spd_inverse recursions — round-4 latency
    # decomposition (tools/exp_latency_split.py): 2.4 ms -> 0.25 ms per
    # solve. Pass "xla" to measure the plain path instead.
    if "xla" in sys.argv[1:]:
        cfg = mpc.MPCConfig(horizon=10)
    else:
        cfg = mpc.MPCConfig(
            horizon=10,
            qp=QPConfig(iters=20, scaling_iters=0, rho=1.0,
                        rho_segments=2, polish_rounds=2,
                        iter_precision="high", polish_kernel=True),
        )
    weights = mpc.default_weights(dtype)
    params = srbd.default_params(dtype)
    N = cfg.horizon
    com = jnp.array([0.0527, 0.0, 0.598], dtype)
    feet = jnp.array(
        [[-0.05, 0.12, 0.0], [0.12, 0.12, 0.0], [-0.05, -0.12, 0.0], [0.12, -0.12, 0.0]],
        dtype,
    )
    x0 = jnp.zeros(13, dtype).at[3:6].set(com).at[12].set(srbd.GRAVITY)
    x_ref = jnp.tile(x0[None], (N, 1))
    contact = jnp.ones((N, 4), dtype)
    c_hor = jnp.tile(feet[None], (N, 1, 1))
    p_hor = jnp.tile(com[None], (N, 1))

    @jax.jit
    def chain(x0, k):
        def body(i, x):
            sol = mpc.solve(cfg, weights, params, x, x_ref, contact, c_hor, p_hor)
            # Data dependence: next state perturbed by this solve's output.
            return x + 1e-9 * jnp.pad(sol.u0, (0, 1))
        return jax.lax.fori_loop(0, k, body, x0)

    # Latency DISTRIBUTION (BASELINE budgets the p99, not the mean): M
    # paired samples of the two chain lengths; per-sample slope removes the
    # host/tunnel dispatch of that sample, the spread over samples captures
    # device-side timing variation. M via argv[1] (default 50).
    nums = [a for a in sys.argv[1:] if a.isdigit()]
    M = int(nums[0]) if nums else 50
    ks = (2, 22)
    for k in ks:
        _ = np.asarray(chain(x0, k))  # compile/warm + sync
    t1s, t2s = [], []
    for _ in range(M):
        t0 = time.perf_counter()
        _ = np.asarray(chain(x0, ks[0]))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = np.asarray(chain(x0, ks[1]))
        t2s.append(time.perf_counter() - t0)
    per_solve_ms = (
        (np.asarray(t2s) - np.asarray(t1s)) / (ks[1] - ks[0]) * 1e3
    )
    p99 = float(np.percentile(per_solve_ms, 99))

    print(
        json.dumps(
            {
                "metric": "mpc_solve_latency_ms",
                "value": round(float(np.median(per_solve_ms)), 3),
                "p50": round(float(np.median(per_solve_ms)), 3),
                "p99": round(p99, 3),
                "mean": round(float(per_solve_ms.mean()), 3),
                "samples": M,
                "unit": "ms",
                "budget_ms": 2.0,
                "within_budget": p99 < 2.0,
            }
        )
    )


if __name__ == "__main__":
    main()
