"""Accuracy validation of the serving-latency GJ-kernel QP path
(QPConfig.polish_kernel): unpivoted Gauss-Jordan at f32 on the real MPC
KKT systems vs the converged spd_inverse reference. Run on TPU.

Usage: python tools/validate_gj_serving.py [n_instances]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import g1_locomotion_tpu  # noqa: F401
from g1_locomotion_tpu.models import srbd
from g1_locomotion_tpu.mpc import solver as mpc
from g1_locomotion_tpu.ops.qp import QPConfig


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 24
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
    c_hor = jnp.tile(feet[None], (N, 1, 1))
    p_hor = jnp.tile(com[None], (N, 1))
    key = jax.random.PRNGKey(0)
    pattern = np.asarray(jax.random.randint(key, (M,), 0, 3))
    stand = jnp.ones((N, 4), dtype)
    left_up = stand.at[:, 0].set(0.0).at[:, 1].set(0.0)
    right_up = stand.at[:, 2].set(0.0).at[:, 3].set(0.0)
    contacts = [stand, left_up, right_up]
    dx = np.asarray(
        jax.random.uniform(key, (M,), dtype, minval=-0.03, maxval=0.03))

    ref_cfg = mpc.MPCConfig(
        horizon=N,
        qp=QPConfig(iters=200, scaling_iters=3, rho=1.0, rho_segments=4,
                    polish_rounds=3))
    srv_cfg = mpc.MPCConfig(
        horizon=N,
        qp=QPConfig(iters=20, scaling_iters=0, rho=1.0, rho_segments=2,
                    polish_rounds=2, iter_precision="high",
                    polish_kernel=True))

    f_ref = jax.jit(lambda x, c: mpc.solve(ref_cfg, weights, params, x,
                                           x_ref, c, c_hor, p_hor))
    f_srv = jax.jit(lambda x, c: mpc.solve(srv_cfg, weights, params, x,
                                           x_ref, c, c_hor, p_hor))
    errs, pris = [], []
    for i in range(M):
        xi = x0.at[4].add(float(dx[i]))
        ci = contacts[int(pattern[i])]
        u_r = np.asarray(f_ref(xi, ci).u0)
        s = f_srv(xi, ci)
        errs.append(float(np.abs(np.asarray(s.u0) - u_r).max()))
        pris.append(float(s.pri_res))
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "n": M,
        "max_du0_N": round(max(errs), 4),
        "mean_du0_N": round(float(np.mean(errs)), 4),
        "pri_res_max": round(max(pris), 5),
    }), flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
