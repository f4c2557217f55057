"""Move-block (mb=2) accuracy validation — VERDICT round-3 item 7.

Move blocking changes the OPTIMIZATION PROBLEM (u constant over step pairs),
not just the numerics, so "accuracy" means: how far is the mb=2 first-step
force from the per-step (mb=1) optimum, and does the flagship walk survive
running on mb=2 solves?

Three checks, one JSON line each:
  A. Bench-workload u0 gap: mb=2 vs a converged mb=1 reference
     (iters=200/polish, same f32 inputs as bench.py's mixed-contact QPs).
  B. Oracle gap: mb=2 (parity params) vs tools/reference_oracle.py's
     per-step scipy solution — the same harness as docs/PARITY.md.
  C. Flagship walk (f64, walking_config N=20) with mpc.move_block=2.

Usage: python tools/validate_moveblock.py [A|B|C|all]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from g1_locomotion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from g1_locomotion_tpu.models import srbd
from g1_locomotion_tpu.mpc import solver as mpc
from g1_locomotion_tpu.ops.qp import QPConfig


def bench_workload(B=512, dtype=jnp.float32):
    N = 10
    com = jnp.array([0.0527, 0.0, 0.598], dtype)
    feet = jnp.array(
        [[-0.05, 0.12, 0.0], [0.12, 0.12, 0.0],
         [-0.05, -0.12, 0.0], [0.12, -0.12, 0.0]], dtype)
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
        jax.random.uniform(key, (B,), dtype, minval=-0.03, maxval=0.03))
    return N, x0s, x_ref, contact, c_hor, p_hor


def check_a():
    dtype = jnp.float32
    N, x0s, x_ref, contact, c_hor, p_hor = bench_workload(dtype=dtype)
    weights = mpc.default_weights(dtype)
    params = srbd.default_params(dtype)

    def run(cfg):
        f = jax.jit(jax.vmap(
            lambda x, c: mpc.solve(cfg, weights, params, x, x_ref, c,
                                   c_hor, p_hor)))
        return np.asarray(f(x0s, contact).u0)

    ref_cfg = mpc.MPCConfig(
        horizon=N,
        qp=QPConfig(iters=200, scaling_iters=3, rho=1.0, rho_segments=4,
                    polish_rounds=3))
    bench_qp = QPConfig(iters=20, scaling_iters=0, rho=1.0, rho_segments=2,
                        polish_rounds=2, iter_precision="high")
    u_ref = run(ref_cfg)
    u_mb1 = run(mpc.MPCConfig(horizon=N, move_block=1, qp=bench_qp))
    u_mb2 = run(mpc.MPCConfig(horizon=N, move_block=2, qp=bench_qp))
    mg = 34.13 * 9.80665
    out = {
        "check": "A_bench_workload_u0_gap",
        "max_du0_mb1_N": round(float(np.abs(u_mb1 - u_ref).max()), 4),
        "max_du0_mb2_N": round(float(np.abs(u_mb2 - u_ref).max()), 4),
        "mean_du0_mb2_N": round(float(np.abs(u_mb2 - u_ref).mean()), 4),
        "max_du0_mb2_pct_of_mg": round(
            float(np.abs(u_mb2 - u_ref).max() / mg * 100), 3),
    }
    print(json.dumps(out), flush=True)


def check_b():
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import reference_oracle as oracle

    N = 10
    dtype = jnp.float64
    com = np.array([0.0527, 0.0, 0.598])
    feet = np.array(
        [[-0.05, 0.12, 0.0], [0.12, 0.12, 0.0],
         [-0.05, -0.12, 0.0], [0.12, -0.12, 0.0]])
    results = {}
    for pat in ("stand", "left_swing", "mixed"):
        x0 = np.zeros(13)
        x0[2] = 0.25
        x0[3:6] = com
        x0[9] = 0.1
        x0[12] = srbd.GRAVITY
        x_ref = np.tile(x0, (N, 1))
        x_ref[:, 9:12] = 0.0
        contact = np.ones((N, 4))
        if pat == "left_swing":
            contact[:, :2] = 0.0
        elif pat == "mixed":
            contact[5:, :2] = 0.0
        c_hor = np.tile(feet, (N, 1, 1))
        p_hor = np.tile(com, (N, 1))
        Q = np.asarray(mpc.default_weights(dtype).Q)
        R = np.asarray(mpc.default_weights(dtype).R)
        u_or, _, _ = oracle.mpc_update(
            x0, x_ref, contact, c_hor, p_hor, Q, R)
        params = srbd.reference_parity_params(dtype)
        weights = mpc.default_weights(dtype)
        # Tight QP settings (the parity inertia makes cond(H) ~ 1e8; see
        # tests/test_parity.py) so the gap measured is the BLOCKING error,
        # not solver under-convergence.
        cfg2 = mpc.MPCConfig(
            horizon=N, move_block=2,
            qp=QPConfig(iters=200, scaling_iters=3, rho=1.0,
                        rho_segments=4, matmul_inverse=False,
                        polish_rounds=3))
        sol2 = mpc.solve(cfg2, weights, params, jnp.asarray(x0),
                         jnp.asarray(x_ref), jnp.asarray(contact),
                         jnp.asarray(c_hor), jnp.asarray(p_hor))
        results[pat] = round(float(np.abs(np.asarray(sol2.u0) - u_or).max()), 4)
    print(json.dumps({"check": "B_oracle_u0_gap_N", **results}), flush=True)


def check_c():
    from g1_locomotion_tpu.core import rotations as rot
    from g1_locomotion_tpu.engine import tick as eng
    from g1_locomotion_tpu.models.robot import load_robot

    dtype = jnp.float64
    model = load_robot("g1_23dof", dtype=dtype)
    cfg = eng.walking_config()
    cfg = cfg._replace(mpc=cfg.mpc._replace(move_block=2))
    params = eng.walking_scenario(dtype, n_steps=8.0, v_cmd=(0.1, 0.0))
    rollout = eng.make_rollout(model, cfg)
    state = eng.init_state(model, cfg, dtype)
    t0 = time.time()
    final, logs = jax.jit(lambda s: rollout(s, params, 163))(state)
    jax.block_until_ready(final.q)
    com = np.asarray(logs.com).reshape(-1, 3)
    contact = np.asarray(logs.contact).reshape(-1, 4)
    left_up = (contact[:, 0] < 0.5).astype(int)
    right_up = (contact[:, 2] < 0.5).astype(int)
    rpy = np.asarray(rot.quat_to_rpy(final.q[3:7]))
    out = {
        "check": "C_flagship_walk_mb2",
        "wall_s": round(time.time() - t0, 1),
        "nan_free": bool(np.isfinite(com).all()),
        "z_min": round(float(com[:, 2].min()), 4),
        "y_absmax": round(float(np.abs(com[:, 1]).max()), 4),
        "z_final": round(float(com[-1, 2]), 4),
        "v_final_max": round(float(jnp.abs(final.v).max()), 4),
        "rpy_final_max": round(float(np.abs(rpy[:2]).max()), 4),
        "steps_L": int(np.clip(np.diff(left_up), 0, 1).sum()),
        "steps_R": int(np.clip(np.diff(right_up), 0, 1).sum()),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("A", "all"):
        check_a()
    if which in ("B", "all"):
        check_b()
    if which in ("C", "all"):
        check_c()
