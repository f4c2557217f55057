"""End-to-end correctness of the round-5 SERVING tick configuration
(polish_kernel fused QP kernels + fast_stack assembly) on the real TPU:
run the full engine (MPC + WBID + plant) for several periods in BOTH the
serving and the default configuration from the same state and compare the
realized trajectories + check the standing invariants.

The serving config's latency claim (p50 0.36 / p99 0.66 ms,
tools/bench_tick_p99.py) is only meaningful if the path CONTROLS correctly —
this is the correctness half of that artifact.

Usage: PYTHONPATH=/root/repo python tools/validate_serving_tick.py [periods]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import g1_locomotion_tpu  # noqa: F401
from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.models.robot import load_robot


def main():
    periods = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    dtype = jnp.float32
    model = load_robot("g1_23dof", dtype=dtype)
    base = eng.EngineConfig()
    serving = base._replace(
        mpc=base.mpc._replace(qp=base.mpc.qp._replace(polish_kernel=True)),
        wbid=base.wbid._replace(
            qp=base.wbid.qp._replace(polish_kernel=True), fast_stack=True
        ),
    )
    params = eng.default_scenario(dtype)
    out = {}
    for name, cfg in (("default", base), ("serving", serving)):
        rollout = eng.make_rollout(model, cfg)
        state0 = eng.init_state(model, cfg, dtype)
        final, logs = jax.jit(lambda s: rollout(s, params, periods))(state0)
        com = np.asarray(jax.block_until_ready(logs.com)).reshape(-1, 3)
        tau = np.asarray(logs.tau)
        out[name] = {
            "com_final": [round(float(v), 4) for v in com[-1]],
            "z_min": round(float(com[:, 2].min()), 4),
            "xy_drift": round(float(np.abs(com[-1, :2] - com[0, :2]).max()), 5),
            "tau_max": round(float(np.abs(tau).max()), 2),
            "finite": bool(np.isfinite(com).all() and np.isfinite(tau).all()),
        }
        print(json.dumps({name: out[name]}), flush=True)
    d = abs(out["serving"]["com_final"][2] - out["default"]["com_final"][2])
    ok = (
        out["serving"]["finite"]
        and out["default"]["finite"]
        and d < 0.01
        and out["serving"]["z_min"] > 0.55
        and out["serving"]["tau_max"] < 88.0
    )
    print(json.dumps({"serving_matches_default_z_mm": round(d * 1e3, 2),
                      "ok": ok}), flush=True)


if __name__ == "__main__":
    main()
