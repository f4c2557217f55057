"""Stale-solution cadence experiment: does the flagship 8-step walk survive
a one-MPC-period compute delay (EngineConfig.mpc_delay=1 — the reference's
real operating regime, ros_run_simulation.py:188-218)?

Usage: python tools/exp_stale.py [n_periods] [delay] [f32] [robust]
                                 [comp=full|state|clock|none]
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

from g1_locomotion_tpu.core import rotations as rot
from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.models.robot import load_robot


def main():
    n_periods = int(sys.argv[1]) if len(sys.argv) > 1 else 163
    delay = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    f32 = "f32" in sys.argv[1:]
    robust = "robust" in sys.argv[1:]
    comp = "full"
    for a in sys.argv[1:]:
        if a.startswith("comp="):
            comp = a.split("=")[1]
    dtype = jnp.float32 if f32 else jnp.float64
    model = load_robot("g1_23dof", dtype=dtype)
    if f32:
        cfg = eng.walking_config_f32()._replace(mpc_delay=delay,
                                                delay_comp=comp)
        params = eng.walking_scenario_f32_robust(dtype, n_steps=8.0,
                                                 v_cmd=(0.1, 0.0))
    else:
        cfg = eng.walking_config()._replace(mpc_delay=delay,
                                            delay_comp=comp)
        if robust:
            params = eng.walking_scenario_f32_robust(dtype, n_steps=8.0,
                                                     v_cmd=(0.1, 0.0))
        else:
            params = eng.walking_scenario(dtype, n_steps=8.0,
                                          v_cmd=(0.1, 0.0))
    rollout = eng.make_rollout(model, cfg)
    state = eng.init_state(model, cfg, dtype)
    t0 = time.time()
    final, logs = jax.jit(lambda s: rollout(s, params, n_periods))(state)
    jax.block_until_ready(final.q)
    com = np.asarray(logs.com).reshape(-1, 3)
    contact = np.asarray(logs.contact).reshape(-1, 4)
    left_up = (contact[:, 0] < 0.5).astype(int)
    right_up = (contact[:, 2] < 0.5).astype(int)
    rpy = np.asarray(rot.quat_to_rpy(final.q[3:7]))
    out = {
        "delay": delay,
        "comp": comp,
        "robust": robust,
        "f32": f32,
        "n_periods": n_periods,
        "wall_s": round(time.time() - t0, 1),
        "nan_free": bool(np.isfinite(com).all()),
        "z_min": round(float(com[:, 2].min()), 4),
        "y_absmax": round(float(np.abs(com[:, 1]).max()), 4),
        "z_final": round(float(com[-1, 2]), 4),
        "x_final": round(float(com[-1, 0]), 4),
        "v_final_max": round(float(jnp.abs(final.v).max()), 4),
        "rpy_final": [round(float(x), 4) for x in rpy],
        "steps_L": int(np.clip(np.diff(left_up), 0, 1).sum()),
        "steps_R": int(np.clip(np.diff(right_up), 0, 1).sum()),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
