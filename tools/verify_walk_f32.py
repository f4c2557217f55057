"""float32 flagship walking verification — the 8-step walk + settle at f32
(walking_config_f32 + walking_scenario_f32_robust), on whatever platform JAX
resolves (the real TPU under the ambient axon platform; pass `cpu` to force
the CPU f32 control run — round-3 measurement: CPU f32 reproduces the TPU
f32 behavior, so the CPU run is the fast test bed).

The f64-validated walk falls at plain f32 (TPU or CPU — it is a precision
phenomenon, not a platform one). The validated f32 combination is the
robustness bundle in walking_scenario_f32_robust; the landing lock is the
decisive mechanism (engine/tick.py docstrings).

Usage: python tools/verify_walk_f32.py [cpu] [n_periods=180]
Prints one JSON line with the walking invariants
(tests/test_engine_walking.py::test_walk_completes_and_stands).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

from g1_locomotion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from g1_locomotion_tpu.core import rotations as rot
from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.models.robot import load_robot


def main():
    n_periods = 180
    for a in sys.argv[1:]:
        if a.startswith("n_periods="):
            n_periods = int(a.split("=")[1])

    dtype = jnp.float32
    model = load_robot("g1_23dof", dtype=dtype)
    cfg = eng.walking_config_f32()
    params = eng.walking_scenario_f32_robust(dtype, n_steps=8.0,
                                             v_cmd=(0.1, 0.0))
    rollout = eng.make_rollout(model, cfg)
    state = eng.init_state(model, cfg, dtype)
    t0 = time.time()
    final, logs = jax.jit(lambda s: rollout(s, params, n_periods))(state)
    jax.block_until_ready(final.q)
    t_compile_run = time.time() - t0

    com = np.asarray(logs.com).reshape(-1, 3)
    contact = np.asarray(logs.contact).reshape(-1, 4)
    left_up = (contact[:, 0] < 0.5).astype(int)
    right_up = (contact[:, 2] < 0.5).astype(int)
    rpy = np.asarray(rot.quat_to_rpy(final.q[3:7]))
    out = {
        "platform": jax.devices()[0].platform,
        "n_periods": n_periods,
        "compile_plus_run_s": round(t_compile_run, 1),
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
    out["walks"] = bool(
        out["nan_free"] and out["z_min"] > 0.45 and out["y_absmax"] < 0.25
        and abs(out["z_final"] - 0.598) < 0.02 and out["v_final_max"] < 0.3
        and out["steps_L"] == 4 and out["steps_R"] == 4
        and max(abs(rpy[0]), abs(rpy[1])) < 0.15
    )
    print(json.dumps(out), flush=True)
    sys.exit(0 if out["walks"] else 1)


if __name__ == "__main__":
    main()
