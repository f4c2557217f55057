"""Solo (non-vmapped) validation of f32-bundle off-center points — the
vmapped margin sweep (tools/sweep_margins.py) and solo runs are different
chaotic draws, so test-worthy points must pass SOLO in the test env.

Usage: python tools/exp_f32_offcenter.py lock=0.6 | gztol=0.09 | ...
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from g1_locomotion_tpu.core import rotations as rot
from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.models.robot import load_robot
from g1_locomotion_tpu.utils.cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    dtype = jnp.float32
    model = load_robot("g1_23dof", dtype=dtype)
    cfg = eng.walking_config_f32()
    params = eng.walking_scenario_f32_robust(dtype, n_steps=8.0,
                                             v_cmd=(0.1, 0.0))
    label = []
    for a in sys.argv[1:]:
        k, v = a.split("=")
        label.append(a)
        field = {"lock": "landing_lock", "gztol": "gate_z_tol",
                 "tgain": "timing_gain"}.get(k)
        if field:
            params = params._replace(gait=params.gait._replace(
                **{field: jnp.asarray(float(v), dtype)}))
        elif k == "dcm":
            params = params._replace(steps=params.steps._replace(
                dcm_scale=jnp.asarray(float(v), dtype)))
    rollout = eng.make_rollout(model, cfg)
    state = eng.init_state(model, cfg, dtype)
    final, logs = jax.jit(lambda s: rollout(s, params, 180))(state)
    com = np.asarray(logs.com).reshape(-1, 3)
    contact = np.asarray(logs.contact).reshape(-1, 4)
    left_up = (contact[:, 0] < 0.5).astype(int)
    right_up = (contact[:, 2] < 0.5).astype(int)
    rpy = np.asarray(rot.quat_to_rpy(final.q[3:7]))
    out = {
        "point": "+".join(label),
        "z_min": round(float(com[:, 2].min()), 4),
        "y_absmax": round(float(np.abs(com[:, 1]).max()), 4),
        "z_final": round(float(com[-1, 2]), 4),
        "v_final": round(float(jnp.abs(final.v).max()), 4),
        "rpy_max": round(float(np.abs(rpy[:2]).max()), 4),
        "steps": [int(np.clip(np.diff(left_up), 0, 1).sum()),
                  int(np.clip(np.diff(right_up), 0, 1).sum())],
    }
    out["walks"] = bool(
        np.isfinite(com).all() and out["z_min"] > 0.45
        and out["y_absmax"] < 0.25 and abs(out["z_final"] - 0.598) < 0.02
        and out["v_final"] < 0.3 and out["steps"] == [4, 4]
        and out["rpy_max"] < 0.15
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
