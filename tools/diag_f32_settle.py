"""Diagnose the TPU-vs-CPU f32 flagship-walk settle divergence (round 4):
CPU@180 settles upright (z 0.5945, rpy ~0) while TPU@180 ends pitched
-0.23 rad at z 0.578 with v_max 0.163 (tools/verify_walk_f32.py).

Runs the f32 flagship walk with per-tick q logging, saves the full
com/rpy/contact trace to an npz, and prints a per-half-second summary of
the tail so the divergence onset is visible.

Usage: python tools/diag_f32_settle.py [cpu] [n_periods=200] [out=/tmp/...npz]
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
    n_periods = 200
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("n_periods="):
            n_periods = int(a.split("=")[1])
        if a.startswith("out="):
            out_path = a.split("=", 1)[1]
    plat = jax.devices()[0].platform
    if out_path is None:
        out_path = f"/tmp/f32_settle_{plat}.npz"

    dtype = jnp.float32
    model = load_robot("g1_23dof", dtype=dtype)
    cfg = eng.walking_config_f32()._replace(log_q=True)
    params = eng.walking_scenario_f32_robust(dtype, n_steps=8.0,
                                             v_cmd=(0.1, 0.0))
    rollout = eng.make_rollout(model, cfg)
    state = eng.init_state(model, cfg, dtype)
    t0 = time.time()
    final, logs = jax.jit(lambda s: rollout(s, params, n_periods))(state)
    jax.block_until_ready(final.q)
    wall = time.time() - t0

    com = np.asarray(logs.com).reshape(-1, 3)
    qs = np.asarray(logs.q).reshape(-1, model.nq)
    contact = np.asarray(logs.contact).reshape(-1, 4)
    rpy = np.asarray(jax.vmap(rot.quat_to_rpy)(jnp.asarray(qs[:, 3:7])))
    np.savez(out_path, com=com, rpy=rpy, contact=contact,
             q_final=np.asarray(final.q), v_final=np.asarray(final.v))

    T = com.shape[0]
    print(f"platform={plat} n_periods={n_periods} wall={wall:.0f}s "
          f"ticks={T} -> {out_path}")
    for k in range(0, T, 500):
        j = min(k + 499, T - 1)
        print(
            f"t={k/1000:5.2f}-{(j+1)/1000:5.2f}s  "
            f"z=[{com[k:j+1,2].min():.4f},{com[k:j+1,2].max():.4f}]  "
            f"y=[{com[k:j+1,1].min():+.4f},{com[k:j+1,1].max():+.4f}]  "
            f"pitch=[{rpy[k:j+1,1].min():+.4f},{rpy[k:j+1,1].max():+.4f}]  "
            f"roll=[{rpy[k:j+1,0].min():+.4f},{rpy[k:j+1,0].max():+.4f}]",
            flush=True,
        )
    print(json.dumps({
        "platform": plat,
        "z_final": round(float(com[-1, 2]), 4),
        "pitch_final": round(float(rpy[-1, 1]), 4),
        "v_final_max": round(float(np.abs(np.asarray(final.v)).max()), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
