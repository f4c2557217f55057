"""MuJoCo walking experiment harness: N-step walks under real unilateral
contacts, sequentially over candidate configs, with early fall detection.

Usage:
    python tools/exp_mujoco_walk.py [n_steps] [width:ds:tgain:ttol:tmax[:vx[:dcm]] ...]

Each config token is colon-separated: step_width, double-support duration,
timing_gain, timing_tol, timing_rate_max, optional v_cmd_x, dcm_scale.
Prints one JSON line per config: ticks survived, fall tick, CoM z minimum,
forward progress, final max|qvel|, final roll/pitch — the iteration loop for
the MuJoCo walking frontier (TODO.md item 4a).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from g1_locomotion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from g1_locomotion_tpu.core import rotations as rot
from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.engine.mujoco_bridge import MujocoLoop
from g1_locomotion_tpu.models.robot import load_robot


def run_one(model, n_steps, width, ds, tgain, ttol, tmax, vx, dcm,
            qty=None, qwy=None):
    cfg = eng.walking_config()
    params = eng.mujoco_walking_scenario(
        jnp.float64, n_steps=n_steps, v_cmd=(vx, 0.0)
    )
    if qty is not None:
        Q = params.mpc_weights.Q.at[1].set(qty).at[7].set(qwy)
        params = params._replace(
            mpc_weights=params.mpc_weights._replace(Q=Q)
        )
    params = params._replace(
        steps=params.steps._replace(
            step_width=jnp.asarray(width, jnp.float64),
            dcm_scale=jnp.asarray(dcm, jnp.float64),
        ),
        gait=params.gait._replace(
            double_support_duration=jnp.asarray(ds, jnp.float64),
            timing_gain=jnp.asarray(tgain, jnp.float64),
            timing_tol=jnp.asarray(ttol, jnp.float64),
            timing_rate_max=jnp.asarray(tmax, jnp.float64),
        ),
    )
    loop = MujocoLoop(model, cfg=cfg, params=params)
    half = 0.25 + ds
    total = int(1000 * (0.5 + n_steps * half + 1.5))
    coms = []
    trace = {"rpy": [], "clock": [], "vy": [], "qv": []}
    fell_at = -1
    chunk = 200
    for start in range(0, total, chunk):
        log = loop.run(min(chunk, total - start))
        coms.append(log["com"])
        trace["rpy"].append(
            np.asarray(rot.quat_to_rpy(jnp.asarray(loop.mj_data.qpos[3:7])))
        )
        trace["clock"].append(float(loop.state.gait_clock))
        trace["vy"].append(float(loop.mj_data.qvel[1]))
        trace["qv"].append(float(np.abs(loop.mj_data.qvel).max()))
        z = log["com"][:, 2]
        if not np.isfinite(z).all() or z.min() < 0.40:
            fell_at = start + int(np.argmax((~np.isfinite(z)) | (z < 0.40)))
            break
    com = np.concatenate(coms)
    if os.environ.get("EXP_TRACE"):
        np.savez(
            os.environ["EXP_TRACE"] + f"_tg{tgain}_w{width}.npz",
            com=com, **{k: np.asarray(v) for k, v in trace.items()},
        )
    rpy = np.asarray(rot.quat_to_rpy(jnp.asarray(loop.mj_data.qpos[3:7])))
    return {
        "cfg": (f"w{width}:ds{ds}:tg{tgain}:tt{ttol}:tm{tmax}:vx{vx}:"
                f"dcm{dcm}:qty{qty}:qwy{qwy}"),
        "n_steps": n_steps,
        "ticks": int(com.shape[0]),
        "total": total,
        "fell_at": fell_at,
        "z_min": round(float(com[:, 2].min()), 4),
        "x_prog": round(float(com[-1, 0] - com[0, 0]), 4),
        "y_final": round(float(com[-1, 1]), 4),
        "qvel_max": round(float(np.abs(loop.mj_data.qvel).max()), 4),
        "roll": round(float(rpy[0]), 4),
        "pitch": round(float(rpy[1]), 4),
    }


def main():
    n_steps = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    toks = sys.argv[2:] or ["0.16:0.35:0:0.05:2.0"]
    model = load_robot("g1_23dof", dtype=jnp.float64)
    for tok in toks:
        p = [float(x) for x in tok.split(":")]
        width, ds, tgain, ttol, tmax = p[0], p[1], p[2], p[3], p[4]
        vx = p[5] if len(p) > 5 else 0.1
        dcm = p[6] if len(p) > 6 else None
        if dcm is None:
            base = eng.mujoco_walking_scenario(jnp.float64)
            dcm = float(base.steps.dcm_scale)
        qty = p[7] if len(p) > 7 else None
        qwy = p[8] if len(p) > 8 else 0.5
        out = run_one(model, n_steps, width, ds, tgain, ttol, tmax, vx, dcm,
                      qty, qwy)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
