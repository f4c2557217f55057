"""g1_29dof_with_hand carry-walk experiment (BASELINE config 4 beyond
standing): the full cascaded 8-step walk with the hand Cartesian hold tasks
active (EngineConfig.hand_task — each hand tracks its standing base-relative
pose, yaw-following). Reports the walking invariants plus the max hand
tracking error over the rollout.

Usage: python tools/exp_walk_hand.py [n_periods]
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
from g1_locomotion_tpu.models import robot as rb
from g1_locomotion_tpu.models.robot import load_robot
from g1_locomotion_tpu.wbid.stack import StackIndices


def main():
    n_periods = int(sys.argv[1]) if len(sys.argv) > 1 else 163
    dtype = jnp.float64
    model = load_robot("g1_29dof_with_hand", dtype=dtype)
    hand = "nohand" not in sys.argv[1:]
    cfg = eng.variant_walking_config(model)._replace(
        hand_task=hand, log_q=True
    )
    params = eng.variant_walking_scenario(model, dtype, n_steps=8.0,
                                          v_cmd=(0.1, 0.0))
    for a in sys.argv[1:]:
        if a.startswith("blend="):
            params = params._replace(gait=params.gait._replace(
                settle_blend_s=jnp.asarray(float(a.split("=")[1]), dtype)))
        if a.startswith("wh="):
            params = params._replace(wbid_gains=params.wbid_gains._replace(
                w_hand=jnp.asarray(float(a.split("=")[1]), dtype)))
        if a.startswith("hkd="):
            params = params._replace(wbid_gains=params.wbid_gains._replace(
                hand_kd=jnp.asarray(float(a.split("=")[1]), dtype)))
        if a.startswith("comh="):
            cfg = cfg._replace(com_height=float(a.split("=")[1]))
        if a.startswith("wp="):
            params = params._replace(wbid_gains=params.wbid_gains._replace(
                w_posture=jnp.asarray(float(a.split("=")[1]), dtype)))
    rollout = eng.make_rollout(model, cfg)
    state = eng.init_state(model, cfg, dtype)
    t0 = time.time()
    final, logs = jax.jit(lambda s: rollout(s, params, n_periods))(state)
    jax.block_until_ready(final.q)
    wall = time.time() - t0

    com = np.asarray(logs.com).reshape(-1, 3)
    contact = np.asarray(logs.contact).reshape(-1, 4)
    left_up = (contact[:, 0] < 0.5).astype(int)
    right_up = (contact[:, 2] < 0.5).astype(int)
    rpy = np.asarray(rot.quat_to_rpy(final.q[3:7]))

    # Hand tracking error: per logged tick, hand position vs the
    # base-relative hold target (subsampled for speed).
    idx = StackIndices.from_model(model)
    qs = np.asarray(logs.q).reshape(-1, model.nq)[::40]
    q_stand = np.asarray(eng.q_init_standing(model, dtype))
    Xs = rb.fk(model, jnp.asarray(q_stand))
    offs = jnp.stack([
        Xs.R[0].T @ (rb.frame_pose(model, Xs, f).p - Xs.p[0])
        for f in idx.hands
    ])

    def hand_err(q):
        q = jnp.asarray(q)
        X = rb.fk(model, q)
        yawR = rot.yaw_matrix(rot.quat_to_rpy(q[3:7])[2])
        tgt = q[0:3][None, :] + offs @ yawR.T
        cur = jnp.stack([rb.frame_pose(model, X, f).p for f in idx.hands])
        return jnp.abs(cur - tgt).max()

    errs = [float(hand_err(q)) for q in qs]
    out = {
        "variant": "g1_29dof_with_hand",
        "hand_task": hand,
        "n_periods": n_periods,
        "wall_s": round(wall, 1),
        "nan_free": bool(np.isfinite(com).all()),
        "z_min": round(float(com[:, 2].min()), 4),
        "y_absmax": round(float(np.abs(com[:, 1]).max()), 4),
        "z_final": round(float(com[-1, 2]), 4),
        "x_final": round(float(com[-1, 0]), 4),
        "v_final_max": round(float(jnp.abs(final.v).max()), 4),
        "rpy_final": [round(float(x), 4) for x in rpy],
        "steps_L": int(np.clip(np.diff(left_up), 0, 1).sum()),
        "steps_R": int(np.clip(np.diff(right_up), 0, 1).sum()),
        "hand_err_max": round(max(errs), 4),
        "hand_err_final": round(errs[-1], 4),
    }
    for k in range(0, com.shape[0], 500):
        j = min(k + 499, com.shape[0] - 1)
        print(f"t={k/1000:5.2f}-{(j+1)/1000:5.2f}s  "
              f"z=[{com[k:j+1,2].min():.4f},{com[k:j+1,2].max():.4f}]  "
              f"y=[{com[k:j+1,1].min():+.4f},{com[k:j+1,1].max():+.4f}]",
              flush=True)
    out["walks"] = bool(
        out["nan_free"] and out["z_min"] > 0.45 and out["y_absmax"] < 0.25
        and abs(out["z_final"] - 0.598) < 0.03 and out["v_final_max"] < 0.3
        and out["steps_L"] == 4 and out["steps_R"] == 4
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
