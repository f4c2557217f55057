"""Walk-to-stand SETTLE diagnostic (round 5): what topples the robot after
the last touchdown at nominal MuJoCo geometry?

The nominal-geometry ensemble members now complete all 8 steps and capsize
0.5-3.5 s INTO the settle (tools/ensemble_mjwalk.py round-4/5 records); the
per-step diag (tools/diag_mjwalk.py) only covers the gait. This logs the
settle at 20 ms resolution: CoM y / vy, roll, feet y, the MPC's planned net
lateral force vs MuJoCo's realized ground reaction, and the plan's lateral
reference — enough to tell a slow drift from a growing oscillation from a
reference mismatch.

Usage: python tools/diag_settle.py [key=val ...]   (keys as ensemble_mjwalk)
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
from g1_locomotion_tpu.models import robot as rb
from g1_locomotion_tpu.models.robot import load_robot
from g1_locomotion_tpu.wbid.stack import StackIndices


def mj_ground_force_world(loop):
    mujoco = loop._mujoco
    f6 = np.zeros(6)
    total = np.zeros(3)
    for ci in range(loop.mj_data.ncon):
        c = loop.mj_data.contact[ci]
        mujoco.mj_contactForce(loop.mj_model, loop.mj_data, ci, f6)
        frame = np.asarray(c.frame).reshape(3, 3)
        total += frame.T @ f6[:3]
    return total


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    f64 = jnp.float64
    n_steps = float(kv.get("steps", 8))
    model = load_robot("g1_23dof", dtype=f64)
    cfg = eng.walking_config()._replace(ticks_per_mpc=int(kv.get("tpm", 40)))
    if "dslow" in kv or "gwin" in kv:
        cfg = cfg._replace(gait_gate=True)
    if any(k in kv for k in ("sramp", "pstop", "dcmeg")):
        cfg = cfg._replace(plan_extras=True)  # round-5 planner mechanisms
    scenario = (
        eng.walking_scenario if kv.get("nom") == "1"
        else eng.mujoco_walking_scenario
    )
    params = scenario(f64, n_steps=n_steps,
                      v_cmd=(float(kv.get("vx", 0.1)), 0.0))
    if "msw" in kv:
        params = params._replace(
            srbd=params.srbd._replace(m_swing=jnp.asarray(float(kv["msw"]), f64))
        )
    steps_cfg = params.steps
    for k, field in (("width", "step_width"), ("dcm", "dcm_scale"),
                     ("fwiden", "final_widen")):
        if k in kv:
            steps_cfg = steps_cfg._replace(**{field: jnp.asarray(float(kv[k]), f64)})
    gait = params.gait
    for k, field in (
        ("ds", "double_support_duration"), ("tgain", "timing_gain"),
        ("ttol", "timing_tol"), ("gztol", "gate_z_tol"),
        ("lock", "landing_lock"), ("swing", "swing_duration"),
        ("gwin", "gate_window"), ("gxitol", "gate_xi_tol"),
        ("dslow", "ds_slow_gain"), ("dsmin", "ds_rate_min"),
        ("blend", "settle_blend_s"), ("exit", "exit_blend_scale"),
        ("sramp", "stop_ramp_s"), ("pstop", "pre_stop_s"),
    ):
        if k in kv:
            gait = gait._replace(**{field: jnp.asarray(float(kv[k]), f64)})
    params = params._replace(gait=gait, steps=steps_cfg)
    if "kneeg" in kv:  # settle knee guard: leg postural weight + flag
        cfg = cfg._replace(settle_knee_guard=True)
        params = params._replace(
            wbid_gains=params.wbid_gains._replace(
                w_posture_legs=jnp.asarray(float(kv["kneeg"]), f64)
            )
        )

    loop = MujocoLoop(model, cfg=cfg, params=params)
    idx = StackIndices.from_model(model)
    half = float(params.gait.swing_duration) + float(
        params.gait.double_support_duration
    )
    start = float(params.gait.start_time)
    t_end = start + n_steps * half  # nominal last-touchdown clock

    # Walk to one second before the nominal end (clock holds can stretch
    # wall time), then log the walk tail + settle at 20 ms resolution.
    walked = 0
    while float(loop.state.gait_clock) < t_end - 1.0 and walked < 20000:
        loop.run(250)
        walked += 250
    print(json.dumps({"walk_done_wall_ms": walked,
                      "clock": round(float(loop.state.gait_clock), 3)}),
          flush=True)

    # Walk tail + settle: log every 20 ms (t < 0 = before nominal t_end).
    for k in range(-50, 200):
        log = loop.run(20)
        com = log["com"][-1]
        qv = np.asarray(loop.mj_data.qvel)
        rpy = np.asarray(rot.quat_to_rpy(jnp.asarray(loop.mj_data.qpos[3:7])))
        X = rb.fk(model, jnp.asarray(loop.mj_data.qpos))
        feet = np.stack([np.asarray(rb.frame_pose(model, X, f).p)
                         for f in idx.feet])
        f_mj = mj_ground_force_world(loop)
        u0 = np.asarray(loop.state.u0).reshape(4, 3)
        Rb = np.asarray(rot.quat_to_matrix(jnp.asarray(loop.mj_data.qpos[3:7])))
        tilt = float(np.arccos(np.clip(Rb[2, 2], -1.0, 1.0)))
        x1 = np.asarray(loop.state.x_opt1)
        qj = np.asarray(loop.mj_data.qpos[7:])
        names = list(model.joint_names)
        kneeL = float(qj[names.index("left_knee_joint")])
        kneeR = float(qj[names.index("right_knee_joint")])
        row = {
            "t": round(float(loop.state.gait_clock) - t_end, 2),
            "x": round(float(com[0]), 4),
            "y": round(float(com[1]), 4),
            "vy": round(float(qv[1]), 4),
            "vx": round(float(qv[0]), 4),
            "z": round(float(com[2]), 4),
            "tilt": round(tilt, 4),
            "zref1": round(float(x1[5]), 4),
            "xref1": round(float(x1[3]), 4),
            "knee": [round(kneeL, 3), round(kneeR, 3)],
            "roll": round(float(rpy[0]), 4),
            "pitch": round(float(rpy[1]), 4),
            "feet_y": [round(float(feet[0, 1]), 3), round(float(feet[1, 1]), 3)],
            "feet_z": [round(float(feet[0, 2]), 3), round(float(feet[1, 2]), 3)],
            "fy_plan": round(float(u0[:, 1].sum()), 1),
            "fy_mj": round(float(f_mj[1]), 1),
            "fz_mj": round(float(f_mj[2]), 1),
        }
        print(json.dumps(row), flush=True)
        if float(com[2]) < 0.35:
            print(json.dumps({"fell_at_settle_s": row["t"]}), flush=True)
            break


if __name__ == "__main__":
    main()
