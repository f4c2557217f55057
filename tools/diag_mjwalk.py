"""Per-step MuJoCo walking diagnostic: what accumulates before the fall?

Runs the cascade against MuJoCo at a given gait config and prints one JSON
line PER STEP with the quantities the round-2/3 failure analysis needs:

* lateral: CoM y relative to the stance foot at touchdown, lateral DCM error
  vs the periodic orbit, per-single-support planned vs MuJoCo-realized
  lateral force impulse (the measured 50-70% under-delivery), roll extremes,
* sagittal: pitch extremes, forward velocity,
* timing: the gait-clock speedup actually used (step-timing adaptation).

Usage: python tools/diag_mjwalk.py [n_steps] \
    [width:ds:tgain:ttol:tmax[:vx[:dcm[:gwin[:gtol[:dslow[:dsmin]]]]]]]
(gwin/gtol: weight-transfer gate window fraction + xi tolerance — 0 0.03
by default, i.e. gate off. dslow/dsmin: DS slow-down gain + rate floor —
0 0.4 by default; dslow > 0 switches the gate window to the slow-down law.)
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
    """(3,) total world-frame ground reaction on the robot from MuJoCo."""
    mujoco = loop._mujoco
    f6 = np.zeros(6)
    total = np.zeros(3)
    for ci in range(loop.mj_data.ncon):
        c = loop.mj_data.contact[ci]
        mujoco.mj_contactForce(loop.mj_model, loop.mj_data, ci, f6)
        frame = np.asarray(c.frame).reshape(3, 3)  # rows = contact axes
        total += frame.T @ f6[:3]
    return total


def main():
    n_steps = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    tok = sys.argv[2] if len(sys.argv) > 2 else "0.12:0.25:3.0:0.03:2.0:0.1:1.3"
    p = [float(x) for x in tok.split(":")]
    width, ds, tgain, ttol, tmax = p[0], p[1], p[2], p[3], p[4]
    vx = p[5] if len(p) > 5 else 0.1
    dcm = p[6] if len(p) > 6 else 1.0
    gwin = p[7] if len(p) > 7 else 0.0
    gtol = p[8] if len(p) > 8 else 0.03
    dslow = p[9] if len(p) > 9 else 0.0
    dsmin = p[10] if len(p) > 10 else 0.4
    gztol = p[11] if len(p) > 11 else 0.06  # 99 = crouch guard off
    msw = p[12] if len(p) > 12 else 0.0  # swing-momentum preview mass [kg]

    model = load_robot("g1_23dof", dtype=jnp.float64)
    cfg = eng.walking_config()._replace(gait_gate=True)
    params = eng.mujoco_walking_scenario(jnp.float64, n_steps=n_steps,
                                         v_cmd=(vx, 0.0))
    params = params._replace(
        srbd=params.srbd._replace(m_swing=jnp.asarray(msw, jnp.float64)),
        steps=params.steps._replace(
            step_width=jnp.asarray(width, jnp.float64),
            dcm_scale=jnp.asarray(dcm, jnp.float64),
        ),
        gait=params.gait._replace(
            double_support_duration=jnp.asarray(ds, jnp.float64),
            timing_gain=jnp.asarray(tgain, jnp.float64),
            timing_tol=jnp.asarray(ttol, jnp.float64),
            timing_rate_max=jnp.asarray(tmax, jnp.float64),
            gate_window=jnp.asarray(gwin, jnp.float64),
            gate_xi_tol=jnp.asarray(gtol, jnp.float64),
            ds_slow_gain=jnp.asarray(dslow, jnp.float64),
            ds_rate_min=jnp.asarray(dsmin, jnp.float64),
            gate_z_tol=jnp.asarray(gztol, jnp.float64),
        ),
    )
    loop = MujocoLoop(model, cfg=cfg, params=params)
    idx = StackIndices.from_model(model)
    half = float(params.gait.swing_duration) + ds
    start = float(params.gait.start_time)
    total = int(1000 * (start + n_steps * half / (1.0) + 1.5)) + 2000

    omega0 = np.sqrt(9.80665 / cfg.com_height)

    prev_step = -1
    acc = None
    rows = []

    def flush(step_rec):
        if step_rec is not None:
            rows.append(step_rec)
            print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                              for k, v in step_rec.items()
                              if not k.startswith("_")}), flush=True)

    for t in range(total):
        log = loop.run(1)
        clock = float(loop.state.gait_clock)
        tau_g = clock - start
        step = int(np.floor(tau_g / half)) if tau_g >= 0 else -1
        in_gait = 0 <= step < int(n_steps)
        t_in = tau_g - step * half if in_gait else 0.0
        in_ss = in_gait and (t_in >= ds)

        com = log["com"][-1]
        qv = loop.mj_data.qvel
        rpy = np.asarray(rot.quat_to_rpy(jnp.asarray(loop.mj_data.qpos[3:7])))
        f_mj = mj_ground_force_world(loop)
        # WBID-planned net lateral force this tick (MPC u0 held over period).
        fy_plan = float(np.asarray(loop.state.u0).reshape(4, 3)[:, 1].sum())

        if step != prev_step and in_gait:
            flush(acc)
            X = rb.fk(model, jnp.asarray(loop.mj_data.qpos))
            feet = np.stack([np.asarray(rb.frame_pose(model, X, f).p)
                             for f in idx.feet])
            swing_left = step % 2 == 0
            stance_y = feet[1, 1] if swing_left else feet[0, 1]
            acc = {
                "step": step, "t0": round(clock, 3),
                "y_rel0": round(float(com[1] - stance_y), 4),
                "roll0": round(float(rpy[0]), 4),
                "vy0": round(float(qv[1]), 4),
                "fy_plan_imp": 0.0, "fy_mj_imp": 0.0,
                "fy_plan_ds": 0.0, "fy_mj_ds": 0.0,
                "ss_ms": 0,
                "wall_ms": 0, "roll_min": 0.0, "roll_max": 0.0,
                # Actual (force-sensed) touchdown of the PREVIOUS step's
                # swing foot vs the scheduled one: ms into this step's DS
                # until its ground force appears (td_lag_ms; 0 = already
                # loaded at the schedule flip) and its xy distance from the
                # planned landing at that moment (td_xy_err).
                "td_lag_ms": -1, "td_xy_err": -1.0,
            }
            land_prev = np.asarray(loop.state.landing).copy()
            prev_step = step
        if acc is not None and step == acc["step"]:
            acc["roll_min"] = min(acc["roll_min"], float(rpy[0]))
            acc["roll_max"] = max(acc["roll_max"], float(rpy[0]))
            acc["wall_ms"] += 1  # wall ticks in this step; < nominal
                                 # half-step ms => timing adaptation fired
            swing_left = acc["step"] % 2 == 0
            if in_ss:
                acc["fy_plan_imp"] += fy_plan * 1e-3
                acc["fy_mj_imp"] += float(f_mj[1]) * 1e-3
                acc["ss_ms"] += 1
            else:
                acc["fy_plan_ds"] += fy_plan * 1e-3
                acc["fy_mj_ds"] += float(f_mj[1]) * 1e-3
                # This step's DS: has the PREVIOUS step's swing foot landed?
                if acc["step"] > 0 and acc["td_lag_ms"] < 0:
                    prev_left = (acc["step"] - 1) % 2 == 0
                    fz = loop.foot_normal_forces()
                    f_sw = fz[0] if prev_left else fz[1]
                    if f_sw > 20.0:
                        acc["td_lag_ms"] = acc.get("_ds_ticks", 0)
                        X = rb.fk(model, jnp.asarray(loop.mj_data.qpos))
                        p_sw = np.asarray(rb.frame_pose(
                            model, X, idx.feet[0 if prev_left else 1]).p)
                        acc["td_xy_err"] = round(
                            float(np.linalg.norm(p_sw[:2] - land_prev[:2])), 4)
                    else:
                        acc["_ds_ticks"] = acc.get("_ds_ticks", 0) + 1
        z = com[2]
        if not np.isfinite(z) or z < 0.40:
            flush(acc)
            print(json.dumps({"fell_at": t, "z": float(z)}), flush=True)
            break
    else:
        flush(acc)
        print(json.dumps({"done": True, "ticks": total,
                          "z_final": float(log["com"][-1, 2]),
                          "qvel_max": float(np.abs(loop.mj_data.qvel).max())}),
              flush=True)


if __name__ == "__main__":
    main()
