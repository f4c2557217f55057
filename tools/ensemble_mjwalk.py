"""Ensemble MuJoCo walking robustness runner.

Closed-loop MuJoCo walking at the nominal gait is chaotically sensitive:
ulp-level controller changes flip a 16-step run into a 6-step fall (round-3
measurement — the world-frame dynamics rewrite, numerically identical to
1e-13, changed the step count of a single run from 16 to 6). Single runs
therefore measure LUCK, not margin. This tool measures margin: it perturbs
the post-settle state with a tiny joint-velocity kick (deterministic per
seed) and reports how far each ensemble member walks.

Usage:
  python tools/ensemble_mjwalk.py <n_steps> <seeds> [key=val ...]

Keys: tpm (ticks_per_mpc, default 40), width (step width), ds, tgain, ttol,
dcm, gztol, lock (landing_lock), swing, vx, noise (mid-walk base push
magnitude [m/s], default 0.05; seed 0 is always the unperturbed run, seeds
>= 1 push in a seed-dependent direction during step 1), nom=1 (use the
NOMINAL-geometry walking_scenario instead of the widened
mujoco_walking_scenario), msw (SRBDParams.m_swing — swing-limb momentum
preview mass [kg], default 0 = off).

Prints one JSON line per member: {seed, steps_done, fell_at, pass, ...} and
a final summary line.
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


def run_member(model, cfg, params, n_steps, half, seed, noise):
    """One rollout with a seed-dependent mid-walk base-velocity push.

    A pre-gait joint-velocity kick is useless as an ensemble probe: 0.5 s of
    stable standing contracts it to nothing and every member reproduces the
    same trajectory (measured round 3 — 4 'seeds', 4 bit-identical falls).
    A push DURING step 1 actually probes the walking controller's margin."""
    loop = MujocoLoop(model, cfg=cfg, params=params)
    rng = np.random.default_rng(seed)
    start = float(params.gait.start_time)
    # Walk into step 1, then shove the base (seed 0 = unperturbed).
    loop.run(int(1000 * (start + 0.5 * half)))
    if seed > 0:
        ang = rng.uniform(0, 2 * np.pi)
        loop.mj_data.qvel[0] += noise * np.cos(ang)
        loop.mj_data.qvel[1] += noise * np.sin(ang)
    # Walk + settle budget; crouch-guard / gate clock holds extend the gait
    # in wall time, so give slack beyond the nominal schedule.
    total = int(1000 * (start + n_steps * half + 1.5)) + 2500
    fell_at = -1
    z_min = 10.0
    chunk = 250
    t = int(1000 * (start + 0.5 * half))
    while t < total:
        log = loop.run(chunk)
        t += chunk
        z = float(np.min(log["com"][:, 2]))
        z_min = min(z_min, z)
        if z < 0.40:
            fell_at = t
            break
    clock = float(loop.state.gait_clock)
    steps_done = max(0.0, min(n_steps, (clock - start) / half))
    if fell_at > 0:
        # The clock may coast after the fall inside the last chunk; cap by
        # the wall time of the fall.
        steps_done = min(steps_done, max(0.0, (fell_at / 1000.0 - start) / half))
    rpy = np.asarray(rot.quat_to_rpy(jnp.asarray(loop.mj_data.qpos[3:7])))
    com_z = float(loop.mj_data.qpos[2])
    quiet = float(np.abs(loop.mj_data.qvel).max())
    ok = bool(
        fell_at < 0
        and steps_done >= n_steps - 1e-6
        and quiet < 0.3
        and max(abs(rpy[0]), abs(rpy[1])) < 0.1
    )
    return {
        "seed": seed,
        "steps_done": round(steps_done, 2),
        "fell_at": fell_at,
        "z_min": round(z_min, 3),
        "quiet": round(quiet, 3),
        "rpy": [round(float(x), 3) for x in rpy[:2]],
        "pass": ok,
    }


def main():
    n_steps = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    kv = dict(a.split("=", 1) for a in sys.argv[3:])
    tpm = int(kv.get("tpm", 40))
    noise = float(kv.get("noise", 0.05))
    vx = float(kv.get("vx", 0.1))

    model = load_robot("g1_23dof", dtype=jnp.float64)
    cfg = eng.walking_config()._replace(ticks_per_mpc=tpm)
    if "dslow" in kv or "gwin" in kv:
        cfg = cfg._replace(gait_gate=True)
    if any(k in kv for k in ("sramp", "pstop", "dcmeg")):
        cfg = cfg._replace(plan_extras=True)  # round-5 planner mechanisms  # compile the DS-tail clock law in
    scenario = (
        eng.walking_scenario if kv.get("nom") == "1"
        else eng.mujoco_walking_scenario
    )
    params = scenario(jnp.float64, n_steps=n_steps, v_cmd=(vx, 0.0))
    f64 = jnp.float64
    if "msw" in kv:
        params = params._replace(
            srbd=params.srbd._replace(
                m_swing=jnp.asarray(float(kv["msw"]), f64)
            )
        )
    if "wy" in kv:  # lateral net-wrench pin weight (w_wrench_total[1])
        wt = np.array(params.wbid_gains.w_wrench_total, np.float64)
        wt[1] = float(kv["wy"])
        params = params._replace(
            wbid_gains=params.wbid_gains._replace(
                w_wrench_total=jnp.asarray(wt, f64)
            )
        )
    if "sway" in kv:
        params = params._replace(
            gait=params.gait._replace(
                sway_gain=jnp.asarray(float(kv["sway"]), f64)
            )
        )
    if "width" in kv:
        params = params._replace(
            steps=params.steps._replace(
                step_width=jnp.asarray(float(kv["width"]), f64)
            )
        )
    if "dcm" in kv:
        params = params._replace(
            steps=params.steps._replace(
                dcm_scale=jnp.asarray(float(kv["dcm"]), f64)
            )
        )
    if "fwiden" in kv:  # terminal stance widening (last two landings)
        params = params._replace(
            steps=params.steps._replace(
                final_widen=jnp.asarray(float(kv["fwiden"]), f64)
            )
        )
    gait = params.gait
    for k, field in (
        ("ds", "double_support_duration"),
        ("tgain", "timing_gain"),
        ("ttol", "timing_tol"),
        ("gztol", "gate_z_tol"),
        ("lock", "landing_lock"),
        ("swing", "swing_duration"),
        ("lean", "lean_gain"),
        ("gwin", "gate_window"),
        ("gxitol", "gate_xi_tol"),
        ("dslow", "ds_slow_gain"),
        ("dsmin", "ds_rate_min"),
        ("rate", "swing_xy_rate_max"),
        ("blend", "settle_blend_s"),
        ("exit", "exit_blend_scale"),
        ("sramp", "stop_ramp_s"),
        ("pstop", "pre_stop_s"),
    ):
        if k in kv:
            gait = gait._replace(**{field: jnp.asarray(float(kv[k]), f64)})
    params = params._replace(gait=gait)
    if "kneeg" in kv:  # settle knee guard: leg postural weight + flag
        cfg = cfg._replace(settle_knee_guard=True)
        params = params._replace(
            wbid_gains=params.wbid_gains._replace(
                w_posture_legs=jnp.asarray(float(kv["kneeg"]), f64)
            )
        )

    half = float(params.gait.swing_duration) + float(
        params.gait.double_support_duration
    )
    rows = []
    for seed in range(seeds):
        r = run_member(model, cfg, params, n_steps, half, seed, noise)
        rows.append(r)
        print(json.dumps(r), flush=True)
    n_pass = sum(r["pass"] for r in rows)
    print(
        json.dumps(
            {
                "summary": True,
                "config": {"tpm": tpm, "n_steps": n_steps, **kv},
                "pass": n_pass,
                "total": len(rows),
                "min_steps": min(r["steps_done"] for r in rows),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
