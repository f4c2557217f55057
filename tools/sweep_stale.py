"""Scenario-knob sweep under the stale-solution cadence (mpc_delay=1).

The flagship walk falls under a one-period (40 ms) MPC compute delay even
with full delay compensation (round-4 measurement: plain scenario 2+2
steps, f32-robust bundle 4+3). Every candidate stabilizer (DCM placement
scale, step timing adaptation, landing lock, gait timing, sway) lives in
the per-scenario pytree, so the whole matrix is ONE vmapped compile.

Usage: python tools/sweep_stale.py [wave]
Prints one JSON line per variant with the walking invariants.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from g1_locomotion_tpu.engine import tick as eng


def variants(wave: int):
    """(label, base, overrides): base 'w' = walking_scenario,
    'r' = walking_scenario_f32_robust (dcm 1.3, timing 3, lock 0.65)."""
    if wave == 0:
        return [
            ("w-base", "w", {}),
            ("r-base", "r", {}),
            ("r-ds030", "r", {"g_double_support_duration": 0.30}),
            ("r-ds035", "r", {"g_double_support_duration": 0.35}),
            ("r-rate25", "r", {"g_swing_xy_rate_max": 2.5}),
            ("r-lock05", "r", {"g_landing_lock": 0.5}),
            ("r-lock08", "r", {"g_landing_lock": 0.8}),
            ("r-dcm115", "r", {"s_dcm_scale": 1.15}),
            ("r-dcm145", "r", {"s_dcm_scale": 1.45}),
            ("r-sway09", "r", {"g_sway_gain": 0.9}),
            ("r-sway11", "r", {"g_sway_gain": 1.1}),
            ("w-dcm12", "w", {"s_dcm_scale": 1.2}),
            ("w-dcm13", "w", {"s_dcm_scale": 1.3}),
            ("r-t0", "r", {"g_timing_gain": 0.0}),
            ("r-ds030-dcm145", "r", {"g_double_support_duration": 0.30,
                                     "s_dcm_scale": 1.45}),
            ("r-width016", "r", {"s_step_width": 0.16}),
        ]
    if wave == 1:
        # Wave-0 finding: the EARLY landing lock is the decisive lever —
        # r-lock05 walks the full bar under delay=1 (the delayed landing
        # updates arrive a period late; committing the foothold sooner
        # keeps it reachable). Map the margin around 0.5.
        return [
            ("r-lock040", "r", {"g_landing_lock": 0.40}),
            ("r-lock045", "r", {"g_landing_lock": 0.45}),
            ("r-lock050", "r", {"g_landing_lock": 0.50}),
            ("r-lock055", "r", {"g_landing_lock": 0.55}),
            ("r-lock060", "r", {"g_landing_lock": 0.60}),
            ("r-lock050-t0", "r", {"g_landing_lock": 0.50,
                                   "g_timing_gain": 0.0}),
            ("w-lock050", "w", {"g_landing_lock": 0.50}),
            ("r-lock050-dcm12", "r", {"g_landing_lock": 0.50,
                                      "s_dcm_scale": 1.2}),
        ]
    raise SystemExit(f"unknown wave {wave}")


def apply(params, ov):
    g, s = params.gait, params.steps
    for k, val in ov.items():
        a = jnp.asarray(val, jnp.float64)
        if k.startswith("g_"):
            g = g._replace(**{k[2:]: a})
        elif k.startswith("s_"):
            s = s._replace(**{k[2:]: a})
        else:
            raise ValueError(k)
    return params._replace(gait=g, steps=s)


def main():
    wave = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    specs = variants(wave)
    from g1_locomotion_tpu.models.robot import load_robot
    from g1_locomotion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    model = load_robot("g1_23dof", dtype=jnp.float64)
    cfg = eng.walking_config()._replace(mpc_delay=1)
    base_w = eng.walking_scenario(jnp.float64, n_steps=8.0, v_cmd=(0.1, 0.0))
    base_r = eng.walking_scenario_f32_robust(jnp.float64, n_steps=8.0,
                                             v_cmd=(0.1, 0.0))
    built = [
        apply(base_w if b == "w" else base_r, ov) for _, b, ov in specs
    ]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *built)

    rollout = eng.make_rollout(model, cfg)
    state0 = eng.init_state(model, cfg, jnp.float64)
    halves = [
        ov.get("g_swing_duration", 0.25)
        + ov.get("g_double_support_duration", 0.25)
        for _, _, ov in specs
    ]
    n_periods = int(np.ceil((0.5 + 8.0 * max(halves) + 1.5) / 0.04))

    run = jax.jit(jax.vmap(lambda p: rollout(state0, p, n_periods)))
    final, logs = jax.block_until_ready(run(batch))

    com = np.asarray(logs.com)
    B = com.shape[0]
    com = com.reshape(B, -1, 3)
    contact = np.asarray(logs.contact).reshape(B, -1, 4)
    for i, (label, b, ov) in enumerate(specs):
        c = com[i]
        ok = bool(np.isfinite(c).all())
        left_up = (contact[i][:, 0] < 0.5).astype(int)
        right_up = (contact[i][:, 2] < 0.5).astype(int)
        zmin = float(np.nanmin(c[:, 2]))
        ymax = float(np.nanmax(np.abs(c[:, 1])))
        zfin = float(c[-1, 2])
        vfin = float(np.abs(np.asarray(final.v[i])).max())
        out = {
            "label": label, "finite": ok,
            "z_min": round(zmin, 4), "y_max": round(ymax, 4),
            "z_final": round(zfin, 4), "v_final": round(vfin, 4),
            "steps_L": int(np.clip(np.diff(left_up), 0, 1).sum()),
            "steps_R": int(np.clip(np.diff(right_up), 0, 1).sum()),
        }
        out["walks"] = bool(
            ok and zmin > 0.45 and ymax < 0.25
            and abs(zfin - 0.598) < 0.02 and vfin < 0.3
            and out["steps_L"] == 4 and out["steps_R"] == 4
        )
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
