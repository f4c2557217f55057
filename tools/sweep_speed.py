"""Speed-envelope sweep: full-engine walking at off-nominal commanded speeds.

Sweeps ScenarioParams knobs (gait timing, DCM/timing adaptation, swing rate
caps) at v_cmd in {0.05, 0.2} m/s on the whole-body engine — the two ends of
the envelope where the validated 0.1 m/s configuration is marginal/untuned
(TODO.md 4b). Every knob lives in the per-scenario pytree, so the sweep is a
SINGLE-DEVICE vmapped rollout (one compile for all variants; the CPU
backend's intra-op threading parallelizes the batched linear algebra —
explicit mesh sharding buys nothing on a 4-core host).

Usage: python tools/sweep_speed.py [wave]
  wave: 0 = v_cmd 0.2 variants, 1 = v_cmd 0.05 variants,
        2 = both in one compile (default).
Prints one JSON line per config with stability/tracking scores.
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

# Rollout length is sized in main() from the slowest variant's half-step
# (n_steps x max(swing+ds) + stand + margin): a fixed count scored the
# long-cycle variants (ds030, mujoco-timing) mid-gait and their z/v finals
# were not comparable (ADVICE round 2).


def variants(wave: int):
    """(v_cmd_x, list of (label, dict-of-overrides)). Override keys are
    prefixed g_* (GaitConfig fields) or s_* (FootstepConfig fields); the
    commanded speed is the per-wave v returned alongside."""
    if wave == 0:
        v = 0.2
        return v, [
            ("base", {}),
            ("ds030", {"g_double_support_duration": 0.30}),
            ("mujoco-timing", {"g_double_support_duration": 0.35,
                               "s_step_width": 0.16}),
            ("swing020", {"g_swing_duration": 0.20,
                          "g_double_support_duration": 0.30}),
            ("timing3", {"g_timing_gain": 3.0}),
            ("dcm12", {"s_dcm_scale": 1.2}),
            ("rate25", {"g_swing_xy_rate_max": 2.5}),
            ("sway08", {"g_sway_gain": 0.8}),
        ]
    v = 0.05
    # Wave-1 history: of the first 8 variants (base, dcm07, dcm05, swing020,
    # ds030, sway09, dcm07-ds030, dcm08-t3) only dcm08-t3 was STABLE — but it
    # walks in place (v_real ~ 0.004): the shared dcm_scale damps sagittal
    # capture along with the lateral over-stepping it was meant to fix.
    # This wave splits the axes (s_dcm_scale_x).
    return v, [
        ("dcm08-t3", {"s_dcm_scale": 0.8, "g_timing_gain": 3.0}),
        ("dcm08x10-t3", {"s_dcm_scale": 0.8, "s_dcm_scale_x": 1.0,
                         "g_timing_gain": 3.0}),
        ("dcm08x12-t3", {"s_dcm_scale": 0.8, "s_dcm_scale_x": 1.2,
                         "g_timing_gain": 3.0}),
        ("dcm08x15-t3", {"s_dcm_scale": 0.8, "s_dcm_scale_x": 1.5,
                         "g_timing_gain": 3.0}),
        ("dcm07x10", {"s_dcm_scale": 0.7, "s_dcm_scale_x": 1.0}),
        ("dcm08x10", {"s_dcm_scale": 0.8, "s_dcm_scale_x": 1.0}),
    ]


def apply(params, ov, v):
    g = params.gait
    s = params.steps
    for k, val in ov.items():
        a = jnp.asarray(val, jnp.float64)
        if k.startswith("g_"):
            g = g._replace(**{k[2:]: a})
        elif k.startswith("s_"):
            s = s._replace(**{k[2:]: a})
        else:
            raise ValueError(
                f"unrecognized override key {k!r} (use g_<gait-field> or "
                "s_<footstep-field>)"
            )
    return params._replace(
        gait=g, steps=s, v_cmd=jnp.asarray([v, 0.0], jnp.float64)
    )


def main():
    wave = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    if wave not in (0, 1, 2):
        raise SystemExit(f"wave must be 0, 1 or 2, got {wave}")
    if wave == 2:  # both waves in one compile
        v0, s0 = variants(0)
        v1, s1 = variants(1)
        specs = [(0, v0, l, ov) for l, ov in s0] + [
            (1, v1, l, ov) for l, ov in s1
        ]
    else:
        v, sp = variants(wave)
        specs = [(wave, v, l, ov) for l, ov in sp]
    from g1_locomotion_tpu.models.robot import load_robot
    from g1_locomotion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    model = load_robot("g1_23dof", dtype=jnp.float64)
    cfg = eng.walking_config()
    base = eng.walking_scenario(jnp.float64, n_steps=8.0)
    batch = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[apply(base, ov, vv) for _, vv, _, ov in specs],
    )

    rollout = eng.make_rollout(model, cfg)
    state0 = eng.init_state(model, cfg, jnp.float64)

    # Size the (shared) rollout so every variant finishes all 8 steps:
    # stand (0.5 s) + 8 x slowest half-step + 0.3 s margin.
    halves = []
    for _, vv, _, ov in specs:
        swing = ov.get("g_swing_duration", 0.25)
        ds = ov.get("g_double_support_duration", 0.25)
        halves.append(swing + ds)
    n_periods = int(np.ceil((0.5 + 8.0 * max(halves) + 0.3) / 0.04))

    # Plain vmap on one device: the CPU backend's intra-op threading
    # parallelizes the batched linear algebra (explicit mesh sharding would
    # require out_sharding annotations throughout the engine — jax 0.9's
    # explicit-sharding mode — for no win on a 4-core host).
    run = jax.jit(jax.vmap(lambda p: rollout(state0, p, n_periods)))
    final, logs = jax.block_until_ready(run(batch))

    com = np.asarray(logs.com)  # (B, P, 40, 3)
    B = com.shape[0]
    com = com.reshape(B, -1, 3)
    for i, (w, vv, label, ov_i) in enumerate(specs):
        v = vv
        c = com[i]
        # Per-variant mid-walk scoring window: steps 2..7 of ITS OWN cycle.
        half_i = halves[i]
        t0 = int((0.5 + 2.0 * half_i) * 1000)
        t1 = int((0.5 + 7.0 * half_i) * 1000)
        ok = bool(np.isfinite(c).all())
        zmin = float(np.nanmin(c[:, 2])) if ok else float("nan")
        ymax = float(np.nanmax(np.abs(c[:, 1]))) if ok else float("nan")
        v_real = (
            float((c[t1, 0] - c[t0, 0]) / ((t1 - t0) * 1e-3)) if ok else None
        )
        vfin = float(np.abs(np.asarray(final.v[i])).max()) if ok else None
        zfin = float(c[-1, 2]) if ok else None
        print(json.dumps({
            "wave": w, "v": v, "label": label, "finite": ok,
            "z_min": zmin, "y_max": ymax, "v_real": v_real,
            "v_final": vfin, "z_final": zfin,
            "walks": ok and zmin > 0.45 and ymax < 0.25,
        }), flush=True)


if __name__ == "__main__":
    main()
