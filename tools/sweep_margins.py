"""Knife-edge margin mapping (VERDICT round-3 weak #5 / next-round #8):
turn the pinned single-point walking configs into measured ranges by
sweeping each bundle axis around its validated center in ONE vmapped
compile per wave.

Waves:
  0 = f32 flagship bundle (walking_scenario_f32_robust at f32,
      walking_config_f32): landing_lock / dcm_scale / gate_z_tol /
      timing_gain axes.
  1 = same axes with the swing-momentum preview on (m_swing=1; 2+ breaks
      the internal gait, tools/sweep_msw.py) — does the better MPC model
      widen the f32 margins?
  2 = 29-DoF w_posture axis (variant_walking_scenario, f64).

Usage: python tools/sweep_margins.py [wave]
Prints one JSON line per point with the walking invariants.
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


def f32_axes():
    """(label, overrides) around the validated f32 bundle center."""
    pts = [("center", {})]
    for v in (0.60, 0.625, 0.675, 0.70):
        pts.append((f"lock{v}", {"g_landing_lock": v}))
    for v in (1.2, 1.25, 1.35, 1.4):
        pts.append((f"dcm{v}", {"s_dcm_scale": v}))
    for v in (0.09, 0.15):
        pts.append((f"gztol{v}", {"g_gate_z_tol": v}))
    for v in (2.0, 4.0):
        pts.append((f"tgain{v}", {"g_timing_gain": v}))
    return pts


def apply(params, ov, dtype):
    g, s, srbd_p = params.gait, params.steps, params.srbd
    for k, val in ov.items():
        a = jnp.asarray(val, dtype)
        if k.startswith("g_"):
            g = g._replace(**{k[2:]: a})
        elif k.startswith("s_"):
            s = s._replace(**{k[2:]: a})
        elif k.startswith("r_"):
            srbd_p = srbd_p._replace(**{k[2:]: a})
        else:
            raise ValueError(k)
    return params._replace(gait=g, steps=s, srbd=srbd_p)


def report(specs, final, logs, com_height, extra=None):
    com = np.asarray(logs.com)
    B = com.shape[0]
    com = com.reshape(B, -1, 3)
    contact = np.asarray(logs.contact).reshape(B, -1, 4)
    n_pass = 0
    for i, (label, ov) in enumerate(specs):
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
            and abs(zfin - com_height) < 0.02 and vfin < 0.3
            and out["steps_L"] == 4 and out["steps_R"] == 4
        )
        if extra:
            out.update(extra)
        n_pass += out["walks"]
        print(json.dumps(out), flush=True)
    print(json.dumps({"summary": True, "pass": n_pass, "total": B}),
          flush=True)


def wave_f32(msw: float):
    from g1_locomotion_tpu.models.robot import load_robot
    from g1_locomotion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    dtype = jnp.float32
    model = load_robot("g1_23dof", dtype=dtype)
    cfg = eng.walking_config_f32()
    base = eng.walking_scenario_f32_robust(dtype, n_steps=8.0,
                                           v_cmd=(0.1, 0.0))
    if msw > 0:
        base = base._replace(
            srbd=base.srbd._replace(m_swing=jnp.asarray(msw, dtype))
        )
    specs = f32_axes()
    built = [apply(base, ov, dtype) for _, ov in specs]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *built)
    rollout = eng.make_rollout(model, cfg)
    state0 = eng.init_state(model, cfg, dtype)
    run = jax.jit(jax.vmap(lambda p: rollout(state0, p, 180)))
    final, logs = jax.block_until_ready(run(batch))
    report(specs, final, logs, cfg.com_height, extra={"m_swing": msw})


def wave_dcm_sched():
    """Round-5 wave 3: state-scheduled DCM gain (FootstepConfig.dcm_err_gain)
    x dcm_scale grid on the f32 flagship bundle. Question: does a nonzero
    error-proportional term open a RANGE on dcm_scale (point-like at 1.3,
    docs/ROBUSTNESS.md)?"""
    from g1_locomotion_tpu.models.robot import load_robot
    from g1_locomotion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    dtype = jnp.float32
    model = load_robot("g1_23dof", dtype=dtype)
    cfg = eng.walking_config_f32()._replace(plan_extras=True)
    base = eng.walking_scenario_f32_robust(dtype, n_steps=8.0,
                                           v_cmd=(0.1, 0.0))
    specs = []
    for dcm in (1.1, 1.2, 1.3, 1.4):
        for eg in (0.0, 10.0, 25.0, 50.0):
            specs.append((
                f"dcm{dcm}-eg{eg}",
                {"s_dcm_scale": dcm, "s_dcm_err_gain": eg},
            ))
    built = [apply(base, ov, dtype) for _, ov in specs]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *built)
    rollout = eng.make_rollout(model, cfg)
    state0 = eng.init_state(model, cfg, dtype)
    run = jax.jit(jax.vmap(lambda p: rollout(state0, p, 180)))
    final, logs = jax.block_until_ready(run(batch))
    report(specs, final, logs, cfg.com_height)


def wave_29dof():
    from g1_locomotion_tpu.models.robot import load_robot
    from g1_locomotion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    dtype = jnp.float64
    model = load_robot("g1_29dof", dtype=dtype)
    # The validated 29-DoF center is plain walking_config
    # (tests/test_variants.py::test_29dof_walks) — sweep around THAT.
    cfg = eng.walking_config()
    base = eng.variant_walking_scenario(model, dtype, n_steps=8.0,
                                        v_cmd=(0.1, 0.0))
    specs = [("center-wp2.0", {})]
    for v in (1.5, 2.5, 3.0):
        specs.append((f"wp{v}", {}))
    built = []
    for (label, _), wp in zip(specs, (2.0, 1.5, 2.5, 3.0)):
        built.append(base._replace(
            wbid_gains=base.wbid_gains._replace(
                w_posture=jnp.asarray(wp, dtype)
            )
        ))
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *built)
    rollout = eng.make_rollout(model, cfg)
    state0 = eng.init_state(model, cfg, dtype)
    run = jax.jit(jax.vmap(lambda p: rollout(state0, p, 163)))
    final, logs = jax.block_until_ready(run(batch))
    report(specs, final, logs, cfg.com_height)


def wave_29dof_torso():
    """Round-5 wave 4: 29-DoF w_posture axis WITH the torso-orientation task
    compiled in (EngineConfig.torso_task — the round-3 mechanism built for
    exactly this variant but absent from the validated bundle). Question:
    does holding the upper body by orientation rather than posture alone
    turn the point-like w_posture=2.0 into a range?"""
    from g1_locomotion_tpu.models.robot import load_robot
    from g1_locomotion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    dtype = jnp.float64
    model = load_robot("g1_29dof", dtype=dtype)
    cfg = eng.walking_config()._replace(torso_task=True)
    base = eng.variant_walking_scenario(model, dtype, n_steps=8.0,
                                        v_cmd=(0.1, 0.0))
    wps = (1.0, 1.5, 2.0, 2.5, 3.0, 4.0)
    specs = [(f"torso-wp{wp}", {}) for wp in wps]
    built = [
        base._replace(
            wbid_gains=base.wbid_gains._replace(
                w_posture=jnp.asarray(wp, dtype)
            )
        )
        for wp in wps
    ]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *built)
    rollout = eng.make_rollout(model, cfg)
    state0 = eng.init_state(model, cfg, dtype)
    run = jax.jit(jax.vmap(lambda p: rollout(state0, p, 163)))
    final, logs = jax.block_until_ready(run(batch))
    report(specs, final, logs, cfg.com_height)


if __name__ == "__main__":
    wave = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    if wave == 0:
        wave_f32(0.0)
    elif wave == 1:
        wave_f32(1.0)
    elif wave == 2:
        wave_29dof()
    elif wave == 3:
        wave_dcm_sched()
    elif wave == 4:
        wave_29dof_torso()
    else:
        raise SystemExit(f"unknown wave {wave}")
