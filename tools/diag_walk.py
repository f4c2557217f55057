"""Single-scenario walking diagnostic: per-step DCM/landing/stance summary.

Usage: python tools/diag_walk.py [n_steps] [gate:sway:dcm[:ds[:swing]]] [fsopt]
"""

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

from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.gait import schedule as gs
from g1_locomotion_tpu.models.robot import load_robot


def main():
    n_steps = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    tok = sys.argv[2] if len(sys.argv) > 2 else "0:1:1"
    parts = [float(x) for x in tok.split(":")]
    gate, sway, dcm = parts[0], parts[1], parts[2]
    ds = parts[3] if len(parts) > 3 else 0.25
    swing = parts[4] if len(parts) > 4 else 0.25

    fsopt = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True

    model = load_robot("g1_23dof", dtype=jnp.float64)
    cfg = eng.walking_config()._replace(gait_gate=True)
    cfg = cfg._replace(mpc=cfg.mpc._replace(footstep_opt=fsopt))
    params = eng.walking_scenario(jnp.float64)
    params = params._replace(
        gait=params.gait._replace(
            n_steps=jnp.asarray(n_steps, jnp.float64),
            gate_window=jnp.asarray(gate, jnp.float64),
            sway_gain=jnp.asarray(sway, jnp.float64),
            double_support_duration=jnp.asarray(ds, jnp.float64),
            swing_duration=jnp.asarray(swing, jnp.float64),
        ),
        steps=params.steps._replace(dcm_scale=jnp.asarray(dcm, jnp.float64)),
        v_cmd=jnp.asarray([0.1, 0.0], jnp.float64),
    )
    n_periods = int(round((0.5 + n_steps * (ds + swing) + 3.5) / 0.04))
    rollout = eng.make_rollout(model, cfg)
    state0 = eng.init_state(model, cfg, jnp.float64)
    final, logs = jax.jit(lambda s: rollout(s, params, n_periods))(state0)

    com = np.asarray(logs.com).reshape(-1, 3)
    contact = np.asarray(logs.contact).reshape(-1, 4)
    landing = np.asarray(logs.landing).reshape(-1, 3)
    plan = np.asarray(logs.plan_x1).reshape(-1, 13)
    forces = np.asarray(logs.forces).reshape(-1, 4, 3)
    plan_u0 = np.asarray(logs.plan_u0).reshape(-1, 4, 3)
    tau = np.asarray(logs.tau).reshape(com.shape[0], -1)
    np.savez("/tmp/diag_walk.npz", com=com, contact=contact, landing=landing,
             plan=plan, forces=forces, plan_u0=plan_u0, tau=tau)

    t = np.arange(com.shape[1 - 1]) * 1e-3
    w0 = np.sqrt(9.80665 / 0.598)
    vy = np.gradient(com[:, 1], 1e-3)
    vx = np.gradient(com[:, 0], 1e-3)
    xi = com[:, 1] + vy / w0

    # events: liftoff/touchdown of either foot
    left_up = contact[:, 0] < 0.5
    right_up = contact[:, 2] < 0.5
    ev = np.flatnonzero(np.diff(left_up.astype(int)) != 0).tolist() + \
         np.flatnonzero(np.diff(right_up.astype(int)) != 0).tolist()
    for k in sorted(ev):
        kind = []
        if k in np.flatnonzero(np.diff(left_up.astype(int)) == 1):
            kind.append("L-liftoff")
        if k in np.flatnonzero(np.diff(left_up.astype(int)) == -1):
            kind.append("L-touchdown")
        if k in np.flatnonzero(np.diff(right_up.astype(int)) == 1):
            kind.append("R-liftoff")
        if k in np.flatnonzero(np.diff(right_up.astype(int)) == -1):
            kind.append("R-touchdown")
        print(
            f"t={t[k]:6.3f} {'/'.join(kind):12s} com=({com[k,0]:+.3f},{com[k,1]:+.3f},{com[k,2]:.3f}) "
            f"vx={vx[k]:+.2f} vy={vy[k]:+.2f} xi_y={xi[k]:+.3f} "
            f"landing=({landing[k,0]:+.3f},{landing[k,1]:+.3f})"
        )
    fall = np.flatnonzero(com[:, 2] < 0.45)
    print("fall t:", t[fall[0]] if len(fall) else None)


if __name__ == "__main__":
    main()
