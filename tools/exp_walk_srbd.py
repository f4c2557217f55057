"""Fast walking iteration: SRBD-level closed loop (mpc/srbd_loop.py).

Usage:
    python tools/exp_walk_srbd.py [n_steps] [spec ...] [--diag]

spec = gate:sway:dcm[:ds[:swing]]  (same format as exp_walk.py).
Env: EXP_DBOX (reach box), EXP_FSOPT=0 (disable footstep QP),
     EXP_VCMD (forward speed, default 0.1), EXP_KICK (vy kick m/s at t=2.0s).

With --diag (single spec), prints per-period state vs plan and touchdown
events; always prints the per-spec summary line.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from g1_locomotion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.mpc import srbd_loop


def main():
    args = [a for a in sys.argv[1:] if a != "--diag"]
    diag = "--diag" in sys.argv
    n_steps = float(args[0]) if args else 8.0
    specs = []
    for tok in args[1:] or ["0:1:1"]:
        parts = [float(x) for x in tok.split(":")]
        gate, sway, dcm = parts[0], parts[1], parts[2]
        ds = parts[3] if len(parts) > 3 else 0.25
        swing = parts[4] if len(parts) > 4 else 0.25
        specs.append((gate, sway, dcm, ds, swing))
    B = len(specs)
    cols = [jnp.asarray([s[i] for s in specs], jnp.float64) for i in range(5)]

    cfg = eng.walking_config().mpc
    if os.environ.get("EXP_DBOX"):
        cfg = cfg._replace(d_box=float(os.environ["EXP_DBOX"]))
    if os.environ.get("EXP_FSOPT") == "0":
        cfg = cfg._replace(footstep_opt=False)
    v_fwd = float(os.environ.get("EXP_VCMD", "0.1"))

    base = eng.walking_scenario(jnp.float64)

    def tile(x):
        return jnp.broadcast_to(jnp.asarray(x), (B,) + jnp.shape(x))

    params = jax.tree_util.tree_map(tile, base)
    params = params._replace(
        gait=params.gait._replace(
            n_steps=tile(jnp.asarray(n_steps, jnp.float64)),
            gate_window=cols[0],
            sway_gain=cols[1],
            double_support_duration=cols[3],
            swing_duration=cols[4],
        ),
        steps=params.steps._replace(dcm_scale=cols[2]),
        v_cmd=tile(jnp.asarray([v_fwd, 0.0], jnp.float64)),
    )
    if os.environ.get("EXP_QVX"):
        Q = params.mpc_weights.Q
        params = params._replace(
            mpc_weights=params.mpc_weights._replace(
                Q=Q.at[:, 9].set(float(os.environ["EXP_QVX"]))
            )
        )

    step_t = max(s[3] + s[4] for s in specs)
    n_periods = int(round((0.5 + n_steps * step_t + 2.0) / 0.04))
    rollout = srbd_loop.make_srbd_loop(cfg)
    s0 = srbd_loop.init_loop_state(cfg, 0.598)
    s0B = jax.tree_util.tree_map(tile, s0)

    kicks = jnp.zeros((B, n_periods, 3), jnp.float64)
    kick_mag = float(os.environ.get("EXP_KICK", "0"))
    if kick_mag:
        kicks = kicks.at[:, 50, 1].set(kick_mag)  # t = 2.0 s

    run = jax.jit(jax.vmap(lambda s, p, k: rollout(s, p, n_periods, k)))
    final, logs = run(s0B, params, kicks)

    X = np.asarray(logs.x)          # (B, T, 13)
    feet = np.asarray(logs.feet)    # (B, T, 2, 3)
    contact = np.asarray(logs.contact)
    land = np.asarray(logs.landing)
    plan1 = np.asarray(logs.plan_x1)
    t = (np.arange(n_periods) + 1) * 0.04

    for b in range(B):
        com = X[b, :, 3:6]
        rp = X[b, :, 0:2]
        # "fall" proxy at SRBD level: CoM far off height or tilted
        fell = (np.abs(com[:, 2] - 0.598) > 0.12).any() or (
            np.abs(rp) > 0.5
        ).any()
        tdL = np.flatnonzero(np.diff((contact[b, :, 0] > 0.5).astype(int)) == 1)
        tdR = np.flatnonzero(np.diff((contact[b, :, 1] > 0.5).astype(int)) == 1)
        y = com[:, 1]
        # one-period plan error (plan_x1[k] predicts x[k+1])
        perr = np.abs(plan1[b, :-1] - X[b, 1:]).max(axis=0)
        print(
            f"spec={':'.join(f'{v:g}' for v in specs[b])}  fell={fell}  "
            f"td L/R={len(tdL)}/{len(tdR)}  "
            f"y in [{y.min():+.3f},{y.max():+.3f}]  y_end={y[-1]:+.3f}  "
            f"x_end={com[-1, 0]:+.3f}  z rng [{com[:, 2].min():.3f},"
            f"{com[:, 2].max():.3f}]  |v|_end="
            f"{np.abs(X[b, -1, 9:12]).max():.3f}  "
            f"plan_err max(y,vy)=({perr[4]:.4f},{perr[10]:.4f})"
        )
        if diag and B == 1:
            for k in sorted(set(tdL.tolist() + tdR.tolist())):
                side = "L" if k in tdL else "R"
                print(
                    f"  t={t[k]:5.2f} td{side} com_y={y[k]:+.4f} "
                    f"vy={X[b, k, 10]:+.3f} land=({land[b, k, 0]:+.3f},"
                    f"{land[b, k, 1]:+.3f}) feet_y=({feet[b, k, 0, 1]:+.3f},"
                    f"{feet[b, k, 1, 1]:+.3f}) com_x={com[k, 0]:+.3f} "
                    f"vx={X[b, k, 9]:+.3f} feet_x=({feet[b, k, 0, 0]:+.3f},"
                    f"{feet[b, k, 1, 0]:+.3f})"
                )
    np.savez("/tmp/exp_walk_srbd.npz", x=X, feet=feet, contact=contact,
             landing=land, plan1=plan1)


if __name__ == "__main__":
    main()
