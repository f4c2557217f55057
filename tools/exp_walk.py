"""Walking experiment harness: N-step walks on the internal plant, vmapped
over candidate parameter sets (placement gains, timings).

Usage:
    python tools/exp_walk.py [n_steps] [gate:sway:dcm[:ds[:swing[:wr[:kd[:kp]]]]] ...]

Each scenario spec is colon-separated: gate_window, sway_gain, dcm_scale,
optional double-support duration, swing duration, WBID wrench-task weight,
CoM-task Kd scale, CoM-task Kp scale, timing_gain, timing_tol,
timing_rate_max. Prints per-scenario summaries: CoM lateral envelope,
forward progress, final velocity, fall flag — the iteration loop for
walking robustness work. Env: EXP_VX sets the commanded forward speed
(default 0.1 m/s).
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
from g1_locomotion_tpu.models.robot import load_robot


def main():
    n_steps = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    specs = []
    for tok in sys.argv[2:] or ["0:0.6:1.0"]:
        parts = [float(x) for x in tok.split(":")]
        gate, sway, dcm = parts[0], parts[1], parts[2]
        ds = parts[3] if len(parts) > 3 else 0.25
        swing = parts[4] if len(parts) > 4 else 0.25
        wr = parts[5] if len(parts) > 5 else 0.05
        kd = parts[6] if len(parts) > 6 else 1.0
        kp = parts[7] if len(parts) > 7 else 1.0
        tgain = parts[8] if len(parts) > 8 else 0.0
        ttol = parts[9] if len(parts) > 9 else 0.05
        tmax = parts[10] if len(parts) > 10 else 2.0
        specs.append((gate, sway, dcm, ds, swing, wr, kd, kp, tgain, ttol, tmax))
    B = len(specs)
    cols = [jnp.asarray([s[i] for s in specs], jnp.float64) for i in range(11)]

    model = load_robot("g1_23dof", dtype=jnp.float64)
    cfg = eng.walking_config()._replace(gait_gate=True)
    if os.environ.get("EXP_DBOX"):
        cfg = cfg._replace(
            mpc=cfg.mpc._replace(d_box=float(os.environ["EXP_DBOX"]))
        )
    if os.environ.get("EXP_FSOPT") == "0":
        cfg = cfg._replace(mpc=cfg.mpc._replace(footstep_opt=False))
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
            timing_gain=cols[8],
            timing_tol=cols[9],
            timing_rate_max=cols[10],
        ),
        steps=params.steps._replace(dcm_scale=cols[2]),
        wbid_gains=params.wbid_gains._replace(
            w_wrench=cols[5],
            com_kd=params.wbid_gains.com_kd * cols[6][:, None],
            com_kp=params.wbid_gains.com_kp * cols[7][:, None],
        ),
        v_cmd=tile(jnp.asarray(
            [float(os.environ.get("EXP_VX", "0.1")), 0.0], jnp.float64
        )),
    )

    # 0.5 stand + n_steps * (ds+swing) + 1.5 settle + 2.0 gate slack.
    step_t = max(s[3] + s[4] for s in specs)
    n_periods = int(round((0.5 + n_steps * step_t + 3.5) / 0.04))
    rollout = eng.make_rollout(model, cfg)
    state0 = eng.init_state(model, cfg, jnp.float64)
    states0 = jax.tree_util.tree_map(tile, state0)

    run = jax.jit(jax.vmap(lambda s, p: rollout(s, p, n_periods)))
    final, logs = run(states0, params)

    com = np.asarray(logs.com).reshape(B, -1, 3)  # (B, T, 3)
    contact = np.asarray(logs.contact).reshape(B, -1, 4)
    t = np.arange(com.shape[1]) * 1e-3
    for b in range(B):
        fell = com[b, :, 2].min() < 0.45
        # lateral envelope after gait start
        gait = t > 0.5
        y = com[b, gait, 1]
        steps_left = int(np.clip(np.diff((contact[b, :, 0] < 0.5).astype(int)), 0, 1).sum())
        steps_right = int(np.clip(np.diff((contact[b, :, 2] < 0.5).astype(int)), 0, 1).sum())
        vfin = float(np.abs(np.asarray(jax.tree_util.tree_map(lambda x: x[b], final).v)).max())
        print(
            f"spec={':'.join(f'{v:g}' for v in specs[b])}  fell={fell}  "
            f"steps L/R={steps_left}/{steps_right}  "
            f"y in [{y.min():+.3f},{y.max():+.3f}]  y_end={com[b, -1, 1]:+.3f}  "
            f"x_end={com[b, -1, 0]:+.3f}  z_min={com[b, :, 2].min():.3f}  "
            f"z_end={com[b, -1, 2]:.3f}  |v|_end={vfin:.3f}"
        )
    np.save("/tmp/exp_walk_com.npy", com)
    np.save("/tmp/exp_walk_contact.npy", contact)


if __name__ == "__main__":
    main()
