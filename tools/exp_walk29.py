"""29-DoF walking experiments: internal-plant walks on non-default variants.

The 23-DoF gait falls "catastrophically" on g1_29dof (TODO 4c); candidate
causes are (a) the hardcoded 23-DoF SRBD params (fixed here: params are
derived per-variant via srbd.params_from_model at the standing pose) and
(b) under-stiff posture control of the two extra waist joints (roll/pitch),
which only the w_posture=0.4 task holds while the SRBD treats the whole
robot as one rigid body. Specs sweep exactly these.

Usage:
    python tools/exp_walk29.py [variant] [n_steps] [spec ...]
spec = w_post:kp_post:w_base:dcm:tgain[:sway[:ds[:swing]]]
Prints one summary line per spec (fell, step counts, lateral envelope).
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
from g1_locomotion_tpu.engine.state import q_init_standing
from g1_locomotion_tpu.models import srbd
from g1_locomotion_tpu.models.robot import load_robot


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "g1_29dof"
    n_steps = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    specs = []
    for tok in sys.argv[3:] or ["0.4:400:3:1.0:0"]:
        p = [float(x) for x in tok.split(":")]
        w_post, kp_post, w_base, dcm, tgain = p[0], p[1], p[2], p[3], p[4]
        sway = p[5] if len(p) > 5 else 1.0
        ds = p[6] if len(p) > 6 else 0.25
        swing = p[7] if len(p) > 7 else 0.25
        specs.append((w_post, kp_post, w_base, dcm, tgain, sway, ds, swing))
    B = len(specs)
    cols = [jnp.asarray([s[i] for s in specs], jnp.float64) for i in range(8)]

    model = load_robot(variant, dtype=jnp.float64)
    cfg = eng.walking_config()
    base = eng.walking_scenario(jnp.float64)
    # Variant-correct SRBD: composite inertia + mass at ITS standing pose.
    base = base._replace(
        srbd=srbd.params_from_model(model, q_init_standing(model, jnp.float64))
    )
    print(
        f"# {variant}: mass={float(base.srbd.mass):.2f} "
        f"I_diag={np.diag(np.asarray(base.srbd.inertia)).round(3).tolist()}",
        flush=True,
    )

    def tile(x):
        return jnp.broadcast_to(jnp.asarray(x), (B,) + jnp.shape(x))

    params = jax.tree_util.tree_map(tile, base)
    params = params._replace(
        gait=params.gait._replace(
            n_steps=tile(jnp.asarray(n_steps, jnp.float64)),
            timing_gain=cols[4],
            sway_gain=cols[5],
            double_support_duration=cols[6],
            swing_duration=cols[7],
        ),
        steps=params.steps._replace(dcm_scale=cols[3]),
        wbid_gains=params.wbid_gains._replace(
            w_posture=cols[0],
            posture_kp=cols[1],
            w_base=cols[2],
        ),
        v_cmd=tile(jnp.asarray(
            [float(os.environ.get("EXP_VX", "0.1")), 0.0], jnp.float64
        )),
    )

    step_t = max(s[6] + s[7] for s in specs)
    n_periods = int(round((0.5 + n_steps * step_t + 3.5) / 0.04))
    rollout = eng.make_rollout(model, cfg)
    state0 = eng.init_state(model, cfg, jnp.float64)
    states0 = jax.tree_util.tree_map(tile, state0)

    run = jax.jit(jax.vmap(lambda s, p: rollout(s, p, n_periods)))
    final, logs = run(states0, params)

    com = np.asarray(logs.com).reshape(B, -1, 3)
    contact = np.asarray(logs.contact).reshape(B, -1, 4)
    tau = np.asarray(logs.tau).reshape(B, -1, model.nj)
    t = np.arange(com.shape[1]) * 1e-3
    for b in range(B):
        fell = bool(com[b, :, 2].min() < 0.45) or not np.isfinite(com[b]).all()
        gait = t > 0.5
        y = com[b, gait, 1]
        sL = int(np.clip(np.diff((contact[b, :, 0] < 0.5).astype(int)), 0, 1).sum())
        sR = int(np.clip(np.diff((contact[b, :, 2] < 0.5).astype(int)), 0, 1).sum())
        vfin = float(np.abs(np.asarray(
            jax.tree_util.tree_map(lambda x: x[b], final).v
        )).max())
        print(
            f"spec={':'.join(f'{v:g}' for v in specs[b])}  fell={fell}  "
            f"steps L/R={sL}/{sR}  y in [{np.nanmin(y):+.3f},{np.nanmax(y):+.3f}]  "
            f"x_end={com[b, -1, 0]:+.3f}  z_min={np.nanmin(com[b, :, 2]):.3f}  "
            f"z_end={com[b, -1, 2]:.3f}  |v|_end={vfin:.3f}  "
            f"|tau|_max={np.nanmax(np.abs(tau[b])):.0f}",
            flush=True,
        )
    np.save("/tmp/exp_walk29_com.npy", com)


if __name__ == "__main__":
    main()
