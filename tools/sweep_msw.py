"""Internal-plant sweep of the swing-limb momentum preview mass
(SRBDParams.m_swing): does the flagship walk stay stable as the MPC starts
previewing the swing leg's angular-momentum rate, and at what mass does it
break? One vmapped compile (m_swing is a scenario leaf).

Usage: python tools/sweep_msw.py [f32]
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

MSW = [0.0, 1.0, 2.0, 3.0, 4.5, 6.0]


def main():
    from g1_locomotion_tpu.models.robot import load_robot
    from g1_locomotion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    dtype = jnp.float64
    model = load_robot("g1_23dof", dtype=dtype)
    cfg = eng.walking_config()
    base = eng.walking_scenario(dtype, n_steps=8.0, v_cmd=(0.1, 0.0))
    built = [
        base._replace(srbd=base.srbd._replace(m_swing=jnp.asarray(m, dtype)))
        for m in MSW
    ]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *built)
    rollout = eng.make_rollout(model, cfg)
    state0 = eng.init_state(model, cfg, dtype)
    run = jax.jit(jax.vmap(lambda p: rollout(state0, p, 163)))
    final, logs = jax.block_until_ready(run(batch))

    com = np.asarray(logs.com)
    B = com.shape[0]
    com = com.reshape(B, -1, 3)
    contact = np.asarray(logs.contact).reshape(B, -1, 4)
    for i, m in enumerate(MSW):
        c = com[i]
        ok = bool(np.isfinite(c).all())
        left_up = (contact[i][:, 0] < 0.5).astype(int)
        right_up = (contact[i][:, 2] < 0.5).astype(int)
        zmin = float(np.nanmin(c[:, 2]))
        ymax = float(np.nanmax(np.abs(c[:, 1])))
        zfin = float(c[-1, 2])
        vfin = float(np.abs(np.asarray(final.v[i])).max())
        out = {
            "m_swing": m, "finite": ok,
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
