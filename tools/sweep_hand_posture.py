"""g1_29dof_with_hand walking tuning sweep: w_posture x hand-task gains on
the internal plant (one vmapped compile per hand_task setting — hand_task
is a static config flag).

Round-4 finding that motivates this: with variant_walking_scenario defaults
(w_posture 2.0, the 29-DoF value), with_hand falls with or without the hand
task — but the hand hold task got CLOSER (z_min -0.18 vs -1.31 without):
the extra 14 hand DoFs + 0.9 kg hands change the arm dynamics enough that
the 29-DoF posture weight no longer covers them.

Usage: python tools/sweep_hand_posture.py [hand|nohand]
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

# (w_posture, w_hand, hand_kd) variants — round-4b: the walk completes at
# every w_posture but falls in the settle with a growing arm oscillation;
# probe stiffer hand holds and stronger arm damping.
VAR = [
    (2.0, 1.0, 20.0),   # baseline
    (2.0, 5.0, 20.0),
    (2.0, 10.0, 40.0),
    (4.0, 5.0, 40.0),
    (2.0, 0.3, 20.0),   # weaker hold (is the hold itself the fight?)
    (6.0, 1.0, 20.0),
]


def main():
    from g1_locomotion_tpu.models.robot import load_robot
    from g1_locomotion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    hand = "nohand" not in sys.argv[1:]
    dtype = jnp.float64
    model = load_robot("g1_29dof_with_hand", dtype=dtype)
    cfg = eng.variant_walking_config(model)._replace(hand_task=hand)
    base = eng.variant_walking_scenario(model, dtype, n_steps=8.0,
                                        v_cmd=(0.1, 0.0))
    built = [
        base._replace(
            wbid_gains=base.wbid_gains._replace(
                w_posture=jnp.asarray(wp, dtype),
                w_hand=jnp.asarray(wh, dtype),
                hand_kd=jnp.asarray(kd, dtype),
            )
        )
        for wp, wh, kd in VAR
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
    for i, (wp, wh, kd) in enumerate(VAR):
        c = com[i]
        ok = bool(np.isfinite(c).all())
        left_up = (contact[i][:, 0] < 0.5).astype(int)
        right_up = (contact[i][:, 2] < 0.5).astype(int)
        zmin = float(np.nanmin(c[:, 2]))
        ymax = float(np.nanmax(np.abs(c[:, 1])))
        zfin = float(c[-1, 2])
        vfin = float(np.abs(np.asarray(final.v[i])).max())
        out = {
            "hand_task": hand, "w_posture": wp, "w_hand": wh,
            "hand_kd": kd, "finite": ok,
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
