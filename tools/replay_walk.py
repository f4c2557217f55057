"""Render the 3D kinematic replay of the validated 8-step walk.

The rviz-scene analogue (SURVEY §2.1 rows 4/14): runs the flagship walking
rollout with per-tick configuration logging (EngineConfig.log_q) and renders
the skeleton + GRF arrows + CoM trace + planned-landing markers as keyframe
PNGs and an animated GIF (utils/replay.py).

Usage: python tools/replay_walk.py [out_dir] [stride_ms]
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
from g1_locomotion_tpu.utils import replay


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/replay_walk"
    stride = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    model = load_robot("g1_23dof", dtype=jnp.float64)
    cfg = eng.walking_config()._replace(log_q=True)
    params = eng.walking_scenario(jnp.float64, n_steps=8.0, v_cmd=(0.1, 0.0))
    rollout = eng.make_rollout(model, cfg)
    state = eng.init_state(model, cfg, jnp.float64)
    final, logs = jax.jit(lambda s: rollout(s, params, 163))(state)

    qs = np.asarray(logs.q).reshape(-1, model.nq)
    forces = np.asarray(logs.forces).reshape(-1, 4, 3)
    landings = np.asarray(logs.landing).reshape(-1, 3)
    coms = np.asarray(logs.com).reshape(-1, 3)
    files = replay.render_replay(
        model, qs, forces=forces, landings=landings, coms=coms,
        out_dir=out_dir, stride=stride,
    )
    print(f"wrote {len(files)} files to {out_dir}")
    for f in files[-3:]:
        print(" ", f)


if __name__ == "__main__":
    main()
