"""Re-record the golden walking trajectory (tests/goldens/walk_golden.npz).

Run ONLY after re-validating the full 8-step walk (tests/test_engine_walking.py
must pass first): the golden pins the exact closed-loop trajectory of the
validated walking configuration — stand, the first 7 steps, and the
previously-fragile step-2/3 region (round-1 golden stopped at 0.76 s, before
the part of the walk that actually breaks; VERDICT round 1).

Usage: python tools/update_golden.py
"""

import os
import sys
from pathlib import Path

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

N_PERIODS = 100  # 4.0 s: stand + 7 of the 8 steps

GOLDEN = Path(__file__).parent.parent / "tests" / "goldens" / "walk_golden.npz"


def main():
    model = load_robot("g1_23dof", dtype=jnp.float64)
    cfg = eng.walking_config()
    params = eng.walking_scenario(jnp.float64, n_steps=8.0, v_cmd=(0.1, 0.0))
    rollout = eng.make_rollout(model, cfg)
    state = eng.init_state(model, cfg, jnp.float64)
    final, logs = jax.jit(lambda s: rollout(s, params, N_PERIODS))(state)

    com = np.asarray(logs.com).reshape(-1, 3)
    tau = np.asarray(logs.tau).reshape(-1, model.nj)
    forces = np.asarray(logs.forces).reshape(-1, 4, 3)
    contact = np.asarray(logs.contact).reshape(-1, 4)
    assert np.isfinite(com).all() and com[:, 2].min() > 0.45, (
        "refusing to record a golden from a failed walk"
    )
    np.savez_compressed(
        GOLDEN, com=com, tau=tau, forces=forces, contact=contact
    )
    print(f"recorded {GOLDEN} ({N_PERIODS} periods, {com.shape[0]} ticks, "
          f"z range [{com[:,2].min():.3f}, {com[:,2].max():.3f}])")


if __name__ == "__main__":
    main()
