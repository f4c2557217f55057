"""Isolate the push-recovery regression: run BASELINE config 2 (0.2, 0.12)
push under candidate MPC QP configs and report the outcome."""
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
from g1_locomotion_tpu.models.robot import load_robot
from g1_locomotion_tpu.mpc import solver as mpc
from g1_locomotion_tpu.ops.qp import QPConfig


def run(qp_cfg, label):
    g1 = load_robot("g1_23dof", dtype=jnp.float64)
    cfg = eng.EngineConfig(mpc=mpc.MPCConfig(horizon=20, qp=qp_cfg))
    params = eng.default_scenario(jnp.float64)
    params = params._replace(
        gait=params.gait._replace(n_steps=jnp.asarray(0.0, jnp.float64))
    )
    rollout = eng.make_rollout(g1, cfg)
    state = eng.init_state(g1, cfg, jnp.float64)
    state = state._replace(v=state.v.at[0].set(0.2).at[1].set(0.12))
    final, logs = jax.jit(lambda s: rollout(s, params, 63))(state)
    com = np.asarray(logs.com).reshape(-1, 3)
    mpri = np.asarray(logs.mpc_pri_res).reshape(-1)
    print(
        f"{label}: z_end={com[-1, 2]:.4f} z_min={com[:, 2].min():.4f} "
        f"xy_end=({com[-1, 0]:+.3f},{com[-1, 1]:+.3f}) "
        f"max_wbid_pri={np.asarray(logs.wbid_pri_res).max():.2e}",
        flush=True,
    )


if __name__ == "__main__":
    old = QPConfig(iters=60, scaling_iters=0, rho=1.0, rho_segments=2,
                   polish_rounds=1)
    new = mpc.MPCConfig().qp
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("old", "both"):
        run(old, "old iters=60/pol=1/highest")
    if which in ("new", "both"):
        run(new, "new iters=20/pol=2/high")
    if which == "mid":
        run(new._replace(iters=60), "mid iters=60/pol=2/high")
        run(new._replace(iter_precision="highest"), "mid iters=20/pol=2/highest")
