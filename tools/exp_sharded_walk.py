"""Flagship walking config sharded over the 8-virtual-device mesh (round-5
VERDICT task 6): the real walking_config (N=20, factorization path, polish)
+ walking_scenario, 8 scenarios (one per device), each asserting the full
walking bar.

The multichip dryrun proves the sharding plumbing compiles; this proves the
PRODUCTION config path walks when sharded — the codegen draw of the
sharded-over-8 program is yet another environment (CLAUDE.md: closed-loop
walks are chaotic across environments), so this is a real validation, not a
formality. Prints one JSON line per shard + a summary.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
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
from g1_locomotion_tpu.parallel import mesh as pmesh


def main():
    dtype = jnp.float64
    model = load_robot("g1_23dof", dtype=dtype)
    cfg = eng.walking_config()
    params = eng.walking_scenario(dtype, n_steps=8.0, v_cmd=(0.1, 0.0))
    B = 8
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), params
    )
    rollout = eng.make_rollout(model, cfg)
    state0 = eng.init_state(model, cfg, dtype)

    mesh = pmesh.scenario_mesh()
    f = pmesh.sharded_vmap(mesh, lambda p: rollout(state0, p, 163))
    final, logs = f(pmesh.shard_batch(mesh, batch))
    com = np.asarray(logs.com).reshape(B, -1, 3)
    contact = np.asarray(logs.contact).reshape(B, -1, 4)
    n_pass = 0
    for b in range(B):
        c = com[b]
        sL = int(np.clip(np.diff((contact[b, :, 0] < 0.5).astype(int)), 0, 1).sum())
        sR = int(np.clip(np.diff((contact[b, :, 2] < 0.5).astype(int)), 0, 1).sum())
        vfin = float(np.abs(np.asarray(
            jax.tree_util.tree_map(lambda x: x[b], final).v)).max())
        ok = bool(
            np.isfinite(c).all() and c[:, 2].min() > 0.45
            and np.abs(c[:, 1]).max() < 0.25
            and abs(c[-1, 2] - cfg.com_height) < 0.02
            and vfin < 0.3 and sL == 4 and sR == 4
        )
        n_pass += ok
        print(json.dumps({
            "shard": b, "walks": ok, "z_min": round(float(c[:, 2].min()), 3),
            "y_max": round(float(np.abs(c[:, 1]).max()), 3),
            "z_final": round(float(c[-1, 2]), 3), "v_final": round(vfin, 3),
            "steps": [sL, sR],
        }), flush=True)
    print(json.dumps({"summary": True, "pass": n_pass, "total": B}), flush=True)


if __name__ == "__main__":
    main()
