"""Flagship walking config sharded over the 8-virtual-device mesh (round-5
VERDICT task 6): the PRODUCTION config path — walking_config (N=20,
factorization QPs, active-set polish, jointly-optimized footsteps) +
walking_scenario — walks the full bar on every shard of a
shard_map'd-over-8 batch.

The multichip dryrun proves the sharding plumbing compiles; this proves
the flagship path CONTROLS when sharded: the sharded-over-8 program is a
different codegen draw than the solo test (closed-loop walks are chaotic
across environments, CLAUDE.md), so 8/8 passing is a real cross-
environment result, recorded first by tools/exp_sharded_walk.py
(round 5: 8/8, z_min 0.529, y_max 0.078, v_final 0.052 per shard).

Marked xslow: the 8-device sharded engine compile is ~40 min on a cold
cache — run explicitly (`pytest -m xslow tests/test_sharded_walk.py`);
the CI halves (make test-par) exclude the marker.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.models.robot import load_robot
from g1_locomotion_tpu.parallel import mesh as pmesh


@pytest.mark.xslow
def test_flagship_walks_sharded_over_8(g1):
    cfg = eng.walking_config()
    params = eng.walking_scenario(jnp.float64, n_steps=8.0, v_cmd=(0.1, 0.0))
    B = 8
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), params
    )
    rollout = eng.make_rollout(g1, cfg)
    state0 = eng.init_state(g1, cfg, jnp.float64)

    mesh = pmesh.scenario_mesh()
    f = pmesh.sharded_vmap(mesh, lambda p: rollout(state0, p, 163))
    final, logs = f(pmesh.shard_batch(mesh, batch))
    com = np.asarray(logs.com).reshape(B, -1, 3)
    contact = np.asarray(logs.contact).reshape(B, -1, 4)
    for b in range(B):
        c = com[b]
        assert np.isfinite(c).all(), b
        assert c[:, 2].min() > 0.45, (b, c[:, 2].min())
        assert np.abs(c[:, 1]).max() < 0.25, (b, np.abs(c[:, 1]).max())
        np.testing.assert_allclose(c[-1, 2], cfg.com_height, atol=0.02)
        sL = int(np.clip(np.diff((contact[b, :, 0] < 0.5).astype(int)), 0, 1).sum())
        sR = int(np.clip(np.diff((contact[b, :, 2] < 0.5).astype(int)), 0, 1).sum())
        assert (sL, sR) == (4, 4), (b, sL, sR)
        vfin = float(np.abs(np.asarray(
            jax.tree_util.tree_map(lambda x: x[b], final).v)).max())
        assert vfin < 0.3, (b, vfin)
