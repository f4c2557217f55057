"""3D kinematic replay (utils/replay.py) — the rviz-scene analogue.

The reference's viz.py publishes the robot model, TF tree, per-contact
wrench arrows and trajectory markers to rviz per tick (viz.py:65-264,
g1_srbd_full.rviz). The TPU analogue renders the same scene offline from
TickLog.q (EngineConfig.log_q); these tests exercise logging + rendering
end-to-end on a tiny rollout.
"""

import jax
import jax.numpy as jnp
import numpy as np

from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.mpc.solver import MPCConfig
from g1_locomotion_tpu.ops.qp import QPConfig
from g1_locomotion_tpu.utils import replay
from g1_locomotion_tpu.wbid.solver import WBIDConfig
from g1_locomotion_tpu.wbid.stack import StackIndices


def _tiny_cfg(log_q: bool) -> eng.EngineConfig:
    return eng.EngineConfig(
        mpc=MPCConfig(
            horizon=4,
            qp=QPConfig(iters=12, scaling_iters=0, rho=1.0, rho_segments=1,
                        polish=False),
        ),
        wbid=WBIDConfig(
            qp=QPConfig(iters=10, scaling_iters=0, rho=0.1, rho_segments=1,
                        polish=False)
        ),
        ticks_per_mpc=4,
        log_q=log_q,
    )


def _standing(dtype=jnp.float64):
    p = eng.default_scenario(dtype)
    return p._replace(gait=p.gait._replace(n_steps=jnp.asarray(0.0, dtype)))


def test_log_q_off_is_empty(g1):
    cfg = _tiny_cfg(False)
    rollout = eng.make_rollout(g1, cfg)
    state = eng.init_state(g1, cfg, jnp.float64)
    _, logs = jax.jit(lambda s: rollout(s, _standing(), 1))(state)
    assert logs.q.shape[-1] == 0


def test_replay_renders_frames(g1, tmp_path):
    cfg = _tiny_cfg(True)
    rollout = eng.make_rollout(g1, cfg)
    state = eng.init_state(g1, cfg, jnp.float64)
    _, logs = jax.jit(lambda s: rollout(s, _standing(), 2))(state)

    qs = np.asarray(logs.q).reshape(-1, g1.nq)
    assert qs.shape == (8, g1.nq)
    np.testing.assert_allclose(qs[0, 3], 1.0, atol=0.1)  # wxyz quat sane

    forces = np.asarray(logs.forces).reshape(-1, 4, 3)
    coms = np.asarray(logs.com).reshape(-1, 3)
    files = replay.render_replay(
        g1, qs, forces=forces, coms=coms, out_dir=str(tmp_path),
        stride=4, gif=True,
    )
    # 2 keyframes (t=0, 4) + the GIF.
    pngs = [f for f in files if f.endswith(".png")]
    gifs = [f for f in files if f.endswith(".gif")]
    assert len(pngs) == 2 and len(gifs) == 1
    import os

    for f in files:
        assert os.path.getsize(f) > 1000, f


def test_skeleton_segments_connects_tree(g1):
    from g1_locomotion_tpu.engine.state import q_init_standing

    q = np.asarray(q_init_standing(g1, jnp.float64))
    segs = replay.skeleton_segments(g1, q)
    assert segs.shape == (g1.nb - 1, 2, 3)
    assert np.isfinite(segs).all()
    # Feet below the pelvis in the stand.
    idx = StackIndices.from_model(g1)
    cpos = replay.contact_points(g1, idx, q)
    assert cpos.shape == (4, 3)
    assert cpos[:, 2].max() < 0.1
