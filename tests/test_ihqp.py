"""Strict-hierarchy iHQP (wbid/ihqp.py) — OpenSoT's multi-level ``/``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.engine.state import q_init_standing
from g1_locomotion_tpu.wbid import ihqp
from g1_locomotion_tpu.wbid import solver as wbid
from g1_locomotion_tpu.wbid.stack import StackIndices, build_qp
from g1_locomotion_tpu.wbid.tasks import default_gains

from test_wbid import standing_refs


@pytest.fixture(scope="module")
def setup(g1):
    return StackIndices.from_model(g1)


@pytest.fixture(scope="module")
def q_stand(g1):
    return q_init_standing(g1, jnp.float64)


def _foot_residual(g1, setup, q, sol, refs):
    """Max weighted level-0 (feet) task residual ||A x - b|| of a solution."""
    gains = default_gains(jnp.float64)
    v = jnp.zeros(g1.nv)
    *_, (A, b, w, levels) = build_qp(
        g1, setup, gains, q, v, refs, 0.001, with_blocks=True
    )
    x = jnp.concatenate([sol.qddot, sol.forces.reshape(-1)])
    r = np.asarray(A @ x - b)
    mask = (levels == 0) & (np.asarray(w) > 1e-9)
    return float(np.abs(r[mask]).max())


def test_ihqp_standing_matches_weighted(g1, q_stand, setup):
    """In quiet standing nothing conflicts: the hierarchy and the weighted
    sum agree (forces ~ mg, near-zero accelerations)."""
    gains = default_gains(jnp.float64)
    cfg = wbid.WBIDConfig()
    refs = standing_refs(g1, q_stand)
    v = jnp.zeros(g1.nv)
    sol_w = wbid.solve(g1, setup, cfg, gains, q_stand, v, refs)
    # Through the public dispatch (WBIDConfig.strict_hierarchy), under jit.
    cfg_h = cfg._replace(strict_hierarchy=True)
    sol_h = jax.jit(
        lambda q: wbid.solve(g1, setup, cfg_h, gains, q, v, refs)
    )(q_stand)
    np.testing.assert_allclose(
        float(sol_h.forces[:, 2].sum()),
        float(sol_w.forces[:, 2].sum()),
        rtol=0.02,
    )
    # Strict-hierarchy semantics: arm joints are only weakly observed by the
    # mid level (CoM/momentum) and posture lives a level BELOW it, so the
    # cascade may spend a couple rad/s^2 of arm acceleration on marginal
    # momentum improvements the single-level weighted sum would not buy —
    # bounded by the per-level regularizer (ihqp.REG_QDD), not by posture.
    assert float(jnp.abs(sol_h.qddot).max()) < 3.0
    np.testing.assert_allclose(np.asarray(sol_h.base_wrench_res), 0.0, atol=1e-4)


def test_ihqp_protects_feet_under_conflict(g1, q_stand, setup):
    """A violent CoM reference cannot degrade the level-0 (feet) tasks: the
    strict hierarchy keeps the foot-task residual at its unconflicted level
    while the weighted sum trades it away."""
    gains = default_gains(jnp.float64)
    cfg = wbid.WBIDConfig()
    refs = standing_refs(g1, q_stand)
    # 1 m CoM step: unrealizable demand that a weighted sum partially
    # satisfies by accelerating the feet.
    refs_bad = refs._replace(com_pos=refs.com_pos + jnp.array([1.0, 0.0, 0.0]))
    v = jnp.zeros(g1.nv)

    sol_w = wbid.solve(g1, setup, cfg, gains, q_stand, v, refs_bad)
    sol_h = ihqp.solve_ihqp(g1, setup, cfg, gains, q_stand, v, refs_bad)

    r_w = _foot_residual(g1, setup, q_stand, sol_w, refs_bad)
    r_h = _foot_residual(g1, setup, q_stand, sol_h, refs_bad)
    # The hierarchy keeps feet at least 3x cleaner than the weighted trade.
    assert r_h < r_w / 3.0, (r_h, r_w)
    assert r_h < 0.05, r_h
