"""Optional WBID hand Cartesian tasks on the hand point contacts.

The reference URDFs define ``*_hand_point_contact`` frames on the rubber
hands (g1_23dof.urdf:855-859) that its WBID never uses; here they are a
first-class optional task (wbid/stack.py) — supplied hand references add
Cartesian rows for the arm endpoints (reach/brace), and the walking hot
path compiles without them (static gate on refs.hand_pos).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.engine.state import standing_state
from g1_locomotion_tpu.models import robot as rb
from g1_locomotion_tpu.models.robot import load_robot
from g1_locomotion_tpu.wbid import solver as wbid
from g1_locomotion_tpu.wbid.stack import StackIndices
from g1_locomotion_tpu.wbid.tasks import WBIDReferences, default_gains


@pytest.mark.parametrize("variant", ["g1_23dof", "g1_29dof_with_hand"])
def test_hand_frames_resolved(variant):
    """URDF-native (23-DoF) and synthesized (dexterous-hand palm) hand
    point-contact frames both resolve."""
    m = load_robot(variant, dtype=jnp.float64)
    idx = StackIndices.from_model(m)
    assert len(idx.hands) == 2, (variant, idx.hands)


def _standing_refs(model, idx, q, hand_pos=None):
    X = rb.fk(model, q)
    feet = jnp.stack([rb.frame_pose(model, X, f).p for f in idx.feet])
    feet_R = jnp.stack([rb.frame_pose(model, X, f).R for f in idx.feet])
    com = rb.com_position(model, X)
    nj = model.nj
    dtype = q.dtype
    W = float(model.total_mass) * 9.80665
    f_des = jnp.tile(jnp.asarray([0.0, 0.0, W / 4.0], dtype)[None], (4, 1))
    return WBIDReferences(
        com_pos=com,
        com_vel=jnp.zeros(3, dtype),
        com_acc=jnp.zeros(3, dtype),
        base_R=X.R[0],
        base_angvel=jnp.zeros(3, dtype),
        base_angacc=jnp.zeros(3, dtype),
        posture_q=q[7:],
        contact_pos=feet,
        contact_R=feet_R,
        swing_pos=feet,
        swing_vel=jnp.zeros((2, 3), dtype),
        swing_acc=jnp.zeros((2, 3), dtype),
        swing_R=feet_R,
        f_des=f_des,
        contact_active=jnp.ones(2, dtype),
        angmom_L=jnp.zeros(3, dtype),
        angmom_Ldot=jnp.zeros(3, dtype),
        hand_pos=hand_pos,
    )


def test_hand_task_accelerates_toward_target():
    """With a hand reference 10 cm forward of the current hand position, the
    solved qddot accelerates the hand toward it."""
    m = load_robot("g1_23dof", dtype=jnp.float64)
    idx = StackIndices.from_model(m)
    st = standing_state(m, jnp.float64)
    X = rb.fk(m, st.q)
    hands_now = jnp.stack(
        [rb.frame_pose(m, X, f).p for f in idx.hands]
    )
    target = hands_now + jnp.asarray([0.10, 0.0, 0.0], jnp.float64)
    refs = _standing_refs(m, idx, st.q, hand_pos=target)
    gains = default_gains(jnp.float64)
    sol = jax.jit(
        lambda q, v: wbid.solve(m, idx, wbid.WBIDConfig(), gains, q, v, refs)
    )(st.q, st.v)
    assert np.isfinite(np.asarray(sol.tau)).all()

    for s, fh in enumerate(idx.hands):
        Jh = np.asarray(rb.frame_jacobian(m, st.q, X, fh)[:3])
        a_h = Jh @ np.asarray(sol.qddot)  # v = 0 -> no drift term
        err = np.asarray(target[s] - hands_now[s])
        # Accelerates toward the target along the error direction.
        assert a_h @ err > 0.5 * np.linalg.norm(err), (s, a_h, err)


def test_no_hand_refs_compiles_without_hand_rows():
    """Default references (hand_pos=None) must not change the stack: the QP
    shape equals the no-hands build (static gate, zero hot-path cost)."""
    from g1_locomotion_tpu.wbid.stack import build_qp

    m = load_robot("g1_23dof", dtype=jnp.float64)
    idx = StackIndices.from_model(m)
    st = standing_state(m, jnp.float64)
    refs = _standing_refs(m, idx, st.q, hand_pos=None)
    H, g, C, l, u, _ = build_qp(
        m, idx, default_gains(jnp.float64), st.q, st.v, refs, 0.001
    )
    refs_h = _standing_refs(
        m, idx, st.q,
        hand_pos=jnp.zeros((2, 3), jnp.float64),
    )
    H2, *_ = build_qp(
        m, idx, default_gains(jnp.float64), st.q, st.v, refs_h, 0.001
    )
    assert H.shape == H2.shape  # H is (nv+12)^2 either way (rows are tasks)
    assert np.isfinite(np.asarray(H)).all()
