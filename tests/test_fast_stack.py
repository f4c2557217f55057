"""WBIDConfig.fast_stack: the op-count-lean task-stack assembly must build
the SAME QP as the default path (round-5 serving-latency lever — the B=1
tick is op-launch-bound in build_qp; docs/BENCHMARKS.md round-5).

The fast path swaps per-frame Jacobian calls for one batched pass
(models/robot.frame_jacobians), the sequential angular-momentum loop for
A_G(q) v, and the .at[].set constraint assembly for static templates —
mathematically identical blocks, different op schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.models import robot as rb
from g1_locomotion_tpu.models.robot import fk, frame_jacobian, frame_jacobians
from g1_locomotion_tpu.wbid import stack as stk
from g1_locomotion_tpu.wbid.tasks import WBIDReferences, default_gains


def _rand_state(model, rng):
    q = np.zeros(model.nq)
    q[2] = 0.7
    quat = rng.standard_normal(4)
    q[3:7] = quat / np.linalg.norm(quat)
    q[7:] = rng.uniform(-0.5, 0.5, model.nq - 7)
    v = rng.uniform(-0.5, 0.5, model.nv)
    return jnp.asarray(q), jnp.asarray(v)


def _refs(model, idx, q, rng, contact_active):
    X = fk(model, q)
    foot_pos = jnp.stack([rb.frame_pose(model, X, f).p for f in idx.feet])
    foot_R = jnp.stack([rb.frame_pose(model, X, f).R for f in idx.feet])
    return WBIDReferences(
        com_pos=jnp.asarray([0.0, 0.0, 0.6]),
        com_vel=jnp.zeros(3),
        com_acc=jnp.asarray([0.1, 0.2, 0.3]),
        base_R=jnp.eye(3),
        base_angvel=jnp.zeros(3),
        base_angacc=jnp.zeros(3),
        posture_q=q[7:],
        contact_pos=foot_pos,
        contact_R=foot_R,
        swing_pos=foot_pos + 0.01,
        swing_vel=jnp.ones((2, 3)) * 0.1,
        swing_acc=jnp.zeros((2, 3)),
        swing_R=foot_R,
        f_des=jnp.asarray(rng.uniform(0.0, 50.0, (4, 3))),
        contact_active=jnp.asarray(contact_active),
        angmom_L=jnp.zeros(3),
        angmom_Ldot=jnp.zeros(3),
    )


def test_frame_jacobians_matches_per_frame(g1, rng):
    q, _ = _rand_state(g1, rng)
    X = fk(g1, q)
    idx = stk.StackIndices.from_model(g1)
    fidxs = list(idx.contacts) + [idx.pelvis] + list(idx.feet)
    Jb = frame_jacobians(g1, q, X, fidxs)
    for k, f in enumerate(fidxs):
        np.testing.assert_allclose(
            np.asarray(Jb[k]), np.asarray(frame_jacobian(g1, q, X, f)),
            atol=1e-13,
        )


@pytest.mark.parametrize(
    "contact_active", [(1.0, 1.0), (1.0, 0.0), (0.0, 1.0)]
)
def test_fast_stack_builds_same_qp(g1, rng, contact_active):
    idx = stk.StackIndices.from_model(g1)
    gains = default_gains(jnp.float64)
    q, v = _rand_state(g1, rng)
    refs = _refs(g1, idx, q, rng, contact_active)
    slow = stk.build_qp(g1, idx, gains, q, v, refs, 0.001)
    fast = stk.build_qp(g1, idx, gains, q, v, refs, 0.001, fast=True)
    for name, a, b in zip("HgClu", slow[:5], fast[:5]):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-11 * scale,
            err_msg=f"{name} differs (contacts {contact_active})",
        )


def test_fast_stack_solution_matches(g1, rng):
    """End-to-end: wbid.solve with fast_stack lands on the same torques."""
    from g1_locomotion_tpu.wbid import solver as wbid

    idx = stk.StackIndices.from_model(g1)
    gains = default_gains(jnp.float64)
    q, v = _rand_state(g1, rng)
    refs = _refs(g1, idx, q, rng, (1.0, 1.0))
    cfg = wbid.WBIDConfig()
    sol0 = wbid.solve(g1, idx, cfg, gains, q, v, refs)
    sol1 = wbid.solve(
        g1, idx, cfg._replace(fast_stack=True), gains, q, v, refs
    )
    np.testing.assert_allclose(
        np.asarray(sol1.tau), np.asarray(sol0.tau), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sol1.qddot), np.asarray(sol0.qddot), atol=1e-6
    )
