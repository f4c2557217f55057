import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.core import rotations as rot


def random_quats(rng, n=64):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_matrix_roundtrip(rng):
    q = jnp.asarray(random_quats(rng))
    R = rot.quat_to_matrix(q)
    q2 = rot.matrix_to_quat(R)
    # Same rotation up to sign; matrix_to_quat canonicalizes w>=0.
    qc = jnp.where(q[..., :1] < 0, -q, q)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(qc), atol=1e-12)


def test_matrix_orthonormal(rng):
    q = jnp.asarray(random_quats(rng))
    R = rot.quat_to_matrix(q)
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), eye, atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-12)


def test_rpy_roundtrip(rng):
    rpy = rng.uniform(low=[-3, -1.4, -3], high=[3, 1.4, 3], size=(128, 3))
    R = rot.rpy_to_matrix(jnp.asarray(rpy))
    rpy2 = rot.matrix_to_rpy(R)
    np.testing.assert_allclose(np.asarray(rpy2), rpy, atol=1e-12)


def test_rpy_matches_tf_convention():
    # tf.transformations.euler_matrix(0.1, 0.2, 0.3)[:3,:3] reference values
    # (sxyz, the convention the reference uses at wbid.py:248).
    R = np.asarray(rot.rpy_to_matrix(jnp.array([0.1, 0.2, 0.3])))
    expected = np.array(
        [
            [0.93629336, -0.27509585, 0.21835066],
            [0.28962948, 0.95642509, -0.03695701],
            [-0.19866933, 0.0978434, 0.97517033],
        ]
    )
    np.testing.assert_allclose(R, expected, atol=1e-8)


def test_quat_rotate_matches_matrix(rng):
    q = jnp.asarray(random_quats(rng))
    v = jnp.asarray(rng.normal(size=(64, 3)))
    np.testing.assert_allclose(
        np.asarray(rot.quat_rotate(q, v)),
        np.asarray(jnp.einsum("nij,nj->ni", rot.quat_to_matrix(q), v)),
        atol=1e-12,
    )


def test_quat_mul_composes(rng):
    q1 = jnp.asarray(random_quats(rng))
    q2 = jnp.asarray(random_quats(rng))
    R12 = rot.quat_to_matrix(rot.quat_mul(q1, q2))
    np.testing.assert_allclose(
        np.asarray(R12),
        np.asarray(rot.quat_to_matrix(q1) @ rot.quat_to_matrix(q2)),
        atol=1e-12,
    )


def test_skew_cross(rng):
    a = jnp.asarray(rng.normal(size=(16, 3)))
    b = jnp.asarray(rng.normal(size=(16, 3)))
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nij,nj->ni", rot.skew(a), b)),
        np.asarray(jnp.cross(a, b)),
        atol=1e-12,
    )


def test_quat_integrate_constant_rate():
    q0 = jnp.array([1.0, 0.0, 0.0, 0.0])
    w = jnp.array([0.0, 0.0, np.pi / 2])  # 90 deg/s about z
    q = q0
    for _ in range(100):
        q = rot.quat_integrate(q, w, 0.01)
    np.testing.assert_allclose(
        np.asarray(rot.quat_to_rpy(q)), [0.0, 0.0, np.pi / 2], atol=1e-9
    )


def test_layout_adapters():
    wxyz = jnp.array([0.1, 0.2, 0.3, 0.4])
    np.testing.assert_allclose(
        np.asarray(rot.wxyz_from_xyzw(rot.xyzw_from_wxyz(wxyz))), np.asarray(wxyz)
    )
