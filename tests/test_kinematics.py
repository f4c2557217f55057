import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g1_locomotion_tpu.models import robot as rb

CONTACT_FRAMES = [
    "left_foot_line_contact_lower",
    "left_foot_line_contact_upper",
    "right_foot_line_contact_lower",
    "right_foot_line_contact_upper",
    "left_foot_point_contact",
    "right_foot_point_contact",
]


def test_model_loads(g1):
    assert g1.nj == 23
    assert g1.nv == 29
    assert g1.nq == 30
    np.testing.assert_allclose(float(g1.total_mass), 34.1329, atol=1e-3)
    for f in CONTACT_FRAMES:
        g1.frame_index(f)  # must exist


def test_joint_order_matches_reference(g1):
    # config.py:2-39 layout: left leg, right leg, waist, left arm, right arm.
    assert g1.joint_names[0] == "left_hip_pitch_joint"
    assert g1.joint_names[3] == "left_knee_joint"
    assert g1.joint_names[6] == "right_hip_pitch_joint"
    assert g1.joint_names[12] == "waist_yaw_joint"
    assert g1.joint_names[13] == "left_shoulder_pitch_joint"
    assert g1.joint_names[18] == "right_shoulder_pitch_joint"


def test_effort_limits(g1):
    # g1_23dof.xml:45-65 / URDF: hips +-88, knees +-139, ankle pitch +-50.
    assert float(g1.tau_max[g1.joint_index("left_hip_pitch_joint")]) == 88.0
    assert float(g1.tau_max[g1.joint_index("left_knee_joint")]) == 139.0
    assert float(g1.tau_max[g1.joint_index("left_ankle_pitch_joint")]) == 50.0


def test_fk_standing_feet_on_ground(g1, q_stand):
    X = rb.fk(g1, q_stand)
    for side in ("left", "right"):
        p = rb.frame_pose(g1, X, g1.frame_index(f"{side}_foot_point_contact")).p
        # Standing pose was tuned so feet are at/near z=0 (config.py:6 comment).
        assert abs(float(p[2])) < 0.02, (side, np.asarray(p))
    # Feet symmetric in y.
    pl = rb.frame_pose(g1, X, g1.frame_index("left_foot_point_contact")).p
    pr = rb.frame_pose(g1, X, g1.frame_index("right_foot_point_contact")).p
    np.testing.assert_allclose(float(pl[1]), -float(pr[1]), atol=1e-6)
    np.testing.assert_allclose(float(pl[0]), float(pr[0]), atol=1e-6)


def test_line_contact_offsets(g1, q_stand):
    """Heel/toe frames sit at x=-0.05/+0.12, z=-0.03 relative to ankle roll
    (g1_23dof.urdf:283-301)."""
    X = rb.fk(g1, q_stand)
    ankle = rb.frame_pose(g1, X, g1.frame_index("left_ankle_roll_link"))
    toe = rb.frame_pose(g1, X, g1.frame_index("left_foot_line_contact_upper"))
    heel = rb.frame_pose(g1, X, g1.frame_index("left_foot_line_contact_lower"))
    d_toe = np.asarray(ankle.inverse().apply(toe.p))
    d_heel = np.asarray(ankle.inverse().apply(heel.p))
    np.testing.assert_allclose(d_toe, [0.12, 0.0, -0.03], atol=1e-10)
    np.testing.assert_allclose(d_heel, [-0.05, 0.0, -0.03], atol=1e-10)


def test_com_standing(g1, q_stand):
    """The reference's standing CoM target (run_simulation.py:81) is
    [5.2679e-02, 7.4434e-05, 5.9798e-01], captured from a *settled* MuJoCo
    state (feet on the floor). Pure FK at q_init puts the foot soles at
    z=+0.03, so we check x/y directly and z as height-above-sole."""
    X = rb.fk(g1, q_stand)
    com = np.asarray(rb.com_position(g1, X))
    np.testing.assert_allclose(com[:2], [5.26790425e-02, 7.44339342e-05], atol=1e-4)
    sole_z = float(
        rb.frame_pose(g1, X, g1.frame_index("left_foot_point_contact")).p[2]
    )
    # FK height-above-sole is a bit above the settled value (gravity compresses
    # the stance in the reference's closed-loop sim).
    assert 0.59 < com[2] - sole_z < 0.64, com


def test_point_jacobian_fd(g1, q_stand, rng):
    """World point velocity from Jacobian == finite-difference of FK under
    configuration integration (validates the base-local twist convention)."""
    q = q_stand + 0.0
    q = q.at[7:].add(jnp.asarray(rng.normal(size=g1.nj) * 0.1))
    # random base orientation too
    from g1_locomotion_tpu.core import rotations as rot

    q = q.at[3:7].set(
        rot.rpy_to_quat(jnp.asarray(rng.normal(size=3) * 0.2))
    )
    v = jnp.asarray(rng.normal(size=g1.nv))
    fidx = g1.frame_index("left_foot_point_contact")

    X = rb.fk(g1, q)
    J = rb.frame_jacobian(g1, q, X, fidx)
    pred = np.asarray(J @ v)

    eps = 1e-7
    q2 = rb.integrate_q(g1, q, v, eps)
    p1 = rb.frame_pose(g1, rb.fk(g1, q), fidx)
    p2 = rb.frame_pose(g1, rb.fk(g1, q2), fidx)
    lin_fd = (np.asarray(p2.p) - np.asarray(p1.p)) / eps
    # Angular velocity from dR: w_skew = dR R^T / eps
    dR = (np.asarray(p2.R) - np.asarray(p1.R)) / eps
    W = dR @ np.asarray(p1.R).T
    ang_fd = np.array([W[2, 1], W[0, 2], W[1, 0]])

    np.testing.assert_allclose(pred[:3], lin_fd, atol=1e-5)
    np.testing.assert_allclose(pred[3:], ang_fd, atol=1e-5)


def test_com_jacobian_fd(g1, q_stand, rng):
    q = q_stand.at[7:].add(jnp.asarray(rng.normal(size=g1.nj) * 0.1))
    v = jnp.asarray(rng.normal(size=g1.nv))
    X = rb.fk(g1, q)
    pred = np.asarray(rb.com_jacobian(g1, q, X) @ v)

    eps = 1e-7
    q2 = rb.integrate_q(g1, q, v, eps)
    c1 = np.asarray(rb.com_position(g1, rb.fk(g1, q)))
    c2 = np.asarray(rb.com_position(g1, rb.fk(g1, q2)))
    np.testing.assert_allclose(pred, (c2 - c1) / eps, atol=1e-5)


def test_fk_vmap_jit(g1, q_stand):
    B = 32
    qs = jnp.tile(q_stand[None], (B, 1))
    f = jax.jit(jax.vmap(lambda q: rb.com_position(g1, rb.fk(g1, q))))
    out = f(qs)
    assert out.shape == (B, 3)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(rb.com_position(g1, rb.fk(g1, q_stand))), atol=1e-12
    )


def test_fk_against_mujoco(g1, q_stand):
    """Cross-check FK world positions against MuJoCo on an exported MJCF."""
    mujoco = pytest.importorskip("mujoco")
    from g1_locomotion_tpu.models.mjcf import export_mjcf
    from g1_locomotion_tpu.models.robot import load_robot
    import json
    from g1_locomotion_tpu.models.urdf import spec_from_dict
    from pathlib import Path

    asset = Path(rb.__file__).parent / "assets" / "g1_23dof.json"
    spec = spec_from_dict(json.loads(asset.read_text()))
    xml = export_mjcf(spec)
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    # MuJoCo free joint qpos = [pos, quat wxyz] — same as our layout.
    d.qpos[:] = np.asarray(q_stand)
    mujoco.mj_forward(m, d)

    X = rb.fk(g1, q_stand)
    for b, name in enumerate(g1.body_names):
        bid = m.body(name).id
        np.testing.assert_allclose(
            np.asarray(X.p[b]), d.xpos[bid], atol=1e-8, err_msg=name
        )
        np.testing.assert_allclose(
            np.asarray(X.R[b]).reshape(-1), d.xmat[bid], atol=1e-8, err_msg=name
        )
