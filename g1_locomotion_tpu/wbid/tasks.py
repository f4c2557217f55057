"""WBID task/constraint configuration: gains and weights of the reference stack.

This is the declarative spec of the OpenSoT ``AutoStack`` the reference builds
in ``WholeBodyID.setupProblem`` (wbid.py:29-224; SURVEY.md §2.4 table). Every
constant below is traceable to a wbid.py line. The stack compiler
(:mod:`g1_locomotion_tpu.wbid.stack`) turns this + the robot state into dense
QP blocks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class WBIDGains(NamedTuple):
    """Pytree of gains/weights — per-scenario randomizable."""

    # CoM task (wbid.py:55-60): gain 3 x (Kp=100 I, Kd=diag(30,30,50)), weight 3.
    com_kp: jnp.ndarray
    com_kd: jnp.ndarray
    w_com: jnp.ndarray
    # Base orientation task (wbid.py:70-75): gain 5 x diag Kp/Kd, rows 3:6,
    # weight 3 (wbid.py:172).
    base_kp_ang: jnp.ndarray
    base_kd_ang: jnp.ndarray
    w_base: jnp.ndarray
    # Postural task on arm/waist rows 18-28 (wbid.py:128-134,167): Kp=400, Kd=40,
    # weight 0.4.
    posture_kp: jnp.ndarray
    posture_kd: jnp.ndarray
    w_posture: jnp.ndarray
    # Acceleration regularization (wbid.py:152,167): weight 0.005.
    w_qddot_reg: jnp.ndarray
    # Angular momentum task (wbid.py:136-142,168): K=3 I, weight 0.3.
    angmom_k: jnp.ndarray
    w_angmom: jnp.ndarray
    # Torque minimization (wbid.py:170): weight 1e-8.
    w_tau_reg: jnp.ndarray
    # Contact (stance) tasks (wbid.py:174-176): lambda=(300, 20), weight 4.5.
    contact_kp: jnp.ndarray
    contact_kd: jnp.ndarray
    w_contact: jnp.ndarray
    # Swing tasks (wbid.py:110-115,176): 3 x diag gains, weight 2.9.
    swing_kp: jnp.ndarray
    swing_kd: jnp.ndarray
    w_swing: jnp.ndarray
    # Wrench tracking to MPC forces (wbid.py:179-182): weight 0.05.
    w_wrench: jnp.ndarray
    w_wrench_total: jnp.ndarray  # (3,) per-axis net-contact-force task weight
                                 # (stack.py): pins the realized CoM dynamics
                                 # to the MPC plan while the per-contact split
                                 # stays free. xy high (plan-following for the
                                 # laterally unstable LIPM channels), z zero
                                 # (the height servo needs PD feedback)
    # Friction coefficient (wbid.py:17).
    mu: jnp.ndarray
    # Stance wrench limits (wbid.py:123-124): fz in [10, 1000], |fx|,|fy| <= 1000.
    fz_min: jnp.ndarray
    fz_max: jnp.ndarray
    fxy_max: jnp.ndarray
    # Optional hand Cartesian tasks on the hand point contacts (frames from
    # g1_23dof.urdf:855-859, synthesized per-variant at load —
    # models/robot.py). Weight 0 = task rows still masked out when hand
    # references are supplied; the task only exists in the QP at all when
    # WBIDReferences.hand_pos is not None (static gate — the walking hot
    # path never pays for it).
    hand_kp: jnp.ndarray
    hand_kd: jnp.ndarray
    w_hand: jnp.ndarray
    # Optional torso-orientation task (Cartesian rows 3:6 on torso_link —
    # OpenSoT's Cartesian task targets any link, wbid.py:67-75 does exactly
    # this for the pelvis). On variants with waist roll/pitch DoFs the upper
    # body above the waist is otherwise held only by the postural task, and
    # the SRBD (one rigid body) cannot see it flop. Gated statically by
    # EngineConfig.torso_task via WBIDReferences.torso_R.
    torso_kp_ang: jnp.ndarray
    torso_kd_ang: jnp.ndarray
    w_torso: jnp.ndarray
    # Joint-limit viability lookahead [s]: the acceleration bound brakes a
    # joint so it can stop within this window. The reference's JointLimits
    # run at dt=1 ms with 10x velocity headroom (wbid.py:196-204) — bounds of
    # ~2e6 rad/s^2, i.e. effectively *vacuous* in normal operation. A long
    # lookahead (0.1 s) is much more conservative than the reference and was
    # measured (round 2) to strangle lateral CoM force delivery mid-walk
    # (ankle-pitch row goes active in double support, the WBID delivers half
    # the MPC's planned force, the gait pumps and falls). 0.02 s keeps a real
    # hard stop close to the limit without the anticipatory braking.
    qlim_lookahead: jnp.ndarray
    # Optional LEG postural task weight (hip/knee/ankle rows, same Kp/Kd as
    # the arm/waist postural task). The reference's postural task excludes
    # the legs — correct in-gait (leg motion belongs to the CoM/contact
    # tasks) but the walk-to-stand settle can park the knees at FULL
    # EXTENSION, where the CoM-height Jacobian row through the knee is
    # singular and the height servo locks at z ~ 0.70 instead of 0.598
    # (round-5 settle diagnosis, tools/diag_settle.py: knees pinned at
    # -0.088, fz = mg forced, then the tall singular stance topples
    # forward). Gated per tick by WBIDReferences.posture_legs_scale
    # (EngineConfig.settle_knee_guard fades it in after the last
    # touchdown); pulls the legs toward the bent q_init. 0 = off.
    w_posture_legs: jnp.ndarray = 0.0
    # Knee-extension floor [rad] under the settle knee guard: the knees'
    # effective lower limit rises to this as the guard fades in, so the
    # stand-up recovery can never park at the fully-straight singular
    # configuration (stack.py joint-limit rows; same static gate).
    knee_floor: jnp.ndarray = 0.15


def default_gains(dtype=jnp.float32) -> WBIDGains:
    return WBIDGains(
        com_kp=jnp.asarray([300.0, 300.0, 300.0], dtype),
        com_kd=jnp.asarray([90.0, 90.0, 150.0], dtype),
        w_com=jnp.asarray(3.0, dtype),
        base_kp_ang=jnp.asarray([50.0, 50.0, 100.0], dtype),
        base_kd_ang=jnp.asarray([250.0, 250.0, 250.0], dtype),
        w_base=jnp.asarray(3.0, dtype),
        posture_kp=jnp.asarray(400.0, dtype),
        posture_kd=jnp.asarray(40.0, dtype),
        w_posture=jnp.asarray(0.4, dtype),
        w_qddot_reg=jnp.asarray(0.005, dtype),
        angmom_k=jnp.asarray(3.0, dtype),
        w_angmom=jnp.asarray(0.3, dtype),
        w_tau_reg=jnp.asarray(1e-8, dtype),
        contact_kp=jnp.asarray(300.0, dtype),
        contact_kd=jnp.asarray(20.0, dtype),
        w_contact=jnp.asarray(4.5, dtype),
        swing_kp=jnp.asarray([1650.0, 2250.0, 1680.0, 210.0, 210.0, 210.0], dtype),
        swing_kd=jnp.asarray([30.0, 30.0, 51.0, 21.0, 21.0, 21.0], dtype),
        w_swing=jnp.asarray(2.9, dtype),
        w_wrench=jnp.asarray(0.05, dtype),
        w_wrench_total=jnp.asarray([25.0, 25.0, 0.0], dtype),
        mu=jnp.asarray(0.8, dtype),
        fz_min=jnp.asarray(10.0, dtype),
        fz_max=jnp.asarray(1000.0, dtype),
        fxy_max=jnp.asarray(1000.0, dtype),
        hand_kp=jnp.asarray(100.0, dtype),
        hand_kd=jnp.asarray(20.0, dtype),
        w_hand=jnp.asarray(1.0, dtype),
        torso_kp_ang=jnp.asarray(60.0, dtype),
        torso_kd_ang=jnp.asarray(15.0, dtype),
        w_torso=jnp.asarray(2.0, dtype),
        w_posture_legs=jnp.asarray(0.0, dtype),
        knee_floor=jnp.asarray(0.15, dtype),
        qlim_lookahead=jnp.asarray(0.02, dtype),
    )


class WBIDReferences(NamedTuple):
    """Per-tick references for the stack (the reference's ``setReference``,
    wbid.py:232-297, plus task activity from the gait FSM,
    ros_run_simulation.py:230-244,374-399)."""

    com_pos: jnp.ndarray       # (3,) from MPC x_opt1[3:6]
    com_vel: jnp.ndarray       # (3,) from MPC x_opt1[9:12]
    com_acc: jnp.ndarray       # (3,) feedforward sum(F)/m + g (wbid.py:287-294)
    base_R: jnp.ndarray        # (3,3) desired base orientation (from rpy)
    base_angvel: jnp.ndarray   # (3,) from MPC x_opt1[6:9]
    base_angacc: jnp.ndarray   # (3,) feedforward I^-1 sum(r x omega) (wbid.py:269-282)
    posture_q: jnp.ndarray     # (nj,) posture reference (initial config)
    contact_pos: jnp.ndarray   # (2, 3) stance-foot target positions (reset pose)
    contact_R: jnp.ndarray     # (2, 3, 3) stance-foot target orientations
    swing_pos: jnp.ndarray     # (2, 3) swing trajectory position
    swing_vel: jnp.ndarray     # (2, 3) swing velocity feedforward
    swing_acc: jnp.ndarray     # (2, 3) swing acceleration feedforward
    swing_R: jnp.ndarray       # (2, 3, 3) swing orientation target
    f_des: jnp.ndarray         # (4, 3) MPC contact forces (wrench tracking)
    contact_active: jnp.ndarray  # (2,) 1 = foot in stance (drives task masking
                                 # and wrench limits, ros_run_simulation.py:230-244)
    angmom_L: jnp.ndarray      # (3,) desired centroidal angular momentum —
                               # the plan's I_srbd @ omega (0 = reference
                               # behavior: damp all momentum, wbid.py:136-142)
    angmom_Ldot: jnp.ndarray   # (3,) momentum-rate feedforward — the plan's
                               # I_srbd @ omega_dot (0 = reference behavior)
    hand_pos: jnp.ndarray | None = None  # (2, 3) optional hand point-contact
                               # position targets (L, R); None (default)
                               # compiles the stack without hand tasks
    torso_R: jnp.ndarray | None = None  # (3, 3) optional torso_link
                               # orientation target (see WBIDGains.w_torso);
                               # None (default) compiles the stack without
                               # the torso task. Angular-velocity target is
                               # base_angvel (the plan's), feedforward zero.
    posture_legs_scale: jnp.ndarray | None = None  # scalar [0,1] fading in
                               # the LEG postural task (WBIDGains.
                               # w_posture_legs) during the walk-to-stand
                               # settle; None (default) compiles the stack
                               # without the leg rows (the walking hot path
                               # never pays for them).
