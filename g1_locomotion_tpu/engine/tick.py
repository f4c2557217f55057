"""The fused control tick: gait -> MPC -> WBID -> whole-body integration.

This is the TPU-native redesign of the reference's two-process architecture
(SURVEY.md §1): instead of a MuJoCo sim node and an MPC ROS node exchanging
``/srbd_current``/``/mpc_solution`` messages asynchronously
(ros_run_simulation.py:501-504), the cascade is one pure function

    (EngineState, params) -> (EngineState, TickLog)

jitted once and rolled out with ``lax.scan``: an outer scan over MPC periods
(dt = 0.04 s) with an inner scan over control ticks (dt = 0.001 s), matching
the reference's rate decoupling (MPC slow, WBID 1 kHz) deterministically
instead of latest-wins message passing.

The plant is the whole-body kinematic rollout driven by the WBID's optimal
accelerations (the "JAX SRBD rollout model replacing MuJoCo/ROS plumbing" of
BASELINE.json) — MuJoCo remains available host-side for validation
(tests/test_engine_mujoco.py).
"""

from __future__ import annotations

import time
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from g1_locomotion_tpu.core import rotations as rot
from g1_locomotion_tpu.engine import plant as plant_mod
from g1_locomotion_tpu.engine.state import q_init_standing
from g1_locomotion_tpu.gait import footsteps as fs
from g1_locomotion_tpu.gait import planner
from g1_locomotion_tpu.gait import schedule as gs
from g1_locomotion_tpu.gait import swing as sw
from g1_locomotion_tpu.models import robot as rb
from g1_locomotion_tpu.models import srbd
from g1_locomotion_tpu.models.robot import RobotModel
from g1_locomotion_tpu.mpc import solver as mpc
from g1_locomotion_tpu.wbid import solver as wbid
from g1_locomotion_tpu.wbid.stack import StackIndices
from g1_locomotion_tpu.wbid.tasks import WBIDGains, WBIDReferences, default_gains


class EngineConfig(NamedTuple):
    """Static engine configuration."""

    mpc: mpc.MPCConfig = mpc.MPCConfig()
    wbid: wbid.WBIDConfig = wbid.WBIDConfig()
    plant: plant_mod.PlantConfig = plant_mod.PlantConfig()
    ticks_per_mpc: int = 40  # 0.04 / 0.001 (run_simulation.py:169 vs :172)
    max_swing_height: float = 0.05  # m (ros_run_simulation.py:294)
    com_height: float = 0.598  # standing CoM target (run_simulation.py:81)
    # In-engine per-stage solve timing (the reference exports
    # /wbid_statistics solve times per tick, ros_run_simulation.py:488,
    # 509-511). Opt-in: ordered host callbacks serialize the stages they
    # measure, so the pure-engine throughput path keeps this OFF and
    # timing-instrumented rollouts are a diagnosis configuration.
    telemetry: bool = False
    # Per-tick whole-body configuration logging (TickLog.q) for the 3D
    # kinematic replay (utils/replay.py — the rviz analogue). Off by
    # default: sweeps at B ~ 10^4 scenarios don't want +nq floats per tick.
    log_q: bool = False
    # Torso-orientation WBID task on torso_link (stack.py): tracks the
    # plan's base orientation above the waist. For variants with waist
    # roll/pitch DoFs (g1_29dof*) — the 23-DoF torso is rigid to the pelvis
    # modulo yaw, so the default walk never pays for the extra task rows.
    torso_task: bool = False
    # Hand Cartesian hold tasks (wbid/stack.py hand rows) during engine
    # rollouts: each hand tracks its standing pose RELATIVE to the base
    # (yaw-following carry hold). The demo capability for the
    # g1_29dof_with_hand variant (BASELINE config 4) — walk while the hand
    # endpoints hold a carry posture. Off by default: the 23-DoF flagship
    # hot path compiles without the extra task rows.
    hand_task: bool = False
    # MPC solution staleness (ticks of the MPC period, 0 or 1). The
    # reference's sim always runs on a STALE solution: the latest-wins
    # /mpc_solution callback caches whatever the MPC node last published
    # while the next solve takes 2-7.6 ms (ros_run_simulation.py:188-218,
    # MPC_QP_layout.xml:256-259). mpc_delay=1 reproduces that regime
    # pessimistically — the whole period runs on the PREVIOUS period's
    # solution (a full 40 ms compute budget, > the reference's worst case).
    # 0 (default) is the synchronous cadence: each period applies its own
    # fresh solve at period start.
    mpc_delay: int = 0
    # Delay-compensation mode at mpc_delay=1: "full" (one-step SRBD state
    # prediction + gait-clock shift — plan for the window where the solve
    # will be applied), "state" / "clock" (each half alone), "none" (apply
    # stale solves of the measured state — the reference's literal
    # behavior). Diagnostic surface for tools/exp_stale.py.
    delay_comp: str = "full"
    # Weight-transfer gait-clock gate + DS slow-down (GaitConfig.gate_window
    # / ds_slow_gain): measured dead ends under MuJoCo (TODO.md) that remain
    # internal-plant capabilities. Static flag so the production tick
    # carries ZERO dead control flow — with the default False the xi-gate
    # prediction block is never traced into the HLO. The always-armed
    # crouch guard (gate_z_tol) and step-timing adaptation (timing_gain)
    # are live flagship mechanisms and are NOT behind this flag.
    gait_gate: bool = False
    # Settle knee guard: after the last touchdown, fade in the LEG postural
    # task (WBIDGains.w_posture_legs, stack.py) over 0.3 s — escapes the
    # straight-knee singularity lock the walk-to-stand recovery can park in
    # (round-5 diagnosis, tools/diag_settle.py: knees pinned at full
    # extension, CoM stuck at z 0.70, fz = mg forced, slow forward topple).
    # Static flag: the walking hot path compiles without the leg rows.
    settle_knee_guard: bool = False
    # STATIC gate for the round-5 experimental planner mechanisms
    # (FootstepConfig.dcm_err_gain schedule, GaitConfig.stop_ramp_s /
    # pre_stop_s). Off (default) compiles the EXACT round-4 planner
    # program — even value-neutral extra ops change XLA's codegen draw and
    # flipped the validated stale-cadence walk (round-5 measurement; the
    # golden stayed bitwise identical). Tools that exercise the mechanisms
    # (diag_settle, ensemble_mjwalk, sweep_margins wave 3) enable it.
    plan_extras: bool = False
    # Lateral sway + weight-transfer gate parameters live in GaitConfig
    # (per-scenario pytree, vmappable/randomizable).


class ScenarioParams(NamedTuple):
    """Per-scenario randomizable parameters (a pytree — vmap axis 0)."""

    srbd: srbd.SRBDParams
    mpc_weights: mpc.MPCWeights
    wbid_gains: WBIDGains
    gait: gs.GaitConfig
    steps: fs.FootstepConfig
    v_cmd: jnp.ndarray  # (2,) commanded planar velocity


def walking_config() -> EngineConfig:
    """The validated walking configuration (BASELINE config 1 demo).

    Horizon N=20 previews the full next step; QP solvers on the
    factorization path with full polish — closed-loop walking is knife-edge
    sensitive to solver numerics, and this combination is the validated one
    (the matmul-inverse fast path is for throughput workloads; its ~1e-12
    solution differences are enough to perturb the marginal lateral dynamics
    of the walk). Pair with walking_scenario(): roll-honest MPC weights +
    the net-contact-force WBID task are what make the 8-step walk stable
    (see CLAUDE.md round-2 notes).
    """
    from g1_locomotion_tpu.ops.qp import QPConfig

    return EngineConfig(
        mpc=mpc.MPCConfig(
            horizon=20,
            footstep_opt=True,
            qp=QPConfig(iters=60, scaling_iters=0, rho=1.0, rho_segments=2,
                        matmul_inverse=False, polish_rounds=3),
        ),
        wbid=wbid.WBIDConfig(
            qp=QPConfig(iters=50, scaling_iters=3, rho=0.1, rho_segments=2,
                        matmul_inverse=False, polish_rounds=3)
        ),
    )


def walking_config_f32() -> EngineConfig:
    """walking_config + float32 numeric mitigations for on-chip execution.

    The f64-validated walk is knife-edge sensitive to QP numerics
    (CLAUDE.md); at plain f32 on the TPU it falls (round-3 measurement).
    This configuration adds iterative refinement on every polish KKT solve
    (QPConfig.polish_refine — reuses the LU factors, ~1 extra digit of
    accuracy per pass) for the f32 deployment path."""
    cfg = walking_config()
    return cfg._replace(
        mpc=cfg.mpc._replace(qp=cfg.mpc.qp._replace(polish_refine=2)),
        wbid=cfg.wbid._replace(qp=cfg.wbid.qp._replace(polish_refine=2)),
    )


def default_scenario(dtype=jnp.float32) -> ScenarioParams:
    return ScenarioParams(
        srbd=srbd.default_params(dtype),
        mpc_weights=mpc.default_weights(dtype),
        wbid_gains=default_gains(dtype),
        gait=gs.default_gait(dtype),
        steps=fs.default_footsteps(dtype),
        v_cmd=jnp.zeros(2, dtype),
    )


def walking_scenario(
    dtype=jnp.float32,
    n_steps: float = 8.0,
    v_cmd=(0.1, 0.0),
) -> ScenarioParams:
    """Scenario defaults for dynamic walking (pairs with walking_config):
    velocity-emphasized MPC weights (mpc.walking_weights), gait timing
    SCHEDULED by the commanded speed (BASELINE config 1 is a
    velocity-commanded MPC — one fixed gait does not cover the envelope):

    * fast (vx >= 0.15 m/s): swing 0.20 s / DS 0.30 s — the sweep-validated
      0.2 m/s gait (tools/sweep_speed.py wave 0; tools/validate_fast_walk.py
      passes the full walking-test bar with it). Shorter swings cap the
      per-step LIPM divergence the larger sagittal excursions drive.
    * slow (vx <= 0.075 m/s): damped LATERAL DCM placement (dcm_scale 0.8)
      with slightly over-unity sagittal capture (dcm_scale_x 1.2) +
      step-timing adaptation — at low speed the full-gain lateral capture
      over-steps the small nominal step (round-2 measurement: vx creep
      0.05 -> 0.4), but damping BOTH axes walks in place (round-3 sweep:
      shared dcm 0.8 gave v_real ~ 0.004 at a 0.05 command; the x-split at
      1.2 tracks 0.061).
    """
    p = default_scenario(dtype)
    gait = p.gait._replace(n_steps=jnp.asarray(n_steps, dtype))
    steps = p.steps
    vx = abs(float(v_cmd[0]))
    if vx >= 0.15:
        gait = gait._replace(
            swing_duration=jnp.asarray(0.20, dtype),
            double_support_duration=jnp.asarray(0.30, dtype),
        )
    elif vx <= 0.075:
        steps = steps._replace(
            dcm_scale=jnp.asarray(0.8, dtype),
            dcm_scale_x=jnp.asarray(1.2, dtype),
        )
        gait = gait._replace(timing_gain=jnp.asarray(3.0, dtype))
    return p._replace(
        mpc_weights=mpc.walking_weights(dtype),
        gait=gait,
        steps=steps,
        v_cmd=jnp.asarray(v_cmd, dtype),
    )


def variant_walking_scenario(
    model: RobotModel,
    dtype=jnp.float32,
    n_steps: float = 8.0,
    v_cmd=(0.1, 0.0),
) -> ScenarioParams:
    """Walking scenario for non-default robot variants (robot-generic WBID,
    reference wbid.py:20 loads any URDF): SRBD parameters derived from THIS
    model at its standing pose (the 23-DoF composite-inertia constants
    destabilize other mass distributions), plus posture stiffening when the
    variant has waist roll/pitch DoFs — the SRBD treats the robot as one
    rigid body, and on g1_29dof the upper body held only by the reference's
    w_posture=0.4 flops around the extra waist joints until the model
    mismatch diverges (round-3 measurement: w_posture 0.4 falls in the
    first steps at +-3 rad of roll; 2.0 walks all 8 steps and settles)."""
    from g1_locomotion_tpu.engine.state import q_init_standing

    p = walking_scenario(dtype, n_steps=n_steps, v_cmd=v_cmd)
    p = p._replace(
        srbd=srbd.params_from_model(model, q_init_standing(model, dtype))
    )
    if any(
        ("waist_roll" in n) or ("waist_pitch" in n)
        for n in model.joint_names
    ):
        p = p._replace(
            wbid_gains=p.wbid_gains._replace(
                w_posture=jnp.asarray(2.0, dtype)
            )
        )
    if any("hand_thumb" in n for n in model.joint_names):
        # Dexterous-hand variant (g1_29dof_with_hand): the carry-hold hand
        # task needs a STIFF hold (w_hand 10, hand_kd 40) — at the default
        # w_hand=1 the 0.9 kg hands at the arm endpoints build a slow arm
        # oscillation through the walk that topples the settle (round-4
        # sweep: every w_posture in {1..6} falls at w_hand=1; the stiff
        # hold walks the full bar with hands converging to ~6 mm). Pair
        # with variant_walking_config (hand_task=True for this variant).
        p = p._replace(
            wbid_gains=p.wbid_gains._replace(
                w_hand=jnp.asarray(10.0, dtype),
                hand_kd=jnp.asarray(40.0, dtype),
            )
        )
    return p


def variant_walking_config(model: RobotModel) -> EngineConfig:
    """Static walking config for a robot variant: walking_config plus the
    torso-orientation task when the variant has waist roll/pitch DoFs (the
    structural reason 29-DoF walking is narrow — the upper body above the
    waist is invisible to the single-rigid-body MPC; pair with
    variant_walking_scenario)."""
    cfg = walking_config()
    if any(
        ("waist_roll" in n) or ("waist_pitch" in n)
        for n in model.joint_names
    ):
        cfg = cfg._replace(torso_task=True)
    if any("hand_thumb" in n for n in model.joint_names):
        cfg = cfg._replace(hand_task=True)
    return cfg


def mujoco_walking_scenario(
    dtype=jnp.float32,
    n_steps: float = 8.0,
    v_cmd=(0.1, 0.0),
) -> ScenarioParams:
    """Walking scenario validated under REAL MuJoCo unilateral contacts:
    wider nominal stance (0.16 m vs 0.12) and longer double support (0.35 s
    vs 0.25). Real feet cannot deliver the roll-channel lateral forces the
    bilateral-pin plant realizes faithfully (round-2 measurement: the WBID
    QP tracks the plan exactly while MuJoCo under-delivers lateral force
    50-70% in single support), so the MuJoCo gait buys its lateral margin
    geometrically — wider stance, more transfer time. 6 steps + settle to a
    quiet stand is the deterministic regression point.

    Round-3 robustness map (tools/ensemble_mjwalk.py): the NOMINAL-geometry
    gait with the round-3 mechanisms (dcm 1.3, timing_gain 3, gate_z_tol
    0.12, landing_lock 0.65) reached 16 steps in one draw but the outcome is
    chaotic — numerically-ulp-level controller changes moved the fall
    between step 5 and step 16 across draws, and the same mechanism bundle
    REGRESSES this bespoke gait (seed-0 ensemble falls in the settle). The
    mechanisms are therefore NOT enabled here; they are the validated f32
    flagship combination instead (walking_scenario_f32_robust). MuJoCo
    nominal-geometry margin remains the open frontier — the honest findings
    live in TODO.md."""
    p = walking_scenario(dtype, n_steps=n_steps, v_cmd=v_cmd)
    return p._replace(
        steps=p.steps._replace(step_width=jnp.asarray(0.16, dtype)),
        gait=p.gait._replace(
            double_support_duration=jnp.asarray(0.35, dtype)
        ),
    )


def mujoco_nominal_config() -> EngineConfig:
    """walking_config + the DS-tail clock law compiled in (gait_gate) —
    pair with mujoco_nominal_scenario."""
    return walking_config()._replace(gait_gate=True)


def mujoco_nominal_scenario(
    dtype=jnp.float32,
    n_steps: float = 8.0,
    v_cmd=(0.1, 0.0),
) -> ScenarioParams:
    """NOMINAL-geometry MuJoCo walking bundle (width 0.12 / DS 0.25 — the
    reference's own gait constants, ros_run_simulation.py:148): DS
    slow-down (gate_window 0.4, ds_slow_gain 3, ds_rate_min 0.5,
    gate_xi_tol 0.02) + swing-limb momentum preview (m_swing 1 kg).

    Round-4 record (tools/ensemble_mjwalk.py, mid-walk pushes): moved the
    nominal-geometry frontier from 0/N passes at floor ~4.4 steps (round
    3: every single-knob variation fell there) to 1/4 FULL passes
    (8 steps + quiet stand under a push) at floor 5.4 — the measured fall
    chain (SS lateral under-delivery -> roll ratchet -> DS transfer fails,
    tools/diag_mjwalk.py) is broken by giving lagging weight transfers
    more time (slow-down, never frozen) and by previewing the swing leg's
    angular-momentum rate in the MPC model. Still short of the >=4/5
    robustness target: the walk-to-stand capture + draw chaos
    (docs/ROBUSTNESS.md, TODO.md). The deterministic regression gait for
    MuJoCo stays mujoco_walking_scenario (wide stance)."""
    p = walking_scenario(dtype, n_steps=n_steps, v_cmd=v_cmd)
    return p._replace(
        srbd=p.srbd._replace(m_swing=jnp.asarray(1.0, dtype)),
        gait=p.gait._replace(
            gate_window=jnp.asarray(0.4, dtype),
            ds_slow_gain=jnp.asarray(3.0, dtype),
            ds_rate_min=jnp.asarray(0.5, dtype),
            gate_xi_tol=jnp.asarray(0.02, dtype),
        ),
    )


def walking_scenario_f32_robust(
    dtype=jnp.float32,
    n_steps: float = 8.0,
    v_cmd=(0.1, 0.0),
) -> ScenarioParams:
    """The float32 flagship walking scenario — walking_scenario plus the
    round-3 robustness mechanisms, the combination validated ON THE TPU
    (pair with walking_config_f32):

    * landing lock 0.65 (GaitConfig.landing_lock) — the decisive one: at f32
      the 2-8 cm late-update touchdown misses are what kill the walk; with
      the lock the 8-step walk completes on-chip,
    * over-unity DCM placement (dcm_scale 1.3) + step-timing adaptation
      (timing_gain 3, tol 0.03) — absorb f32 solver noise like any other
      disturbance,
    * relaxed crouch guard (gate_z_tol 0.12) — f32 height tracking rides a
      few cm lower; the default 0.06 threshold freezes the gait clock.

    The combination is load-bearing as a bundle: dcm 1.2 or 1.4, or lock
    0.7, each fall at f32 (round-3 sweep); f64 does not need any of this
    (walking_scenario alone walks)."""
    p = walking_scenario(dtype, n_steps=n_steps, v_cmd=v_cmd)
    return p._replace(
        steps=p.steps._replace(dcm_scale=jnp.asarray(1.3, dtype)),
        gait=p.gait._replace(
            timing_gain=jnp.asarray(3.0, dtype),
            timing_tol=jnp.asarray(0.03, dtype),
            gate_z_tol=jnp.asarray(0.12, dtype),
            landing_lock=jnp.asarray(0.65, dtype),
        ),
    )


def stale_walking_scenario(
    dtype=jnp.float32,
    n_steps: float = 8.0,
    v_cmd=(0.1, 0.0),
) -> ScenarioParams:
    """Walking scenario validated under the STALE-SOLUTION cadence
    (EngineConfig.mpc_delay=1 + delay_comp="full") — the reference's real
    operating regime made pessimistic: every MPC solution is applied one
    full 40 ms period late (the reference's measured staleness is 2-7.6 ms,
    MPC_QP_layout.xml:256-259).

    The bundle is walking_scenario_f32_robust with the landing lock moved
    EARLIER (0.5 vs 0.65). Round-4 sweep (tools/sweep_stale.py): under
    delay=1 the committed foothold reaches the executing tick one period
    late, so late landing updates (which the swing foot could still track
    synchronously) become unreachable — locking at half-swing restores a
    convergent swing servo. lock 0.65 falls, 0.5 walks the full bar; the
    convergent swing servo. Measured margin (sweep wave 1): lock 0.45 and
    0.50 walk the full bar; 0.40 and 0.55 fall. The bundle is load-bearing
    as a bundle: timing_gain 0, dcm 1.2, or the plain (non-robust) scenario
    each fall under delay=1. Delay compensation must be "full": planning
    from the measured (40 ms old) state loses the walk (comp=none 3+3
    steps), and the clock shift without the state prediction is
    catastrophic (comp=clock diverges)."""
    p = walking_scenario_f32_robust(dtype, n_steps=n_steps, v_cmd=v_cmd)
    return p._replace(
        gait=p.gait._replace(landing_lock=jnp.asarray(0.5, dtype))
    )


class EngineState(NamedTuple):
    """Carried state of the closed loop (pytree)."""

    q: jnp.ndarray            # (nq,) whole-body configuration
    v: jnp.ndarray            # (nv,) generalized velocity
    t: jnp.ndarray            # scalar sim time
    U_warm: jnp.ndarray       # (N, 12) MPC warm start
    u0: jnp.ndarray           # (12,) latest MPC forces
    x_opt0: jnp.ndarray       # (13,) SRBD state at the latest MPC solve
    x_opt1: jnp.ndarray       # (13,) latest MPC next-state reference
    contact_now: jnp.ndarray  # (4,) latest MPC contact flags
    landing: jnp.ndarray      # (3,) planned touchdown point
    swing_start: jnp.ndarray  # (2, 3) lift-off positions per foot
    contact_hold: jnp.ndarray # (2, 3) stance target positions (reset poses)
    contact_hold_R: jnp.ndarray  # (2, 3, 3)
    prev_stance: jnp.ndarray  # (2,) stance flags from the previous tick
    anchors: jnp.ndarray      # (4, 3) contact pin positions for the plant
    gait_clock: jnp.ndarray   # scalar gait time — advances with sim time but
                              # pauses at the end of double support until the
                              # weight transfer completes (state-gated gait)
    swing_xy_ref: jnp.ndarray # (2, 2) receding swing-foot xy reference —
                              # carried per tick so mid-swing landing updates
                              # are absorbed smoothly (see _wbid_tick)
    gate_hold: jnp.ndarray    # scalar 0/1 — 1 while the weight-transfer gate
                              # pauses the gait clock. The MPC stage zeroes
                              # the commanded velocity during a hold: with the
                              # receding (CoM-anchored) sagittal reference, a
                              # nonzero v_cmd has no position feedback and
                              # would march the CoM off the frozen support
                              # polygon (round-2: forward fall with 0 steps
                              # taken when a tight gate held the first DS)
    # Pending (freshly-solved, not-yet-applied) MPC solution — the
    # one-period staleness buffer for EngineConfig.mpc_delay=1. Unused
    # (carried verbatim) at mpc_delay=0; ~45 floats, negligible next to
    # U_warm's (N,12).
    u0_pend: jnp.ndarray      # (12,)
    x_opt0_pend: jnp.ndarray  # (13,)
    x_opt1_pend: jnp.ndarray  # (13,)
    contact_pend: jnp.ndarray # (4,)
    landing_pend: jnp.ndarray # (3,)


class TickLog(NamedTuple):
    """Per-tick diagnostics (the PlotJuggler tab contents, SURVEY.md §2.1 row 13).

    ``plan_x1`` is the MPC's one-period-ahead predicted state (x_opt[1]) held
    over the period's ticks — juxtaposing it (shifted one MPC period) against
    the realized state is the reference's de-facto correctness check
    (MPC_QP_layout.xml:10-100 plots /mpc_solution vs /srbd_current)."""

    com: jnp.ndarray
    tau: jnp.ndarray
    forces: jnp.ndarray
    contact: jnp.ndarray
    plan_x1: jnp.ndarray      # (13,) MPC predicted next state
    plan_u0: jnp.ndarray      # (12,) MPC planned contact forces (u_opt0) —
                              # juxtapose against realized `forces` (the
                              # reference plots /mpc_solution forces the
                              # same way)
    landing: jnp.ndarray      # (3,) planned touchdown point
    mpc_pri_res: jnp.ndarray
    wbid_pri_res: jnp.ndarray
    mpc_ms: jnp.ndarray       # host wall-clock of the period's MPC solve
    wbid_ms: jnp.ndarray      # host wall-clock of this tick's WBID solve
                              # (both 0 unless cfg.telemetry)
    q: jnp.ndarray            # (nq,) whole-body configuration for the 3D
                              # replay (empty (0,) unless cfg.log_q)


class _StageClock:
    """Host stopwatch for in-jit solve timing (cfg.telemetry).

    A pair of ORDERED io_callbacks brackets the solve; the data dependencies
    (start token folded into the solve input, solve residual fed to stop)
    pin the callbacks to the solve in program order, so the measured window
    is the solve's host wall-clock even under XLA reordering. State lives on
    the host object — legal because ordered callbacks execute serially in
    program order, including across lax.scan iterations."""

    def __init__(self):
        self._t0 = 0.0

    def _start(self):
        self._t0 = time.perf_counter()
        return np.float32(0.0)

    def _stop(self, _dep):
        return np.float32((time.perf_counter() - self._t0) * 1e3)

    def start(self, dtype):
        from jax.experimental import io_callback

        tok = io_callback(
            self._start, jax.ShapeDtypeStruct((), np.float32), ordered=True
        )
        return tok.astype(dtype)

    def stop(self, dep, dtype):
        from jax.experimental import io_callback

        ms = io_callback(
            self._stop, jax.ShapeDtypeStruct((), np.float32), dep,
            ordered=True,
        )
        return ms.astype(dtype)


def init_state(model: RobotModel, cfg: EngineConfig, dtype=jnp.float32) -> EngineState:
    q = q_init_standing(model, dtype)
    X = rb.fk(model, q)
    idx = StackIndices.from_model(model)
    feet = jnp.stack([rb.frame_pose(model, X, f).p for f in idx.feet])
    feet_R = jnp.stack([rb.frame_pose(model, X, f).R for f in idx.feet])
    N = cfg.mpc.horizon
    return EngineState(
        q=q,
        v=jnp.zeros(model.nv, dtype),
        t=jnp.asarray(0.0, dtype),
        U_warm=jnp.zeros((N, 12), dtype),
        u0=jnp.zeros(12, dtype),
        x_opt0=jnp.zeros(13, dtype),
        x_opt1=jnp.zeros(13, dtype),
        contact_now=jnp.ones(4, dtype),
        landing=feet[0],
        swing_start=feet,
        contact_hold=feet,
        contact_hold_R=feet_R,
        prev_stance=jnp.ones(2, dtype),
        anchors=plant_mod.anchors_from_state(model, idx, q).astype(dtype),
        gait_clock=jnp.asarray(0.0, dtype),
        swing_xy_ref=feet[:, :2],
        gate_hold=jnp.asarray(0.0, dtype),
        u0_pend=jnp.zeros(12, dtype),
        x_opt0_pend=jnp.zeros(13, dtype),
        x_opt1_pend=jnp.zeros(13, dtype),
        contact_pend=jnp.ones(4, dtype),
        landing_pend=feet[0],
    )


def srbd_state_from_wholebody(
    model: RobotModel, q: jnp.ndarray, v: jnp.ndarray, body_X
) -> jnp.ndarray:
    """Pack the 13-dim SRBD state from the whole-body state — the analogue of
    publish_current_state (ros_run_simulation.py:21-79,428-450)."""
    theta = rot.quat_to_rpy(q[3:7])
    com = rb.com_position(model, body_X)
    base_R = body_X.R[0]
    omega_world = base_R @ v[3:6]
    com_vel = rb.com_velocity(model, q, v, body_X)
    g = jnp.asarray(srbd.GRAVITY, q.dtype)
    return jnp.concatenate([theta, com, omega_world, com_vel, g[None]])


def _mpc_stage(
    model: RobotModel,
    idx: StackIndices,
    cfg: EngineConfig,
    params: ScenarioParams,
    state: EngineState,
):
    """Periodic MPC solve — the reference's mpc_to_wbid_node turn (SURVEY §3.2).

    All planning (footstep placement, horizon contacts, CoM reference) lives
    in gait/planner.py — this stage only adds the whole-body measurement
    (FK -> SRBD state + contact positions) and runs the QP."""
    body_X = rb.fk(model, state.q)
    x0 = srbd_state_from_wholebody(model, state.q, state.v, body_X)

    # Current contact point positions (4: L-heel, L-toe, R-heel, R-toe).
    cpos = jnp.stack(
        [rb.frame_pose(model, body_X, f).p for f in idx.contacts]
    )  # (4,3)

    plan_clock = state.gait_clock
    if cfg.mpc_delay == 1:
        # Delay COMPENSATION for the stale cadence: this solve is applied
        # one period from now, so plan from the one-step SRBD prediction of
        # the state THEN — measured state propagated through the model with
        # the forces being applied this period (the pending solution). A
        # real MPC node with compute latency does exactly this; planning
        # from the measured state instead loses the walk (round-4
        # measurement: 3 steps then capsize — every solution arrives
        # describing a 40 ms-old world). The first period has no pending
        # solution and is applied synchronously (see make_rollout), so it
        # plans from the measurement.
        first = state.t < 0.5 * cfg.plant.dt
        if cfg.delay_comp in ("full", "state"):
            r_now = cpos - x0[3:6][None, :]
            A_c, B_c = srbd.continuous_matrices(params.srbd, x0[2], r_now)
            Ad1, Bd1 = srbd.discretize(A_c, B_c, cfg.mpc.dt)
            u_applied = state.u0_pend * state.contact_pend.repeat(3)
            x_pred = Ad1 @ x0 + Bd1 @ u_applied
            x0 = jnp.where(first, x0, x_pred)
        if cfg.delay_comp in ("full", "clock"):
            plan_clock = state.gait_clock + jnp.where(
                first, 0.0, jnp.asarray(cfg.mpc.dt, x0.dtype)
            )

    # During a weight-transfer hold, plan pure station-keeping (see
    # EngineState.gate_hold).
    v_cmd_eff = params.v_cmd * (1.0 - state.gate_hold)
    # Landing lock (gait.landing_lock < 1): past that swing-phase fraction
    # the committed foothold is frozen so the rate-limited swing foot can
    # converge to it (see GaitConfig.landing_lock).
    _, in_swing_m, _, progress_m = gs.phase_info(
        params.gait, plan_clock
    )
    lock_flag = (
        (in_swing_m > 0.5) & (progress_m > params.gait.landing_lock)
    ).astype(x0.dtype)
    # Landing continuity follows the PLANNING chain: at mpc_delay=1 the
    # last-committed foothold of this solve sequence lives in the pending
    # buffer (state.landing holds the stale applied one).
    prev_landing = (
        state.landing_pend if cfg.mpc_delay == 1 else state.landing
    )
    plan = planner.plan_horizon(
        params.gait, params.steps, v_cmd_eff, x0, cpos,
        plan_clock, cfg.mpc.horizon, cfg.mpc.dt, cfg.com_height,
        hold=state.gate_hold,
        prev_landing=prev_landing, lock_flag=lock_flag,
        swing_start=state.swing_start, z_apex=cfg.max_swing_height,
        plan_extras=cfg.plan_extras,
    )

    if cfg.telemetry:
        clock = _StageClock()
        x0 = x0 + clock.start(x0.dtype) * 0.0
    sol = mpc.solve(
        cfg.mpc,
        params.mpc_weights,
        params.srbd,
        x0,
        plan.x_ref,
        plan.contact_hor,
        plan.c_hor,
        plan.p_ref,
        U_warm=state.U_warm,
        landing_mask=plan.landing_mask,
        hdot_sw=plan.hdot_geom,
    )
    mpc_ms = (
        clock.stop(sol.pri_res, x0.dtype)
        if cfg.telemetry else jnp.zeros((), x0.dtype)
    )
    landing = plan.landing
    if cfg.mpc.footstep_opt:
        # Fold in the jointly-optimized landing offset (re-clipped for foot
        # separation; the QP's reach box already bounds |d|) — suppressed
        # while the landing lock holds the committed foothold.
        landing = jnp.where(
            lock_flag > 0.5,
            plan.landing,
            planner.apply_landing_offset(plan, sol.d),
        )
    return state._replace(
        U_warm=sol.U,
        u0=sol.u0,
        x_opt0=sol.x_horizon[0],
        x_opt1=sol.x_horizon[1],
        contact_now=plan.contact_hor[0],
        landing=landing,
    ), sol, mpc_ms


def _wbid_tick(
    model: RobotModel,
    idx: StackIndices,
    cfg: EngineConfig,
    params: ScenarioParams,
    state: EngineState,
    alpha: jnp.ndarray,
) -> Tuple[EngineState, TickLog]:
    """One 1 kHz control tick: gait FSM -> WBID refs -> QP -> integrate
    (the reference's sim_step, ros_run_simulation.py:341-489).

    ``alpha`` in (0, 1] is the tick's phase within the MPC period: CoM/base
    references interpolate x_opt0 -> x_opt1 along the MPC's own predicted
    trajectory. The reference implementation instead holds x_opt1 for the
    whole period (wbid.py:243-294) — but a stiff task PD chasing a held
    future target front-loads acceleration and arrives at the target
    position with excess velocity in the direction of motion (measured
    round 2: vy overshoot up to 0.2 m/s per period at mm-level position
    accuracy). That per-period velocity excess pumps the lateral gait
    oscillation until foot placement can no longer absorb it — the dominant
    cause of the reference demo's few-step limit, removed here by
    within-period interpolation."""
    dtype = state.q.dtype
    body_X = rb.fk(model, state.q)

    # Contact FSM from the MPC's active flags (ros_run_simulation.py:374-399).
    left_active = jnp.maximum(state.contact_now[0], state.contact_now[1])
    right_active = jnp.maximum(state.contact_now[2], state.contact_now[3])
    contact_active = jnp.stack([left_active, right_active])

    _, in_swing, swing_is_left, progress = gs.phase_info(params.gait, state.gait_clock)

    # Per-foot stance transitions — the jit equivalent of the reference's
    # task reset()s in switch_procedure (ros_run_simulation.py:230-244):
    #  * lift-off (stance -> swing): latch the swing start position
    #    (feet_gait_procedure, ros_run_simulation.py:284-322);
    #  * touchdown (swing -> stance): re-anchor the stance task target to the
    #    just-landed pose (contact_tasks[..].reset()).
    feet_now = jnp.stack([rb.frame_pose(model, body_X, f).p for f in idx.feet])
    feet_R_now = jnp.stack([rb.frame_pose(model, body_X, f).R for f in idx.feet])
    liftoff = (contact_active < 0.5) & (state.prev_stance > 0.5)  # (2,)
    touchdown = (contact_active > 0.5) & (state.prev_stance < 0.5)
    swing_start = jnp.where(liftoff[:, None], feet_now, state.swing_start)
    # Touchdown re-anchoring: xy where the foot landed, but z at GROUND
    # height — carried by induction from the initial (standing) anchors.
    # Pinning z at the measured foot height builds a phantom staircase: the
    # swing ends a few mm-cm high (schedule flips before the trajectory
    # finishes descending), the bilateral pin then holds the robot on that
    # raised phantom step, and each step pins higher (measured round 2:
    # +3 mm, +16 mm, +78 mm over three touchdowns) until the legs can no
    # longer reach the old ground and the knee saturates. A real floor
    # (MuJoCo) has no such mode — contact happens at ground z by definition.
    feet_td = feet_now.at[:, 2].set(state.contact_hold[:, 2])
    contact_hold = jnp.where(touchdown[:, None], feet_td, state.contact_hold)
    contact_hold_R = jnp.where(
        touchdown[:, None, None], feet_R_now, state.contact_hold_R
    )
    cpos_now = jnp.stack(
        [rb.frame_pose(model, body_X, f).p for f in idx.contacts]
    )
    touchdown_c = jnp.repeat(touchdown, 2)  # foot -> its 2 contact points
    cpos_td = cpos_now.at[:, 2].set(state.anchors[:, 2])
    anchors = jnp.where(touchdown_c[:, None], cpos_td, state.anchors)

    # Receding swing xy reference: carried tick-to-tick so mid-swing landing
    # updates are absorbed over the REMAINING phase instead of jumping the
    # tracked reference. A late capture-point update used to shift the swing
    # task target near-instantly (xy_phase(s) ~ 1 late in swing) and the foot
    # missed the planned foothold by up to 10 cm at a step-3 cross-step
    # (round-2 probe) — the planner then "captured" with a foothold that never
    # happened. The per-tick advance toward the current landing target follows
    # the same sine-eased phase profile and is rate-limited to what the leg
    # can actually track (gait.swing_xy_rate_max), so the realized foothold
    # stays close to what the planner assumed.
    ds_phase = cfg.plant.dt / params.gait.swing_duration
    ph_now = sw.xy_phase(progress)
    ph_next = sw.xy_phase(jnp.clip(progress + ds_phase, 0.0, 1.0))
    frac = jnp.clip(
        (ph_next - ph_now) / jnp.maximum(1.0 - ph_now, 1e-6), 0.0, 1.0
    )

    def swing_xy(side):
        is_this = (
            jnp.where(swing_is_left, side == 0, side == 1) & (in_swing > 0)
        )
        ref = state.swing_xy_ref[side]
        step_vec = frac * (state.landing[:2] - ref)
        step_norm = jnp.linalg.norm(step_vec)
        cap = params.gait.swing_xy_rate_max * cfg.plant.dt
        step_vec = step_vec * jnp.minimum(
            1.0, cap / jnp.maximum(step_norm, 1e-9)
        )
        return jnp.where(is_this, ref + step_vec, feet_now[side, :2])

    swing_xy_ref = jnp.stack([swing_xy(0), swing_xy(1)])

    # Swing trajectory for each foot (only the swinging one is weighted in).
    def swing_refs(side):
        is_this = jnp.where(swing_is_left, side == 0, side == 1)
        p_start = swing_start[side]
        p_end = state.landing
        sp = sw.SwingParams(
            p_start=p_start,
            p_end=p_end,
            z_apex=jnp.asarray(cfg.max_swing_height, dtype),
        )
        pos, vel, acc = sw.evaluate(sp, progress, params.gait.swing_duration)
        # xy position from the receding (rate-limited) reference; z keeps the
        # closed-form sextic profile.
        pos = pos.at[:2].set(swing_xy_ref[side])
        # Mirror the reference: xy velocity feedforward zeroed
        # (ros_run_simulation.py:256-257).
        vel = vel.at[0:2].set(0.0)
        acc = acc.at[0:2].set(0.0)
        hold = feet_now[side]
        return (
            jnp.where(is_this & (in_swing > 0), pos, hold),
            jnp.where(is_this & (in_swing > 0), vel, jnp.zeros(3, dtype)),
            jnp.where(is_this & (in_swing > 0), acc, jnp.zeros(3, dtype)),
        )

    sw0 = swing_refs(0)
    sw1 = swing_refs(1)

    # Base/CoM references from the latest MPC solution (wbid.py:243-294),
    # interpolated within the period (see docstring).
    x1 = (1.0 - alpha) * state.x_opt0 + alpha * state.x_opt1
    base_R_ref = rot.rpy_to_matrix(x1[0:3])
    # Plan-consistent angular feedforward. The reference feeds the base task
    # I^-1 sum(r x omega) (wbid.py:269-282) — dimensionally an acceleration
    # but physically unrelated to the plan's torque balance (it is ~0 at
    # walking speeds). The MPC's own prediction carries the consistent
    # angular acceleration: the lateral GRF it plans *requires* the torso
    # roll-rate change (omega1 - omega0)/dt. Feeding that (and the matching
    # momentum reference below) instead was measured (round 2, frozen
    # double-support probe) to raise delivered lateral force from ~50% to
    # ~90% of the plan — the reference's few-step limit is partly this
    # inconsistency.
    base_angacc = (state.x_opt1[6:9] - state.x_opt0[6:9]) / cfg.mpc.dt
    gvec = jnp.array([0.0, 0.0, srbd.GRAVITY], dtype)
    com_acc = jnp.sum(state.u0.reshape(4, 3), axis=0) / params.srbd.mass + gvec
    # Momentum reference for the angular-momentum task: the SRBD plan's
    # I w (zero would damp the planned roll away — see stack.py).
    angmom_L = params.srbd.inertia @ x1[6:9]
    angmom_Ldot = params.srbd.inertia @ base_angacc

    # Hand carry-hold references (cfg.hand_task): standing base-relative
    # offsets, yaw-following. The standing FK is of a constant configuration
    # and constant-folds at compile time.
    hand_pos = None
    if cfg.hand_task and idx.hands:
        q_stand = q_init_standing(model, dtype)
        Xs = rb.fk(model, q_stand)
        offs = jnp.stack([
            Xs.R[0].T @ (rb.frame_pose(model, Xs, f).p - Xs.p[0])
            for f in idx.hands
        ])  # (2, 3) base-frame offsets
        yaw_now = rot.quat_to_rpy(state.q[3:7])[2]
        yawR = rot.yaw_matrix(yaw_now)
        hand_pos = state.q[0:3][None, :] + offs @ yawR.T

    posture_legs_scale = None
    if cfg.settle_knee_guard:
        half_g2 = (
            params.gait.swing_duration + params.gait.double_support_duration
        )
        t_end_g2 = params.gait.start_time + params.gait.n_steps * half_g2
        posture_legs_scale = jnp.clip(
            (state.gait_clock - t_end_g2) / 0.3, 0.0, 1.0
        ) * (params.gait.n_steps > 0.5)

    refs = WBIDReferences(
        com_pos=x1[3:6],
        com_vel=x1[9:12],
        com_acc=com_acc,
        base_R=base_R_ref,
        base_angvel=x1[6:9],
        base_angacc=base_angacc,
        posture_q=q_init_standing(model, dtype)[7:],
        contact_pos=contact_hold,
        contact_R=contact_hold_R,
        swing_pos=jnp.stack([sw0[0], sw1[0]]),
        swing_vel=jnp.stack([sw0[1], sw1[1]]),
        swing_acc=jnp.stack([sw0[2], sw1[2]]),
        swing_R=contact_hold_R,
        f_des=state.u0.reshape(4, 3),
        contact_active=contact_active,
        angmom_L=angmom_L,
        angmom_Ldot=angmom_Ldot,
        torso_R=base_R_ref if cfg.torso_task else None,
        hand_pos=hand_pos,
        posture_legs_scale=posture_legs_scale,
    )

    if cfg.telemetry:
        clock = _StageClock()
        q_in = state.q + clock.start(dtype) * 0.0
    else:
        q_in = state.q
    sol = wbid.solve(
        model, idx, cfg.wbid, params.wbid_gains, q_in, state.v, refs,
        body_X=body_X,
    )
    wbid_ms = (
        clock.stop(sol.pri_res, dtype)
        if cfg.telemetry else jnp.zeros((), dtype)
    )

    # Whole-body plant: constrained forward dynamics driven by the WBID
    # torques, with the active contact points pinned (the MuJoCo stand-in —
    # ros_run_simulation.py:417-419 applies tau[6:] and calls mj_step).
    q_new, v_new, plant_forces = plant_mod.constrained_step(
        model, idx, cfg.plant, state.q, state.v, sol.tau,
        state.contact_now, anchors, body_X=body_X,
    )

    # Weight-transfer gate: in the tail of double support, pause the gait
    # clock until the CoM is over (and settling above) the upcoming stance
    # foot. Without this, swings start with residual lateral velocity and the
    # LIPM fall compounds step over step (the round's main walking failure).
    com_now = rb.com_position(model, body_X)
    com_vel_now = rb.com_velocity(model, state.q, state.v, body_X)
    vy_now = com_vel_now[1]
    half = params.gait.swing_duration + params.gait.double_support_duration
    tau_g = state.gait_clock - params.gait.start_time
    step_f = jnp.floor(tau_g / half)
    in_gait = (tau_g >= 0.0) & (step_f < params.gait.n_steps)
    t_in_step = tau_g - step_f * half
    ds = params.gait.double_support_duration
    # The xi-gate / DS-slow-down block below is compiled OUT of the
    # production tick (cfg.gait_gate=False, the default): both are measured
    # dead ends under MuJoCo (TODO.md) kept as internal-plant capabilities.
    omega0_g = jnp.sqrt(jnp.asarray(-srbd.GRAVITY, dtype) / cfg.com_height)
    W_g = params.steps.step_width
    # Centerline implied by the upcoming stance foot (feet-relative
    # anchoring, matching gait/planner.py).
    next_swing_left = jnp.mod(jnp.maximum(step_f, 0.0), 2.0) < 0.5
    y_stance_g = jnp.where(next_swing_left, feet_now[1, 1], feet_now[0, 1])
    y_line_g = y_stance_g + jnp.where(next_swing_left, W_g, -W_g)
    xi_rel_g = (
        com_now[1] - y_line_g + (vy_now - params.v_cmd[1]) / omega0_g
    )
    # Vertical crouch guard (always armed): never start a swing while the
    # CoM is sagging — give the MPC double-support time to stand back up
    # instead of stepping into a knee-saturating crouch.
    in_ds_end = in_gait & (t_in_step < ds) & (t_in_step > 0.8 * ds)
    z_ok = (com_now[2] > cfg.com_height - params.gait.gate_z_tol) & (
        com_vel_now[2] > -params.gait.gate_vz_tol
    )
    # Step-TIMING adaptation (gait.timing_gain > 0): during the swing, once
    # the lateral DCM predicted at the nominal touchdown (through the step's
    # remaining ZMP profile) deviates from the periodic orbit by more than
    # timing_tol, run the gait clock FASTER. Touchdown then happens early:
    # LIPM error grows as e^{omega0 t}, so every shaved Dt caps the error the
    # capture step must absorb. Placement (DCM-scaled footholds, authority
    # bounded by clip_landing_y) and timing are the two complementary
    # capturability levers — the round-2 MuJoCo frontier failure was exactly
    # a fixed-timing swing watching the error outgrow placement authority.
    in_ss_t = in_gait & (t_in_step >= ds)
    # The centerline-relative DCM: swing_left_t == next_swing_left (each
    # step is [DS][swing], so the "upcoming" swing of the DS gate is this
    # step's own swing) and the gate block's xi_rel_g is relative to the
    # same stance centerline.
    speedup = gs.timing_clock_rate(
        params.gait, omega0_g, W_g, xi_rel_g, t_in_step,
        next_swing_left,
    )
    # FEASIBILITY cap: never run the clock faster than the rate-limited
    # swing foot can still reach the landing. At clock rate r the remaining
    # swing lasts (gait-time remaining)/r of wall time, in which the foot
    # covers at most swing_xy_rate_max * that — so r <= rate_max * rem /
    # d_xy. Without this, a large DCM error sped a 0.25 s swing through in
    # ~110 ms of wall time, the foot landed ~half way to the planned
    # foothold, and the "capture" step captured nothing (round-3 step-13
    # trace: the direct cause of the 20-step run's fall).
    swing_side_i = jnp.where(next_swing_left, 0, 1)
    d_xy = jnp.linalg.norm(
        state.landing[:2] - state.swing_xy_ref[swing_side_i]
    )
    t_rem_sw = jnp.maximum(half - t_in_step, 1e-3)
    r_feas = params.gait.swing_xy_rate_max * t_rem_sw / jnp.maximum(
        d_xy, 1e-6
    )
    speedup = jnp.minimum(speedup, jnp.maximum(r_feas, 1.0))
    clock_rate = jnp.where(in_ss_t, speedup, 1.0)
    if cfg.gait_gate:
        # Weight-transfer gate against the PREDICTED swing-onset DCM:
        # propagate the measured lateral DCM xi = y + vy/omega0 through the
        # REMAINDER of this step's double-support ZMP ramp
        # (gs.predict_ds_end_dcm) and compare to the periodic orbit's
        # swing-onset DCM. A transfer that is merely in progress predicts
        # on-target and is NEVER held — gating on the instantaneous DCM
        # instead brakes the orbit's natural crossing mid double support
        # (measured round 3: the hold reference demands the CoM stop at the
        # DS-end DCM point while it still carries ~0.26 m/s of crossing
        # velocity; the required lateral braking exceeds what line feet
        # deliver and the robot rolls over during the hold). The criterion
        # is the DCM ALONE: during a hold the planner's hold-at-target
        # reference (gait/planner.py) station-keeps the CoM at the orbit's
        # DCM position, which the remaining ramp then carries exactly onto
        # the swing-onset target — so the predictive criterion is
        # achievable and the gate cannot deadlock (round-2 failure mode).
        in_ds_tail = in_gait & (t_in_step < ds) & (
            t_in_step > (1.0 - params.gait.gate_window) * ds
        )
        xi_pred_g = gs.predict_ds_end_dcm(
            params.gait, omega0_g, W_g, xi_rel_g, t_in_step, next_swing_left
        )
        xi_target = params.gait.sway_gain * gs.swing_onset_dcm_nominal(
            params.gait, omega0_g, W_g, next_swing_left
        )
        # One-sided release: the transfer moves xi TOWARD the upcoming
        # stance side (right for a left swing); having moved past the
        # target is fine — overshoot is on the stance side where foot
        # placement absorbs it. A two-sided band re-holds on overshoot,
        # exactly when the swing should start.
        gate_err = jnp.where(
            next_swing_left, xi_pred_g - xi_target, xi_target - xi_pred_g
        )
        gate_ok = gate_err < params.gait.gate_xi_tol
        # DS slow-down (gait.ds_slow_gain > 0): a lagging transfer gets a
        # SLOWER clock through the DS tail — never frozen (the freeze gate
        # is a measured dead end under MuJoCo, see
        # gs.GaitConfig.ds_slow_gain).
        ds_rate = jnp.clip(
            1.0
            - params.gait.ds_slow_gain
            * jnp.maximum(gate_err - params.gait.gate_xi_tol, 0.0),
            jnp.maximum(params.gait.ds_rate_min, 1e-2),
            1.0,
        )
        slow_mode = params.gait.ds_slow_gain > 0.0
        ds_tail_rate = jnp.where(
            slow_mode,
            ds_rate,
            jnp.where(in_ds_tail & ~gate_ok, 0.0, 1.0),
        )
        clock_rate = jnp.where(in_ds_tail, ds_tail_rate, clock_rate)
    clock_rate = jnp.where(in_ds_end & ~z_ok, 0.0, clock_rate)
    # gate_hold marks only FULL freezes: the planner's station-keeping hold
    # semantics (absolute anchor, zeroed v_cmd, DCM-position reference)
    # apply to a frozen clock, not a slowed one — a slowed clock keeps the
    # normal receding references.
    gate_hold = jnp.where(clock_rate < 1e-6, 1.0, 0.0)

    log = TickLog(
        com=com_now,
        tau=sol.tau,
        forces=sol.forces,
        contact=state.contact_now,
        plan_x1=state.x_opt1,
        plan_u0=state.u0,
        landing=state.landing,
        mpc_pri_res=jnp.zeros((), dtype),
        wbid_pri_res=sol.pri_res,
        mpc_ms=jnp.zeros((), dtype),
        wbid_ms=wbid_ms,
        q=q_new if cfg.log_q else jnp.zeros((0,), dtype),
    )
    new_state = state._replace(
        q=q_new,
        v=v_new,
        t=state.t + cfg.plant.dt,
        swing_start=swing_start,
        contact_hold=contact_hold,
        contact_hold_R=contact_hold_R,
        prev_stance=contact_active.astype(dtype),
        anchors=anchors,
        gait_clock=state.gait_clock + clock_rate * cfg.plant.dt,
        swing_xy_ref=swing_xy_ref,
        gate_hold=jnp.asarray(gate_hold, dtype),
    )
    return new_state, log


def make_rollout(model: RobotModel, cfg: EngineConfig):
    """Build the jittable closed-loop rollout: n_mpc_periods of
    [MPC solve; ticks_per_mpc x WBID tick]."""
    idx = StackIndices.from_model(model)

    if cfg.mpc_delay not in (0, 1):
        raise ValueError("mpc_delay must be 0 (synchronous) or 1 (stale)")

    def period(state: EngineState, params: ScenarioParams):
        prev = state
        state, mpc_sol, mpc_ms = _mpc_stage(model, idx, cfg, params, state)
        if cfg.mpc_delay == 1:
            # Stale-solution cadence (the reference's real operating
            # regime, ros_run_simulation.py:188-218): the fresh solve only
            # becomes visible NEXT period; this period's ticks run on the
            # previous period's solution from the staleness buffer. The
            # first period has no previous solution — it applies its own
            # solve, like the reference sim idling until the MPC node's
            # first /mpc_solution arrives.
            first = prev.t < 0.5 * cfg.plant.dt
            pick = lambda fresh, pend: jnp.where(first, fresh, pend)
            state = state._replace(
                u0=pick(state.u0, prev.u0_pend),
                x_opt0=pick(state.x_opt0, prev.x_opt0_pend),
                x_opt1=pick(state.x_opt1, prev.x_opt1_pend),
                contact_now=pick(state.contact_now, prev.contact_pend),
                landing=pick(state.landing, prev.landing_pend),
                u0_pend=state.u0,
                x_opt0_pend=state.x_opt0,
                x_opt1_pend=state.x_opt1,
                contact_pend=state.contact_now,
                landing_pend=state.landing,
            )

        def tick(s, i):
            # Phase within the MPC's PREDICTION interval (mpc.dt), not the
            # replan period: with ticks_per_mpc * plant.dt < mpc.dt (faster
            # replanning than the discretization — e.g. the 50 Hz MuJoCo
            # cadence) the x_opt0 -> x_opt1 interpolation must still span
            # the full prediction step.
            alpha = jnp.minimum(
                (i + 1.0) * cfg.plant.dt / cfg.mpc.dt, 1.0
            )
            return _wbid_tick(model, idx, cfg, params, s, alpha)

        state, logs = jax.lax.scan(
            tick, state,
            jnp.arange(cfg.ticks_per_mpc, dtype=state.q.dtype),
        )
        logs = logs._replace(
            mpc_pri_res=jnp.broadcast_to(mpc_sol.pri_res, logs.mpc_pri_res.shape),
            mpc_ms=jnp.broadcast_to(mpc_ms, logs.mpc_ms.shape),
        )
        return state, logs

    def rollout(state: EngineState, params: ScenarioParams, n_periods: int):
        def body(s, _):
            return period(s, params)

        return jax.lax.scan(body, state, None, length=n_periods)

    return rollout
