"""MuJoCo closed-loop validation harness (host-side oracle).

Replicates the reference's architecture exactly — MuJoCo steps physics at
1 kHz while our MPC+WBID cascade computes torques
(ros_run_simulation.py:341-519) — but with the controller being the
TPU-native jitted cascade. Used by tests to validate the controller against
real contact physics rather than the internal constrained-dynamics plant.

Frame conversions follow ros_run_simulation.py:354-368:
MuJoCo qvel linear is world-frame, ours is base-local; angular is local in
both; qpos quaternion layout (w,x,y,z) matches our internal convention.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from g1_locomotion_tpu.core import rotations as rot
from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.engine.state import q_init_standing
from g1_locomotion_tpu.models import robot as rb
from g1_locomotion_tpu.models.mjcf import export_mjcf
from g1_locomotion_tpu.models.robot import RobotModel
from g1_locomotion_tpu.models.urdf import spec_from_dict
from g1_locomotion_tpu.wbid.stack import StackIndices


class MujocoLoop:
    """Closed loop: MuJoCo plant + jitted MPC/WBID controller."""

    def __init__(
        self,
        model: RobotModel,
        cfg: Optional[eng.EngineConfig] = None,
        params: Optional[eng.ScenarioParams] = None,
        variant: str = "g1_23dof",
        settle_ticks: int = 3000,
        settle_quiet: float = 0.03,
        view: bool = False,
    ):
        import mujoco

        self._mujoco = mujoco
        # Live interactive viewer during the run — the reference watches
        # MuJoCo's viewer + rviz live (ros_run_simulation.py:177,519); the
        # passive viewer is synced once per control tick in run(). Requires
        # a display; replay (utils/replay.py) stays the headless analogue.
        self._viewer = None
        self._view_requested = view
        self.model = model
        self.cfg = cfg or eng.EngineConfig()
        self.params = params or eng.default_scenario(jnp.float64)
        self.idx = StackIndices.from_model(model)

        asset = Path(rb.__file__).parent / "assets" / f"{variant}.json"
        spec = spec_from_dict(json.loads(asset.read_text()))
        self.mj_model = mujoco.MjModel.from_xml_string(
            export_mjcf(spec, with_floor=True)
        )
        self.mj_data = mujoco.MjData(self.mj_model)
        self.mj_data.qpos[:] = np.asarray(q_init_standing(model, jnp.float64))
        mujoco.mj_forward(self.mj_model, self.mj_data)

        # Let the robot settle onto the floor passively held at q_init by
        # strong joint PD before engaging the cascade (the reference's sim
        # starts slightly above ground too, config.py:6 comment). Settle
        # until QUIET (max|qvel| < settle_quiet), not a fixed count: handing
        # the cascade a still-moving robot (the old 300-tick cut-off left
        # ~0.1 m/s of backward CoM velocity) started it at the edge of the
        # heel's CoP authority and it toppled within ~1.5 s — with a quiet
        # hand-off the same controller stands indefinitely (round-2 probe).
        from g1_locomotion_tpu.utils import pd

        pd_gains = pd.default_gains(jnp.float64)
        tau_max = np.asarray(model.tau_max)
        q0 = self.mj_data.qpos[7:].copy()
        quiet_run = 0
        for k in range(settle_ticks):
            tau = np.asarray(pd.pd_torques(
                pd_gains, q0, self.mj_data.qpos[7:], self.mj_data.qvel[6:],
            ))
            self.mj_data.ctrl[:] = np.clip(tau, -tau_max, tau_max)
            mujoco.mj_step(self.mj_model, self.mj_data)
            # SUSTAINED quiet, not an instant: the settle bounces, and any
            # single turning point has qvel ~ 0 while the contact springs are
            # loaded — exiting there hands the cascade a rebounding robot.
            quiet_run = quiet_run + 1 if np.abs(self.mj_data.qvel).max() < settle_quiet else 0
            if k >= 500 and quiet_run >= 150:
                break

        self.state = eng.init_state(model, self.cfg, jnp.float64)
        self.state = self.state._replace(
            q=jnp.asarray(self.read_q()), v=jnp.asarray(self.read_v())
        )
        # Re-anchor references to the settled pose.
        from g1_locomotion_tpu.engine import plant as plant_mod

        X = rb.fk(model, self.state.q)
        feet = jnp.stack(
            [rb.frame_pose(model, X, f).p for f in self.idx.feet]
        )
        feet_R = jnp.stack(
            [rb.frame_pose(model, X, f).R for f in self.idx.feet]
        )
        self.state = self.state._replace(
            contact_hold=feet,
            contact_hold_R=feet_R,
            swing_start=feet,
            swing_xy_ref=feet[:, :2],
            anchors=plant_mod.anchors_from_state(model, self.idx, self.state.q),
        )

        self._mpc_jit = jax.jit(
            lambda s: eng._mpc_stage(model, self.idx, self.cfg, self.params, s)[0]
        )
        self._wbid_jit = jax.jit(
            lambda s, alpha: eng._wbid_tick(
                model, self.idx, self.cfg, self.params, s, alpha
            )
        )
        # pal_statistics analogue (/wbid_statistics, /mpc_statistics —
        # ros_run_simulation.py:488,509-511): wall-clock solve timers around
        # the jitted stages, p50/p99 exported via .stats.export().
        from g1_locomotion_tpu.utils.stats import StatisticsRegistry

        self.stats = StatisticsRegistry(topic="/mujoco_loop_statistics")
        if self._view_requested:
            import mujoco.viewer

            self._viewer = mujoco.viewer.launch_passive(
                self.mj_model, self.mj_data
            )
        # Global tick counter: the MPC cadence (every ticks_per_mpc) must be
        # phase-continuous across run() calls — a per-call counter made
        # chunked runs re-solve the MPC at every chunk boundary, silently
        # running a different (and non-reproducible) control cadence than a
        # single long run.
        self._tick = 0

    def read_q(self) -> np.ndarray:
        return self.mj_data.qpos.copy()

    def read_v(self) -> np.ndarray:
        qv = self.mj_data.qvel.copy()
        R = np.asarray(rot.quat_to_matrix(jnp.asarray(self.mj_data.qpos[3:7])))
        v = qv.copy()
        v[:3] = R.T @ qv[:3]  # world -> base-local linear velocity
        return v

    def foot_normal_forces(self) -> np.ndarray:
        """(2,) summed ground-contact normal force per foot (L, R) —
        MuJoCo's truth, the bridge's contact sensor."""
        mujoco = self._mujoco
        f = np.zeros(2)
        f6 = np.zeros(6)
        for ci in range(self.mj_data.ncon):
            c = self.mj_data.contact[ci]
            mujoco.mj_contactForce(self.mj_model, self.mj_data, ci, f6)
            bid = max(
                self.mj_model.geom_bodyid[c.geom1],
                self.mj_model.geom_bodyid[c.geom2],
            )
            name = (
                mujoco.mj_id2name(self.mj_model, mujoco.mjtObj.mjOBJ_BODY, bid)
                or ""
            )
            if "left" in name:
                f[0] += f6[0]
            elif "right" in name:
                f[1] += f6[0]
        return f

    def run(self, n_ticks: int, touchdown_sync: bool = False):
        """Run the cascade against MuJoCo for n_ticks ms. Returns log dict.

        touchdown_sync (experimental, default OFF): contact-sensed phase
        sync — at the end of a swing (progress > 0.98), hold the gait clock
        until the swing foot's measured ground reaction appears (capped at
        250 ms). Motivation: under real unilateral contacts the schedule's
        touchdown and the physical one drift apart, and switching stance
        tasks on an airborne foot injects step-timing error. Measured
        round 2: holding with FROZEN references destabilizes more than the
        timing error it removes (the validated 2-step walk falls with it
        on) — the same frozen-reference problem as the engine's DS gate.
        A correct version must hold against the touchdown-TARGET reference;
        kept as an option for that round-3 work.
        """
        from g1_locomotion_tpu.gait import schedule as gs

        mujoco = self._mujoco
        log = {"com": [], "tau": [], "fz": []}
        hold_budget = 0
        for _ in range(n_ticks):
            t = self._tick
            self._tick += 1
            # Sync measured state into the engine.
            self.state = self.state._replace(
                q=jnp.asarray(self.read_q()), v=jnp.asarray(self.read_v())
            )
            if t % self.cfg.ticks_per_mpc == 0:
                self.state = self.stats.timer("mpc_solve").time(
                    self._mpc_jit, self.state
                )
            # Phase within the MPC's PREDICTION interval (mpc.dt) — not the
            # replan period, which may be shorter (engine/tick.py tick()).
            alpha = jnp.asarray(
                min(
                    ((t % self.cfg.ticks_per_mpc) + 1.0)
                    * self.cfg.plant.dt / self.cfg.mpc.dt,
                    1.0,
                ),
                jnp.float64,
            )
            new_state, ticklog = self.stats.timer("wbid_solve").time(
                self._wbid_jit, self.state, alpha
            )
            tau = np.asarray(ticklog.tau)
            prev_clock = self.state.gait_clock
            # Carry controller state but keep the plant state from MuJoCo.
            self.state = new_state
            if touchdown_sync:
                _, in_swing, swing_is_left, progress = gs.phase_info(
                    self.params.gait, self.state.gait_clock
                )
                if float(in_swing) > 0 and float(progress) > 0.98:
                    foot = 0 if float(swing_is_left) > 0.5 else 1
                    if hold_budget == 0:
                        hold_budget = 250
                    if (
                        hold_budget > 1
                        and self.foot_normal_forces()[foot] < 10.0
                    ):
                        self.state = self.state._replace(gait_clock=prev_clock)
                        hold_budget -= 1
                else:
                    hold_budget = 0
            self.mj_data.ctrl[:] = np.clip(
                tau, -np.asarray(self.model.tau_max), np.asarray(self.model.tau_max)
            )
            mujoco.mj_step(self.mj_model, self.mj_data)
            if self._viewer is not None:
                if not self._viewer.is_running():
                    self._viewer = None  # window closed — keep simulating
                else:
                    self._viewer.sync()

            log["com"].append(np.asarray(ticklog.com))
            log["tau"].append(tau)
            log["fz"].append(np.asarray(ticklog.forces)[:, 2])
        return {k: np.stack(v) for k, v in log.items()}
