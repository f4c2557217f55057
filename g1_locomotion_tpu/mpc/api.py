"""Reference-compatible MPC class: the ``srbd_mpc.mpc.MPC`` Python API.

Drop-in surface for code written against the reference submodule
(run_simulation.py:19,169-170,73-106; contract in SURVEY.md §2.3):

    MPC = mpc.MPC(dt=0.04)
    MPC.init_matrices()
    MPC.x0[...] = ...; MPC.x_ref_hor[...] = ...
    u_opt0, x_opt = MPC.update(contact_horizon, c_horizon, p_com_horizon,
                               x_current=MPC.x0, one_rollout=True)

Internally everything routes through the functional jitted core
(:mod:`g1_locomotion_tpu.mpc.solver`); this class is a thin stateful host-side
adapter (mutable numpy attributes, matching the reference's imperative style).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from g1_locomotion_tpu.models import srbd
from g1_locomotion_tpu.mpc import solver


class MPC:
    HORIZON_LENGTH = 10  # N (BASELINE.json)

    def __init__(self, dt: float = 0.04, horizon: int = None, dtype=jnp.float32):
        if horizon is not None:
            self.HORIZON_LENGTH = horizon
        self.dt = dt
        self.g = srbd.GRAVITY
        self.x0 = np.zeros((13, 1))
        self.x0[12] = self.g
        self.x_ref_hor = np.zeros((self.HORIZON_LENGTH, 13))
        self.x_ref_hor[:, 12] = self.g
        self._dtype = dtype
        self._cfg = solver.MPCConfig(horizon=self.HORIZON_LENGTH, dt=dt)
        self._weights = solver.default_weights(dtype)
        self._params = srbd.default_params(dtype)
        self._solve = None
        self._U_warm = None

    def init_matrices(self) -> None:
        """Precompile the jitted solve (the reference preallocates matrices)."""
        cfg, weights, params = self._cfg, self._weights, self._params

        @jax.jit
        def run(x0, x_ref, contact, c_hor, p_hor, U_warm):
            return solver.solve(
                cfg, weights, params, x0, x_ref, contact, c_hor, p_hor,
                U_warm=U_warm,
            )

        self._solve = run
        self._U_warm = jnp.zeros((self.HORIZON_LENGTH, 12), self._dtype)

    def update(
        self,
        contact_horizon,
        c_horizon,
        p_com_horizon,
        x_current=None,
        one_rollout: bool = True,
    ):
        """One MPC solve; returns (u_opt0 (12,), x_opt ((N+1), 13))."""
        if not one_rollout:
            # The reference call sites always pass one_rollout=True
            # (run_simulation.py:106); the multi-rollout semantics of the
            # unreleased submodule are unknown, so refuse rather than
            # silently ignore the flag.
            raise NotImplementedError(
                "one_rollout=False is not supported: only the reference's "
                "single-rollout contract (run_simulation.py:106) is implemented"
            )
        if self._solve is None:
            self.init_matrices()
        dtype = self._dtype
        x0 = jnp.asarray(
            np.asarray(x_current if x_current is not None else self.x0).reshape(13),
            dtype,
        )
        x_ref = jnp.asarray(
            np.asarray(self.x_ref_hor)[: self.HORIZON_LENGTH], dtype
        )
        contact = jnp.asarray(np.asarray(contact_horizon, dtype=np.float64), dtype)
        c_hor = jnp.asarray(
            np.asarray(c_horizon, dtype=np.float64).reshape(
                self.HORIZON_LENGTH, 4, 3
            ),
            dtype,
        )
        p_hor = jnp.asarray(np.asarray(p_com_horizon)[:, :3], dtype)
        sol = self._solve(x0, x_ref, contact, c_hor, p_hor, self._U_warm)
        self._U_warm = sol.U
        return np.asarray(sol.u0), np.asarray(sol.x_horizon)
