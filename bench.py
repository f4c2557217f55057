#!/usr/bin/env python3
"""Benchmark: batched SRBD-MPC solves/s on one chip (BASELINE north star).

Prints ONE JSON line:
    {"metric": "srbd_mpc_solves_per_s_per_chip", "value": N, "unit": "solves/s",
     "vs_baseline": N / 10000}

The measured op is the full MPC update (SRBD linearization + ZOH + horizon
condensation + friction-cone stacking + ADMM solve + horizon rollout) at
N=10, vmapped over a batch of standing/walking scenarios — the workload the
reference does per tick on CPU in 2-7.6 ms (BASELINE.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from g1_locomotion_tpu.models import srbd
    from g1_locomotion_tpu.mpc import solver as mpc

    dtype = jnp.float32
    cfg = mpc.MPCConfig(horizon=10)
    weights = mpc.default_weights(dtype)
    params = srbd.default_params(dtype)

    N = cfg.horizon
    com = jnp.array([0.0527, 0.0, 0.598], dtype)
    feet = jnp.array(
        [[-0.05, 0.12, 0.0], [0.12, 0.12, 0.0], [-0.05, -0.12, 0.0], [0.12, -0.12, 0.0]],
        dtype,
    )
    x0 = jnp.zeros(13, dtype).at[3:6].set(com).at[12].set(srbd.GRAVITY)
    x_ref = jnp.tile(x0[None], (N, 1))
    c_hor = jnp.tile(feet[None], (N, 1, 1))
    p_hor = jnp.tile(com[None], (N, 1))

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    # Mixed contact patterns (standing + left/right swing) like a gait sweep.
    key = jax.random.PRNGKey(0)
    pattern = jax.random.randint(key, (B,), 0, 3)
    stand = jnp.ones((N, 4), dtype)
    left_up = stand.at[:, 0].set(0.0).at[:, 1].set(0.0)
    right_up = stand.at[:, 2].set(0.0).at[:, 3].set(0.0)
    contact = jnp.stack([stand, left_up, right_up])[pattern]  # (B, N, 4)

    x0s = jnp.tile(x0[None], (B, 1))
    x0s = x0s.at[:, 4].add(
        jax.random.uniform(key, (B,), dtype, minval=-0.03, maxval=0.03)
    )

    @jax.jit
    def run(x0s, contact):
        return jax.vmap(
            lambda x, c: mpc.solve(cfg, weights, params, x, x_ref, c, c_hor, p_hor)
        )(x0s, contact)

    # Warm up / compile.
    sols = jax.block_until_ready(run(x0s, contact))

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        sols = jax.block_until_ready(run(x0s, contact))
    t1 = time.perf_counter()

    per_batch = (t1 - t0) / reps
    solves_per_s = B / per_batch

    print(
        json.dumps(
            {
                "metric": "srbd_mpc_solves_per_s_per_chip",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 10000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
