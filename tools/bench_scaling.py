#!/usr/bin/env python3
"""Multi-device scaling efficiency on the virtual 8-device CPU mesh.

BASELINE target: >=80% multi-host scaling efficiency. Real multi-host TPU
hardware is not available in this environment, so this measures the honest
single-host proxy: the SAME global batch of MPC solves run (a) on a 1-device
mesh and (b) sharded over an 8-device mesh with a psum'd statistics
reduction (the only collective the design ever uses — the per-tick cascade
is collective-free by construction, parallel/mesh.py). Because all 8 virtual
devices share this host's cores, per-device *speedup* is meaningless here;
what the proxy isolates is the overhead sharding adds (partitioning,
collective, runtime dispatch):

    efficiency = t_1device(B) / t_8devices(B sharded)

which upper-bounds nothing but measures exactly the term that would erode
multi-host efficiency at fixed per-device work. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from g1_locomotion_tpu.models import srbd
from g1_locomotion_tpu.mpc import solver as mpc
from g1_locomotion_tpu.parallel import mesh as pmesh


def make_inputs(B, dtype=jnp.float32, N=10):
    com = jnp.array([0.0527, 0.0, 0.598], dtype)
    feet = jnp.array(
        [[-0.05, 0.12, 0.0], [0.12, 0.12, 0.0], [-0.05, -0.12, 0.0], [0.12, -0.12, 0.0]],
        dtype,
    )
    x0 = jnp.zeros(13, dtype).at[3:6].set(com).at[12].set(srbd.GRAVITY)
    key = jax.random.PRNGKey(0)
    pattern = jax.random.randint(key, (B,), 0, 3)
    stand = jnp.ones((N, 4), dtype)
    left_up = stand.at[:, 0].set(0.0).at[:, 1].set(0.0)
    right_up = stand.at[:, 2].set(0.0).at[:, 3].set(0.0)
    contact = jnp.stack([stand, left_up, right_up])[pattern]
    x0s = jnp.tile(x0[None], (B, 1))
    x0s = x0s.at[:, 4].add(
        jax.random.uniform(key, (B,), dtype, minval=-0.03, maxval=0.03)
    )
    x_ref = jnp.tile(x0[None], (N, 1))
    c_hor = jnp.tile(feet[None], (N, 1, 1))
    p_hor = jnp.tile(com[None], (N, 1))
    return x0s, contact, x_ref, c_hor, p_hor


def time_mesh(devices, B, reps=3):
    dtype = jnp.float32
    cfg = mpc.MPCConfig(horizon=10)
    weights = mpc.default_weights(dtype)
    params = srbd.default_params(dtype)
    x0s, contact, x_ref, c_hor, p_hor = make_inputs(B, dtype)
    mesh = pmesh.scenario_mesh(devices)

    def per_scenario(x0, c):
        sol = mpc.solve(cfg, weights, params, x0, x_ref, c, c_hor, p_hor)
        return sol.u0

    def reduce_fn(u0):
        return jnp.sum(u0[:, 2::3])  # psum'd support-force statistic

    f = pmesh.sharded_vmap(mesh, per_scenario, reduce_fn=reduce_fn)
    x0s = pmesh.shard_batch(mesh, x0s)
    contact = pmesh.shard_batch(mesh, contact)
    jax.block_until_ready(f(x0s, contact))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x0s, contact))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    devs = jax.devices()
    assert len(devs) >= 8, devs
    t1 = time_mesh(devs[:1], B)
    t8 = time_mesh(devs, B)
    eff = t1 / t8
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8dev_proxy",
                "value": round(eff, 4),
                "unit": "t_1dev / t_8dev at same global batch",
                "batch": B,
                "t_1dev_s": round(t1, 4),
                "t_8dev_s": round(t8, 4),
                "vs_baseline": round(eff / 0.8, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
