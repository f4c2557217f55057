#!/usr/bin/env python3
"""Tick-latency distribution from real closed-loop rollouts (BASELINE: p99
solve latency < 2 ms tick budget).

Measures the on-device latency of one full control period (1 MPC solve at
N=10 + 40 WBID ticks + plant steps) by timing M independent invocations of a
jitted k-period chain. Host/tunnel dispatch is removed per-sample via the
two-length slope intercept (the same technique bench.py uses for the mean):

    t(k) = dispatch + k * period_time

With k1/k2 chains timed M times each, per-sample period estimates are
(t_k2[i] - t_k1[i]) / (k2 - k1); the distribution over i gives p50/p99.
Per-tick latency = period / 40. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import g1_locomotion_tpu  # noqa: F401
from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.models.robot import load_robot


def main():
    nums = [a for a in sys.argv[1:] if a.isdigit()]
    M = int(nums[0]) if nums else 50
    model = load_robot("g1_23dof", dtype=jnp.float32)
    cfg = eng.EngineConfig()
    if "serving" in sys.argv[1:]:
        # Single-robot serving path: every B=1 QP inverse through the fused
        # Pallas Gauss-Jordan kernels (QPConfig.polish_kernel — the lever
        # that took the bare MPC solve 2.4 -> 0.25 ms, docs/BENCHMARKS.md).
        # Round 5 adds fast_stack: the op-count-lean task-stack assembly
        # (the tick's measured floor was build_qp, not the QPs —
        # tools/exp_tick_split.py: 1.38 of 1.59 ms).
        cfg = cfg._replace(
            mpc=cfg.mpc._replace(
                qp=cfg.mpc.qp._replace(polish_kernel=True)
            ),
            wbid=cfg.wbid._replace(
                qp=cfg.wbid.qp._replace(polish_kernel=True),
                fast_stack=True,
            ),
        )
    params = eng.default_scenario(jnp.float32)
    state0 = eng.init_state(model, cfg, jnp.float32)
    rollout = eng.make_rollout(model, cfg)

    def chain(k):
        @jax.jit
        def f(s):
            final, _ = rollout(s, params, k)
            return final

        return f

    k1, k2 = 1, 3
    f1, f2 = chain(k1), chain(k2)
    jax.block_until_ready(f1(state0))
    jax.block_until_ready(f2(state0))

    t1s, t2s = [], []
    for _ in range(M):
        t0 = time.perf_counter()
        jax.block_until_ready(f1(state0))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(f2(state0))
        t2s.append(time.perf_counter() - t0)
    per_period = (np.asarray(t2s) - np.asarray(t1s)) / (k2 - k1)
    per_tick_ms = per_period / cfg.ticks_per_mpc * 1e3
    out = {
        "metric": "engine_tick_latency_ms",
        "p50": round(float(np.percentile(per_tick_ms, 50)), 4),
        "p99": round(float(np.percentile(per_tick_ms, 99)), 4),
        "mean": round(float(per_tick_ms.mean()), 4),
        "unit": "ms/tick (1 kHz budget = 1 ms; MPC share amortized over 40)",
        "mpc_period_ms_p99": round(float(np.percentile(per_period, 99)) * 1e3, 3),
        "samples": M,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
