#!/usr/bin/env python3
"""Batched FULL-CASCADE throughput + roofline fractions on one chip.

VERDICT round-3 items 5: the fused engine (MPC + WBID + constrained plant)
at domain-randomization batch sizes — the number that prices a config-3/5
sweep — plus an explicit roofline statement for both the fused engine and
the headline MPC-solve program.

Roofline method: XLA's own cost model (compiled.cost_analysis(): flops +
bytes accessed) over the measured slope time gives achieved FLOP/s and
HBM bytes/s; the reported fraction is the max of flops/peak_flops and
bytes/peak_bw — i.e. utilization of whichever resource binds. Peaks are the
TPU v5e datasheet values (197 TFLOP/s bf16 MXU, 819 GB/s HBM); f32 at
matmul_precision=highest runs the MXU in multi-pass mode, so the f32
effective peak is taken as bf16/6 (the 6-pass f32 emulation) — stated
explicitly in the output rather than hidden in the fraction.

Usage: python tools/bench_cascade.py [B] [n_periods]
Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import g1_locomotion_tpu  # noqa: F401  (sets matmul precision)
from g1_locomotion_tpu.engine import tick as eng
from g1_locomotion_tpu.models import srbd
from g1_locomotion_tpu.models.robot import load_robot
from g1_locomotion_tpu.mpc import solver as mpc

PEAK_BF16_FLOPS = 197e12  # TPU v5e MXU
PEAK_F32_FLOPS = PEAK_BF16_FLOPS / 6.0  # 6-pass f32 emulation at "highest"
PEAK_HBM_BPS = 819e9


def roofline(compiled, wall_s):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    nbytes = float(ca.get("bytes accessed", 0.0))
    f_frac = flops / wall_s / PEAK_F32_FLOPS
    b_frac = nbytes / wall_s / PEAK_HBM_BPS
    return {
        "flops_per_run": flops,
        "bytes_per_run": nbytes,
        "achieved_tflops": round(flops / wall_s / 1e12, 3),
        "achieved_gbps": round(nbytes / wall_s / 1e9, 1),
        "mxu_fraction_f32peak": round(f_frac, 4),
        "hbm_fraction": round(b_frac, 4),
        "roofline_fraction": round(max(f_frac, b_frac), 4),
        "bound": "mxu" if f_frac > b_frac else "hbm",
    }


def bench_engine(B, n_periods, fast_stack=False):
    dtype = jnp.float32
    model = load_robot("g1_23dof", dtype=dtype)
    cfg = eng.EngineConfig()
    if fast_stack:
        # Round-5 lever for the 40-tick inner-scan serialization bound: the
        # op-count-lean task-stack assembly (WBIDConfig.fast_stack) — same
        # QP blocks, ~5x fewer launches per tick (tools/exp_tick_split.py).
        cfg = cfg._replace(wbid=cfg.wbid._replace(fast_stack=True))
    params = eng.default_scenario(dtype)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), params
    )
    state0 = eng.init_state(model, cfg, dtype)
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), state0
    )
    rollout = eng.make_rollout(model, cfg)

    def run(states, reps):
        def body(i, carry):
            s = jax.tree_util.tree_map(lambda a, c=carry: a + 0.0 * c, states)
            final, _ = jax.vmap(lambda st, p: rollout(st, p, n_periods))(
                s, batch
            )
            return jnp.sum(final.q[:, 2]) * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    jitted = jax.jit(run, static_argnums=1)
    ts = {}
    compiled = None
    for reps in (1, 3):
        lowered = jitted.lower(states, reps)
        comp = lowered.compile()
        if reps == 1:
            compiled = comp
        _ = np.asarray(comp(states))  # warm
        t0 = time.perf_counter()
        _ = np.asarray(comp(states))
        ts[reps] = time.perf_counter() - t0
    per_rep = (ts[3] - ts[1]) / 2.0
    ticks = B * cfg.ticks_per_mpc * n_periods
    out = {
        "metric": "fused_cascade_ticks_per_s_per_chip",
        "B": B,
        "n_periods": n_periods,
        "value": round(ticks / per_rep, 1),
        "unit": "controlled ticks/s (MPC+WBID+plant)",
        "mpc_solves_per_s_in_cascade": round(B * n_periods / per_rep, 1),
    }
    out.update(roofline(compiled, per_rep))
    print(json.dumps(out), flush=True)


def bench_mpc_roofline(B):
    """Roofline for the headline bench.py program (same config/workload)."""
    dtype = jnp.float32
    from g1_locomotion_tpu.ops.qp import QPConfig

    cfg = mpc.MPCConfig(
        horizon=10,
        qp=QPConfig(iters=20, scaling_iters=0, rho=1.0, rho_segments=2,
                    polish_rounds=2, iter_precision="high"),
    )
    weights = mpc.default_weights(dtype)
    params = srbd.default_params(dtype)
    N = cfg.horizon
    com = jnp.array([0.0527, 0.0, 0.598], dtype)
    feet = jnp.array(
        [[-0.05, 0.12, 0.0], [0.12, 0.12, 0.0],
         [-0.05, -0.12, 0.0], [0.12, -0.12, 0.0]], dtype)
    x0 = jnp.zeros(13, dtype).at[3:6].set(com).at[12].set(srbd.GRAVITY)
    x_ref = jnp.tile(x0[None], (N, 1))
    c_hor = jnp.tile(feet[None], (N, 1, 1))
    p_hor = jnp.tile(com[None], (N, 1))
    key = jax.random.PRNGKey(0)
    pattern = jax.random.randint(key, (B,), 0, 3)
    stand = jnp.ones((N, 4), dtype)
    left_up = stand.at[:, 0].set(0.0).at[:, 1].set(0.0)
    right_up = stand.at[:, 2].set(0.0).at[:, 3].set(0.0)
    contact = jnp.stack([stand, left_up, right_up])[pattern]
    x0s = jnp.tile(x0[None], (B, 1))
    x0s = x0s.at[:, 4].add(
        jax.random.uniform(key, (B,), dtype, minval=-0.03, maxval=0.03))

    def rep(x0s, reps):
        def body(i, carry):
            xs = x0s + carry * 1e-20
            sols = jax.vmap(
                lambda x, c: mpc.solve(cfg, weights, params, x, x_ref, c,
                                       c_hor, p_hor)
            )(xs, contact)
            return jnp.sum(sols.u0[:, 2::3]) * 1e-24
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    jitted = jax.jit(rep, static_argnums=1)
    ts = {}
    compiled = None
    for reps in (1, 5):
        comp = jitted.lower(x0s, reps).compile()
        if reps == 1:
            compiled = comp
        _ = np.asarray(comp(x0s))
        t0 = time.perf_counter()
        _ = np.asarray(comp(x0s))
        ts[reps] = time.perf_counter() - t0
    per_batch = (ts[5] - ts[1]) / 4.0
    out = {
        "metric": "mpc_bench_roofline",
        "B": B,
        "solves_per_s": round(B / per_batch, 1),
    }
    out.update(roofline(compiled, per_batch))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    nums = [a for a in sys.argv[1:] if a.isdigit()]
    B = int(nums[0]) if nums else 2048
    n_periods = int(nums[1]) if len(nums) > 1 else 2
    if "engine-only" not in sys.argv[1:]:
        bench_mpc_roofline(4096)
        bench_engine(B, n_periods)
    bench_engine(B, n_periods, fast_stack=True)
    sys.stdout.flush()
    os._exit(0)
