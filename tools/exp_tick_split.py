#!/usr/bin/env python3
"""Serving-tick latency decomposition (round 5).

The serial engine tick (serving config, B=1) is p50 ~1.7 ms against the
reference's 1 kHz budget; the QP loops are already fused (round 4), so the
floor is believed to be the FK/RNEA + task-stack assembly chain. This tool
measures that claim stage-by-stage on the real chip with slope timing
(each stage chained k times with a data dependence; latency = slope
between k=1 and k=5 runs).

Stages: fk | build_qp (FK+Jacobians+drifts+assembly) | qp_solve (WBID QP,
serving config) | rnea | wbid_total (build+solve+rnea) | plant.

Usage: PYTHONPATH=/root/repo python tools/exp_tick_split.py [M]
Prints one JSON line per stage.
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
from g1_locomotion_tpu.models import dynamics as dyn
from g1_locomotion_tpu.models import robot as rb
from g1_locomotion_tpu.models.robot import load_robot
from g1_locomotion_tpu.ops import qp as qplib
from g1_locomotion_tpu.wbid import solver as wbid
from g1_locomotion_tpu.wbid import stack as stk
from g1_locomotion_tpu.wbid.tasks import WBIDReferences, default_gains


def slope_time(make_chain, M=8, k1=2, k2=12):
    """Median on-device latency via the two-length slope."""
    f1, f2 = make_chain(k1), make_chain(k2)
    jax.block_until_ready(f1())
    jax.block_until_ready(f2())
    t1s, t2s = [], []
    for _ in range(M):
        t0 = time.perf_counter()
        jax.block_until_ready(f1())
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(f2())
        t2s.append(time.perf_counter() - t0)
    per = (np.asarray(t2s) - np.asarray(t1s)) / (k2 - k1)
    med = float(np.median(per)) * 1e3
    iqr = float(np.percentile(per, 75) - np.percentile(per, 25)) * 1e3
    return med, iqr


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = jnp.float32
    model = load_robot("g1_23dof", dtype=dtype)
    idx = stk.StackIndices.from_model(model)
    gains = default_gains(dtype)
    cfg = eng.EngineConfig()
    serving_qp = cfg.wbid.qp._replace(polish_kernel=True)
    wcfg = cfg.wbid._replace(qp=serving_qp)

    state = eng.init_state(model, cfg, dtype)
    q, v = state.q, state.v
    X = rb.fk(model, q)
    com = rb.com_position(model, X)
    nj = model.nv - 6
    feet_R = jnp.tile(jnp.eye(3, dtype=dtype)[None], (2, 1, 1))
    foot_pos = jnp.stack([X.p[idx.feet[0]], X.p[idx.feet[1]]])
    refs = WBIDReferences(
        com_pos=com, com_vel=jnp.zeros(3, dtype),
        com_acc=jnp.zeros(3, dtype),
        base_R=jnp.eye(3, dtype=dtype), base_angvel=jnp.zeros(3, dtype),
        base_angacc=jnp.zeros(3, dtype),
        posture_q=q[7:], contact_pos=foot_pos, contact_R=feet_R,
        swing_pos=foot_pos, swing_vel=jnp.zeros((2, 3), dtype),
        swing_acc=jnp.zeros((2, 3), dtype), swing_R=feet_R,
        f_des=jnp.zeros((4, 3), dtype).at[:, 2].set(83.7),
        contact_active=jnp.ones(2, dtype),
        angmom_L=jnp.zeros(3, dtype), angmom_Ldot=jnp.zeros(3, dtype),
    )

    eps = jnp.asarray(1e-12, dtype)

    # --- fk ---------------------------------------------------------------
    def chain_fk(k):
        @jax.jit
        def f():
            def body(i, qq):
                Xi = rb.fk(model, qq)
                return qq + eps * (jnp.sum(Xi.p) + jnp.sum(Xi.R))
            return jax.lax.fori_loop(0, k, body, q)
        return f

    # --- build_qp ---------------------------------------------------------
    def chain_build(k):
        @jax.jit
        def f():
            def body(i, qq):
                H, g, C, l, u, _ = stk.build_qp(
                    model, idx, gains, qq, v, refs, wcfg.dt
                )
                return qq + eps * (jnp.sum(H) + jnp.sum(g) + jnp.sum(C)
                                   + jnp.sum(l) + jnp.sum(u))
            return jax.lax.fori_loop(0, k, body, q)
        return f

    # --- qp solve on frozen blocks ---------------------------------------
    H, g, C, l, u, _ = jax.jit(
        lambda: stk.build_qp(model, idx, gains, q, v, refs, wcfg.dt)
    )()

    def chain_qp(qp_cfg):
        def mk(k):
            @jax.jit
            def f():
                def body(i, gg):
                    sol = qplib.solve_qp(H, gg, C, l, u, cfg=qp_cfg)
                    return gg + eps * (jnp.sum(sol.x) + jnp.sum(sol.y))
                return jax.lax.fori_loop(0, k, body, g)
            return f
        return mk

    # --- rnea -------------------------------------------------------------
    def chain_rnea(k):
        @jax.jit
        def f():
            def body(i, qq):
                tau = dyn.rnea(model, qq, v, v * 0.0)
                return qq + eps * jnp.sum(tau)
            return jax.lax.fori_loop(0, k, body, q)
        return f

    # --- wbid total -------------------------------------------------------
    def chain_wbid(k):
        @jax.jit
        def f():
            def body(i, qq):
                sol = wbid.solve(model, idx, wcfg, gains, qq, v, refs)
                return qq + eps * (jnp.sum(sol.tau) + jnp.sum(sol.qddot)
                                   + sol.pri_res)
            return jax.lax.fori_loop(0, k, body, q)
        return f

    # --- wbid total, fast_stack (round-5 op-lean assembly) ----------------
    wcfg_fast = wcfg._replace(fast_stack=True)

    def chain_wbid_fast(k):
        @jax.jit
        def f():
            def body(i, qq):
                sol = wbid.solve(model, idx, wcfg_fast, gains, qq, v, refs)
                return qq + eps * (jnp.sum(sol.tau) + jnp.sum(sol.qddot)
                                   + sol.pri_res)
            return jax.lax.fori_loop(0, k, body, q)
        return f

    # --- full engine tick (_wbid_tick: refs/gait + wbid + plant) ----------
    from functools import partial
    scen = eng.default_scenario(dtype)
    tick_fn = partial(eng._wbid_tick, model, idx, cfg._replace(
        wbid=wcfg,
        mpc=cfg.mpc._replace(qp=cfg.mpc.qp._replace(polish_kernel=True)),
    ), scen)
    tick_fn_fast = partial(eng._wbid_tick, model, idx, cfg._replace(
        wbid=wcfg_fast,
        mpc=cfg.mpc._replace(qp=cfg.mpc.qp._replace(polish_kernel=True)),
    ), scen)

    def mk_chain_tick(fn):
        def chain_tick(k):
            @jax.jit
            def f():
                def body(i, s):
                    s2, _ = fn(s, jnp.asarray(1.0, dtype))
                    return s2
                return jax.lax.fori_loop(0, k, body, state)
            return f
        return chain_tick
    chain_tick = mk_chain_tick(tick_fn)
    chain_tick_fast = mk_chain_tick(tick_fn_fast)

    rows = []
    for name, mk in (
        ("fk", chain_fk),
        ("rnea", chain_rnea),
        ("build_qp", chain_build),
        ("qp_serving", chain_qp(serving_qp)),
        ("qp_xla", chain_qp(cfg.wbid.qp)),
        ("wbid_total", chain_wbid),
        ("wbid_fast", chain_wbid_fast),
        ("tick_total", chain_tick),
        ("tick_fast", chain_tick_fast),
    ):
        ms, iqr = slope_time(mk, M=M)
        rows.append({"stage": name, "ms": round(ms, 4), "iqr": round(iqr, 4)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"summary": rows}), flush=True)


if __name__ == "__main__":
    main()
