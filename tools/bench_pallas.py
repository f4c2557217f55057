"""On-chip micro-bench: Pallas vs XLA base case inside lin.spd_inverse.

Times the full recursive SPD inverse at the QP's KKT shape (B, n, n) with
the Pallas lane-batched base kernel forced ON and OFF (ops/lin.py dispatch),
plus the end-to-end MPC solve throughput both ways. Slope-method timing
(CLAUDE.md: block_until_ready under-measures through the axon tunnel).

Usage: python tools/bench_pallas.py [B] [n]
Prints one JSON line per configuration.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from g1_locomotion_tpu.ops import lin


def slope_time(fn, *args):
    """Seconds per call via the 5-vs-1 reps slope with host readback."""

    @jax.jit
    def rep(a0, reps):
        def body(i, carry):
            out = fn(a0 + carry * 1e-30, *args[1:])
            return jnp.sum(out) * 1e-24
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    ts = {}
    for reps in (1, 5):
        _ = np.asarray(rep(args[0], reps))  # compile/warm
        t0 = time.perf_counter()
        _ = np.asarray(rep(args[0], reps))
        ts[reps] = time.perf_counter() - t0
    return (ts[5] - ts[1]) / 4.0


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    dtype = jnp.float32

    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (B, n, n), dtype)
    K = A @ jnp.swapaxes(A, -1, -2) + 10.0 * jnp.eye(n, dtype=dtype)

    results = {}
    for mode in (False, True):
        lin.use_pallas_base = mode
        dt = slope_time(lin.spd_inverse, K)
        results["pallas" if mode else "xla"] = dt
        print(json.dumps({
            "metric": "spd_inverse_s_per_call",
            "pallas_base": mode, "B": B, "n": n,
            "value": round(dt * 1e3, 3), "unit": "ms",
        }), flush=True)

    # Accuracy cross-check on-chip (same matrices both paths). Compare the
    # kernels directly: re-jitting lin.chol_inverse under a flipped module
    # flag can hit the tracing cache and silently reuse the first path.
    from g1_locomotion_tpu.ops import pallas_lin

    Kb = K[:256, :30, :30] + 1.0 * jnp.eye(30, dtype=dtype)
    Wp = jax.jit(pallas_lin.chol_inverse_base)(Kb)
    Wx = jax.jit(lin._chol_inv_base)(Kb)
    err = float(jnp.max(jnp.abs(Wp - Wx)))
    scale = float(jnp.max(jnp.abs(Wx)))
    print(json.dumps({
        "metric": "pallas_vs_xla_max_abs_diff",
        "value": err, "rel": err / max(scale, 1e-30),
    }), flush=True)
    lin.use_pallas_base = None
    print(json.dumps({
        "speedup": round(results["xla"] / results["pallas"], 3)
    }), flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
