"""ctypes binding for the native dense IPM QP solver (native/qp_solver.cpp).

The C++ solver is the host-side runtime piece standing in for the reference's
qpOASES/eiQuadProg backends (SURVEY.md §2.2): high-accuracy single-problem
solves for CPU serving and for cross-checking the batched TPU ADMM. Built on
demand with g++ (no external deps); the shared object is cached next to the
source.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import NamedTuple, Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "qp_solver.cpp"
_LIB = _SRC.parent / "libqp_solver.so"
_cached_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> Path:
    """Compile the shared library if missing/stale. Returns its path."""
    if force or not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-o", str(_LIB), str(_SRC),
        ]
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True)
        except FileNotFoundError as e:
            raise RuntimeError(
                "native QP solver requires a C++ toolchain: `g++` was not "
                "found on PATH. Install g++ or use the pure-JAX solver "
                "(g1_locomotion_tpu.ops.qp) instead."
            ) from e
        if proc.returncode != 0:
            raise RuntimeError(
                f"native QP solver build failed (exit {proc.returncode}):\n"
                f"  {' '.join(cmd)}\n{proc.stderr}"
            )
    return _LIB


def _lib() -> ctypes.CDLL:
    global _cached_lib
    if _cached_lib is None:
        lib = ctypes.CDLL(str(build()))
        lib.qp_solve_dense.restype = ctypes.c_int
        lib.qp_solve_dense.argtypes = [
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_double,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        _cached_lib = lib
    return _cached_lib


class NativeQPResult(NamedTuple):
    x: np.ndarray
    y: np.ndarray
    status: int  # 0 ok, 1 max-iter, 2 numerical failure
    iters: int
    gap: float


def solve(H, g, A, l, u, max_iter: int = 50, tol: float = 1e-10) -> NativeQPResult:
    """Solve min 0.5 x'Hx + g'x s.t. l <= Ax <= u at float64 on the host."""
    H = np.ascontiguousarray(H, np.float64)
    g = np.ascontiguousarray(g, np.float64)
    A = np.ascontiguousarray(A, np.float64)
    l = np.ascontiguousarray(l, np.float64)
    u = np.ascontiguousarray(u, np.float64)
    n, m = H.shape[0], A.shape[0]
    x = np.zeros(n)
    y = np.zeros(m)
    info = np.zeros(2)
    status = _lib().qp_solve_dense(n, m, H, g, A, l, u, max_iter, tol, x, y, info)
    return NativeQPResult(x=x, y=y, status=int(status), iters=int(info[0]), gap=float(info[1]))
