"""ctypes binding for the native ADMM iteration kernel (native/host_qp.cc).

Same build-on-demand pattern as runtime/native_rt.py.  The kernel holds the
inner fixed-point loop of the host WBC QP; problem assembly and the SPD
factorization stay in numpy (they are one-shot per tick, the loop is not).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "host_qp.cc")
_LIB = None
_FAILED = False


def _build_library() -> str:
    src = os.path.abspath(_SRC)
    out = os.path.join(os.path.dirname(src), "libhost_qp.so")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
            check=True,
        )
    return out


def load_library():
    """The CDLL, or None when the toolchain is unavailable (numpy fallback)."""
    global _LIB, _FAILED
    if _LIB is None and not _FAILED:
        try:
            lib = ctypes.CDLL(_build_library())
            dptr = ctypes.POINTER(ctypes.c_double)
            lib.admm_iterate.argtypes = [dptr] * 8 + [
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ] + [dptr] * 4
            lib.admm_iterate.restype = None
            _LIB = lib
        except Exception:  # noqa: BLE001 — fall back to the numpy loop
            _FAILED = True
    return _LIB


def admm_iterate_native(
    P_inv, A, rho_AT, g, l, u, rho_vec, inv_rho, sigma, alpha, iters, x, z, y  # noqa: E741
) -> bool:
    """Run the iteration loop natively in place; False -> caller must use
    the numpy loop."""
    lib = load_library()
    if lib is None:
        return False
    n, m = A.shape[1], A.shape[0]
    scratch = np.empty(2 * n + 2 * m, dtype=np.float64)
    dptr = ctypes.POINTER(ctypes.c_double)
    as_ptr = lambda a: a.ctypes.data_as(dptr)
    lib.admm_iterate(
        as_ptr(P_inv), as_ptr(A), as_ptr(rho_AT), as_ptr(g), as_ptr(l), as_ptr(u),
        as_ptr(rho_vec), as_ptr(inv_rho),
        ctypes.c_double(sigma), ctypes.c_double(alpha),
        ctypes.c_int(n), ctypes.c_int(m), ctypes.c_int(iters),
        as_ptr(x), as_ptr(z), as_ptr(y), as_ptr(scratch),
    )
    return True
