"""ctypes bridge to the C++ HEOM reference-loop oracle (heom_ref.cpp).

Used by bench.py as the honest CPU denominator for the flagship HEOM
benchmark and by tests/test_bench_parity.py for numerical parity against
both the JAX kernels and the ACTUAL reference rem_cal
(/root/reference/pyqed/heom/deom.py:667) exec'd via tests/ref_oracle.py.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "heom_ref.cpp"
_LIB = _HERE / "libheom_ref.so"


def build(force=False) -> Path:
    if _LIB.exists() and not force \
            and _LIB.stat().st_mtime > _SRC.stat().st_mtime:
        return _LIB
    # -ffast-math ≙ numba's fastmath=True (the reference enables it on its
    # hot helper, deom.py:945) and makes this denominator ~4x faster —
    # i.e. the reported TPU speedup ~4x more conservative
    cmd = ["g++", "-O3", "-march=native", "-ffast-math", "-shared",
           "-fPIC", str(_SRC), "-o", str(_LIB)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        cmd = ["g++", "-O3", "-ffast-math", "-shared", "-fPIC",
               str(_SRC), "-o", str(_LIB)]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


_handle = None


def _lib():
    global _handle
    if _handle is None:
        build()
        _handle = ctypes.CDLL(str(_LIB))
        f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        _handle.heom_ref_rk4.restype = None
        _handle.heom_ref_rk4.argtypes = [
            f64, f64, ctypes.c_int,              # H re/im, n
            i64, i64, i64,                       # keys, plus_idx, minus_idx
            ctypes.c_int, ctypes.c_int,          # nado, M
            f64, f64, f64,                       # Q, c re, c im
            f64,                                 # damp
            ctypes.c_double, ctypes.c_int,       # dt, nsteps
            f64, f64,                            # ados re/im (in/out)
        ]
    return _handle


def heom_ref_rk4(H, keys, plus_idx, minus_idx, Q, cvec, nuvec, dt, nsteps,
                 ados):
    """Propagate ``ados`` (nado, n, n) complex; the input array is NOT
    mutated — the propagated hierarchy is the RETURN value."""
    lib = _lib()
    nado, M = keys.shape
    n = H.shape[0]
    damp = np.ascontiguousarray((keys @ nuvec).real, dtype=np.float64)
    a_re = np.ascontiguousarray(ados.real, dtype=np.float64)
    a_im = np.ascontiguousarray(ados.imag, dtype=np.float64)
    lib.heom_ref_rk4(
        np.ascontiguousarray(H.real, np.float64),
        np.ascontiguousarray(H.imag if np.iscomplexobj(H)
                             else np.zeros_like(H), np.float64),
        n,
        np.ascontiguousarray(keys, np.int64),
        np.ascontiguousarray(plus_idx, np.int64),
        np.ascontiguousarray(minus_idx, np.int64),
        nado, M,
        np.ascontiguousarray(Q, np.float64),
        np.ascontiguousarray(cvec.real, np.float64),
        np.ascontiguousarray(cvec.imag, np.float64),
        damp, float(dt), int(nsteps), a_re, a_im)
    return a_re + 1j * a_im
