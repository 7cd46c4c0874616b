"""ctypes bridge to the native C++ McMurchie-Davidson ERI engine.

The reference reaches general-basis integrals through gbasis/pyscf
(/root/reference/pyqed/qchem/basis.py:10-15); here the hot O(nao^4)
two-electron tensor is built by qchem/native/eri_engine.cpp (OpenMP
over shell pairs, 8-fold symmetry) with the pure-Python recursion in
basis.py as the bit-compatible oracle/fallback.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "native" / "eri_engine.cpp"
_LIB = _HERE / "native" / "liberi.so"

_handle = None


def build(force=False) -> Path:
    if _LIB.exists() and not force \
            and _LIB.stat().st_mtime > _SRC.stat().st_mtime:
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           str(_SRC), "-o", str(_LIB)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        cmd = ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _lib():
    global _handle
    if _handle is None:
        build()
        _handle = ctypes.CDLL(str(_LIB))
        f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        _handle.eri_tensor_native.restype = None
        _handle.eri_tensor_native.argtypes = [
            f64, i32, i32, f64, f64, ctypes.c_int, f64]
        _handle.eri_deriv_native.restype = None
        _handle.eri_deriv_native.argtypes = [
            f64, i32, i32, f64, f64, ctypes.c_int, f64]
    return _handle


def eri_tensor_native(bfs):
    """Full (nao, nao, nao, nao) ERI tensor from the C++ engine."""
    centers, lmn, prim_off, exps, cn, nbf = _pack(bfs)
    out = np.zeros((nbf, nbf, nbf, nbf), np.float64)
    _lib().eri_tensor_native(centers, lmn, prim_off, exps, cn, nbf,
                             out.reshape(-1))
    return out


def _pack(bfs):
    nbf = len(bfs)
    centers = np.ascontiguousarray(
        np.array([g.center for g in bfs]), np.float64)
    lmn = np.ascontiguousarray(np.array([g.lmn for g in bfs]), np.int32)
    prim_off = np.zeros(nbf + 1, np.int32)
    exps, cn = [], []
    for k, g in enumerate(bfs):
        prim_off[k + 1] = prim_off[k] + len(g.exps)
        exps.append(np.asarray(g.exps, float))
        cn.append(np.asarray(g.coefs, float) * np.asarray(g.norms, float))
    return (centers, lmn, prim_off,
            np.ascontiguousarray(np.concatenate(exps), np.float64),
            np.ascontiguousarray(np.concatenate(cn), np.float64), nbf)


def eri_deriv_native(bfs):
    """d(ij|kl)/d(center_i)_x, derivative on the FIRST index:
    (3, nao, nao, nao, nao) from the C++ engine."""
    centers, lmn, prim_off, exps, cn, nbf = _pack(bfs)
    out = np.zeros((3, nbf, nbf, nbf, nbf), np.float64)
    _lib().eri_deriv_native(centers, lmn, prim_off, exps, cn, nbf,
                            out.reshape(-1))
    return out


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False
