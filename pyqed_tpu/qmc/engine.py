"""ctypes bridge to the native C++ DMC walker engine.

The CPU analogue of the reference's native QSATS kernels
(reference: pyqed/qmc/MC_exchange/permute3d/ Fortran+MPI; built there with
gfortran Makefiles, here with g++ at first use). The TPU path with the
same algorithm is :class:`pyqed_tpu.qmc.dmc.DMC`; both sit behind
:func:`dmc_native` / DMC with matching semantics.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "native" / "qmc_engine.cpp"
_LIB = _HERE / "native" / "libqmc_engine.so"

POTENTIALS = {"harmonic": 0, "morse": 1, "quartic": 2}


def build(force=False) -> Path:
    """Compile the engine with g++ (cached)."""
    if _LIB.exists() and not force and _LIB.stat().st_mtime > _SRC.stat().st_mtime:
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           str(_SRC), "-o", str(_LIB)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        # fall back without OpenMP
        cmd = ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


_handle = None


def _lib():
    global _handle
    if _handle is None:
        build()
        _handle = ctypes.CDLL(str(_LIB))
        _handle.dmc_run.restype = ctypes.c_double
        _handle.dmc_run.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_uint64,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        _f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        _i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        _handle.qsats_eloc.restype = None
        _handle.qsats_eloc.argtypes = [
            _f64, ctypes.c_int, ctypes.c_int, _i32, _f64, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, _f64, _f64,
        ]
        _handle.qsats_vmc.restype = ctypes.c_double
        _handle.qsats_vmc.argtypes = [
            _f64, ctypes.c_int, _i32, _f64, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_uint64,
            _f64,
        ]
    return _handle


def qsats_eloc_native(q, ipairs, vpvec, a, b, mass):
    """C++ local energies for configurations q (nw, natoms, 3).
    Returns (tloc, vloc) arrays (nw,) [hartree]."""
    lib = _lib()
    q = np.ascontiguousarray(q, np.float64)
    if q.ndim == 2:
        q = q[None]
    nw, natoms, _ = q.shape
    ipairs = np.ascontiguousarray(ipairs, np.int32)
    vpvec = np.ascontiguousarray(vpvec, np.float64)
    t = np.zeros(nw)
    v = np.zeros(nw)
    lib.qsats_eloc(q, nw, natoms, ipairs, vpvec, ipairs.shape[0],
                   a, b, mass, t, v)
    return t, v


def qsats_vmc_native(q0, ipairs, vpvec, a, b, mass, nsweeps=2000,
                     nequil=500, step=0.35, seed=1234):
    """C++ single-chain all-atom Metropolis VMC. Returns
    (energy per atom [K], e_trace, final config)."""
    lib = _lib()
    q = np.ascontiguousarray(q0, np.float64).copy()
    natoms = q.shape[0]
    ipairs = np.ascontiguousarray(ipairs, np.int32)
    vpvec = np.ascontiguousarray(vpvec, np.float64)
    e_trace = np.zeros(nsweeps)
    E = lib.qsats_vmc(q.reshape(-1), natoms, ipairs, vpvec,
                      ipairs.shape[0], a, b, mass, nsweeps, nequil,
                      step, seed, e_trace)
    return E, e_trace, q


def dmc_native(potential="harmonic", ndim=1, nwalkers=4096, nsteps=2000,
               nequil=500, dt=0.01, mass=1.0, p0=0.0, p1=0.0, eref0=0.5,
               seed=12345, walkers0=None):
    """Run the C++ DMC engine. Returns (E, e_trace, final walkers)."""
    lib = _lib()
    pot_id = POTENTIALS[potential]
    if walkers0 is None:
        rng = np.random.default_rng(seed)
        walkers = rng.normal(size=(nwalkers, ndim)) * 0.5
    else:
        walkers = np.array(walkers0, dtype=np.float64, copy=True)
        nwalkers, ndim = walkers.shape
    walkers = np.ascontiguousarray(walkers, dtype=np.float64)
    e_trace = np.zeros(nsteps, dtype=np.float64)
    E = lib.dmc_run(walkers, nwalkers, ndim, nsteps, nequil, dt, mass,
                    pot_id, p0, p1, eref0, seed, e_trace)
    return E, e_trace, walkers
