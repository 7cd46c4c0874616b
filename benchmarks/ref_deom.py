"""Drive the ACTUAL reference DEOM loop on our flagship HEOM structure.

The reference rk4/rem_cal (/root/reference/pyqed/heom/deom.py:725,667) is
exec'd from the reference tree via tests/ref_oracle.py — never copied.
numba is not installed in this environment, so the @njit hash helpers run
as pure Python; the timing this yields is reported for transparency but
the honest CPU denominator is the C++ transcription (heom_ref.cpp), which
upper-bounds the numba-jitted speed.

Convention mapping (reference scaled hierarchy -> unscaled):
bath_list = [expn=nu, etal=c, etar=conj(c), etaa=|c|], mode=arange(M);
the physical element ddos[0] then follows the identical trajectory as the
unscaled hierarchy used by pyqed_tpu (asserted in
tests/test_bench_parity.py).
"""
from __future__ import annotations

import time

import numpy as np


def ref_deom_rk4(H, Q, cvec, nuvec, lmax, dt, nsteps, rho0):
    """Returns (steps_per_sec, rho0_final) from the reference rk4."""
    from ref_oracle import load_reference_module
    deom = load_reference_module("heom.deom")

    M = len(cvec)
    nind = M
    n = H.shape[0]
    # comb_list / keys exactly as DEOMSolver.init_ (deom.py:1048-1064)
    combmax = nind + lmax + 1
    comb_list = np.zeros((combmax, combmax), dtype=np.int64)
    comb_list[0, 0] = 1
    for i in range(1, combmax):
        for j in range(1, combmax):
            comb_list[i, j] = comb_list[i - 1, j] + comb_list[i - 1, j - 1]
        comb_list[i, 0] = 1
    nmax = int(comb_list[lmax + nind, lmax])
    keys = np.zeros((nmax, nind), dtype=np.int64)
    deom.gen_keys(keys, lmax, nind, comb_list)

    bath_list = [np.asarray(nuvec, complex), np.asarray(cvec, complex),
                 np.conj(np.asarray(cvec, complex)),
                 np.abs(np.asarray(cvec, complex))]
    mode = np.arange(M)
    Hc = np.asarray(H, complex)
    zero = np.zeros_like(Hc)
    coupling = [np.asarray(q, complex) for q in Q]
    coupling_dip = [zero] * M
    no_pulse = lambda t: 0.0   # noqa: E731

    ddos = np.zeros((nmax, n, n), complex)
    ddos[0] = rho0
    dd1 = np.zeros_like(ddos)
    dd2 = np.zeros_like(ddos)
    dd3 = np.zeros_like(ddos)

    t0 = time.perf_counter()
    for i in range(nsteps):
        deom.rk4(ddos, dd1, dd2, dd3, keys, lmax, bath_list, mode,
                 Hc, zero, no_pulse, coupling, coupling_dip, no_pulse,
                 comb_list, nmax, dt, i * dt)
    elapsed = time.perf_counter() - t0
    return nsteps / elapsed, ddos[0].copy()
