"""Vibronic-model MPS dynamics: LVC Hamiltonian as a compact MPO,
propagated with (two-site) TDVP.

TPU-native counterpart of the reference's vibronic MPS layer
(reference: pyqed/mps/vibronic.py:25 ``MatrixState``/:428
``MatrixProductState`` — P&C-style variational propagation of vibronic
Hamiltonians; pyqed/mps/lvc.py). Instead of the reference's
hand-written variational compression sweeps, the Hamiltonian is encoded
EXACTLY as an MPO with bond dimension nmodes+2 and propagated with the
TDVP integrators (tn/tdvp.py), so one engine serves ground states
(DMRG), quenches and spectra.

Chain layout: site 0 = electronic system (d = nstates), sites 1..M =
harmonic modes (d = nb levels each):

    H = H_el(0) + Σ_m ω_m n_m + Σ_m V_m(0) ⊗ x_m,
    x_m = (a + a†)/√2,  V_m = any Hermitian electronic matrix
    (diagonal κ shifts = tuning modes, off-diagonal = coupling modes).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp

from .mps import MPS, MPO, two_site_dmrg
from .tdvp import TDVP, TDVP2


def boson_ops(nb):
    a = np.diag(np.sqrt(np.arange(1, nb)), 1)
    return a, a.T, np.diag(np.arange(nb))


def lvc_mpo(H_el, omegas: Sequence, couplings: Sequence, nb: int) -> MPO:
    """MPO of the LVC Hamiltonian.

    H_el : (ns, ns) electronic Hamiltonian.
    omegas : (M,) mode frequencies.
    couplings : list of (ns, ns) Hermitian electronic matrices V_m
        multiplying x_m (diagonal entries = κ, off-diagonal = λ).
    nb : boson levels per mode.
    """
    H_el = np.asarray(H_el)
    ns = H_el.shape[0]
    M = len(omegas)
    a, ad, num = boson_ops(nb)
    x = (a + ad) / np.sqrt(2.0)
    D = M + 2

    # site 0 (electronic): channels [idle, mode couplings..., done]
    W0 = np.zeros((D, D, ns, ns))
    W0[0, 0] = np.eye(ns)
    for m in range(M):
        W0[0, 1 + m] = np.asarray(couplings[m])
    W0[0, D - 1] = H_el
    W0[D - 1, D - 1] = np.eye(ns)

    Ws = [jnp.asarray(W0)]
    for k in range(M):
        W = np.zeros((D, D, nb, nb))
        W[0, 0] = np.eye(nb)
        W[D - 1, D - 1] = np.eye(nb)
        W[0, D - 1] = omegas[k] * num        # mode energy
        W[1 + k, D - 1] = x                  # terminate coupling channel k
        for m in range(M):
            if m != k:
                W[1 + m, 1 + m] = np.eye(nb)  # pass other channels
        Ws.append(jnp.asarray(W))
    return MPO(Ws)


class VibronicMPS:
    """Driver: build the LVC MPO, prepare |el⟩⊗|0...0⟩, propagate with
    TDVP2, record electronic populations
    (reference: pyqed/mps/vibronic.py:428 run-loop)."""

    def __init__(self, H_el, omegas, couplings, nb=8, chi_max=32):
        self.ns = np.asarray(H_el).shape[0]
        self.M = len(omegas)
        self.nb = nb
        self.chi_max = chi_max
        self.mpo = lvc_mpo(H_el, omegas, couplings, nb)

    def initial_state(self, el_state: int):
        el = np.zeros(self.ns)
        el[el_state] = 1.0
        ground = [1.0] + [0.0] * (self.nb - 1)
        return MPS.from_product_state([el] + [ground] * self.M)

    def run(self, el_state, dt, nt, nout=1, chi_pad=8, noise=1e-8):
        """Returns (times, populations (nsteps+1, ns))."""
        psi = self.initial_state(el_state)
        if chi_pad and chi_pad > 1:
            psi = psi.pad_noise(chi_pad, noise=noise)
        td = TDVP2(self.mpo, psi, chi_max=self.chi_max)
        pops = [self._populations(td)]
        times = [0.0]
        for k in range(nt // nout):
            for _ in range(nout):
                td.step(dt)
            pops.append(self._populations(td))
            times.append((k + 1) * nout * dt)
        self.td = td
        return np.asarray(times), np.asarray(pops)

    def _populations(self, td):
        ops = [None] * (self.M + 1)
        out = np.zeros(self.ns)
        for s in range(self.ns):
            P = np.zeros((self.ns, self.ns))
            P[s, s] = 1.0
            ops[0] = P
            out[s] = np.real(td.expect_local(ops)[0])
        return out

    def ground_state(self, sweeps=8, chi_pad=8):
        state = [np.eye(self.ns)[0]] + \
            [[1.0] + [0.0] * (self.nb - 1)] * self.M
        # noise-pad: a pure product seed can trap the two-site sweeps
        mps = MPS.from_product_state(state).pad_noise(chi_pad, noise=1e-3)
        energies, gs = two_site_dmrg(self.mpo, mps, chi_max=self.chi_max,
                                     sweeps=sweeps)
        return energies[-1], gs
