"""G0W0 quasiparticle corrections on the RPA (Casida) screened interaction.

TPU-native counterpart of the reference GW layer
(reference: pyqed/gw/G0W0.py:170 — G0W0 on RPA/Casida; gw/dmft.py and
gw-BSE are later-round targets).

Sum-over-states correlation self-energy from the RPA excitation vectors:

  Sigma_c^p(w) = sum_I [ sum_i |w^I_{pi}|^2 / (w - e_i + Omega_I)
                       + sum_a |w^I_{pa}|^2 / (w - e_a - Omega_I) ]

with w^I_{pq} = sum_{ia} (pq|ia) (X+Y)^I_{ia}; HF reference, so the
quasiparticle energy is E_p = e_p + Sigma_c(e_p) (linearized, eta -> 0+).
All contractions are einsums on device; the RPA eigenproblem reuses
:mod:`pyqed_tpu.qchem.tdscf`.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..qchem.tdscf import tda_matrix, b_matrix


def rpa_modes(mf):
    """RPA excitation energies Omega_I and (X+Y)^I vectors, normalized by
    (X+Y)^T (A-B) ... the standard Casida normalization."""
    A = np.asarray(tda_matrix(mf, singlet=True))
    B = np.asarray(b_matrix(mf, singlet=True))
    ApB = A + B
    AmB = A - B
    w, U = np.linalg.eigh(AmB)
    sq = (U * np.sqrt(np.clip(w, 1e-14, None))) @ U.T
    sq_inv = (U * (1.0 / np.sqrt(np.clip(w, 1e-14, None)))) @ U.T
    M = sq @ ApB @ sq
    w2, Z = np.linalg.eigh(M)
    Omega = np.sqrt(np.clip(w2, 1e-14, None))
    # X+Y = (A-B)^{1/2} Z / sqrt(Omega)
    XpY = sq @ Z / np.sqrt(Omega)[None, :]
    return Omega, XpY


def g0w0(mf, eta=1e-3, orbitals=None):
    """Quasiparticle energies for the requested orbitals (default: all).

    Returns (e_qp, e_hf, sigma_c). HF starting point: E_p = e_p +
    Re Sigma_c(e_p).
    """
    eri, e, nocc, nvir = _blocks(mf)
    nmo = nocc + nvir
    Omega, XpY = rpa_modes(mf)
    XpY = XpY.reshape(nocc, nvir, -1)         # (i, a, I)
    if orbitals is None:
        orbitals = list(range(nmo))

    # w^I_{pq} = sum_{ia} (pq|ia) (X+Y)^I_{ia}
    W = np.einsum("pqia, iaI -> pqI", eri[:, :, :nocc, nocc:], XpY)

    e_qp = np.array(e, dtype=float).copy()
    sig = np.zeros(nmo)
    for p in orbitals:
        w0 = e[p]
        num_occ = np.abs(W[p, :nocc, :]) ** 2          # (i, I)
        den_occ = w0 - e[:nocc, None] + Omega[None, :]
        num_vir = np.abs(W[p, nocc:, :]) ** 2          # (a, I)
        den_vir = w0 - e[nocc:, None] - Omega[None, :]
        sc = (np.sum(num_occ * den_occ / (den_occ**2 + eta**2))
              + np.sum(num_vir * den_vir / (den_vir**2 + eta**2)))
        sig[p] = sc
        e_qp[p] = e[p] + sc
    return e_qp, np.asarray(e), sig


def _blocks(mf):
    hmo, eri_mo = mf.mo_ints()
    nocc = mf.nocc
    nmo = hmo.shape[0]
    return np.asarray(eri_mo), np.asarray(mf.mo_energy), nocc, nmo - nocc


class G0W0:
    """(reference: pyqed/gw/G0W0.py:170)."""

    def __init__(self, mf, eta=1e-3):
        self.mf = mf
        self.eta = eta
        self.e_qp = None

    def run(self, orbitals=None):
        self.e_qp, self.e_hf, self.sigma_c = g0w0(self.mf, self.eta,
                                                  orbitals)
        return self.e_qp

    kernel = run

    @property
    def ip(self):
        """Ionization potential = -E_qp(HOMO)."""
        return -self.e_qp[self.mf.nocc - 1]
