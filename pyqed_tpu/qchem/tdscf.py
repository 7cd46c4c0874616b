"""Time-dependent SCF: TDA (CIS) and TDHF (RPA) excitation energies.

TPU-native counterpart of the reference TDSCF layer
(reference: pyqed/qchem/tdscf/, pyqed/qchem/core.py:444 — TDHF/TDA +
core-excitation RXS variants).

The A/B response matrices are built with einsums from the MO-basis ERIs
and diagonalized on the MXU.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _mo_blocks(mf):
    hmo, eri_mo = mf.mo_ints()
    nocc = mf.nocc
    nmo = hmo.shape[0]
    nvir = nmo - nocc
    e = mf.mo_energy
    return np.asarray(eri_mo), np.asarray(e), nocc, nvir


def tda_matrix(mf, singlet=True):
    """A_{ia, jb} = delta (e_a - e_i) + 2(ia|jb) - (ij|ab) (singlet)
    or - (ij|ab) (triplet)."""
    eri, e, nocc, nvir = _mo_blocks(mf)
    o = slice(0, nocc)
    v = slice(nocc, nocc + nvir)
    ov = eri[o, v, o, v]          # (ia|jb)
    oo_vv = eri[o, o, v, v]       # (ij|ab)
    de = (e[None, nocc:] - e[:nocc, None])   # (i, a)
    A = np.einsum("ia, jb, ij, ab -> iajb", de, np.ones((nocc, nvir)),
                  np.eye(nocc), np.eye(nvir))
    if singlet:
        A = A + 2.0 * ov.transpose(0, 1, 2, 3) - oo_vv.transpose(0, 2, 1, 3)
    else:
        A = A - oo_vv.transpose(0, 2, 1, 3)
    return A.reshape(nocc * nvir, nocc * nvir)


def b_matrix(mf, singlet=True):
    """B_{ia, jb} = 2(ia|jb) - (ib|ja) (singlet)."""
    eri, e, nocc, nvir = _mo_blocks(mf)
    o = slice(0, nocc)
    v = slice(nocc, nocc + nvir)
    ov = eri[o, v, o, v]
    ov_swap = eri[o, v, o, v].transpose(0, 3, 2, 1)  # (ib|ja)
    if singlet:
        B = 2.0 * ov - ov_swap
    else:
        B = -ov_swap
    return B.reshape(ov.shape[0] * ov.shape[1], -1)


class TDA:
    """CIS/TDA excitations (reference: pyqed/qchem/tdscf)."""

    def __init__(self, mf, singlet=True):
        self.mf = mf
        self.singlet = singlet
        self.e = None
        self.xy = None

    def run(self, nroots=5):
        A = tda_matrix(self.mf, self.singlet)
        w, X = jnp.linalg.eigh(jnp.asarray(A))
        self.e = np.asarray(w[:nroots])
        self.xy = X[:, :nroots]
        return self.e

    kernel = run

    def transition_dipole(self):
        """Transition dipoles <0|r|n> (nroots, 3) from the MO dipole
        occ->virt block (uses the AO dipole integrals that unblocked
        qchem/scf.py:122)."""
        mf = self.mf
        _, _, nocc, nvir = _mo_blocks(mf)
        Dmo = mf.transition_dipoles()                   # (3, nmo, nmo)
        dov = Dmo[:, :nocc, nocc:nocc + nvir]           # (3, no, nv)
        X = jnp.reshape(self.xy, (nocc, nvir, -1))
        # sqrt(2): spin-adapted singlet CIS normalization
        return np.asarray(jnp.einsum("kia, ian -> nk", dov, X)
                          * np.sqrt(2.0))

    def oscillator_strength(self):
        """f_n = (2/3) omega_n |<0|r|n>|^2."""
        mu = self.transition_dipole()
        return (2.0 / 3.0) * self.e * np.sum(np.abs(mu) ** 2, axis=1)


class TDHF:
    """Full RPA/TDHF: solve the (A, B) non-Hermitian problem via the
    Hermitian (A-B)^{1/2} (A+B) (A-B)^{1/2} form."""

    def __init__(self, mf, singlet=True):
        self.mf = mf
        self.singlet = singlet
        self.e = None

    def run(self, nroots=5):
        A = tda_matrix(self.mf, self.singlet)
        B = b_matrix(self.mf, self.singlet)
        ApB = jnp.asarray(A + B)
        AmB = jnp.asarray(A - B)
        w, U = jnp.linalg.eigh(AmB)
        sq = (U * jnp.sqrt(jnp.clip(w, 0, None))) @ U.T
        M = sq @ ApB @ sq
        w2 = jnp.linalg.eigvalsh(M)
        self.e = np.sqrt(np.clip(np.asarray(w2[:nroots]), 0, None))
        return self.e

    kernel = run


CIS = TDA


def tda_density_matrix(td, state_id):
    """AO density matrix of TDA excited state ``state_id`` (0 = first
    excited state), taking the TDA amplitudes as CIS coefficients
    (reference: pyqed/qchem/core.py:840 ``tda_denisty_matrix`` [sic]):

        D = D_gs + 2 (-X X^T)_oo + 2 (X^T X)_vv   in the MO basis.
    """
    mf = td.mf
    nocc = mf.nocc
    nmo = np.asarray(mf.mo_coeff).shape[1]
    X = np.asarray(td.xy)[:, state_id].reshape(nocc, nmo - nocc)
    dm = np.zeros((nmo, nmo))
    dm[:nocc, :nocc] = 2.0 * np.eye(nocc)
    dm[:nocc, :nocc] += -2.0 * np.einsum("ia, ka -> ik", X.conj(), X)
    dm[nocc:, nocc:] += 2.0 * np.einsum("ia, ic -> ac", X, X.conj())
    mo = np.asarray(mf.mo_coeff)
    return np.einsum("pi, ij, qj -> pq", mo, dm, mo.conj())
