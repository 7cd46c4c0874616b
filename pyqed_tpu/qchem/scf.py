"""Self-consistent field: restricted Hartree-Fock with DIIS.

TPU-native counterpart of the reference SCF
(reference: pyqed/qchem/hf/rhf.py — ``RHF:22``, kernel ``hartree_fock:424``).

Integrals come from the host layer; the SCF loop — Fock build (one einsum
with the ERI tensor), DIIS extrapolation, generalized eigenproblem via
symmetric orthogonalization — is jnp on the MXU.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..ops.linalg import dag


def diis_extrapolate(errs, vecs):
    """Pulay DIIS: solve the bordered B-matrix system and return the
    extrapolated vector ``sum_i c_i vecs[i]`` (or None if the system is
    singular).  Shared by RHF/UHF Fock extrapolation and the CCSD
    amplitude extrapolation (qchem/cc.py)."""
    m = len(errs)
    B = np.zeros((m + 1, m + 1))
    B[-1, :] = B[:, -1] = -1.0
    B[-1, -1] = 0.0
    for i in range(m):
        for j in range(m):
            B[i, j] = float(np.real(np.sum(np.conj(np.asarray(errs[i]))
                                           * np.asarray(errs[j]))))
    rhs = np.zeros(m + 1)
    rhs[-1] = -1.0
    try:
        c = np.linalg.solve(B, rhs)[:m]
    except np.linalg.LinAlgError:
        return None
    return sum(ci * vi for ci, vi in zip(c, vecs))


class SCFResult:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class RHF:
    """(reference: pyqed/qchem/hf/rhf.py:22)."""

    def __init__(self, mol, max_cycle=100, conv_tol=1e-10, diis_size=8,
                 extra_hcore=None):
        self.mol = mol
        self.max_cycle = max_cycle
        self.conv_tol = conv_tol
        self.diis_size = diis_size
        # extra_hcore: optional (nao, nao) AO one-electron perturbation
        # added to T+V — finite-field properties (dipole/polarizability
        # as energy derivatives) and one-electron embedding potentials
        self.extra_hcore = extra_hcore
        self.e_tot = None
        self.mo_coeff = None
        self.mo_energy = None
        self.converged = False

    @property
    def bfs(self):
        return self.mol.bfs

    def run(self):
        mol = self.mol
        S, T, V, eri = mol.intor()
        hcore = T + V
        if self.extra_hcore is not None:
            hcore = hcore + jnp.asarray(self.extra_hcore)
        enuc = mol.energy_nuc()
        nocc = mol.nelec // 2
        if mol.nelec % 2 != 0:
            raise ValueError("RHF needs an even electron count")

        # symmetric orthogonalization X = S^{-1/2}
        s, U = jnp.linalg.eigh(S)
        X = (U * (1.0 / jnp.sqrt(s))) @ U.T

        def fock(D):
            J = jnp.einsum("pqrs, rs -> pq", eri, D)
            K = jnp.einsum("prqs, rs -> pq", eri, D)
            return hcore + J - 0.5 * K

        def density(F):
            Fp = X.T @ F @ X
            e, Cp = jnp.linalg.eigh(Fp)
            C = X @ Cp
            Cocc = C[:, :nocc]
            return 2.0 * Cocc @ Cocc.T, C, e

        # core guess
        D, C, mo_e = density(hcore)
        E_old = 0.0
        diis_F, diis_err = [], []
        for it in range(self.max_cycle):
            F = fock(D)
            # DIIS error: FDS - SDF in orthogonal basis
            err = X.T @ (F @ D @ S - S @ D @ F) @ X
            diis_F.append(F)
            diis_err.append(err)
            if len(diis_F) > self.diis_size:
                diis_F.pop(0)
                diis_err.pop(0)
            if len(diis_F) > 1:
                mix = diis_extrapolate(diis_err, diis_F)
                if mix is not None:
                    F = mix
            D, C, mo_e = density(F)
            # E_elec = 1/2 Tr[D (hcore + F)]
            E = float(0.5 * jnp.sum(D * (hcore + fock(D))).real)
            if abs(E - E_old) < self.conv_tol:
                self.converged = True
                break
            E_old = E

        self.e_tot = E + enuc
        self.mo_coeff = C
        self.mo_energy = mo_e
        self.nocc = nocc
        self.hcore = hcore
        self.eri = eri
        self.S = S
        self.e_elec = E
        self.dm = D
        return self

    kernel = run

    # ------------------------------------------------- MO-basis integrals
    def mo_ints(self):
        """(hcore_mo, eri_mo in chemists' notation)."""
        C = self.mo_coeff
        h = C.T @ self.hcore @ C
        eri_mo = jnp.einsum("pi, qj, pqrs, rk, sl -> ijkl",
                            C, C, self.eri, C, C)
        return h, eri_mo

    def dipole_integrals(self, origin=(0.0, 0.0, 0.0)):
        """AO dipole matrices (3, nao, nao) about ``origin``
        (reference: gbasis-backed path, pyqed/qchem/basis.py:10-15)."""
        from .basis import dipole_matrix
        mu = dipole_matrix(self.mol.bfs, origin)
        C = getattr(self.mol, "csph", None)
        if C is not None:
            mu = np.einsum("pi, kij, qj -> kpq", C, mu, C)
        return jnp.asarray(mu)

    def dip_moment(self, origin=(0.0, 0.0, 0.0), unit="au"):
        """Molecular dipole vector mu = sum_A Z_A R_A - Tr[D r]
        (reference calls through to pyscf ``mf.dip_moment()``,
        pyqed/qchem/hessian.py:232; here from the in-house AO dipole
        integrals).  ``unit``: 'au' or 'debye'."""
        mu_ao = self.dipole_integrals(origin)
        el = -jnp.einsum("kpq, qp -> k", mu_ao, self.dm).real
        R = np.asarray(self.mol.atom_coords()) - np.asarray(origin)
        Z = np.asarray(self.mol.atom_charges(), dtype=float)
        nuc = jnp.asarray(Z @ R)
        mu = nuc + el
        if unit.lower().startswith("d"):
            mu = mu * 2.541746473
        return np.asarray(mu)

    def polarizability(self, eps=1e-3):
        """Static dipole polarizability alpha_ij = d mu_i / d E_j by
        finite-field SCF (reference exposes none; the pyscf path it
        wraps has one — this is the in-house finite-field route through
        ``extra_hcore``).  Returns (3, 3), symmetrized."""
        mu_ao = np.asarray(self.dipole_integrals())
        alpha = np.zeros((3, 3))
        for j in range(3):
            # H' = -mu.E => hcore += E_j * r_j (electron charge -1 is
            # inside mu_ao = -<r> convention handled in dip_moment)
            mus = []
            for s in (+1.0, -1.0):
                mf = RHF(self.mol, max_cycle=self.max_cycle,
                         conv_tol=self.conv_tol,
                         extra_hcore=s * eps * mu_ao[j]).run()
                mus.append(mf.dip_moment())
            alpha[:, j] = (mus[0] - mus[1]) / (2.0 * eps)
        return 0.5 * (alpha + alpha.T)

    def transition_dipoles(self, xy=None):
        """MO-basis occ->virt dipole blocks (feeds TDA/TDHF oscillator
        strengths)."""
        D = self.dipole_integrals()
        C = self.mo_coeff
        Dmo = jnp.einsum("pi, kpq, qj -> kij", C, D, C)
        return Dmo


class UHF:
    """Unrestricted Hartree-Fock (reference: pyqed/qchem/hf — UHF variant).

    Separate alpha/beta Fock matrices; same DIIS machinery as RHF.
    """

    def __init__(self, mol, max_cycle=150, conv_tol=1e-10, diis_size=8,
                 extra_hcore=None):
        self.mol = mol
        self.max_cycle = max_cycle
        self.conv_tol = conv_tol
        self.diis_size = diis_size
        #: optional (nao, nao) AO one-electron perturbation (finite
        #: fields etc.) — same contract as RHF's extra_hcore
        self.extra_hcore = extra_hcore
        self.converged = False

    def run(self):
        mol = self.mol
        S, T, V, eri = mol.intor()
        hcore = T + V
        if self.extra_hcore is not None:
            hcore = hcore + jnp.asarray(self.extra_hcore)
        enuc = mol.energy_nuc()
        na = (mol.nelec + mol.spin) // 2
        nb = mol.nelec - na
        self.nocc = (na, nb)

        s, U = jnp.linalg.eigh(S)
        X = (U * (1.0 / jnp.sqrt(s))) @ U.T

        def fock(Da, Db):
            J = jnp.einsum("pqrs, rs -> pq", eri, Da + Db)
            Ka = jnp.einsum("prqs, rs -> pq", eri, Da)
            Kb = jnp.einsum("prqs, rs -> pq", eri, Db)
            return hcore + J - Ka, hcore + J - Kb

        def density(F, nocc):
            e, Cp = jnp.linalg.eigh(X.T @ F @ X)
            C = X @ Cp
            Cocc = C[:, :nocc]
            return Cocc @ Cocc.T, C, e

        Da, Ca, ea = density(hcore, na)
        Db, Cb, eb = density(hcore, nb)
        # break alpha/beta symmetry for open shells
        if na == nb and mol.spin == 0:
            pass
        E_old = 0.0
        diis = []
        for it in range(self.max_cycle):
            Fa, Fb = fock(Da, Db)
            erra = X.T @ (Fa @ Da @ S - S @ Da @ Fa) @ X
            errb = X.T @ (Fb @ Db @ S - S @ Db @ Fb) @ X
            diis.append((Fa, Fb, jnp.concatenate(
                [jnp.ravel(erra), jnp.ravel(errb)])))
            if len(diis) > self.diis_size:
                diis.pop(0)
            if len(diis) > 1:
                mix = diis_extrapolate([d[2] for d in diis],
                                       [np.stack([np.asarray(d[0]),
                                                  np.asarray(d[1])])
                                        for d in diis])
                if mix is not None:
                    Fa, Fb = jnp.asarray(mix[0]), jnp.asarray(mix[1])
            Da, Ca, ea = density(Fa, na)
            Db, Cb, eb = density(Fb, nb)
            Fa0, Fb0 = fock(Da, Db)
            E = float(0.5 * (jnp.sum((Da + Db) * hcore)
                             + jnp.sum(Da * Fa0) + jnp.sum(Db * Fb0)).real)
            if abs(E - E_old) < self.conv_tol:
                self.converged = True
                break
            E_old = E

        self.e_tot = E + enuc
        self.mo_coeff = (Ca, Cb)
        self.mo_energy = (ea, eb)
        self.hcore = hcore
        self.eri = eri
        self.S = S
        self.dm = (Da, Db)
        return self

    kernel = run

    def spin_square(self):
        """<S^2> = S(S+1) + Nb - sum_ij |<a_i|b_j>|^2."""
        Ca, Cb = self.mo_coeff
        na, nb = self.nocc
        Sab = Ca[:, :na].T @ self.S @ Cb[:, :nb]
        sz = (na - nb) / 2
        return float(sz * (sz + 1) + nb - jnp.sum(jnp.abs(Sab) ** 2))


def get_hcore_mo(mf):
    """Core Hamiltonian in the MO basis; RHF-like -> (n, n), UHF-like ->
    (h_alpha, h_beta) (reference: pyqed/qchem/mol.py:48)."""
    C = mf.mo_coeff
    if isinstance(C, (tuple, list)):
        Ca, Cb = C
        return (Ca.T @ mf.hcore @ Ca, Cb.T @ mf.hcore @ Cb)
    return C.T @ mf.hcore @ C


def get_eri_mo(mf):
    """Two-electron integrals in the MO basis, chemists' notation
    (ij|kl); UHF-like -> (aa, ab, bb) blocks
    (reference: pyqed/qchem/mol.py:83)."""
    def xform(Cp, Cq, Cr, Cs):
        return jnp.einsum("pi, qj, pqrs, rk, sl -> ijkl",
                          Cp, Cq, mf.eri, Cr, Cs)
    C = mf.mo_coeff
    if isinstance(C, (tuple, list)):
        Ca, Cb = C
        return (xform(Ca, Ca, Ca, Ca), xform(Ca, Ca, Cb, Cb),
                xform(Cb, Cb, Cb, Cb))
    return xform(C, C, C, C)
