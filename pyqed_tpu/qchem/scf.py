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


class SCFResult:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class RHF:
    """(reference: pyqed/qchem/hf/rhf.py:22)."""

    def __init__(self, mol, max_cycle=100, conv_tol=1e-10, diis_size=8):
        self.mol = mol
        self.max_cycle = max_cycle
        self.conv_tol = conv_tol
        self.diis_size = diis_size
        self.e_tot = None
        self.mo_coeff = None
        self.mo_energy = None
        self.converged = False

    def run(self):
        mol = self.mol
        S, T, V, eri = mol.intor()
        hcore = T + V
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
                m = len(diis_F)
                B = np.zeros((m + 1, m + 1))
                B[-1, :] = B[:, -1] = -1.0
                B[-1, -1] = 0.0
                for i in range(m):
                    for j in range(m):
                        B[i, j] = float(jnp.sum(diis_err[i]
                                                * diis_err[j]).real)
                rhs = np.zeros(m + 1)
                rhs[-1] = -1.0
                try:
                    c = np.linalg.solve(B, rhs)[:m]
                    F = sum(ci * Fi for ci, Fi in zip(c, diis_F))
                except np.linalg.LinAlgError:
                    pass
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

    def dipole_integrals(self):
        raise NotImplementedError("dipole AO integrals: next round")
