"""Linear vibronic coupling (LVC) model in the Fock (HO) basis.

TPU-native counterpart of the reference LVC layer
(reference: pyqed/mol.py — ``Mode:953``, ``LVC:959`` (``buildH:1003``,
``APES:1060``, ``promote:1081``, ``vertical:1090``, ``rdm_el:1222``,
``add_coupling:1241``); pyqed/phys.py — ``multimode:1878``).

Hilbert-space ordering: electronic (x) vibrational, matching the reference
(H = h_el (x) I_vib + I_el (x) h_vib + sum_j V_j (x) x_j).
Generalized beyond the reference: arbitrary number of electronic states
(the reference hardcodes 3, pyqed/mol.py:984) and per-mode Fock dimensions.
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np
import jax.numpy as jnp

from ..ops.linalg import dag, ket2dm
from ..ops.operators import (
    basis, boson, destroy, jump, quadrature, tensor,
)
from .mol import Mol, SESolver


@dataclasses.dataclass
class Mode:
    """A vibrational mode (reference: pyqed/mol.py:953)."""
    omega: float
    couplings: list = dataclasses.field(default_factory=list)
    truncate: int = 2


def multimode(omegas, nmodes, J=0.0, truncate=2):
    """Direct-product multi-mode boson Hamiltonian + position operators
    (reference: pyqed/phys.py:1878). Returns (H, [x_j])."""
    N = truncate
    idm = jnp.eye(N)
    x1 = quadrature(N)
    H = 0.0
    xs = []
    for j in range(nmodes):
        ops_h = [idm] * nmodes
        ops_h[j] = boson(omegas[j], N)
        H = H + tensor(ops_h)
        ops_x = [idm] * nmodes
        ops_x[j] = x1
        xs.append(tensor(ops_x))
    if J != 0.0:
        for j in range(nmodes - 1):
            H = H + J * xs[j] @ xs[j + 1]
    return H, xs


class LVC(Mol):
    """(reference: pyqed/mol.py:959)."""

    def __init__(self, E, modes: Sequence[Mode]):
        self.e_fc = np.asarray(E)
        self.nel = self.nstates = len(E)
        self.nmodes = len(modes)
        self.modes = list(modes)
        self.fock_dims = [m.truncate for m in modes]
        self.nvib = int(np.prod(self.fock_dims))
        self.idm_vib = jnp.eye(self.nvib)
        self.idm_el = jnp.eye(self.nstates)
        self.omegas = [m.omega for m in modes]
        self.H = None
        self.dim = None
        self._x = None
        self.gamma = None
        self.dephasing = 0.0
        self._edip = None
        self._edip_rms = None

    def buildH(self):
        """(reference: pyqed/mol.py:1003)."""
        nel = self.nstates
        h_el = jnp.diag(jnp.asarray(self.e_fc))
        hv, xs = multimode(self.omegas, self.nmodes,
                           truncate=self.fock_dims[0])
        H = (jnp.kron(h_el, jnp.eye(hv.shape[0], dtype=hv.dtype))
             + jnp.kron(self.idm_el.astype(hv.dtype), hv))
        for j, mode in enumerate(self.modes):
            V = jnp.zeros((nel, nel), dtype=H.dtype)
            for c in mode.couplings:
                a, b = c[0]
                V = V + c[1] * jump(a, b, nel)
            H = H + jnp.kron(V, xs[j])
        self.H = H
        self.dim = H.shape[0]
        self._x = xs
        return H

    def APES(self, x):
        """Adiabatic PES scan at nuclear point x
        (reference: pyqed/mol.py:1060)."""
        x = np.atleast_1d(np.asarray(x))
        V = jnp.diag(jnp.asarray(self.e_fc)).astype(complex)
        V = V + 0.5 * float(np.sum(np.asarray(self.omegas) * x**2)) * self.idm_el
        for j, mode in enumerate(self.modes):
            for c in mode.couplings:
                a, b = c[0]
                V = V + c[1] * jump(a, b, self.nstates) * x[j]
        return jnp.sort(jnp.linalg.eigvalsh(V))

    def promote(self, A, which="el"):
        """(reference: pyqed/mol.py:1081)."""
        if which in ("el", "e", "electronic"):
            return jnp.kron(A, self.idm_vib.astype(A.dtype))
        elif which in ("v", "vib", "vibrational"):
            return jnp.kron(self.idm_el.astype(A.dtype), A)
        raise ValueError(which)

    def buildop(self, i, f=None, isherm=True):
        """Electronic jump operator lifted to the vibronic space
        (reference: pyqed/mol.py:1130)."""
        if f is None:
            op = jump(i, i, self.nel, isherm=False)
        else:
            op = jump(f, i, self.nel, isherm=isherm)
        return self.promote(op, "el")

    def coordinate(self, n):
        """n-th mode position operator in the full space
        (reference: pyqed/mol.py:1163)."""
        if self._x is None:
            self.buildH()
        return self.promote(self._x[n], "vib")

    def vertical(self, n=1):
        """Franck-Condon (vertical excitation) initial state
        (reference: pyqed/mol.py:1090)."""
        psi = basis(self.nstates, n)
        chi = basis(self.fock_dims[0], 0)
        for j in range(1, self.nmodes):
            chi = jnp.kron(chi, basis(self.fock_dims[j], 0))
        return jnp.kron(psi, chi)

    def groundstate(self):
        return self.vertical(n=0)

    def rdm_el(self, psi):
        """(reference: pyqed/mol.py:1222)."""
        p = jnp.reshape(psi, (self.nel, self.nvib))
        return p @ dag(p)

    def add_coupling(self, coupling):
        """(reference: pyqed/mol.py:1241)."""
        a, b = coupling[0]
        self.H = self.H + coupling[1] * jnp.kron(
            jump(a, b, self.nel), self.idm_vib.astype(self.H.dtype))
        return self.H

    def wavepacket_dynamics(self, method="RK4"):
        """(reference: pyqed/mol.py:1185)."""
        if self.H is None:
            self.buildH()
        sol = SESolver(self.H)
        sol.groundstate = self.groundstate()
        return sol

    def run(self, psi0=None, dt=0.01, nt=1, **kwargs):
        if self.H is None:
            self.buildH()
        if psi0 is None:
            psi0 = self.vertical(1)
        return SESolver(self.H).run(psi0=psi0, dt=dt, Nt=nt, **kwargs)
