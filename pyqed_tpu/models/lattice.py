"""Lattice models: tight-binding chains, Fermi-/Bose-Hubbard, Jordan-Wigner.

TPU-native counterpart of the reference lattice layer
(reference: pyqed/lattice/hubbard.py — ``FermiHubbard:30`` (JWT + exact
diagonalization), ``BoseHubbard:222``; pyqed/qchem/jordan_wigner/).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..ops.linalg import dag, tensor
from ..ops.operators import destroy, pauli


def jordan_wigner_ops(nmodes):
    """Fermionic annihilation operators on nmodes spin-orbitals via JWT:
    c_j = (prod_{k<j} Z_k) sigma^-_j
    (reference: pyqed/qchem/jordan_wigner/spinful.py:231)."""
    s0, sx, sy, sz = pauli()
    sm = jnp.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)  # |0><1|
    ops = []
    for j in range(nmodes):
        factors = [sz] * j + [sm] + [s0] * (nmodes - j - 1)
        ops.append(tensor(factors))
    return ops


class FermiHubbard:
    """Spin-half Fermi-Hubbard chain by JWT + dense diagonalization
    (reference: pyqed/lattice/hubbard.py:30).

    H = -t sum_{<ij>s} (c†_is c_js + hc) + U sum_i n_iu n_id - mu sum_i n_i
    Ordering of JW modes: (site0 up, site0 dn, site1 up, ...).
    """

    def __init__(self, t, U, nsites, filling=None, nelec=None, mu=None):
        self.t = t
        self.U = U
        self.mu = mu or 0.0
        self.L = self.nsites = nsites
        self.d = 4
        self.nelec = nelec
        self.H = None
        self.e_tot = None
        self.eigvecs = None

    def jordan_wigner(self):
        """(reference: pyqed/lattice/hubbard.py:115)."""
        n = 2 * self.nsites
        c = jordan_wigner_ops(n)
        cd = [dag(op) for op in c]

        def up(i):
            return 2 * i

        def dn(i):
            return 2 * i + 1

        H = 0.0
        for i in range(self.nsites - 1):
            for s in (0, 1):
                a, b = 2 * i + s, 2 * (i + 1) + s
                H = H - self.t * (cd[a] @ c[b] + cd[b] @ c[a])
        for i in range(self.nsites):
            nu = cd[up(i)] @ c[up(i)]
            nd = cd[dn(i)] @ c[dn(i)]
            H = H + self.U * nu @ nd - self.mu * (nu + nd)
        self.H = H
        self._c = c
        return H

    def number_operator(self):
        if self.H is None:
            self.jordan_wigner()
        return sum(dag(op) @ op for op in self._c)

    def run(self, nstates=1):
        if self.H is None:
            self.jordan_wigner()
        w, v = jnp.linalg.eigh(self.H)
        if self.nelec is not None:
            # filter to the fixed-particle-number sector
            N = self.number_operator()
            occ = jnp.real(jnp.einsum("ik, ij, jk -> k", v.conj(), N, v))
            mask = jnp.abs(occ - self.nelec) < 1e-8
            idx = jnp.nonzero(mask, size=int(jnp.sum(mask)))[0]
            w, v = w[idx], v[:, idx]
        self.e_tot = w[:nstates]
        self.eigvecs = v[:, :nstates]
        return self.e_tot


class BoseHubbard:
    """Bose-Hubbard chain (reference stub: pyqed/lattice/hubbard.py:222,
    completed here): H = -t sum (b†_i b_{i+1} + hc) + U/2 sum n(n-1) -
    mu sum n with local truncation nmax."""

    def __init__(self, t, U, nsites, nmax=3, mu=0.0):
        self.t = t
        self.U = U
        self.mu = mu
        self.nsites = nsites
        self.nmax = nmax
        self.H = None

    def buildH(self):
        d = self.nmax + 1
        b1 = destroy(d)
        n1 = dag(b1) @ b1
        I = jnp.eye(d, dtype=b1.dtype)

        def embed(op, i):
            ops = [I] * self.nsites
            ops[i] = op
            return tensor(ops)

        bs = [embed(b1, i) for i in range(self.nsites)]
        H = 0.0
        for i in range(self.nsites - 1):
            H = H - self.t * (dag(bs[i]) @ bs[i + 1] + dag(bs[i + 1]) @ bs[i])
        for i in range(self.nsites):
            ni = embed(n1, i)
            H = H + 0.5 * self.U * ni @ (ni - embed(I, i)) - self.mu * ni
        self.H = H
        return H

    def run(self, nstates=1):
        if self.H is None:
            self.buildH()
        w, v = jnp.linalg.eigh(self.H)
        return w[:nstates]
