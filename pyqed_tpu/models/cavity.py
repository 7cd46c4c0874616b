"""Cavity QED: single-mode cavity, composite systems, polaritons.

TPU-native counterpart of the reference cavity/polariton layer
(reference: pyqed/polariton/cavity.py — ``Composite:28``, ``Cavity:404``,
``Polariton:577`` (``getH:608`` length/velocity gauge + DSE + RWA),
``eigenstates:735`` photon fractions, ``get_cav_leak:726``; the older
duplicate pyqed/cavity.py is unified here per SURVEY.md §7).

Dense jnp throughout; tensor products via jnp.kron (operators are small),
eigen-decompositions on the MXU via jnp.linalg.eigh.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..ops.linalg import dag, ket2dm, transform, ptrace
from ..ops.operators import destroy, create, ham_ho, basis
from .mol import Mol


class Cavity:
    """Single-mode cavity (reference: pyqed/polariton/cavity.py:404)."""

    def __init__(self, freq, n_cav=None, x=None, decay=None, g=None,
                 quality_factor=None):
        self.freq = self.omega = self.omegac = freq
        self.resonance = freq
        self.ncav = self.n_cav = n_cav
        self.n = self.dim = n_cav
        self.idm = jnp.eye(n_cav)
        self.decay = decay
        self.quality_factor = quality_factor
        self._g = g
        self.H = self.getH()
        if x is not None:
            self.x = np.asarray(x)
            self.nx = len(x)

    @property
    def g(self):
        return self._g

    @g.setter
    def g(self, value):
        self._g = value

    def getH(self, zpe=False):
        return ham_ho(self.freq, self.n_cav, ZPE=zpe)

    def nonhermH(self):
        """H with cavity decay (reference: pyqed/polariton/cavity.py:451)."""
        omegac = self.omega - 0.5j * self.decay
        return ham_ho(omegac, self.ncav)

    def get_nonhermitianH(self):
        if self.quality_factor is None:
            raise ValueError("The quality factor cannot be None.")
        kappa = self.freq / 2.0 / self.quality_factor
        self.nonhermHmat = self.H - 1j * kappa * jnp.eye(self.ncav)
        return self.nonhermHmat

    get_nonhermH = get_nonhermitianH

    def annihilate(self):
        return destroy(self.n_cav)

    def create(self):
        return create(self.n_cav)

    def num(self):
        return jnp.diag(jnp.arange(self.n_cav, dtype=float)).astype(complex)

    get_number_operator = num

    def quadrature(self):
        a = self.annihilate()
        return (a + dag(a)) / jnp.sqrt(2.0)

    def vacuum(self):
        return basis(self.n_cav, 0)

    ground_state = vacuum

    def vacuum_dm(self):
        return ket2dm(self.vacuum())

    get_dm = vacuum_dm


class Composite(Mol):
    """Tensor product of two subsystems (reference:
    pyqed/polariton/cavity.py:28)."""

    def __init__(self, A, B):
        self.A = A
        self.B = B
        self.ida = A.idm
        self.idb = B.idm
        self.idm = jnp.kron(A.idm, B.idm)
        self.H = None
        self.nonhermH = None
        self.dim = A.dim * B.dim
        self.nstates = self.dim
        self.dims = [A.dim, B.dim]
        self.eigvals_ = None
        self.eigvecs_ = None
        self.gamma = None
        self.dephasing = 0.0
        self._edip = None
        self._edip_rms = None

    def getH(self, a_ops=None, b_ops=None, g=0):
        """H = H_A (x) I + I (x) H_B + sum_i g_i a_i (x) b_i
        (reference: pyqed/polariton/cavity.py:58)."""
        H = jnp.kron(self.A.H, self.idb) + jnp.kron(self.ida, self.B.H)
        if a_ops is not None:
            if not isinstance(a_ops, (list, tuple)):
                a_ops, b_ops, g = [a_ops], [b_ops], [g]
            for gi, a_op, b_op in zip(np.atleast_1d(g), a_ops, b_ops):
                H = H + gi * jnp.kron(a_op, b_op)
        self.H = H
        return H

    def promote(self, o, subspace="A"):
        """Lift an operator into the product space
        (reference: pyqed/polariton/cavity.py:144)."""
        if subspace in ("A", "a"):
            return jnp.kron(o, self.B.idm)
        elif subspace in ("B", "b"):
            return jnp.kron(self.A.idm, o)
        raise ValueError("The subspace option can only be A or B.")

    def promote_ops(self, ops, subspaces=None):
        if subspaces is None:
            subspaces = ["A"] * len(ops)
        return [self.promote(op, s) for op, s in zip(ops, subspaces)]

    def eigenstates(self, k: Optional[int] = None):
        if self.H is None:
            raise ValueError("Please call getH to compute the Hamiltonian first.")
        evals, evecs = jnp.linalg.eigh(self.H)
        self.eigvals_ = evals
        self.eigvecs_ = evecs
        if k is not None and k < self.dim:
            return evals[:k], evecs[:, :k]
        return evals, evecs

    def rdm(self, psi, which="A"):
        """Reduced density matrix of a pure state of the composite."""
        rho = ket2dm(jnp.asarray(psi))
        return ptrace(rho, self.dims, which="B" if which == "A" else "A")

    def spectrum(self):
        """(eigvals, eigvecs) of the composite — reference:
        pyqed/polariton/cavity.py Composite.spectrum."""
        if self.H is None:
            raise ValueError("Call getH() to compute the full Hamiltonian first.")
        return self.eigenstates()

    def transform_basis(self, a):
        """Operator from the product basis to the eigen (polariton)
        basis: U† a U (reference: pyqed/polariton/cavity.py)."""
        if self.eigvecs_ is None:
            self.eigenstates()
        return transform(a, self.eigvecs_)

    def purity(self, psi, which="A"):
        """tr(rdm^2) of a subsystem — 1 for a product state
        (reference: pyqed/polariton/cavity.py Composite.purity)."""
        r = self.rdm(psi, which=which)
        return jnp.real(jnp.trace(r @ r))

    def get_nonhermH(self, a_ops=None, b_ops=None, g=0):
        """Composite non-Hermitian H from the subsystems' nonhermH
        plus V_AB = sum_i g_i a_i (x) b_i (reference:
        pyqed/polariton/cavity.py Composite.get_nonhermH)."""
        ha = self.A.get_nonhermH() if hasattr(self.A, "get_nonhermH") \
            else self.A.nonhermH
        hb = self.B.get_nonhermH() if hasattr(self.B, "get_nonhermH") \
            else self.B.nonhermH
        H = (jnp.kron(ha, self.idb.astype(ha.dtype))
             + jnp.kron(self.ida.astype(hb.dtype), hb))
        if a_ops is not None:
            if not isinstance(a_ops, (list, tuple)):
                a_ops, b_ops, g = [a_ops], [b_ops], [g]
            for gi, a_op, b_op in zip(np.atleast_1d(g), a_ops, b_ops):
                H = H + gi * jnp.kron(a_op.astype(H.dtype),
                                      b_op.astype(H.dtype))
        self.nonhermH = H
        return H


class Polariton(Composite):
    """Molecule + cavity (reference: pyqed/polariton/cavity.py:577)."""

    def __init__(self, mol, cav, g=None, gauge="length"):
        super().__init__(mol, cav)
        self.mol = mol
        self.cav = cav
        self.dims = [mol.dim, cav.n_cav]
        self.dim = mol.dim * cav.n_cav
        self.nstates = self.dim
        self.gauge = gauge
        self._g = g
        self.H = None
        self.cav_leak = None

    @property
    def g(self):
        return self._g

    @g.setter
    def g(self, value):
        self._g = value

    def getH(self, RWA=False):
        """Light-matter Hamiltonian (reference:
        pyqed/polariton/cavity.py:608):

        length gauge:    H_int = i g mu (x) (a - a†) + g^2/w_c (mu·mu) (x) I
        (DSE included); RWA: g (sigma^+ (x) a + sigma^- (x) a†);
        velocity gauge:  p (x) A + I (x) A^2/2 with A = g/w_c (a + a†).
        """
        mol, cav = self.mol, self.cav
        omegac = cav.omegac
        hmol = mol.getH()
        hcav = cav.getH()
        edip = mol.edip
        Icav = cav.idm
        Imol = mol.idm
        a = cav.annihilate()
        ad = dag(a)
        qc = a + ad
        g = self._g

        if self.gauge in ("length", "dipole", "dip"):
            if RWA:
                hint = g * (jnp.kron(mol.raising, a)
                            + jnp.kron(mol.lowering, ad))
            else:
                DSE = g**2 / omegac * jnp.kron(edip @ edip, Icav)
                hint = 1j * g * jnp.kron(edip, a - ad) + DSE
        elif self.gauge == "velocity":
            if mol.E is None:
                mol.E = mol.eigenenergies()
            # p_ij = -i m w_ij x_ij (reference: pyqed/mol.py:298)
            p = -1j * (mol.E[:, None] - mol.E[None, :]) * edip
            A = g / omegac * qc
            hint = jnp.kron(p, A) + 0.5 * jnp.kron(Imol, A @ A)
        else:
            raise ValueError(f"unknown gauge {self.gauge!r}")

        self.H = (jnp.kron(hmol.astype(hint.dtype), Icav.astype(hint.dtype))
                  + jnp.kron(Imol.astype(hint.dtype), hcav.astype(hint.dtype))
                  + hint)
        return self.H

    get_ham = getH

    def setH(self, h):
        self.H = h

    def get_nonhermitianH(self, g=None, RWA=False):
        """(reference: pyqed/polariton/cavity.py:683)."""
        mol, cav = self.mol, self.cav
        if g is None:
            g = self._g
        hmol = mol.get_nonhermitianH()
        hcav = cav.get_nonhermitianH()
        Icav, Imol = cav.idm, mol.idm
        if RWA:
            hint = g * (jnp.kron(mol.raising, cav.annihilate())
                        + jnp.kron(mol.lowering, cav.create()))
        else:
            hint = g * jnp.kron(mol.dip, cav.create() + cav.annihilate())
        H = (jnp.kron(hmol, Icav.astype(hmol.dtype))
             + jnp.kron(Imol.astype(hcav.dtype), hcav) + hint)
        self.nonhermH = H
        return H

    def get_dm(self):
        """Product initial density matrix: molecular ground state x
        cavity vacuum (reference: pyqed/polariton/cavity.py)."""
        return jnp.kron(self.mol.get_dm(), self.cav.vacuum_dm())

    def get_edip(self, basis="product"):
        return jnp.kron(self.mol.edip, self.cav.idm)

    get_dip = get_edip

    def get_cav_leak(self):
        """Collapse operator for cavity decay
        (reference: pyqed/polariton/cavity.py:726)."""
        if self.cav_leak is None:
            self.cav_leak = jnp.kron(self.mol.idm, self.cav.annihilate())
        return self.cav_leak

    def eigenstates(self, k: Optional[int] = None):
        """Polariton spectrum + photonic fractions
        (reference: pyqed/polariton/cavity.py:735)."""
        if self.H is None:
            raise ValueError("Please call getH() to compute the Hamiltonian first.")
        evals, evecs = jnp.linalg.eigh(self.H)
        num_op = jnp.kron(self.mol.idm, self.cav.num())
        n_ph = jnp.real(jnp.einsum("ik, ij, jk -> k",
                                   evecs.conj(), num_op, evecs))
        self.eigvals_ = evals
        self.eigvecs_ = evecs
        if k is not None and k < self.dim:
            return evals[:k], evecs[:, :k], n_ph[:k]
        return evals, evecs, n_ph

    def promote_op(self, a, kind="mol"):
        if kind in ("mol", "m"):
            return jnp.kron(a, self.cav.idm)
        elif kind in ("cav", "c"):
            return jnp.kron(self.mol.idm, a)
        raise ValueError(kind)

    def rdm_photon(self, psi):
        """Reduced photon density matrix."""
        return ptrace(ket2dm(jnp.asarray(psi)), self.dims, which="A")

    def transform_basis(self, a):
        if self.eigvecs_ is None:
            self.eigenstates()
        return transform(a, self.eigvecs_)

    def driven_dynamics(self, psi0, pulse, dt=0.001, nt=1, e_ops=None,
                        nout=1, t0=0.0):
        from .mol import SESolver
        return SESolver(self.H).run(psi0=psi0, dt=dt, Nt=nt, e_ops=e_ops,
                                    nout=nout, t0=t0, pulse=pulse,
                                    edip=self.get_edip())


def QRM(omega0, omegac, ncav=2):
    """Quantum Rabi model / Jaynes-Cummings factory (reference:
    pyqed/cavity.py:741 ``QRM``): a two-level atom with transition
    frequency ``omega0`` and sigma_x dipole coupled to an ``ncav``-level
    cavity at ``omegac``.  Returns a :class:`Polariton`; call
    ``getH(RWA=...)`` for the Rabi (False) or Jaynes-Cummings (True)
    Hamiltonian."""
    from .mol import Mol
    from ..ops.operators import pauli
    s0, sx, sy, sz = pauli()
    hmol = 0.5 * omega0 * (-sz + s0)
    mol = Mol(hmol, edip=sx)
    cav = Cavity(omegac, ncav)
    return Polariton(mol, cav)
