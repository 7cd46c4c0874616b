"""Shin-Metiu model with two explicit electrons in 1D.

TPU-native counterpart of the reference's two-electron Shin-Metiu
model (reference: pyqed/models/ShinMetiu2e1d.py:223 ``ShinMetiu1d`` —
proton between two fixed ions, two soft-Coulomb electrons;
``single_point:369`` exact two-electron diagonalization,
``potential_energy:497``, ``pes:518``).

The reference's per-grid-point double loop building V(x, y) becomes a
broadcast meshgrid evaluation; the Born-Oppenheimer scan over proton
positions is a batched sequence of dense eigensolves.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..units import au2angstrom
from ..qchem.dvr import soft_coulomb, MoleculeDVR, RHF1D
from ..grid.dvr import SineDVR


class ShinMetiu2e1d:
    """Proton-coupled two-electron transfer model.

    Two fixed ions at ±L/2 and a mobile proton at R, all charge +1;
    two electrons interacting through erf-screened Coulomb terms
    (screenings: Rf for the fixed ions, Rc for the proton, Re for e-e;
    reference defaults ShinMetiu2e1d.py:233-241).
    """

    def __init__(self, nstates=3, spin=0):
        self.Rc = 1.5 / au2angstrom
        self.Rf = 1.5 / au2angstrom
        self.Re = (2.5 if spin == 0 else 1.5) / au2angstrom
        self.L = 10.0 / au2angstrom
        self.left = -self.L / 2
        self.right = +self.L / 2
        self.nstates = nstates
        self.nelec = 2
        self.spin = spin
        self.x = None

    def create_grid(self, domain, nx):
        dvr = SineDVR(*domain, nx)
        self.dvr = dvr
        self.x = np.asarray(dvr.x)
        self.nx = nx
        self.domain = domain
        return self.x

    # ------------------------------------------------------- potentials
    def v_en_fixed(self, r):
        return (-soft_coulomb(np.abs(r - self.left), self.Rf)
                - soft_coulomb(np.abs(r - self.right), self.Rf))

    def v_en_proton(self, r, R):
        return -soft_coulomb(np.abs(r - R), self.Rc)

    def energy_nuc(self, R):
        """(reference: ShinMetiu2e1d.py:491)."""
        return (1.0 / abs(R - self.left) + 1.0 / abs(R - self.right)
                + 1.0 / self.L)

    # ------------------------------------------------------ single point
    def single_point(self, R, num_eigs=None):
        """Exact two-electron BO energies/states at proton position R
        (reference: ShinMetiu2e1d.py:369). Returns (w, u) with u columns
        on the (x1, x2) product grid; energies INCLUDE the
        nuclear-repulsion constant (reference convention)."""
        if self.x is None:
            raise ValueError("call create_grid(domain, nx) first")
        x = self.x
        nx = self.nx
        T1 = np.asarray(self.dvr.t())
        X1, X2 = np.meshgrid(x, x, indexing="ij")
        v = (np.asarray(self.v_en_fixed(X1)) + np.asarray(
            self.v_en_fixed(X2))
            + np.asarray(self.v_en_proton(X1, R))
            + np.asarray(self.v_en_proton(X2, R))
            + np.asarray(soft_coulomb(np.abs(X1 - X2), self.Re)))
        H = (np.kron(T1, np.eye(nx)) + np.kron(np.eye(nx), T1)
             + np.diag(v.ravel()))
        w, u = np.linalg.eigh(H)
        w = w + self.energy_nuc(R)
        k = num_eigs or self.nstates
        return w[:k], u[:, :k]

    def exchange_symmetry(self, u):
        """+1 (singlet spatial) / −1 (triplet spatial) of eigencolumns."""
        nx = self.nx
        out = []
        for k in range(u.shape[1]):
            psi = u[:, k].reshape(nx, nx)
            s = np.sum(psi * psi.T) / np.sum(psi * psi)
            out.append(float(np.sign(s)))
        return np.array(out)

    def pes(self, Rs, num_eigs=None):
        """Born-Oppenheimer curves over proton positions
        (reference: ShinMetiu2e1d.py:518)."""
        return np.stack([self.single_point(R, num_eigs)[0] for R in Rs])

    # ------------------------------------------------------ HF reference
    def scf(self, R, nx=None):
        """Mean-field single point via the DVR RHF layer (reference
        path: ShinMetiu2e1d.py:932 ``RHF1D(mol)``). Uses the fixed-ion
        screening for every center (MoleculeDVR convention)."""
        mol = MoleculeDVR([(1, [self.left]), (1, [self.right]),
                           (1, [float(R)])], charge=1,
                          Rf=self.Rf, Re=self.Re)
        mf = RHF1D(mol, domain=self.domain, nx=nx or self.nx)
        mf.run()
        return mf


class ShinMetiu3d:
    """Shin-Metiu model in full 3D: one electron on an (x, y, z) grid,
    a mobile proton at 3D position R between two fixed ions at ±L/2 x̂
    (reference: pyqed/models/ShinMetiu3d.py:50 — softened Coulomb
    1/sqrt(a + r²) and the (|R|/R0)^4 bounding term).

    Single points use a matrix-free Lanczos (scipy eigsh) with the
    kinetic matvec applied as per-dimension tensordots — no dense
    (nx ny nz)² Hamiltonian.
    """

    def __init__(self, nstates=3):
        self.a = 0.5
        self.b = 10.0
        self.R0 = 3.5
        self.L = 4 * np.sqrt(3) / 5
        self.left = np.array([-self.L / 2, 0.0, 0.0])
        self.right = np.array([+self.L / 2, 0.0, 0.0])
        self.nstates = nstates
        self.x = None

    def create_grid(self, domain, nx):
        """domain: [(x0,x1), (y0,y1), (z0,z1)], nx points per dim."""
        self.dvrs = [SineDVR(*d, nx) for d in domain]
        self.grids = [np.asarray(d.x) for d in self.dvrs]
        self.x, self.y, self.z = self.grids
        self.nx = nx
        return self.grids

    def v_en(self, r2):
        """−1/sqrt(a + |r−R|²) summed over ions, broadcast on the grid;
        r2: squared distances array."""
        return -1.0 / np.sqrt(self.a + r2)

    def potential_grid(self, R):
        X, Y, Z = np.meshgrid(*self.grids, indexing="ij")
        R = np.asarray(R, dtype=float)

        def d2(Rc):
            return ((X - Rc[0]) ** 2 + (Y - Rc[1]) ** 2
                    + (Z - Rc[2]) ** 2)

        v = (self.v_en(d2(self.left)) + self.v_en(d2(self.right))
             + self.v_en(d2(R)))
        vnn = (1 / np.sqrt(self.b + np.sum((R - self.left) ** 2))
               + 1 / np.sqrt(self.b + np.sum((R - self.right) ** 2))
               + 1 / np.sqrt(self.b + self.L ** 2))
        v = v + vnn + (np.linalg.norm(R) / self.R0) ** 4
        return v

    def single_point(self, R, num_eigs=None):
        """(reference: ShinMetiu3d.py:98): BO energies at proton R via
        matrix-free Lanczos."""
        import scipy.sparse.linalg as sla
        v = self.potential_grid(R)
        Ts = [np.asarray(d.t()) for d in self.dvrs]
        nx = self.nx
        shape = (nx, nx, nx)

        def matvec(p):
            p = p.reshape(shape)
            out = v * p
            out = out + np.tensordot(Ts[0], p, axes=([1], [0]))
            out = out + np.moveaxis(
                np.tensordot(Ts[1], p, axes=([1], [1])), 0, 1)
            out = out + np.moveaxis(
                np.tensordot(Ts[2], p, axes=([1], [2])), 0, 2)
            return out.reshape(-1)

        N = nx ** 3
        A = sla.LinearOperator((N, N), matvec=matvec)
        k = num_eigs or self.nstates
        w, u = sla.eigsh(A, k=k, which="SA")
        return w, u

    def pes(self, Rs, num_eigs=None):
        """(reference: ShinMetiu3d.py:185)."""
        return np.stack([self.single_point(np.asarray(R), num_eigs)[0]
                         for R in Rs])
