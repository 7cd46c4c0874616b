"""Molecule container and integral driver.

TPU-native counterpart of the reference's qchem Molecule
(reference: pyqed/qchem/mol.py:817 — geometry, charge, basis dispatch to
RHF/UHF; Z-matrix/Eckart utilities there are geometry helpers).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from .basis import (
    ATOMIC_NUMBER, build_basis, overlap_matrix, kinetic_matrix,
    nuclear_matrix, eri_tensor, nuclear_repulsion,
)
from ..units import au2angstrom


class Molecule:
    """(reference: pyqed/qchem/mol.py:817).

    atoms: list of (symbol, (x, y, z)); unit='bohr'|'angstrom'.
    """

    def __init__(self, atoms: Sequence[Tuple], charge=0, spin=0,
                 basis="sto-3g", unit="bohr", spherical=False):
        scale = 1.0 if unit.lower().startswith("b") else 1.0 / au2angstrom
        self.atoms = [(s, np.asarray(x, dtype=float) * scale)
                      for (s, x) in atoms]
        self.charge = charge
        self.spin = spin
        self.basis_name = basis
        self.spherical = bool(spherical)
        self.nelec = sum(ATOMIC_NUMBER[s] for s, _ in self.atoms) - charge
        self.bfs = build_basis(self.atoms, basis)
        # pure (real-spherical) angular functions: keep the Cartesian bfs
        # for integral evaluation and contract through csph everywhere
        # (chi_sph = csph @ chi_cart); L<2 shells pass through unchanged.
        if self.spherical:
            from .basis import spherical_transform
            self.csph = spherical_transform(self.bfs)
            self.nao = self.csph.shape[0]
        else:
            self.csph = None
            self.nao = len(self.bfs)
        self._ints = None

    @property
    def natm(self):
        return len(self.atoms)

    def energy_nuc(self):
        return nuclear_repulsion(self.atoms)

    def intor(self):
        """Compute and cache (S, T, V, ERI) as jnp arrays (in the pure
        spherical AO basis when ``spherical=True``)."""
        if self._ints is None:
            S = overlap_matrix(self.bfs)
            T = kinetic_matrix(self.bfs)
            V = nuclear_matrix(self.bfs, self.atoms)
            eri = eri_tensor(self.bfs)
            if self.csph is not None:
                from .basis import transform_eri
                C = self.csph
                S, T, V = (C @ M @ C.T for M in (S, T, V))
                eri = transform_eri(C, eri)
            self._ints = tuple(jnp.asarray(x) for x in (S, T, V, eri))
        return self._ints

    def RHF(self, **kwargs):
        from .scf import RHF
        return RHF(self, **kwargs)

    def UHF(self, **kwargs):
        from .scf import UHF
        return UHF(self, **kwargs)

    def RKS(self, xc="svwn", **kwargs):
        """Restricted Kohn-Sham dispatch (reference: pyqed/qchem/mol.py:817
        ``Mole.RKS``)."""
        from .dft import RKS
        return RKS(self, xc=xc, **kwargs)

    def UKS(self, xc="svwn", **kwargs):
        from .dft import UKS
        return UKS(self, xc=xc, **kwargs)

    def FCI(self, **kwargs):
        from .ci import FCI
        return FCI(self.RHF().run(), **kwargs)

    def center_of_mass(self):
        from ..units import atomic_mass, amu2au
        masses = np.array([atomic_mass[s.upper()] for s, _ in self.atoms])
        coords = np.array([x for _, x in self.atoms])
        return (masses[:, None] * coords).sum(0) / masses.sum()

    def inertia_tensor(self):
        from ..units import atomic_mass
        masses = np.array([atomic_mass[s.upper()] for s, _ in self.atoms])
        coords = np.array([x for _, x in self.atoms]) - self.center_of_mass()
        I = np.zeros((3, 3))
        for m, r in zip(masses, coords):
            I += m * (np.dot(r, r) * np.eye(3) - np.outer(r, r))
        return I
