"""Nuclear Hessians and harmonic vibrational analysis.

TPU-native counterpart of the reference vibrational layer
(reference: pyqed/qchem/hessian.py:26 ``Hessian`` + vibration.py —
mass-weighted normal-mode analysis; the reference differentiates
pyscf energies, here the in-house RHF is differentiated numerically).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from .mol import Molecule
from ..units import au2wavenumber, atomic_mass


def scf_energy(atoms, basis="sto-3g"):
    mol = Molecule(atoms, basis=basis)
    return mol.RHF().run().e_tot


class Hessian:
    """Numerical (central-difference) Hessian of the RHF energy.

    Parameters
    ----------
    atoms : [(symbol, xyz)] equilibrium-ish geometry (bohr).
    basis : basis-set name.
    step : displacement (bohr).
    """

    def __init__(self, atoms, basis="sto-3g", step=5e-3):
        self.atoms = [(s, np.asarray(x, dtype=float)) for s, x in atoms]
        self.basis = basis
        self.step = step
        self.natm = len(self.atoms)

    def _geom(self, disp):
        disp = disp.reshape(self.natm, 3)
        return [(s, x + d) for (s, x), d in zip(self.atoms, disp)]

    def run(self):
        """(3N, 3N) Cartesian Hessian by double central differences."""
        n = 3 * self.natm
        h = self.step
        H = np.zeros((n, n))
        E0 = scf_energy(self.atoms, self.basis)
        # diagonal
        for i in range(n):
            d = np.zeros(n)
            d[i] = h
            Ep = scf_energy(self._geom(d), self.basis)
            Em = scf_energy(self._geom(-d), self.basis)
            H[i, i] = (Ep - 2 * E0 + Em) / h ** 2
        # off-diagonal
        for i in range(n):
            for j in range(i):
                d = np.zeros(n)
                d[i] = h
                d[j] = h
                Epp = scf_energy(self._geom(d), self.basis)
                d[j] = -h
                Epm = scf_energy(self._geom(d), self.basis)
                d[i] = -h
                Emm = scf_energy(self._geom(d), self.basis)
                d[j] = h
                Emp = scf_energy(self._geom(d), self.basis)
                H[i, j] = H[j, i] = (Epp - Epm - Emp + Emm) / (4 * h ** 2)
        self.hessian = H
        return H

    def frequencies(self):
        """Harmonic frequencies (cm^-1) from the mass-weighted Hessian;
        the 5/6 smallest |w| are translations/rotations
        (reference: pyqed/qchem/vibration.py)."""
        if not hasattr(self, "hessian"):
            self.run()
        masses = np.repeat(
            [atomic_mass[s.upper()] * 1822.888486 for s, _ in self.atoms], 3)
        M = 1.0 / np.sqrt(masses)
        Hmw = self.hessian * np.outer(M, M)
        w2, modes = np.linalg.eigh(Hmw)
        freqs = np.sign(w2) * np.sqrt(np.abs(w2)) * au2wavenumber
        self.freqs_cm = freqs
        self.modes = modes
        return freqs

    def vibrational_frequencies(self, linear=None):
        """Only the genuine vibrations (drops 3N-6 or 3N-5 zeros)."""
        freqs = self.frequencies()
        nzero = 5 if (linear if linear is not None
                      else self.natm == 2) else 6
        return np.sort(np.abs(freqs))[nzero:]
