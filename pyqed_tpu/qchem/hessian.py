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

    def _gradient(self, atoms):
        """Flat (3N,) ANALYTIC RHF gradient at ``atoms`` (one SCF)."""
        from .grad import rhf_gradient
        mol = Molecule(atoms, basis=self.basis)
        mf = mol.RHF().run()
        if not mf.converged:
            raise RuntimeError("SCF failed to converge during Hessian "
                               "displacement")
        return np.asarray(rhf_gradient(mf)).reshape(-1)

    def run(self, scheme="grad"):
        """(3N, 3N) Cartesian Hessian.

        scheme='grad' (default): central differences of the ANALYTIC
        gradient — 2·3N SCF runs and O(h²) error on FORCES (the better
        conditioned quantity).  scheme='energy': the round-2 double
        central differences of the energy — O((3N)²) SCF runs, kept as
        the independent cross-check.  (The reference differentiates
        pyscf energies; its own Hessian class is a skeleton —
        pyqed/qchem/hessian.py:26.)
        """
        n = 3 * self.natm
        h = self.step
        H = np.zeros((n, n))
        if scheme == "grad":
            for i in range(n):
                d = np.zeros(n)
                d[i] = h
                gp = self._gradient(self._geom(d))
                gm = self._gradient(self._geom(-d))
                H[:, i] = (gp - gm) / (2 * h)
            H = 0.5 * (H + H.T)       # symmetrize the FD remainder
            self.hessian = H
            return H
        if scheme != "energy":
            raise ValueError(f"scheme {scheme!r}: use 'grad' or 'energy'")
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

    # ---------------------------------------------------- IR intensities
    def _masses_au(self):
        return np.repeat(
            [atomic_mass[s.upper()] * 1822.888486 for s, _ in self.atoms], 3)

    def dip_derivative(self, mode_id, delta=0.01):
        """Dipole derivative d mu / d Q along mass-weighted normal mode
        ``mode_id`` by central finite difference (reference:
        pyqed/qchem/hessian.py:203 ``dip_derivative`` — one-sided FD of
        a pyscf RKS dipole there; central FD of the in-house RHF dipole
        here).  Q in mass-weighted atomic units (bohr sqrt(m_e));
        returns the (3,) derivative in a.u."""
        if not hasattr(self, "modes"):
            self.frequencies()
        q = np.asarray(self.modes[:, mode_id], dtype=float)
        dR = (q / np.sqrt(self._masses_au())).reshape(self.natm, 3)

        def dip(sign):
            geom = [(s, x + sign * delta * d)
                    for (s, x), d in zip(self.atoms, dR)]
            mf = Molecule(geom, basis=self.basis).RHF().run()
            return mf.dip_moment()

        return (dip(+1.0) - dip(-1.0)) / (2.0 * delta)

    def infrared(self, linear=None, delta=0.01, omegas=None, lw=5.0):
        """Double-harmonic IR: frequencies (cm^-1) + intensities
        |d mu/d Q_i|^2 for each genuine vibration (the reference's
        ``infrared`` is a ``pass`` stub, pyqed/qchem/hessian.py:240 —
        made real here).  With ``omegas`` (cm^-1 grid) also returns the
        Lorentzian-broadened spectrum with width ``lw`` (cm^-1).
        Returns (freqs_cm, intensities[, spectrum])."""
        freqs = self.frequencies()
        nzero = 5 if (linear if linear is not None
                      else self.natm == 2) else 6
        order = np.argsort(np.abs(freqs))
        vib = order[nzero:]
        vib = vib[np.argsort(freqs[vib])]
        nus = freqs[vib]
        inten = np.array([float(np.sum(self.dip_derivative(i, delta) ** 2))
                          for i in vib])
        if omegas is None:
            return nus, inten
        w = np.asarray(omegas, dtype=float)
        spec = np.zeros_like(w)
        for nu, I in zip(nus, inten):
            spec += I * (lw / np.pi) / ((w - nu) ** 2 + lw ** 2)
        return nus, inten, spec

    def polarizability_derivative(self, mode_id, delta=0.02):
        """d alpha / d Q along mass-weighted normal mode ``mode_id``
        (central FD of the finite-field RHF polarizability).  Returns
        (3, 3) in a.u."""
        if not hasattr(self, "modes"):
            self.frequencies()
        q = np.asarray(self.modes[:, mode_id], dtype=float)
        dR = (q / np.sqrt(self._masses_au())).reshape(self.natm, 3)

        def alpha(sign):
            geom = [(s, x + sign * delta * d)
                    for (s, x), d in zip(self.atoms, dR)]
            return Molecule(geom, basis=self.basis).RHF().run() \
                .polarizability()

        return (alpha(+1.0) - alpha(-1.0)) / (2.0 * delta)

    def raman(self, linear=None, delta=0.02):
        """Raman activities per vibration in the Placzek double-harmonic
        approximation: 45 a'^2 + 7 gamma'^2 with a' the isotropic and
        gamma' the anisotropic polarizability derivative invariants
        (completes the reference's vibrational-spectroscopy layer; its
        Raman path does not exist).  Returns (freqs_cm, activities)."""
        freqs = self.frequencies()
        nzero = 5 if (linear if linear is not None
                      else self.natm == 2) else 6
        order = np.argsort(np.abs(freqs))
        vib = order[nzero:]
        vib = vib[np.argsort(freqs[vib])]
        acts = []
        for i in vib:
            dA = self.polarizability_derivative(i, delta)
            a = np.trace(dA) / 3.0
            g2 = 0.5 * (3.0 * np.sum(dA * dA) - (np.trace(dA)) ** 2)
            acts.append(45.0 * a * a + 7.0 * g2)
        return freqs[vib], np.array(acts)
