"""Tests: GTO-basis Kohn-Sham DFT (SVWN) + one-electron spin-orbit
integrals (reference pyqed/qchem/mol.py RKS/UKS placeholders and
pyqed/qchem/soc.py pyscf driver)."""
import copy

import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.qchem.mol import Molecule
from pyqed_tpu.qchem.dft import (becke_grid, lda_exc_vxc, RKS, UKS,
                                 _eps_x)
from pyqed_tpu.qchem.basis import build_basis, _contract2, _nuclear_prim
from pyqed_tpu.qchem.soc import soc_integrals, _contract_dV


class TestBeckeGrid:
    def test_gaussian_density_norm_and_lda_exchange(self):
        """One-center grid: integrate a unit Gaussian density and its
        LDA exchange energy against the closed forms."""
        pts, w = becke_grid([("He", (0.0, 0.0, 0.0))])
        alpha = 1.3
        rho = ((2 * alpha / np.pi) ** 1.5
               * np.exp(-2 * alpha * np.sum(np.asarray(pts) ** 2, 1)))
        assert abs(float(jnp.sum(w * jnp.asarray(rho))) - 1.0) < 1e-9
        Cx = -0.75 * (3 / np.pi) ** (1 / 3)
        Ex_ana = Cx * (2 * alpha / np.pi) ** 2 \
            * (3 * np.pi / (8 * alpha)) ** 1.5
        Ex = float(jnp.sum(w * jnp.asarray(rho) * _eps_x(jnp.asarray(rho))))
        assert abs(Ex - Ex_ana) < 1e-10

    def test_two_center_partition(self):
        """Becke weights must re-assemble the full integral."""
        pts, w = becke_grid([("H", (0, 0, -0.7)), ("H", (0, 0, 0.7))],
                            n_rad=50, n_theta=12)
        p = np.asarray(pts)
        rho = (np.exp(-2 * np.linalg.norm(p - [0, 0, -0.7], axis=1))
               + np.exp(-2 * np.linalg.norm(p - [0, 0, 0.7], axis=1))) / np.pi
        assert abs(float(jnp.sum(w * jnp.asarray(rho))) - 2.0) < 1e-7


class TestKohnSham:
    def test_he_vs_radial_lda(self):
        """He SVWN: the exact (basis-free) LDA answer is E = -2.83480,
        eps_1s = -0.57042 (verified here against an independent radial
        finite-difference KS solver); 6-31G lands within ~9 mHa."""
        ks = RKS(Molecule([("He", (0.0, 0.0, 0.0))], basis="6-31g")).run()
        assert ks.converged
        assert abs(ks.e_tot - (-2.83480)) < 0.012
        assert abs(float(ks.mo_energy[0]) - (-0.57042)) < 0.02
        assert abs(ks.nelec_on_grid() - 2.0) < 1e-6

    def test_h2_binding(self):
        ks = RKS(Molecule([("H", (0, 0, -0.7)), ("H", (0, 0, 0.7))],
                          basis="6-31g")).run()
        assert ks.converged
        assert -1.14 < ks.e_tot < -1.12          # SVWN/6-31G H2
        # bound relative to two LSDA H atoms
        uks = UKS(Molecule([("H", (0.0, 0.0, 0.0))], spin=1,
                           basis="6-31g")).run()
        assert ks.e_tot < 2 * uks.e_tot - 0.05

    def test_h_atom_lsda(self):
        """Spin-polarized H atom: exact LSD gives -0.4787."""
        uks = UKS(Molecule([("H", (0.0, 0.0, 0.0))], spin=1,
                           basis="6-31g")).run()
        assert uks.converged
        assert abs(uks.e_tot - (-0.4787)) < 0.005


class TestSOC:
    def test_derivative_integrals_vs_finite_difference(self):
        """<d_y mu|1/r_C|d_z nu> == d^2/dA_y dB_z of the plain nuclear
        attraction integral (centers as parameters)."""
        atoms = [("C", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 2.0))]
        bfs = build_basis(atoms, "sto-3g")
        C = np.array([0.0, 0.0, 0.0])
        h = 2e-4
        ey, ez = np.array([0, h, 0.0]), np.array([0.0, 0, h])

        def V(i, j, dA, dB):
            b1, b2 = copy.deepcopy(bfs[i]), copy.deepcopy(bfs[j])
            b1.center = b1.center + dA
            b2.center = b2.center + dB
            return _contract2(_nuclear_prim, b1, b2, C)

        for (i, j) in [(3, 4), (3, 5), (5, 3), (0, 4)]:
            num = (V(i, j, ey, ez) - V(i, j, ey, -ez)
                   - V(i, j, -ey, ez) + V(i, j, -ey, -ez)) / (4 * h * h)
            ana = _contract_dV(bfs[i], bfs[j], C, 1, 2)
            assert abs(num - ana) < 5e-6

    def test_antisymmetry_and_selection_rules(self):
        atoms = [("C", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 2.0))]
        bfs = build_basis(atoms, "sto-3g")
        W = soc_integrals(bfs, atoms)
        for k in range(3):
            assert np.max(np.abs(W[k] + W[k].transpose())) < 1e-12
        # one-center 2p SOC must be positive (px, py, pz at 2, 3, 4)
        assert W[0, 3, 4] > 1.0
        # axial molecule: L_z couples only px <-> py
        nz = {tuple(ij) for ij in np.argwhere(np.abs(W[2]) > 1e-10)}
        assert nz == {(2, 3), (3, 2)}


class TestGeometry:
    def test_zmatrix_roundtrip(self):
        from pyqed_tpu.qchem.geometry import (zmatrix_to_cartesian,
                                              bond_length, bond_angle,
                                              dihedral)
        th = np.deg2rad(104.5)
        c = zmatrix_to_cartesian([("O",), ("H", 0, 1.81),
                                  ("H", 0, 1.81, 1, th)])
        assert abs(bond_length(c, 0, 1) - 1.81) < 1e-12
        assert abs(bond_angle(c, 1, 0, 2) - th) < 1e-12
        c2 = zmatrix_to_cartesian(
            [("O",), ("O", 0, 2.8), ("H", 0, 1.8, 1, np.deg2rad(100)),
             ("H", 1, 1.8, 0, np.deg2rad(100), 2, np.deg2rad(115))])
        assert abs(np.rad2deg(dihedral(c2, 2, 0, 1, 3)) - 115.0) < 1e-9

    def test_eckart_frame(self):
        from pyqed_tpu.qchem.geometry import (zmatrix_to_cartesian,
                                              eckart_frame,
                                              eckart_conditions)
        c = zmatrix_to_cartesian([("O",), ("H", 0, 1.81),
                                  ("H", 0, 1.81, 1, np.deg2rad(104.5))])
        m = np.array([16.0, 1.0, 1.0])
        rng = np.random.default_rng(0)
        Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        al, R, rmsd = eckart_frame(c, c @ Q.T + [1.0, -2.0, 0.5], m)
        assert rmsd < 1e-12
        al2, _, r2 = eckart_frame(
            c, (c + 0.02 * rng.normal(size=c.shape)) @ Q.T, m)
        assert eckart_conditions(c, al2, m, tol=1e-8)


class TestSobol:
    def test_qmc_beats_mc(self):
        import jax.numpy as jnp
        from pyqed_tpu.qmc.sobol import qmc_integrate
        f = lambda x: jnp.prod(jnp.cos(x))
        exact = np.sin(1.0) ** 4
        qv = qmc_integrate(f, [(0, 1)] * 4, n=4096)
        rng = np.random.default_rng(1)
        mcv = float(np.mean(np.prod(np.cos(rng.random((4096, 4))), 1)))
        assert abs(qv - exact) < 1e-4
        assert abs(qv - exact) < abs(mcv - exact) / 10
