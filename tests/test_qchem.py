"""Quantum chemistry golden tests.

References: Szabo & Ostlund 'Modern Quantum Chemistry' benchmark values for
H2 and HeH+ in STO-3G (the standard textbook numbers the reference package
also validates against via pyscf, which is unavailable here).
"""
import numpy as np
import pytest

from pyqed_tpu.qchem import Molecule, RHF, FCI, CISD, TDA, TDHF


def h2(R=1.4):
    return Molecule([("H", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, R))])


class TestIntegrals:
    def test_h2_overlap_szabo(self):
        """S12 = 0.6593 for H2/STO-3G at R=1.4 (Szabo-Ostlund Table 3.5)."""
        mol = h2()
        S, T, V, eri = mol.intor()
        assert np.isclose(float(S[0, 0]), 1.0, atol=1e-10)
        assert np.isclose(float(S[0, 1]), 0.6593, atol=2e-4)

    def test_h2_kinetic_szabo(self):
        """T11 = 0.7600, T12 = 0.2365 (Szabo-Ostlund Table 3.5)."""
        mol = h2()
        S, T, V, eri = mol.intor()
        assert np.isclose(float(T[0, 0]), 0.7600, atol=2e-4)
        assert np.isclose(float(T[0, 1]), 0.2365, atol=2e-4)

    def test_h2_eri_szabo(self):
        """(11|11) = 0.7746, (11|22)=0.5697, (11|12)=0.4441,
        (12|12)=0.2970 (Szabo-Ostlund Table 3.5 / eq 3.235)."""
        mol = h2()
        S, T, V, eri = mol.intor()
        assert np.isclose(float(eri[0, 0, 0, 0]), 0.7746, atol=2e-4)
        assert np.isclose(float(eri[0, 0, 1, 1]), 0.5697, atol=2e-4)
        assert np.isclose(float(eri[1, 0, 0, 0]), 0.4441, atol=2e-4)
        assert np.isclose(float(eri[1, 0, 1, 0]), 0.2970, atol=2e-4)


class TestRHF:
    def test_h2_energy_szabo(self):
        """E_RHF(H2/STO-3G, R=1.4) = -1.1167 hartree."""
        mf = RHF(h2()).run()
        assert mf.converged
        assert np.isclose(mf.e_tot, -1.1167, atol=2e-4), mf.e_tot

    def test_heh_cation(self):
        """E_RHF(HeH+/STO-3G, R=1.4632) = -2.8418 hartree with STANDARD
        STO-3G He exponents (Szabo-Ostlund's -2.8606 uses a scaled
        zeta_He = 2.0925 basis, not stock STO-3G)."""
        mol = Molecule([("He", (0, 0, 0)), ("H", (0, 0, 1.4632))], charge=1)
        mf = RHF(mol).run()
        assert np.isclose(mf.e_tot, -2.8418, atol=3e-4), mf.e_tot

    def test_h2o_runs(self):
        """Water STO-3G: E ~ -74.96 hartree (literature -74.9659)."""
        # experimental-ish geometry, bohr
        mol = Molecule([
            ("O", (0.0, 0.0, 0.2217)),
            ("H", (0.0, 1.4309, -0.8867)),
            ("H", (0.0, -1.4309, -0.8867)),
        ])
        mf = RHF(mol).run()
        assert mf.converged
        assert -75.1 < mf.e_tot < -74.8, mf.e_tot


class TestCI:
    def test_h2_fci(self):
        """FCI(H2/STO-3G, R=1.4) = -1.1373 hartree (well-known value)."""
        mf = RHF(h2()).run()
        fci = FCI(mf)
        E = fci.run()
        assert np.isclose(E[0], -1.1373, atol=3e-4), E[0]

    def test_h2_cisd_equals_fci(self):
        """For 2 electrons CISD == FCI."""
        mf = RHF(h2()).run()
        e_fci = FCI(mf).run()[0]
        e_cisd = CISD(mf).run()[0]
        assert np.isclose(e_fci, e_cisd, atol=1e-10)

    def test_fci_below_hf(self):
        mf = RHF(h2()).run()
        assert FCI(mf).run()[0] < mf.e_tot


class TestTDSCF:
    def test_h2_tda_excitation(self):
        """H2/STO-3G lowest singlet CIS excitation ~ 0.60 hartree
        (sigma->sigma*); check it is positive and TDHF <= TDA."""
        mf = RHF(h2()).run()
        e_tda = TDA(mf).run(nroots=1)
        e_rpa = TDHF(mf).run(nroots=1)
        assert e_tda[0] > 0
        assert e_rpa[0] <= e_tda[0] + 1e-12
        assert 0.3 < e_tda[0] < 1.0

    def test_triplet_below_singlet(self):
        mf = RHF(h2()).run()
        es = TDA(mf, singlet=True).run(nroots=1)[0]
        et = TDA(mf, singlet=False).run(nroots=1)[0]
        assert et < es


class TestUHF:
    def test_h_atom(self):
        """Hydrogen atom UHF/STO-3G: E = -0.4666 hartree (known value)."""
        from pyqed_tpu.qchem import Molecule, UHF
        mol = Molecule([("H", (0, 0, 0))], spin=1)
        mf = UHF(mol).run()
        assert mf.converged
        assert np.isclose(mf.e_tot, -0.46658, atol=2e-4), mf.e_tot
        assert np.isclose(mf.spin_square(), 0.75, atol=1e-8)

    def test_closed_shell_matches_rhf(self):
        from pyqed_tpu.qchem import Molecule, RHF, UHF
        mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))])
        e_r = RHF(mol).run().e_tot
        e_u = UHF(Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))])).run().e_tot
        assert np.isclose(e_r, e_u, atol=1e-8)

    def test_he_cation(self):
        """He+ UHF = exact 1-electron in this basis; compare to hcore eig."""
        from pyqed_tpu.qchem import Molecule, UHF
        import scipy.linalg as sla
        mol = Molecule([("He", (0, 0, 0))], charge=1, spin=1)
        mf = UHF(mol).run()
        S, T, V, eri = mol.intor()
        w = sla.eigh(np.asarray(T + V), np.asarray(S), eigvals_only=True)
        assert np.isclose(mf.e_tot, w[0], atol=1e-8)


class TestRXSDensity:
    """Core-excitation RXS (reference: pyqed/qchem/core.py:444) and
    transition charge/current densities
    (reference: pyqed/qchem/current_density.py)."""

    def _h2o(self):
        from pyqed_tpu.qchem import Molecule
        atoms = [("O", (0.0, 0.0, 0.0)),
                 ("H", (0.0, -1.43, 1.11)),
                 ("H", (0.0, 1.43, 1.11))]
        mol = Molecule(atoms, basis="sto-3g")
        mf = mol.RHF().run()
        return mol, mf

    def test_full_window_rxs_equals_tda(self):
        from pyqed_tpu.qchem import RXS
        from pyqed_tpu.qchem.tdscf import TDA
        mol, mf = self._h2o()
        td = TDA(mf); e_full = td.run(nroots=4)
        r = RXS(mf)
        w, _ = r.core_excitation(nstates=4)
        assert np.max(np.abs(np.asarray(e_full) - w)) < 1e-9

    def test_core_window_and_energy_range(self):
        from pyqed_tpu.qchem import RXS
        mol, mf = self._h2o()
        # O 1s core window: excitations from the lowest MO only
        r = RXS(mf, occidx=[0])
        w, v = r.core_excitation()
        assert w.min() > 18.0   # O K-edge ~ 20 Ha in STO-3G
        # energy_range picks the matching subset
        w2, _ = r.core_excitation(energy_range=(w[0] - 1e-6, w[0] + 1e-6))
        assert len(w2) == 1 and abs(w2[0] - w[0]) < 1e-12
        # oscillator strengths finite and some nonzero
        f = r.oscillator_strength()
        assert np.all(np.isfinite(f)) and np.any(f > 1e-4)

    def test_tdm_ao_representation(self):
        from pyqed_tpu.qchem import RXS
        mol, mf = self._h2o()
        r = RXS(mf)
        r.core_excitation(nstates=2)
        Dmo = r.tdm(0, "mo")
        Dao = r.tdm(0, "ao")
        # transition dipole from AO TDM == window-einsum dipole
        from pyqed_tpu.qchem.basis import dipole_matrix
        mu_ao = np.asarray(dipole_matrix(mf.bfs))      # (3, nao, nao)
        mu1 = np.einsum("kpq, pq -> k", mu_ao, Dao) * np.sqrt(2.0)
        mu2 = r.transition_dipole()[0]
        assert np.max(np.abs(mu1 - mu2)) < 1e-8

    def test_ao_gradients_finite_difference(self):
        from pyqed_tpu.qchem.density import ao_gradients
        from pyqed_tpu.qchem.dft import ao_values
        mol, mf = self._h2o()
        rng = np.random.default_rng(0)
        pts = rng.normal(scale=1.5, size=(20, 3))
        g = np.asarray(ao_gradients(mf.bfs, pts))
        h = 1e-6
        for ax in range(3):
            e = np.zeros(3); e[ax] = h
            fd = (np.asarray(ao_values(mf.bfs, pts + e))
                  - np.asarray(ao_values(mf.bfs, pts - e))) / (2 * h)
            assert np.max(np.abs(g[:, :, ax] - fd)) < 1e-6

    def test_current_density_continuity(self):
        """For a stationary-state superposition psi = (phi_i + i phi_a)
        the current from the TDM contraction equals Im[psi* grad psi]."""
        from pyqed_tpu.qchem.density import (transition_current_density,
                                             current_density_wavefunction)
        mol, mf = self._h2o()
        C = np.asarray(mf.mo_coeff)
        c = (C[:, 2] + 1j * C[:, 4]) / np.sqrt(2.0)
        gamma = np.outer(c.conj(), c)
        rng = np.random.default_rng(1)
        pts = rng.normal(scale=1.2, size=(30, 3))
        j1 = np.asarray(transition_current_density(mf.bfs, gamma, pts))
        j2 = np.asarray(current_density_wavefunction(mf.bfs, c, pts))
        assert np.max(np.abs(np.real(j1) - j2)) < 1e-10

    def test_density_cube_roundtrip(self, tmp_path):
        from pyqed_tpu.qchem import write_density_cube
        from pyqed_tpu.utils.io import read_cube
        mol, mf = self._h2o()
        D = np.asarray(mf.make_rdm1()) if hasattr(mf, "make_rdm1") else \
            2.0 * np.asarray(mf.mo_coeff)[:, :mf.nocc] @ \
            np.asarray(mf.mo_coeff)[:, :mf.nocc].T
        atoms = [("O", (0.0, 0.0, 0.0)),
                 ("H", (0.0, -1.43, 1.11)),
                 ("H", (0.0, 1.43, 1.11))]
        f = str(tmp_path / "rho.cube")
        rho = write_density_cube(f, atoms, mf.bfs, D, nx=12, ny=12, nz=12,
                                 margin=3.0)
        assert rho.shape == (12, 12, 12) and np.all(rho > -1e-12)
        atoms_r, cell_r, data_r, origin_r = read_cube(f)
        assert np.allclose(data_r, rho, rtol=1e-4, atol=1e-8)


class TestCIOverlap:
    """Cross-geometry CI overlaps and derivative couplings
    (reference: pyqed/qchem/ci_overlap.py, cisd_overlap.py)."""

    def _h2(self, r):
        from pyqed_tpu.qchem import Molecule
        return Molecule([("H", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, r))],
                        basis="sto-3g")

    def test_same_geometry_is_identity(self):
        from pyqed_tpu.qchem import wavefunction_overlap
        from pyqed_tpu.qchem.ci import FCI
        mf = self._h2(1.4).RHF().run()
        ci = FCI(mf); ci.run(nroots=3)
        O = wavefunction_overlap(mf, ci, mf, ci)
        assert np.max(np.abs(O - np.eye(3))) < 1e-8

    def test_displaced_overlap_smooth(self):
        from pyqed_tpu.qchem import wavefunction_overlap
        from pyqed_tpu.qchem.ci import FCI
        mf1 = self._h2(1.4).RHF().run()
        ci1 = FCI(mf1); ci1.run(nroots=2)
        o_prev = 1.0
        for d in (0.2, 0.05, 0.01):
            mf2 = self._h2(1.4 + d).RHF().run()
            ci2 = FCI(mf2); ci2.run(nroots=2)
            o = abs(np.asarray(wavefunction_overlap(mf1, ci1,
                                                    mf2, ci2))[0, 0])
            assert o < 1.0 + 1e-10
            assert o > o_prev - 1.0 + 0.5  # monotone toward 1
            o_prev = o
        assert o_prev > 0.9999

    def test_nac_antisymmetric(self):
        """Antisymmetry tau_mn = -tau_nm holds between NON-degenerate
        states (H2/STO-3G FCI: ground sigma_g^2 and the doubly excited
        sigma_u^2 at roots 0 and 5; the triplet manifold in between is
        degenerate, where finite-difference NAC is gauge-dependent)."""
        from pyqed_tpu.qchem import nonadiabatic_coupling
        tau = nonadiabatic_coupling(
            lambda r: self._h2(r), 1.4, None, dr=5e-3, nroots=6)
        # norm conservation for the non-degenerate states
        assert abs(tau[0, 0]) < 1e-4
        assert abs(tau[5, 5]) < 1e-4
        # antisymmetry of the 0<->5 coupling
        assert abs(tau[0, 5] + tau[5, 0]) < 1e-4
        # the sigma_g^2 <-> sigma_u^2 coupling is nonzero off equilibrium
        tau2 = nonadiabatic_coupling(
            lambda r: self._h2(r), 1.8, None, dr=5e-3, nroots=6)
        assert abs(tau2[0, 5]) > 1e-3


class TestMoleculeGeometryAPI:
    """Atom accessors + frames (reference: pyqed/qchem/mol.py —
    principle_axes/tofile are pass stubs there, zmat prints to stdout)."""

    def _water(self):
        from pyqed_tpu.qchem.mol import Molecule
        return Molecule([("O", (0.0, 0.0, 0.22)),
                         ("H", (0.0, 1.43, -0.89)),
                         ("H", (0.0, -1.43, -0.89))])

    def test_accessors(self):
        mol = self._water()
        assert mol.atom_symbols() == ["O", "H", "H"]
        assert list(mol.atom_charges()) == [8, 1, 1]
        assert mol.atom_charge(0) == 8
        assert np.allclose(mol.atom_coord(1), [0.0, 1.43, -0.89])
        m = mol.atom_mass_list()
        assert abs(m[0] - 15.999) < 0.01 and abs(m[1] - 1.008) < 0.01

    def test_molecular_frame_and_principal_axes(self):
        mol = self._water()
        mol.molecular_frame()
        assert np.allclose(mol.center_of_mass(), 0.0, atol=1e-12)
        w, v = mol.principle_axes()
        # planar molecule: largest moment = sum of the other two
        assert abs(w[2] - (w[0] + w[1])) < 1e-8
        assert np.allclose(v @ v.T, np.eye(3), atol=1e-12)

    def test_zmat(self):
        mol = self._water()
        lines = mol.zmat().splitlines()
        assert lines[0] == "O"
        r1 = float(lines[1].split()[2])
        assert abs(r1 - np.linalg.norm([0.0, 1.43, -1.11])) < 1e-4
        ang = float(lines[2].split()[4])
        assert 30.0 < ang < 45.0

    def test_eckart_frame_realigns_rotation(self):
        from pyqed_tpu.qchem.mol import Molecule
        from pyqed_tpu.qchem.geometry import eckart_conditions
        ref = self._water().molecular_frame()
        th = 0.3
        R = np.array([[1, 0, 0],
                      [0, np.cos(th), -np.sin(th)],
                      [0, np.sin(th), np.cos(th)]])
        rot = Molecule([(s, R @ x) for s, x in ref.atoms])
        rot.eckart_frame(ref)
        assert eckart_conditions(ref.atom_coords(), rot.atom_coords(),
                                 ref.atom_mass_list())
        assert np.abs(rot.atom_coords() - ref.atom_coords()).max() < 1e-12

    def test_tofile_roundtrip(self, tmp_path):
        from pyqed_tpu.units import au2angstrom
        mol = self._water()
        f = tmp_path / "w.xyz"
        mol.tofile(str(f))
        lines = f.read_text().splitlines()
        assert lines[0].strip() == "3"
        vals = np.array([[float(v) for v in l.split()[1:]]
                         for l in lines[2:]])
        assert np.allclose(vals, mol.atom_coords() * au2angstrom, atol=1e-8)
