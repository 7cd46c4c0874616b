"""Dipole moments, finite-field hook, and IR intensities
(reference: pyqed/qchem/hessian.py:203 dip_derivative; :240 infrared is
a pass stub there)."""
import numpy as np
import pytest


def _hf_mol():
    from pyqed_tpu.qchem import Molecule
    return Molecule([("H", (0.0, 0.0, 0.0)), ("F", (0.0, 0.0, 1.733))],
                    basis="sto-3g")


class TestDipole:
    def test_dip_moment_equals_finite_field_energy_derivative(self):
        """First-principles pin: mu_z = -dE/d(eps) with H' = eps * z
        (electronic) plus the constant nuclear shift -eps*sum Z R_z —
        checks sign conventions, density factor 2, and the AO dipole
        integrals all at once."""
        from pyqed_tpu.qchem import Molecule
        from pyqed_tpu.qchem.scf import RHF

        mol = _hf_mol()
        mf = RHF(mol).run()
        mu = mf.dip_moment()
        zint = np.asarray(mf.dipole_integrals())[2]
        ZR = float(np.asarray(mol.atom_charges(), float)
                   @ np.asarray(mol.atom_coords())[:, 2])
        eps = 2e-4
        Es = []
        for s in (+1, -1):
            mfe = RHF(mol, extra_hcore=s * eps * zint).run()
            Es.append(mfe.e_tot - s * eps * ZR)
        mu_ff = -(Es[0] - Es[1]) / (2 * eps)
        assert abs(mu[2] - mu_ff) < 1e-6
        assert abs(mu[0]) < 1e-10 and abs(mu[1]) < 1e-10

    def test_debye_conversion(self):
        mf = _hf_mol().RHF().run()
        au = mf.dip_moment()
        D = mf.dip_moment(unit="debye")
        assert np.allclose(D, au * 2.541746473)


class TestInfrared:
    def test_h2_is_ir_silent_hf_is_active(self):
        """Symmetry pin: the homonuclear stretch carries NO dipole
        derivative; the heteronuclear one does."""
        from pyqed_tpu.qchem.hessian import Hessian

        h2 = Hessian([("H", (0, 0, 0.0)), ("H", (0, 0, 1.4))],
                     basis="sto-3g")
        nus, inten = h2.infrared()
        assert len(nus) == 1
        assert inten[0] < 1e-10

        hf = Hessian([("H", (0, 0, 0.0)), ("F", (0, 0, 1.733))],
                     basis="sto-3g")
        nus, inten, spec = hf.infrared(omegas=np.linspace(500, 6000, 200))
        assert len(nus) == 1 and nus[0] > 1000.0   # real stretch
        # d mu/d Q ~ (d mu/d r)/sqrt(mu_red) ~ 0.3/42 a.u. -> I ~ 1e-5
        assert inten[0] > 1e-6
        # spectrum peaks at the stretch frequency
        w = np.linspace(500, 6000, 200)
        assert abs(w[int(np.argmax(spec))] - nus[0]) < 60.0


class TestRaman:
    def test_he_sto3g_polarizability_is_zero(self):
        """Exact basis-structure pin: a single s function cannot
        polarize — alpha(He/STO-3G) = 0 identically."""
        from pyqed_tpu.qchem import Molecule

        mf = Molecule([("He", (0, 0, 0.0))], basis="sto-3g").RHF().run()
        assert np.max(np.abs(mf.polarizability())) < 1e-9

    def test_h2_polarizability_structure(self):
        """H2/STO-3G: axial alpha_zz > 0 (sigma_g/sigma_u mixing) while
        the transverse components vanish exactly (no p functions)."""
        from pyqed_tpu.qchem import Molecule

        mf = Molecule([("H", (0, 0, 0.0)), ("H", (0, 0, 1.4))],
                      basis="sto-3g").RHF().run()
        a = mf.polarizability()
        assert a[2, 2] > 0.1
        assert abs(a[0, 0]) < 1e-8 and abs(a[1, 1]) < 1e-8
        assert np.max(np.abs(a - np.diag(np.diag(a)))) < 1e-8

    def test_h2_raman_active_ir_silent(self):
        """Mutual-exclusion pin for a centrosymmetric molecule: the H2
        stretch has zero IR intensity but nonzero Raman activity."""
        from pyqed_tpu.qchem.hessian import Hessian

        h2 = Hessian([("H", (0, 0, 0.0)), ("H", (0, 0, 1.4))],
                     basis="sto-3g")
        _, ir = h2.infrared()
        nus, act = h2.raman()
        assert ir[0] < 1e-10
        assert act[0] > 1e-4
        assert nus[0] > 1000.0


def test_hessian_grad_scheme_matches_energy_scheme():
    """FD-of-analytic-gradient Hessian (the r4 default: 2*3N SCFs,
    O(h^2) on forces) == double-FD-of-energy Hessian (O((3N)^2) SCFs)
    on H2/sto-3g."""
    import numpy as np
    from pyqed_tpu.qchem.hessian import Hessian

    h2 = [("H", (0, 0, 0.0)), ("H", (0, 0, 1.4))]
    a = Hessian(h2, basis="sto-3g")
    Hg = a.run(scheme="grad")
    b = Hessian(h2, basis="sto-3g")
    He = b.run(scheme="energy")
    assert np.max(np.abs(Hg - He)) < 5e-5   # both schemes O(h^2), different constants
    assert np.max(np.abs(Hg - Hg.T)) < 1e-14      # exactly symmetric
    fa = a.vibrational_frequencies()
    fb = b.vibrational_frequencies()
    assert abs(fa[0] - fb[0]) < 0.5               # cm^-1
