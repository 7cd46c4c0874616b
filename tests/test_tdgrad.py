"""Analytic CIS/TDA excited-state gradient tests (tdgrad.py).

The reference has no excited-state forces; the oracle is Richardson
finite differences of E_SCF + omega_TDA (fully self-contained).
"""
import numpy as np
import pytest

from pyqed_tpu.qchem.mol import Molecule
from pyqed_tpu.qchem.tdscf import TDA
from pyqed_tpu.qchem.tdgrad import cis_gradient
from pyqed_tpu.qchem.grad import tda_gradient_fd, ExcitedGeometryOptimizer

H2O = [("O", (0.02, 0.0, 0.0)), ("H", (0.1, -1.4, 1.0)),
       ("H", (0.0, 1.43, 1.15))]     # deliberately symmetry-free


@pytest.mark.parametrize("state", [1, 2])
def test_cis_gradient_vs_richardson_fd_h2o(state):
    mf = Molecule(H2O, basis="sto-3g").RHF().run()
    td = TDA(mf)
    td.run(nroots=4)
    g = cis_gradient(td, state=state)
    gfd = tda_gradient_fd(H2O, state=state, richardson=True)
    assert np.max(np.abs(g - gfd)) < 1e-5        # SCF-tolerance floor
    # translational invariance of the analytic forces
    assert np.max(np.abs(g.sum(axis=0))) < 1e-6


def test_cis_gradient_triplet():
    mf = Molecule(H2O, basis="sto-3g").RHF().run()
    td = TDA(mf, singlet=False)
    td.run(nroots=3)
    g = cis_gradient(td, state=1)
    gfd = tda_gradient_fd(H2O, state=1, singlet=False, richardson=True)
    assert np.max(np.abs(g - gfd)) < 1e-5


def test_excited_optimizer_analytic_matches_fd():
    """The analytic-jac optimizer lands on the same LiH A-state
    minimum as the FD-jac one (and faster: 1 SCF+TDA per jac instead
    of 2*3N)."""
    lih = [("Li", (0, 0, 0.0)), ("H", (0, 0, 3.0))]
    oa = ExcitedGeometryOptimizer(lih, state=1, analytic=True,
                                  maxiter=30).run()
    assert oa.converged
    Re_a = abs(oa.atoms_opt[1][1][2] - oa.atoms_opt[0][1][2])
    of = ExcitedGeometryOptimizer(lih, state=1, analytic=False,
                                  maxiter=30).run()
    Re_f = abs(of.atoms_opt[1][1][2] - of.atoms_opt[0][1][2])
    assert abs(Re_a - Re_f) < 1e-3
    assert abs(oa.e_tot - of.e_tot) < 1e-7


def test_mp2_gradient_vs_richardson_fd():
    """Analytic MP2 gradient (Hylleraas frozen-t functional through
    the generic response engine) vs Richardson FD of E_SCF + E2."""
    from pyqed_tpu.qchem.tdgrad import mp2_gradient
    from pyqed_tpu.qchem.mp import MP2

    mf = Molecule(H2O, basis="sto-3g").RHF().run()
    g = mp2_gradient(mf)
    assert np.max(np.abs(g.sum(axis=0))) < 1e-6   # translational inv.

    def e_mp2(atoms):
        m = Molecule(atoms, basis="sto-3g").RHF().run()
        mp = MP2(m)
        mp.run()
        return float(m.e_tot + mp.e_corr)

    at = [(s, np.asarray(x, float)) for s, x in H2O]
    h = 5e-3
    # spot-check three representative components (full 9 is slow)
    for (a, x) in [(0, 1), (1, 2), (2, 0)]:
        def E(d):
            geo = [(s, xx + (d if k == a else 0) * np.eye(3)[x])
                   for k, (s, xx) in enumerate(at)]
            return e_mp2(geo)
        gfd = (8 * (E(h) - E(-h)) - (E(2 * h) - E(-2 * h))) / (12 * h)
        assert abs(g[a, x] - gfd) < 1e-6, (a, x)


def test_mp2_gradient_canonical_formula_would_fail():
    """The engine's stationarity gate: feeding a NON-stationary
    functional (the canonical closed-form E2 with diagonal-F
    denominators) must be rejected — its oo/vv Lagrangian is not
    symmetric."""
    from pyqed_tpu.qchem.tdgrad import response_gradient
    import jax.numpy as jnp

    mf = Molecule(H2O, basis="sto-3g").RHF().run()
    no = mf.nocc
    C = np.asarray(mf.mo_coeff, float)
    Cj = jnp.asarray(C)
    eps = jnp.asarray(mf.mo_energy)

    def omega_bad(kappa, h_, eri_):
        Cr = Cj + Cj @ kappa
        emo = jnp.einsum("pi, qj, pqkl, kr, ls -> ijrs",
                         Cr, Cr, eri_, Cr, Cr)
        ov = emo[:no, no:, :no, no:]
        # frozen canonical denominators: NOT stationary in amplitudes
        den = (eps[:no, None, None, None] - eps[None, no:, None, None]
               + eps[None, None, :no, None]
               - eps[None, None, None, no:])
        return jnp.sum(ov * (2 * ov - jnp.swapaxes(ov, 1, 3)) / den)

    with pytest.raises(RuntimeError, match="not symmetric|stationary"):
        response_gradient(mf, omega_bad)


def test_mp2_relaxed_dipole_vs_finite_field():
    """Orbital-relaxed MP2 dipole (field perturbation through the SAME
    Z-vector engine) == finite-field d(E_SCF+E2)/dF."""
    from pyqed_tpu.qchem.tdgrad import mp2_dipole
    from pyqed_tpu.qchem.mp import MP2
    from pyqed_tpu.qchem.basis import dipole_matrix

    mf = Molecule(H2O, basis="sto-3g").RHF().run()
    mu = mp2_dipole(mf)
    mol = Molecule(H2O, basis="sto-3g")
    mu_ao = np.asarray(dipole_matrix(mol.bfs))
    R = np.asarray(mol.atom_coords())
    Z = np.asarray(mol.atom_charges(), float)

    def e_tot(F):
        m2 = Molecule(H2O, basis="sto-3g")
        mfF = m2.RHF(
            extra_hcore=np.einsum("x, xpq -> pq", F, mu_ao)).run()
        mp = MP2(mfF)
        mp.run()
        return float(mfF.e_tot + mp.e_corr) - float(F @ (Z @ R))

    h = 1e-3
    for x in range(3):
        F = np.zeros(3)
        F[x] = h
        mu_ff = -(e_tot(F) - e_tot(-F)) / (2 * h)
        assert abs(mu[x] - mu_ff) < 2e-6, x
    # the relaxed correction is real (differs from plain HF)
    assert np.max(np.abs(mu - np.asarray(mf.dip_moment()))) > 5e-3


def test_ccsd_gradient_vs_richardson_fd():
    """Analytic CCSD nuclear gradient: Lagrangian with Λ multipliers
    solved numerically from the autodiff residual Jacobian (projected
    onto the antisymmetric amplitude subspace), through the same
    response engine.  No hand-derived Λ equations anywhere."""
    from pyqed_tpu.qchem.cc import CCSD
    from pyqed_tpu.qchem.tdgrad import ccsd_gradient

    lih = [("Li", (0, 0, 0.0)), ("H", (0, 0, 3.0))]
    mf = Molecule(lih, basis="sto-3g").RHF().run()
    cc = CCSD(mf).run()
    assert cc.converged
    g = ccsd_gradient(cc)
    assert np.max(np.abs(g.sum(axis=0))) < 1e-10   # translational inv.

    def e_cc(atoms):
        m = Molecule(atoms, basis="sto-3g").RHF().run()
        c = CCSD(m).run()
        return float(m.e_tot + c.e_corr)

    at = [(s, np.asarray(x, float)) for s, x in lih]
    h = 5e-3

    def E(d):
        geo = [(s, xx + np.array([0, 0, d if k == 1 else 0]))
               for k, (s, xx) in enumerate(at)]
        return e_cc(geo)

    gfd = (8 * (E(h) - E(-h)) - (E(2 * h) - E(-2 * h))) / (12 * h)
    assert abs(g[1, 2] - gfd) < 1e-7


def test_tdhf_rpa_gradient_vs_richardson_fd():
    """Full-RPA (TDHF) excited-state gradient: the frozen-(X, Y) ω
    bilinear is stationary at the RPA eigenpair, so it rides the same
    engine — the Y amplitudes add their own pathway contractions."""
    from pyqed_tpu.qchem.tdscf import TDHF
    from pyqed_tpu.qchem.tdgrad import tdhf_gradient

    mf = Molecule(H2O, basis="sto-3g").RHF().run()
    td = TDHF(mf)
    td.run(nroots=3)
    # normalization of the recovered RPA pair: X^2 - Y^2 = 1, Y != 0
    X, Y = td.xy[0]
    assert abs(float(np.sum(X ** 2) - np.sum(Y ** 2)) - 1.0) < 1e-8
    assert float(np.max(np.abs(Y))) > 1e-4
    g = tdhf_gradient(td, state=1)
    assert np.max(np.abs(g.sum(axis=0))) < 1e-6

    def e_rpa(atoms):
        m = Molecule(atoms, basis="sto-3g").RHF().run()
        t = TDHF(m)
        t.run(nroots=3)
        return float(m.e_tot + t.e[0])

    at = [(s, np.asarray(x, float)) for s, x in H2O]
    h = 5e-3
    a, x = 0, 2

    def E(d):
        geo = [(s, xx + (d if k == a else 0) * np.eye(3)[x])
               for k, (s, xx) in enumerate(at)]
        return e_rpa(geo)

    gfd = (8 * (E(h) - E(-h)) - (E(2 * h) - E(-2 * h))) / (12 * h)
    assert abs(g[a, x] - gfd) < 1e-5


def test_tddft_tda_lda_gradient_vs_fd():
    """Analytic TDDFT (TDA on RKS/SVWN) excited-state gradient: the
    XC kernel, its g_xc response, and the grid/Becke/AO-center motion
    all enter as autodiff blocks on the traceable quadrature."""
    from pyqed_tpu.qchem.tdscf import TDA
    from pyqed_tpu.qchem.tdgrad import tddft_tda_gradient

    lih = [("Li", (0, 0, 0.0)), ("H", (0, 0, 3.0))]
    kw = dict(xc="svwn", n_rad=30, n_theta=8)
    mf = Molecule(lih, basis="sto-3g").RKS(**kw).run()
    td = TDA(mf)
    td.run(nroots=3)
    g = tddft_tda_gradient(td, state=1)
    assert np.max(np.abs(g.sum(axis=0))) < 1e-10   # translational inv.

    def e_exc(atoms):
        m = Molecule(atoms, basis="sto-3g").RKS(**kw).run()
        t = TDA(m)
        t.run(nroots=3)
        return float(m.e_tot + np.asarray(t.e)[0])

    at = [(s, np.asarray(x, float)) for s, x in lih]
    h = 5e-3

    def E(d):
        geo = [(s, xx + np.array([0, 0, d if k == 1 else 0]))
               for k, (s, xx) in enumerate(at)]
        return e_exc(geo)

    gfd = (E(h) - E(-h)) / (2 * h)
    assert abs(g[1, 2] - gfd) < 5e-5    # O(h^2) FD + grid floor


def test_tddft_gga_gate_and_fd_path():
    """Analytic TDDFT gradients are gated to LDA (the shipped GGA
    kernel and the differentiable E_xc regularize the density tail
    differently — documented in the error); the FD path covers GGA."""
    from pyqed_tpu.qchem.tdscf import TDA
    from pyqed_tpu.qchem.tdgrad import tddft_tda_gradient
    from pyqed_tpu.qchem.grad import tda_gradient_fd

    lih = [("Li", (0, 0, 0.0)), ("H", (0, 0, 3.0))]
    mf = Molecule(lih, basis="sto-3g").RKS(xc="pbe", n_rad=30,
                                           n_theta=8).run()
    td = TDA(mf)
    td.run(nroots=3)
    with pytest.raises(NotImplementedError, match="tail"):
        tddft_tda_gradient(td, state=1)
    g = tda_gradient_fd(lih, state=1, method="RKS", xc="pbe",
                        n_rad=30, n_theta=8)
    assert np.max(np.abs(g.sum(axis=0))) < 1e-6
    assert np.max(np.abs(g)) > 1e-3


def test_ump2_gradient_open_shell_vs_fd():
    """Open-shell analytic MP2 gradient (UHF reference, per-spin
    rotations in ResponseEngineU) on the OH radical — the engine's
    ω-gate also pins the spin-orbital E2 against qchem.mp.UMP2."""
    from pyqed_tpu.qchem.tdgrad import ump2_gradient
    from pyqed_tpu.qchem.mp import UMP2

    oh = [("O", (0.0, 0.0, 0.0)), ("H", (0.0, 0.3, 1.83))]
    mf = Molecule(oh, spin=1, basis="sto-3g").UHF().run()
    assert mf.converged
    g = ump2_gradient(mf)
    assert np.max(np.abs(g.sum(axis=0))) < 1e-10

    def e_u(atoms):
        m = Molecule(atoms, spin=1, basis="sto-3g").UHF().run()
        u = UMP2(m)
        u.run()
        return float(m.e_tot + u.e_corr)

    at = [(s, np.asarray(x, float)) for s, x in oh]
    h = 5e-3
    a, x = 0, 2

    def E(d):
        geo = [(s, xx + (d if k == a else 0) * np.eye(3)[x])
               for k, (s, xx) in enumerate(at)]
        return e_u(geo)

    gfd = (8 * (E(h) - E(-h)) - (E(2 * h) - E(-2 * h))) / (12 * h)
    assert abs(g[a, x] - gfd) < 1e-7


def test_ccsd_relaxed_dipole_vs_finite_field():
    """Orbital-relaxed CCSD dipole from the SAME Lagrangian engine
    with a field perturbation == Richardson finite-field CCSD
    (plain central FD floors at ~1e-4 here: LiH's hyperpolarizability
    is large)."""
    from pyqed_tpu.qchem.cc import CCSD
    from pyqed_tpu.qchem.tdgrad import ccsd_dipole
    from pyqed_tpu.qchem.basis import dipole_matrix

    lih = [("Li", (0, 0, 0.0)), ("H", (0, 0, 3.0))]
    mf = Molecule(lih, basis="sto-3g").RHF().run()
    cc = CCSD(mf).run()
    mu = ccsd_dipole(cc)
    mol = Molecule(lih, basis="sto-3g")
    mu_ao = np.asarray(dipole_matrix(mol.bfs))
    R = np.asarray(mol.atom_coords())
    Z = np.asarray(mol.atom_charges(), float)

    def e_cc(Fz):
        m2 = Molecule(lih, basis="sto-3g")
        F = np.array([0.0, 0.0, Fz])
        mfF = m2.RHF(
            extra_hcore=np.einsum("x, xpq -> pq", F, mu_ao)).run()
        c = CCSD(mfF).run()
        return float(mfF.e_tot + c.e_corr) - float(F @ (Z @ R))

    h = 1e-3
    mu_ff = -(8 * (e_cc(h) - e_cc(-h))
              - (e_cc(2 * h) - e_cc(-2 * h))) / (12 * h)
    assert abs(mu[2] - mu_ff) < 1e-6
    # the correlation relaxation is real
    assert abs(mu[2] - np.asarray(mf.dip_moment())[2]) > 1e-3


def test_ucis_closed_shell_limit_and_radical_gradient():
    """UCIS: at a closed-shell UHF point the spectrum is the UNION of
    the RHF singlet and triplet TDA roots (exact degeneracy test);
    on the OH radical the analytic UCIS gradient (open-shell engine)
    pins Richardson FD.  Root 1 of the radical is the ~zero-energy
    spin-completing configuration of the contaminated UHF reference —
    the physical excitation is root 2."""
    from pyqed_tpu.qchem.tdscf import UCIS, TDA
    from pyqed_tpu.qchem.tdgrad import ucis_gradient

    mfu = Molecule(H2O, basis="sto-3g").UHF().run()
    mfr = Molecule(H2O, basis="sto-3g").RHF().run()
    eu = np.asarray(UCIS(mfu).run(nroots=5))
    es = np.asarray(TDA(mfr, singlet=True).run(nroots=5))
    et = np.asarray(TDA(mfr, singlet=False).run(nroots=5))
    merged = np.sort(np.concatenate([es, et]))[:5]
    assert np.max(np.abs(eu - merged)) < 1e-8

    oh = [("O", (0.0, 0.0, 0.0)), ("H", (0.0, 0.3, 1.83))]
    mf = Molecule(oh, spin=1, basis="sto-3g").UHF().run()
    td = UCIS(mf)
    td.run(nroots=3)
    assert abs(td.e[0]) < 1e-8          # spin-completing zero mode
    assert td.e[1] > 0.05               # the real excitation
    g = ucis_gradient(td, state=2)
    assert np.max(np.abs(g.sum(axis=0))) < 1e-10

    def e_exc(atoms):
        m = Molecule(atoms, spin=1, basis="sto-3g").UHF().run()
        t = UCIS(m)
        t.run(nroots=3)
        return float(m.e_tot + np.asarray(t.e)[1])

    at = [(s, np.asarray(x, float)) for s, x in oh]
    h = 5e-3
    a, x = 0, 2

    def E(d):
        geo = [(s, xx + (d if k == a else 0) * np.eye(3)[x])
               for k, (s, xx) in enumerate(at)]
        return e_exc(geo)

    gfd = (8 * (E(h) - E(-h)) - (E(2 * h) - E(-2 * h))) / (12 * h)
    assert abs(g[a, x] - gfd) < 1e-7


def test_ucis_oscillator_strengths_closed_shell_limit():
    """UCIS oscillator strengths at a closed-shell point: triplet-type
    roots are dark (f = 0 by spin symmetry), and bright-root strengths
    match the RHF singlet TDA values."""
    from pyqed_tpu.qchem.tdscf import UCIS, TDA

    mfu = Molecule(H2O, basis="sto-3g").UHF().run()
    mfr = Molecule(H2O, basis="sto-3g").RHF().run()
    tu = UCIS(mfu)
    tu.run(nroots=6)
    fu = tu.oscillator_strength()
    ts = TDA(mfr, singlet=True)
    es = ts.run(nroots=6)
    fs = ts.oscillator_strength()
    tt = TDA(mfr, singlet=False)
    et = tt.run(nroots=6)
    for n, e in enumerate(np.asarray(tu.e)):
        ks = np.argmin(np.abs(np.asarray(es) - e))
        kt = np.argmin(np.abs(np.asarray(et) - e))
        if abs(et[kt] - e) < 1e-8:          # triplet-type: dark
            assert fu[n] < 1e-10
        else:                               # singlet-type: matches RHF
            assert abs(es[ks] - e) < 1e-8
            assert abs(fu[n] - fs[ks]) < 1e-8


def test_cis_excited_state_dipole_vs_finite_field():
    """Excited-state dipole moment from the CIS engine with a field
    perturbation: reproduces finite-field d(E+omega)/dF and captures
    LiH's A-state dipole REVERSAL (ionic ground state -> covalent
    excited state flips the sign)."""
    from pyqed_tpu.qchem.tdscf import TDA
    from pyqed_tpu.qchem.tdgrad import cis_dipole
    from pyqed_tpu.qchem.basis import dipole_matrix

    lih = [("Li", (0, 0, 0.0)), ("H", (0, 0, 3.0))]
    mf = Molecule(lih, basis="sto-3g").RHF().run()
    td = TDA(mf)
    td.run(nroots=3)
    mu = cis_dipole(td, state=1)
    mu_gs = np.asarray(mf.dip_moment())
    assert mu[2] * mu_gs[2] < 0            # the sign reversal
    mol = Molecule(lih, basis="sto-3g")
    mu_ao = np.asarray(dipole_matrix(mol.bfs))
    R = np.asarray(mol.atom_coords())
    Z = np.asarray(mol.atom_charges(), float)

    def e_exc(Fz):
        m2 = Molecule(lih, basis="sto-3g")
        F = np.array([0.0, 0.0, Fz])
        mfF = m2.RHF(
            extra_hcore=np.einsum("x, xpq -> pq", F, mu_ao)).run()
        t = TDA(mfF)
        t.run(nroots=3)
        return float(mfF.e_tot + np.asarray(t.e)[0]) \
            - float(F @ (Z @ R))

    h = 1e-3
    mu_ff = -(8 * (e_exc(h) - e_exc(-h))
              - (e_exc(2 * h) - e_exc(-2 * h))) / (12 * h)
    # the excited state's large hyperpolarizability floors the FF
    assert abs(mu[2] - mu_ff) < 5e-5


def test_ump2_relaxed_dipole_open_shell_vs_finite_field():
    """Open-shell relaxed UMP2 dipole (field perturbation on the
    open-shell engine) == Richardson finite-field UMP2 on OH."""
    from pyqed_tpu.qchem.tdgrad import ump2_dipole
    from pyqed_tpu.qchem.mp import UMP2
    from pyqed_tpu.qchem.basis import dipole_matrix

    oh = [("O", (0.0, 0.0, 0.0)), ("H", (0.0, 0.3, 1.83))]
    mf = Molecule(oh, spin=1, basis="sto-3g").UHF().run()
    mu = ump2_dipole(mf)
    mol = Molecule(oh, spin=1, basis="sto-3g")
    mu_ao = np.asarray(dipole_matrix(mol.bfs))
    R = np.asarray(mol.atom_coords())
    Z = np.asarray(mol.atom_charges(), float)

    def e_u(Fv):
        m2 = Molecule(oh, spin=1, basis="sto-3g")
        mfF = m2.UHF(
            extra_hcore=np.einsum("x, xpq -> pq", Fv, mu_ao)).run()
        u = UMP2(mfF)
        u.run()
        return float(mfF.e_tot + u.e_corr) - float(Fv @ (Z @ R))

    h = 1e-3
    F = np.zeros(3)
    F[2] = h
    mu_ff = -(8 * (e_u(F) - e_u(-F))
              - (e_u(2 * F) - e_u(-2 * F))) / (12 * h)
    assert abs(mu[2] - mu_ff) < 1e-6


def test_rpa_and_ucis_excited_dipoles_vs_finite_field():
    """Excited-state dipoles for TDHF/RPA (closed shell) and UCIS
    (radical) from their respective engines == Richardson FF (to the
    excited-state hyperpolarizability floor)."""
    from pyqed_tpu.qchem.tdscf import TDHF, UCIS
    from pyqed_tpu.qchem.tdgrad import tdhf_dipole, ucis_dipole
    from pyqed_tpu.qchem.basis import dipole_matrix

    h = 1e-3
    lih = [("Li", (0, 0, 0.0)), ("H", (0, 0, 3.0))]
    mf = Molecule(lih, basis="sto-3g").RHF().run()
    td = TDHF(mf)
    td.run(nroots=3)
    mu = tdhf_dipole(td, state=1)
    mol = Molecule(lih, basis="sto-3g")
    mu_ao = np.asarray(dipole_matrix(mol.bfs))
    R0 = np.asarray(mol.atom_coords())
    Z0 = np.asarray(mol.atom_charges(), float)

    def e_rpa(Fz):
        m2 = Molecule(lih, basis="sto-3g")
        F = np.array([0.0, 0.0, Fz])
        mfF = m2.RHF(
            extra_hcore=np.einsum("x, xpq -> pq", F, mu_ao)).run()
        t = TDHF(mfF)
        t.run(nroots=3)
        return float(mfF.e_tot + np.asarray(t.e)[0]) \
            - float(F @ (Z0 @ R0))

    ff = -(8 * (e_rpa(h) - e_rpa(-h))
           - (e_rpa(2 * h) - e_rpa(-2 * h))) / (12 * h)
    assert abs(mu[2] - ff) < 5e-5

    oh = [("O", (0.0, 0.0, 0.0)), ("H", (0.0, 0.3, 1.83))]
    mfu = Molecule(oh, spin=1, basis="sto-3g").UHF().run()
    tu = UCIS(mfu)
    tu.run(nroots=3)
    muu = ucis_dipole(tu, state=2)
    mol2 = Molecule(oh, spin=1, basis="sto-3g")
    mu_ao2 = np.asarray(dipole_matrix(mol2.bfs))
    R2 = np.asarray(mol2.atom_coords())
    Z2 = np.asarray(mol2.atom_charges(), float)

    def e_ucis(Fz):
        m2 = Molecule(oh, spin=1, basis="sto-3g")
        F = np.array([0.0, 0.0, Fz])
        mfF = m2.UHF(
            extra_hcore=np.einsum("x, xpq -> pq", F, mu_ao2)).run()
        t = UCIS(mfF)
        t.run(nroots=3)
        return float(mfF.e_tot + np.asarray(t.e)[1]) \
            - float(F @ (Z2 @ R2))

    ffu = -(8 * (e_ucis(h) - e_ucis(-h))
            - (e_ucis(2 * h) - e_ucis(-2 * h))) / (12 * h)
    assert abs(muu[2] - ffu) < 2e-5


def test_tddft_tda_lda_excited_dipole_vs_finite_field():
    """Relaxed TDDFT/TDA (LDA) excited-state dipole from the XC-aware
    engine == Richardson FF of E_KS + omega (floor: the engine's 5e-5
    quadrature-grouping agreement between the TDA matrix and the
    functional, plus FF truncation)."""
    from pyqed_tpu.qchem.tdscf import TDA
    from pyqed_tpu.qchem.tdgrad import tddft_tda_dipole
    from pyqed_tpu.qchem.basis import dipole_matrix

    lih = [("Li", (0, 0, 0.0)), ("H", (0, 0, 3.0))]
    mf = Molecule(lih, basis="sto-3g").RKS(xc="svwn").run()
    td = TDA(mf)
    td.run(nroots=3)
    mu = tddft_tda_dipole(td, state=1)

    mol = Molecule(lih, basis="sto-3g")
    mu_ao = np.asarray(dipole_matrix(mol.bfs))
    R0 = np.asarray(mol.atom_coords())
    Z0 = np.asarray(mol.atom_charges(), float)

    def e(Fz):
        m2 = Molecule(lih, basis="sto-3g")
        F = np.array([0.0, 0.0, Fz])
        mfF = m2.RKS(
            xc="svwn",
            extra_hcore=np.einsum("x, xpq -> pq", F, mu_ao)).run()
        t = TDA(mfF)
        t.run(nroots=3)
        return float(mfF.e_tot + np.asarray(t.e)[0]) \
            - float(F @ (Z0 @ R0))

    h = 1e-3
    ff = -(8 * (e(h) - e(-h)) - (e(2 * h) - e(-2 * h))) / (12 * h)
    assert abs(mu[2] - ff) < 2e-4
