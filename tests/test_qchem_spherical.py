"""Pure (real-spherical) Gaussian basis support.

The transform is validated three independent ways:
  1. coefficient rows reproduce scipy's real spherical harmonics on the
     sphere exactly (the projection identity, any L);
  2. completing the transform to a square matrix leaves the RHF energy
     bit-identical (exact basis-span invariance — pins the per-component
     Cartesian normalization bookkeeping AND the 4-index ERI transform);
  3. the truncated (pure) basis is variational from above and the
     transformed S is exactly the identity-overlap of an orthonormalized
     shell (diagonal ones).

(reference counterpart: gbasis spherical bases,
/root/reference/pyqed/qchem/basis.py:10-15.)
"""
import numpy as np
import pytest

from pyqed_tpu.qchem.basis import (
    ContractedGaussian, real_solid_harmonic_coefs, cartesian_components,
    spherical_transform, transform_eri, overlap_matrix, build_basis,
)
from pyqed_tpu.qchem.mol import Molecule

WATER = [("O", (0.0, 0.0, 0.22140)),
         ("H", (0.0, 1.43052, -0.88560)),
         ("H", (0.0, -1.43052, -0.88560))]


# ------------------------------------------------------------------ 1.
@pytest.mark.parametrize("L", [0, 1, 2, 3, 4])
def test_solid_harmonic_rows_match_scipy(L):
    """Each row evaluated as a polynomial equals the real Y_lm on S^2."""
    try:
        from scipy.special import sph_harm_y

        def ylm(m, l, phi, theta):
            return sph_harm_y(l, m, theta, phi)
    except ImportError:
        from scipy.special import sph_harm as _sh

        def ylm(m, l, phi, theta):
            return _sh(m, l, phi, theta)

    C = real_solid_harmonic_coefs(L)
    comps = cartesian_components(L)
    assert C.shape == (2 * L + 1, len(comps))
    # fresh evaluation points (NOT the fit nodes)
    th = np.linspace(0.3, 2.8, 11)
    ph = np.linspace(-2.9, 2.9, 11)
    T, P = np.meshgrid(th, ph)
    t, p = T.ravel(), P.ravel()
    x = np.sin(t) * np.cos(p)
    y = np.sin(t) * np.sin(p)
    z = np.cos(t)
    M = np.stack([x ** a * y ** b * z ** c for (a, b, c) in comps], axis=1)
    for idx, m in enumerate(range(-L, L + 1)):
        Y = ylm(abs(m), L, p, t)
        if m > 0:
            ref = np.sqrt(2.0) * (-1.0) ** m * Y.real
        elif m < 0:
            ref = np.sqrt(2.0) * (-1.0) ** m * Y.imag
        else:
            ref = Y.real
        assert np.max(np.abs(M @ C[idx] - ref)) < 1e-12


def test_d_z2_row_shape():
    """The m=0 d row is proportional to 2z^2 - x^2 - y^2."""
    C = real_solid_harmonic_coefs(2)
    row = C[2] / C[2][-1]          # comps: xx xy xz yy yz zz
    assert np.allclose(row, [-0.5, 0, 0, -0.5, 0, 1.0], atol=1e-12)


# ------------------------------------------------------------------ 2.
def test_complete_transform_rhf_invariance():
    """Square (completed) spherical transform is a pure basis rotation:
    water/6-31G* RHF energy must be identical to the Cartesian run."""
    import jax
    m_cart = Molecule(WATER, basis="6-31g*")
    e_cart = float(m_cart.RHF().run().e_tot)

    m_full = Molecule(WATER, basis="6-31g*", spherical=True)
    m_full.csph = spherical_transform(m_full.bfs, complete=True)
    m_full.nao = m_full.csph.shape[0]
    m_full._ints = None
    assert m_full.csph.shape == (19, 19)
    e_full = float(m_full.RHF().run().e_tot)
    assert abs(e_full - e_cart) < 1e-9


def test_spherical_variational_from_above():
    """Dropping the d contaminant raises the energy by a small amount."""
    e_cart = float(Molecule(WATER, basis="6-31g*").RHF().run().e_tot)
    m = Molecule(WATER, basis="6-31g*", spherical=True)
    assert m.nao == 18            # 19 cart - 1 contaminant
    e_sph = float(m.RHF().run().e_tot)
    assert 0.0 < e_sph - e_cart < 5e-3
    # the well-known Cartesian pin still holds
    assert abs(e_cart - (-76.01053)) < 2e-5


# ------------------------------------------------------------------ 3.
def test_transformed_overlap_normalized():
    m = Molecule(WATER, basis="6-31g*", spherical=True)
    S = np.asarray(m.intor()[0])
    assert np.allclose(np.diag(S), 1.0, atol=1e-10)


def test_f_shell_transform_orthonormal():
    """A single f shell: 7 pure functions, orthonormal among themselves
    (same center, same radial -> overlap block is the angular metric)."""
    exps = np.array([1.3, 0.4])
    coefs = np.array([0.5, 0.6])
    bfs = [ContractedGaussian(np.zeros(3), lmn, exps, coefs)
           for lmn in cartesian_components(3)]
    C = spherical_transform(bfs)
    assert C.shape == (7, 10)
    S = overlap_matrix(bfs)
    G = C @ S @ C.T
    assert np.max(np.abs(G - np.eye(7))) < 1e-10


def test_spherical_dft_b3lyp_runs():
    """RKS/B3LYP in the pure basis: converges, variational vs Cartesian."""
    m_s = Molecule(WATER, basis="6-31g*", spherical=True)
    e_s = float(m_s.RKS(xc="b3lyp").run().e_tot)
    m_c = Molecule(WATER, basis="6-31g*")
    e_c = float(m_c.RKS(xc="b3lyp").run().e_tot)
    assert 0.0 < e_s - e_c < 5e-3


def test_spherical_dipole_consistent():
    """Dipole moment of water barely moves when the contaminant drops."""
    def dip(m):
        mf = m.RHF()
        r = mf.run()
        D = 2.0 * np.asarray(r.mo_coeff)[:, :m.nelec // 2] @ \
            np.asarray(r.mo_coeff)[:, :m.nelec // 2].T
        mu_e = -np.einsum("kij, ij -> k", np.asarray(mf.dipole_integrals()), D)
        mu_n = sum(
            np.asarray(x) * {"O": 8, "H": 1}[s] for s, x in m.atoms)
        return mu_e + mu_n
    d_c = dip(Molecule(WATER, basis="6-31g*"))
    d_s = dip(Molecule(WATER, basis="6-31g*", spherical=True))
    assert np.linalg.norm(d_c - d_s) < 5e-3
    assert 0.7 < np.linalg.norm(d_c) < 1.1   # ~0.8-1.0 au for water


# ---------------------------------------------------- analysis helpers
def test_tda_density_matrix_trace_and_idempotency_limit():
    """Excited-state AO density from TDA amplitudes conserves electron
    number in both Cartesian and spherical bases (reference:
    pyqed/qchem/core.py:840)."""
    from pyqed_tpu.qchem.tdscf import TDA, tda_density_matrix
    for sph in (False, True):
        m = Molecule(WATER, basis="sto-3g", spherical=sph)
        mf = m.RHF(); mf.run()
        td = TDA(mf); td.run(nroots=3)
        S = np.asarray(m.intor()[0])
        for n in range(3):
            D = tda_density_matrix(td, n)
            assert abs(np.trace(D @ S) - m.nelec) < 1e-8


def test_write_mo_cube_norm():
    """MO evaluated through ao_on_grid integrates to ~1 on a box grid."""
    import tempfile, os
    from pyqed_tpu.qchem.density import write_mo_cube, cube_grid, ao_on_grid
    m = Molecule(WATER, basis="sto-3g")
    mf = m.RHF(); mf.run()
    pts, origin, axes, shape = cube_grid(m.atoms, 25, 25, 25, margin=5.0)
    phi = ao_on_grid(m, pts) @ np.asarray(mf.mo_coeff)[:, mf.nocc - 1]
    dv = np.prod(np.diag(axes))
    assert abs(np.sum(phi ** 2) * dv - 1.0) < 5e-2
    with tempfile.TemporaryDirectory() as d:
        out = write_mo_cube(os.path.join(d, "mo.cube"), m,
                            np.asarray(mf.mo_coeff)[:, 0], nx=8, ny=8, nz=8)
        assert out.shape == (8, 8, 8) and np.isfinite(out).all()


def test_save_to_xyz_roundtrip():
    import tempfile, os
    from pyqed_tpu.qchem.geometry import save_to_xyz
    from pyqed_tpu.units import au2angstrom
    m = Molecule(WATER, basis="sto-3g")
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "w.xyz")
        save_to_xyz(m, p)
        lines = open(p).read().strip().splitlines()
    assert lines[0] == "3"
    sym, *xyz = lines[2].split()
    assert sym == "O"
    assert abs(float(xyz[2]) - 0.22140 * au2angstrom) < 1e-8
