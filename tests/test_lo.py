"""Orbital localization (Boys/PM/IAO/IBO), population analysis, and the
qchem convenience surface (read_xyz, grad_nuc, MO integrals,
find_homo_lumo) — reference: pyqed/qchem/mol.py:48,83,1156,1174,1445,1528."""
import numpy as np
import pytest

from pyqed_tpu.qchem import Molecule, RHF
from pyqed_tpu.qchem.lo import (
    boys, pipek_mezey, iao, ibo, mulliken_charges, iao_charges,
    find_homo_lumo, orbital_centers, vec_lowdin)
from pyqed_tpu.qchem.geometry import (read_xyz, grad_nuc,
                                      quasi_angular_momentum, eckart_frame)
from pyqed_tpu.qchem.scf import get_hcore_mo, get_eri_mo

WATER = [("O", (0.0, 0.0, 0.2217)),
         ("H", (0.0, 1.4309, -0.8867)),
         ("H", (0.0, -1.4309, -0.8867))]


@pytest.fixture(scope="module")
def water_rhf():
    mol = Molecule(WATER, basis="6-31g")
    return RHF(mol).run()


@pytest.mark.parametrize("localizer", [boys, pipek_mezey, ibo])
def test_localized_orbitals_preserve_span(water_rhf, localizer):
    mf = water_rhf
    S = np.asarray(mf.S)
    Cocc = np.asarray(mf.mo_coeff)[:, :mf.nocc]
    L = localizer(mf)
    # orthonormal in the S metric
    assert np.max(np.abs(L.T @ S @ L - np.eye(mf.nocc))) < 1e-12
    # same occupied projector (density matrix invariant)
    assert np.max(np.abs(L @ L.T - Cocc @ Cocc.T)) < 1e-12


def test_boys_increases_localization(water_rhf):
    mf = water_rhf
    Cocc = np.asarray(mf.mo_coeff)[:, :mf.nocc]
    obj = lambda C: float(np.sum(orbital_centers(mf, C) ** 2))
    L = boys(mf)
    assert obj(L) > obj(Cocc) + 0.5


def test_boys_water_bond_and_lone_pair_pattern(water_rhf):
    """Boys on water: 1 O core + 2 OH bond orbitals (in plane, +-y) + 2
    rabbit-ear lone pairs (out of plane, +-x)."""
    r = orbital_centers(water_rhf, boys(water_rhf))
    n_bond = np.sum((np.abs(r[:, 1]) > 0.5) & (np.abs(r[:, 0]) < 0.1))
    n_lone = np.sum((np.abs(r[:, 0]) > 0.3) & (np.abs(r[:, 1]) < 0.1))
    n_core = np.sum(np.linalg.norm(r - r[0], axis=1) < 1e-6)
    assert n_bond == 2 and n_lone == 2


def test_pm_keeps_sigma_lone_pair_in_plane(water_rhf):
    """Pipek-Mezey preserves sigma/pi separation: the out-of-plane lone
    pair stays a pure p_x orbital centered on O (x-center ~ 0)."""
    r = orbital_centers(water_rhf, pipek_mezey(water_rhf))
    assert np.max(np.abs(r[:, 0])) < 1e-6


def test_iao_spans_occupied_space(water_rhf):
    mf = water_rhf
    S = np.asarray(mf.S)
    C = np.asarray(mf.mo_coeff)[:, :mf.nocc]
    A = iao(mf)
    assert A.shape[1] == 7          # minimal basis size for H2O
    assert np.max(np.abs(A.T @ S @ A - np.eye(7))) < 1e-12
    assert np.max(np.abs(A @ (A.T @ S @ C) - C)) < 1e-12


def test_iao_charges_basis_stable():
    """IAO charges move by <0.02 e from 6-31G to 6-31G* (Mulliken moves
    by ~0.1 e on the same pair) — the Knizia basis-stability property."""
    q = {}
    for basis in ("6-31g", "6-31g*"):
        mf = RHF(Molecule(WATER, basis=basis)).run()
        q[basis] = (iao_charges(mf), mulliken_charges(mf))
    d_iao = np.abs(q["6-31g"][0] - q["6-31g*"][0]).max()
    d_mul = np.abs(q["6-31g"][1] - q["6-31g*"][1]).max()
    assert d_iao < 0.02
    assert d_iao < d_mul
    # O negative, H positive, symmetric
    qi = q["6-31g"][0]
    assert qi[0] < -0.3 and qi[1] > 0.1
    assert abs(qi[1] - qi[2]) < 1e-8


def test_charges_sum_to_total_charge(water_rhf):
    assert abs(mulliken_charges(water_rhf).sum()) < 1e-10
    assert abs(iao_charges(water_rhf).sum()) < 1e-10


def test_vec_lowdin_orthonormalizes(water_rhf):
    S = np.asarray(water_rhf.S)
    rng = np.random.default_rng(5)
    C = rng.normal(size=(S.shape[0], 4))
    L = vec_lowdin(C, S)
    assert np.max(np.abs(L.T @ S @ L - np.eye(4))) < 1e-12


def test_find_homo_lumo(water_rhf):
    mf = water_rhf
    eh, ih, el, il = find_homo_lumo(mf)
    assert ih == mf.nocc - 1 and il == mf.nocc
    assert eh == pytest.approx(float(np.asarray(mf.mo_energy)[mf.nocc - 1]))
    assert el > eh


def test_read_xyz_roundtrip(tmp_path, water_rhf):
    mol = water_rhf.mol
    f = str(tmp_path / "w.xyz")
    mol.tofile(f)
    atoms = read_xyz(f)
    assert [s for s, _ in atoms] == [s for s, _ in mol.atoms]
    got = np.array([x for _, x in atoms])
    want = np.array([x for _, x in mol.atoms])
    assert np.max(np.abs(got - want)) < 1e-9
    mol2 = Molecule.from_xyz(f)
    assert mol2.nelec == mol.nelec


def test_grad_nuc_matches_finite_difference(water_rhf):
    mol = water_rhf.mol
    g = grad_nuc(mol)
    eps = 1e-6
    for a in range(mol.natm):
        for k in range(3):
            def enuc(shift):
                atoms = [(s, np.array(x)) for s, x in mol.atoms]
                atoms[a] = (atoms[a][0], atoms[a][1] + shift)
                return Molecule(atoms, basis="sto-3g").energy_nuc()
            dv = np.zeros(3)
            dv[k] = eps
            fd = (enuc(dv) - enuc(-dv)) / (2 * eps)
            assert g[a, k] == pytest.approx(fd, abs=1e-7)
    # translational sum rule
    assert np.max(np.abs(g.sum(axis=0))) < 1e-12
    assert grad_nuc(mol, atmlst=[1]).shape == (1, 3)


def test_quasi_angular_momentum_vanishes_in_eckart_frame(water_rhf):
    mol = water_rhf.mol
    m = np.asarray(mol.atom_mass_list())
    ref = np.array([x for _, x in mol.atoms])
    ref = ref - np.average(ref, axis=0, weights=m)   # COM at origin
    # rotate + distort the geometry, then Eckart-align it back
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    rng = np.random.default_rng(3)
    rotated = (ref + 0.02 * rng.normal(size=ref.shape)) @ R.T
    aligned, _, _ = eckart_frame(ref, rotated, m)
    l_rot = quasi_angular_momentum(m, ref, rotated)
    l_fix = quasi_angular_momentum(m, ref, aligned)
    assert np.linalg.norm(l_fix) < 1e-8 * max(np.linalg.norm(l_rot), 1.0)


def test_mo_integral_helpers(water_rhf):
    mf = water_rhf
    h = np.asarray(get_hcore_mo(mf))
    eri = np.asarray(get_eri_mo(mf))
    # rebuild the SCF electronic energy from MO-basis integrals
    n = mf.nocc
    e1 = 2 * np.trace(h[:n, :n])
    J = np.einsum("iijj ->", eri[:n, :n, :n, :n])
    K = np.einsum("ijji ->", eri[:n, :n, :n, :n])
    assert e1 + 2 * J - K == pytest.approx(mf.e_elec, abs=1e-8)


def test_mo_integral_helpers_uhf():
    from pyqed_tpu.qchem import UHF
    mol = Molecule([("O", (0, 0, 0)), ("H", (0, 0, 1.83))], spin=1,
                   basis="sto-3g")
    mf = UHF(mol).run()
    ha, hb = get_hcore_mo(mf)
    aa, ab, bb = (np.asarray(x) for x in get_eri_mo(mf))
    na, nb = mf.nocc
    e1 = np.trace(np.asarray(ha)[:na, :na]) + np.trace(np.asarray(hb)[:nb, :nb])
    Jaa = np.einsum("iijj ->", aa[:na, :na, :na, :na])
    Kaa = np.einsum("ijji ->", aa[:na, :na, :na, :na])
    Jbb = np.einsum("iijj ->", bb[:nb, :nb, :nb, :nb])
    Kbb = np.einsum("ijji ->", bb[:nb, :nb, :nb, :nb])
    Jab = np.einsum("iijj ->", ab[:na, :na, :nb, :nb])
    e2 = 0.5 * (Jaa - Kaa) + 0.5 * (Jbb - Kbb) + Jab
    assert e1 + e2 == pytest.approx(
        mf.e_tot - mf.mol.energy_nuc(), abs=1e-8)
    assert np.asarray(mf.dm[0]).shape == np.asarray(mf.dm[1]).shape


def test_scan_pes_h2_minimum():
    """H2/STO-3G bond scan: minimum near 1.4 bohr at the literature
    energy -1.1167 Eh (reference: pyqed/qchem/mol.py:1374)."""
    from pyqed_tpu.qchem import scan_pes
    r = np.array([1.2, 1.401, 1.6])
    e = scan_pes(lambda s: [("H", (0, 0, 0)), ("H", (0, 0, s))], r)
    assert e[1] < e[0] and e[1] < e[2]
    assert e[1] == pytest.approx(-1.11668, abs=2e-4)


def test_find_homo_lumo_no_virtuals_raises():
    """He/STO-3G has nocc == nmo: no LUMO exists — must be a clear
    ValueError, not an IndexError (review finding)."""
    import pytest
    from pyqed_tpu.qchem import RHF, Molecule
    from pyqed_tpu.qchem.lo import find_homo_lumo
    mf = RHF(Molecule([("He", (0.0, 0.0, 0.0))], basis="sto-3g")).run()
    with pytest.raises(ValueError):
        find_homo_lumo(mf)
