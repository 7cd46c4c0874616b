"""qchem generalization (round-1 VERDICT item 5): d shells, general
basis reader, GGA/hybrid DFT.

Gates: d-block one-electron integrals vs dense quadrature oracles; SCF
rotational invariance with d functions (exercises every ERI d-block);
variational ordering across basis levels; functional internal limits
(PBE -> LDA at zero gradient, B88 -> Slater) and the known He-atom LYP
correlation energy; water B3LYP/PBE literature windows.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqed_tpu.qchem.basis import (build_basis, parse_gbs, parse_bse_json,
                                   cartesian_components, overlap_matrix,
                                   kinetic_matrix, ContractedGaussian)
from pyqed_tpu.qchem.mol import Molecule
from pyqed_tpu.qchem.scf import RHF
from pyqed_tpu.qchem import dft
from pyqed_tpu.qchem.dft import RKS, UKS

BOHR = 0.52917721092


def _water(basis="6-31g*"):
    r = 0.9572 / BOHR
    th = np.deg2rad(104.52) / 2
    atoms = [("O", (0.0, 0.0, 0.0)),
             ("H", (r * np.sin(th), 0.0, r * np.cos(th))),
             ("H", (-r * np.sin(th), 0.0, r * np.cos(th)))]
    return Molecule(atoms, basis=basis)


def test_cartesian_components():
    assert cartesian_components(0) == [(0, 0, 0)]
    assert len(cartesian_components(1)) == 3
    assert len(cartesian_components(2)) == 6
    assert len(cartesian_components(3)) == 10
    assert all(sum(c) == 2 for c in cartesian_components(2))


def test_d_overlap_kinetic_vs_quadrature():
    """d-shell one-electron integrals against a dense-grid oracle."""
    g1 = ContractedGaussian((0.1, -0.2, 0.3), (2, 0, 0), [0.9, 0.3],
                            [0.6, 0.5])
    g2 = ContractedGaussian((-0.4, 0.5, 0.0), (1, 1, 0), [1.1], [1.0])
    g3 = ContractedGaussian((0.0, 0.0, 0.0), (0, 1, 1), [0.7], [1.0])
    bfs = [g1, g2, g3]
    S = overlap_matrix(bfs)
    T = kinetic_matrix(bfs)

    # quadrature oracle
    n = 101
    L = 7.0
    x = np.linspace(-L, L, n)
    dx = x[1] - x[0]
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")

    def val_grad(g):
        d = [X - g.center[0], Y - g.center[1], Z - g.center[2]]
        r2 = d[0] ** 2 + d[1] ** 2 + d[2] ** 2
        rad, drad = 0.0, 0.0
        for a, c, nn in zip(g.exps, g.coefs, g.norms):
            e = c * nn * np.exp(-a * r2)
            rad = rad + e
            drad = drad - 2.0 * a * e
        mono = [d[i] ** g.lmn[i] for i in range(3)]
        poly = mono[0] * mono[1] * mono[2]
        grads = []
        for i in range(3):
            l = g.lmn[i]
            dmono = l * d[i] ** (l - 1) if l > 0 else 0.0
            others = np.prod([mono[j] for j in range(3) if j != i],
                             axis=0)
            grads.append(dmono * others * rad + poly * drad * d[i])
        return poly * rad, grads

    vg = [val_grad(g) for g in bfs]
    for i in range(3):
        for j in range(3):
            s_q = np.sum(vg[i][0] * vg[j][0]) * dx ** 3
            assert abs(S[i, j] - s_q) < 5e-5, (i, j, S[i, j], s_q)
            # T_ij = 1/2 int grad(phi_i).grad(phi_j)  (by parts, exact
            # for decaying functions; analytic gradients on the grid)
            t_q = 0.5 * sum(np.sum(vg[i][1][ax] * vg[j][1][ax])
                            for ax in range(3)) * dx ** 3
            assert abs(T[i, j] - t_q) < 2e-4, (i, j, T[i, j], t_q)


@pytest.mark.slow
def test_rhf_d_rotational_invariance():
    """Rigid rotation must not change the SCF energy — a stringent test
    of every d-function integral block (S, T, V, and all ERI classes)."""
    r = 0.9572 / BOHR
    th = np.deg2rad(104.52) / 2
    geom = np.array([[0.0, 0.0, 0.0],
                     [r * np.sin(th), 0.0, r * np.cos(th)],
                     [-r * np.sin(th), 0.0, r * np.cos(th)]])
    # a generic rotation
    a, b, c = 0.3, 1.1, -0.7
    Rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
                   [0, 0, 1]])
    Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0],
                   [-np.sin(b), 0, np.cos(b)]])
    Rx = np.array([[1, 0, 0], [0, np.cos(c), -np.sin(c)],
                   [0, np.sin(c), np.cos(c)]])
    R = Rz @ Ry @ Rx
    syms = ["O", "H", "H"]
    e = []
    for g in (geom, geom @ R.T):
        mol = Molecule([(s, tuple(x)) for s, x in zip(syms, g)],
                       basis="6-31g*")
        e.append(RHF(mol).run().e_tot)
    assert abs(e[0] - e[1]) < 1e-8, e


@pytest.mark.slow
def test_basis_variational_ordering():
    e631 = RHF(_water("6-31g")).run().e_tot
    e631d = RHF(_water("6-31g*")).run().e_tot
    assert e631d < e631 < -75.9
    # literature windows (RHF, experimental geometry): 6-31G ~ -75.984,
    # 6-31G* ~ -76.0105
    assert abs(e631 - (-75.984)) < 3e-3
    assert abs(e631d - (-76.0105)) < 3e-3


def test_gbs_parser_roundtrip():
    gbs = """\
! comment line
H     0
S    3   1.00
     18.7311370             0.03349460
      2.8253937             0.23472695
      0.6401217             0.81375733
S    1   1.00
      0.1612778             1.0000000
****
O     0
S    2   1.00
    130.7093200             0.15432897
     23.8088610             0.53532814
SP   1   1.00
      0.2700058             1.0000000   1.0000000
D    1   1.00
      0.8000000             1.0000000
****
"""
    table = parse_gbs(gbs)
    assert set(table) == {"H", "O"}
    letters = [sh[0] for sh in table["O"]]
    assert letters == ["S", "SP", "D"]
    bfs = build_basis([("O", (0, 0, 0))], basis=table)
    # 1 s + (s + 3 p) + 6 cart d = 11 functions
    assert len(bfs) == 11


def test_bse_json_parser():
    doc = {
        "elements": {
            "1": {"electron_shells": [
                {"angular_momentum": [0],
                 "exponents": ["3.42525091", "0.62391373", "0.16885540"],
                 "coefficients": [["0.15432897", "0.53532814",
                                   "0.44463454"]]},
                {"angular_momentum": [0, 1],
                 "exponents": ["1.0"],
                 "coefficients": [["1.0"], ["1.0"]]},
            ]}}}
    table = parse_bse_json(doc)
    assert table["H"][0][0] == "S"
    assert table["H"][1][0] == "SP"
    bfs = build_basis([("H", (0, 0, 0))], basis=table)
    assert len(bfs) == 5      # s + (s + 3p)


def test_functional_internal_limits():
    rho = jnp.asarray([0.05, 0.3, 1.2])
    zero = jnp.zeros(3)
    # PBE exchange reduces to Slater at zero gradient
    ex_pbe = dft._pbe_ex_unpol(rho, zero)
    ex_lda = dft._eps_x(rho) * rho
    assert np.allclose(np.asarray(ex_pbe), np.asarray(ex_lda), rtol=1e-12)
    # B88 reduces to (spin-scaled) Slater at zero gradient
    ex_b88 = dft.b88_ex(rho / 2, rho / 2, zero, zero, zero)
    assert np.allclose(np.asarray(ex_b88), np.asarray(ex_lda), rtol=1e-12)
    # PW92 paramagnetic correlation at rs=1: literature -0.0598 Eh
    ec = float(dft._pw92_eps_c(jnp.asarray(1.0), jnp.asarray(0.0)))
    assert abs(ec - (-0.0598)) < 2e-3
    # PBE H term vanishes at zero gradient
    e_pbe = dft.pbe_exc(rho / 2, rho / 2, zero, zero, zero)
    rs = (3.0 / (4 * np.pi * rho)) ** (1.0 / 3.0)
    e_ref = ex_lda + rho * dft._pw92_eps_c(rs, jnp.zeros(3))
    assert np.allclose(np.asarray(e_pbe), np.asarray(e_ref), rtol=1e-10)


def test_lyp_helium_pin():
    """LYP correlation on the He HF density: literature ~ -0.0437 Eh
    (the LYP parameters were FIT to helium)."""
    mol = Molecule([("He", (0.0, 0.0, 0.0))], basis="6-31g")
    mf = RHF(mol).run()
    D = mf.dm
    pts, w = dft.becke_grid(mol.atoms, 80, 16)
    ao, gao = dft.ao_values_grad(mol.bfs, pts)
    rho = jnp.einsum("pi, ij, pj -> p", ao, D, ao)
    grho = 2 * jnp.einsum("pid, ij, pj -> pd", gao, D, ao)
    s = jnp.sum(grho ** 2, axis=1)
    ec = dft.lyp_ec(rho / 2, rho / 2, s / 4, s / 4, s / 4)
    Ec = float(jnp.sum(w * jnp.where(rho > 1e-10, ec, 0.0)))
    assert abs(Ec - (-0.0437)) < 2e-3, Ec


@pytest.mark.slow
def test_water_dft_literature_windows():
    mol = _water("6-31g*")
    e_b3lyp = RKS(mol, xc="b3lyp").run().e_tot
    # B3LYP(VWN5)/6-31G* water: ~ -76.41 (the VWN3 'Gaussian' variant
    # differs by ~+0.003); wide window to absorb geometry/grid details
    assert abs(e_b3lyp - (-76.41)) < 0.02, e_b3lyp
    e_pbe = RKS(mol, xc="pbe").run().e_tot
    assert abs(e_pbe - (-76.33)) < 0.03, e_pbe
    # LDA << GGA < hybrid ordering of total energies for water
    e_lda = RKS(mol, xc="svwn").run().e_tot
    assert e_lda > e_pbe > e_b3lyp


def test_uks_h_atom_b3lyp():
    mol = Molecule([("H", (0.0, 0.0, 0.0))], spin=1, basis="6-31g**")
    mf = UKS(mol, xc="b3lyp").run()
    # exact H atom is -0.5; B3LYP self-interaction error ~ -0.502 at
    # basis-set limit, slightly higher in 6-31G**
    assert abs(mf.e_tot - (-0.500)) < 0.01, mf.e_tot


def test_gga_xc_potential_consistency():
    """V_xc from the autodiff assembly equals the numerical derivative
    dE_xc/dD of the grid energy — validates the sigma chain rule."""
    mol = Molecule([("He", (0.0, 0.0, 0.0))], basis="6-31g")
    mf = RKS(mol, xc="pbe", n_rad=40, n_theta=10)
    rng = np.random.default_rng(0)
    n = len(mol.bfs)
    A = rng.normal(size=(n, n))
    D = A @ A.T / n    # SPD test density matrix
    E0, V = mf._xc(jnp.asarray(D))
    # directional numerical derivative along a random symmetric dD
    B = rng.normal(size=(n, n))
    dD = (B + B.T) / 2
    eps = 1e-6
    Ep, _ = mf._xc(jnp.asarray(D + eps * dD))
    Em, _ = mf._xc(jnp.asarray(D - eps * dD))
    num = float((Ep - Em) / (2 * eps))
    ana = float(jnp.sum(V * dD))
    assert abs(num - ana) < 1e-6 * max(1.0, abs(num)), (num, ana)


def test_native_eri_engine_parity():
    """C++ MD ERI engine == Python recursion (the oracle) to 1e-12,
    including d-function blocks."""
    from pyqed_tpu.qchem.basis import eri_tensor
    from pyqed_tpu.qchem.engine import eri_tensor_native, available
    if not available():
        pytest.skip("no C++ toolchain")
    atoms = [("O", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 1.8))]
    bfs = build_basis(atoms, "6-31g*")
    e_c = eri_tensor_native(bfs)
    e_p = eri_tensor(bfs, native=False)
    assert np.max(np.abs(e_c - e_p)) < 1e-12
    # 8-fold symmetry of the native tensor
    assert np.allclose(e_c, e_c.transpose(1, 0, 2, 3))
    assert np.allclose(e_c, e_c.transpose(2, 3, 0, 1))
