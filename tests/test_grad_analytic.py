"""Analytic RHF nuclear gradients (derivative MD integrals + C++
eri_deriv engine) vs finite differences and the native-vs-Python
derivative-ERI oracle (reference: pyqed/qchem/grad.py:9 — an empty
skeleton; the reference reaches gradients only through pyscf)."""
import numpy as np
import pytest

from pyqed_tpu.qchem import Molecule, RHF, rhf_gradient
from pyqed_tpu.qchem.grad import Grad, GeometryOptimizer

ATOMS = [("O", (0.0, 0.05, 0.25)),
         ("H", (0.03, 1.5, -0.9)),
         ("H", (0.0, -1.43, -0.88))]


def test_deriv_oneelectron_vs_fd():
    """Bra-derivative S/T/V integrals against center displacement."""
    from pyqed_tpu.qchem.basis import (
        build_basis, overlap_matrix, kinetic_matrix, _contract2,
        _nuclear_prim, overlap_deriv_bra, kinetic_deriv_bra,
        nuclear_deriv_bra)
    atoms = [("O", np.array([0.0, 0.1, 0.2217])),
             ("H", np.array([0.05, 1.4309, -0.8867]))]
    bfs = build_basis(atoms, "sto-3g")
    n, eps, i, x = len(bfs), 1e-6, 2, 1      # p function on O, y axis
    C = np.array([0.3, -0.2, 0.5])

    def vmat(b):
        V = np.zeros((n, n))
        for p in range(n):
            for q in range(n):
                V[p, q] = _contract2(_nuclear_prim, b[p], b[q], C)
        return V

    def fd(mat_fn):
        def shifted(s):
            b2 = build_basis(atoms, "sto-3g")
            c = np.array(b2[i].center)
            c[x] += s
            b2[i].center = c
            return b2
        return (mat_fn(shifted(eps)) - mat_fn(shifted(-eps))) / (2 * eps)

    for deriv, mat_fn in ((overlap_deriv_bra(bfs), overlap_matrix),
                          (kinetic_deriv_bra(bfs), kinetic_matrix),
                          (nuclear_deriv_bra(bfs, C), vmat)):
        fdm = fd(mat_fn)
        asm = np.zeros((n, n))
        asm[i, :] += deriv[x, i, :]
        asm[:, i] += deriv[x, i, :]           # ket = bra by symmetry
        assert np.max(np.abs(asm - fdm)) < 1e-8


def test_eri_deriv_native_matches_python_oracle():
    from pyqed_tpu.qchem.basis import build_basis, eri_deriv_bra_py
    from pyqed_tpu.qchem.engine import eri_deriv_native
    atoms = [("H", np.array([0.0, 0.0, 0.0])),
             ("H", np.array([0.2, 0.1, 1.4]))]
    bfs = build_basis(atoms, "6-31g")
    assert np.max(np.abs(eri_deriv_native(bfs)
                         - eri_deriv_bra_py(bfs))) < 1e-13


@pytest.mark.parametrize("basis, spherical", [
    ("sto-3g", False), ("6-31g*", False), ("6-31g*", True)])
def test_rhf_gradient_vs_fd(basis, spherical):
    mf = RHF(Molecule(ATOMS, basis=basis, spherical=spherical),
             conv_tol=1e-12).run()
    g = rhf_gradient(mf)
    gfd = Grad(mf=mf, step=1e-3, conv_tol=1e-12).run().de
    assert np.max(np.abs(g - gfd)) < 5e-7
    # translational invariance
    assert np.max(np.abs(g.sum(axis=0))) < 1e-9


def test_rhf_gradient_zero_at_optimized_geometry():
    opt = GeometryOptimizer(ATOMS, basis="sto-3g", gtol=1e-6,
                            conv_tol=1e-12).run()
    assert opt.converged
    mf = RHF(Molecule(opt.atoms_opt, basis="sto-3g"),
             conv_tol=1e-12).run()
    assert np.max(np.abs(rhf_gradient(mf))) < 2e-6
    # water STO-3G equilibrium: r(OH) ~ 0.989 A = 1.8694 bohr
    r = np.linalg.norm(np.asarray(opt.atoms_opt[1][1])
                       - np.asarray(opt.atoms_opt[0][1]))
    assert r == pytest.approx(1.8694, abs=2e-2)


def test_uhf_gradient_vs_fd():
    """Analytic UHF gradient (per-spin exchange) on the OH radical."""
    from pyqed_tpu.qchem import UHF
    mol = Molecule([("O", (0.0, 0.02, 0.0)), ("H", (0.03, 0.0, 1.9))],
                   spin=1, basis="6-31g")
    mf = UHF(mol, conv_tol=1e-12).run()
    g = rhf_gradient(mf)
    gfd = Grad(mf=mf, step=1e-3, conv_tol=1e-12).run().de
    assert np.max(np.abs(g - gfd)) < 5e-7
    assert np.max(np.abs(g.sum(axis=0))) < 1e-10


def test_uhf_gradient_equals_rhf_closed_shell():
    from pyqed_tpu.qchem import UHF
    mol = Molecule([("H", (0, 0, 0)), ("H", (0.1, 0, 1.5))],
                   basis="sto-3g")
    ga = rhf_gradient(UHF(mol, conv_tol=1e-12).run())
    gb = rhf_gradient(RHF(Molecule(mol.atoms, basis="sto-3g"),
                          conv_tol=1e-12).run())
    assert np.max(np.abs(ga - gb)) < 1e-9


def test_scf_gradient_rejects_ks_meanfield():
    """KS mean-fields lack the XC derivative term in rhf_gradient —
    silently wrong science must be a loud TypeError (review finding)."""
    import pytest
    from pyqed_tpu.qchem.dft import RKS
    ks = RKS(Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))],
                      basis="sto-3g"), xc="svwn").run()
    with pytest.raises(TypeError):
        rhf_gradient(ks)


def test_rhf_gradient_rejects_unconverged_scf():
    import pytest
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))], basis="sto-3g")
    mf = RHF(mol, max_cycle=1)
    mf.run()
    if not mf.converged:
        with pytest.raises(RuntimeError):
            rhf_gradient(mf)


def test_from_xyz_rejects_unit_kwarg(tmp_path):
    import pytest
    p = tmp_path / "h2.xyz"
    p.write_text("2\nH2\nH 0 0 0\nH 0 0 0.74\n")
    with pytest.raises(ValueError):
        Molecule.from_xyz(str(p), unit="angstrom")
    m = Molecule.from_xyz(str(p), basis="sto-3g")
    assert m.natm == 2


def test_excited_state_fd_gradient_and_optimizer():
    """Excited-state (TDA) forces and geometry relaxation — a surface
    the reference does not have at all (its gradients delegate to
    pyscf ground state).  LiH/sto-3g first singlet."""
    import numpy as np
    from pyqed_tpu.qchem.grad import (tda_gradient_fd,
                                      ExcitedGeometryOptimizer,
                                      excited_state_energy,
                                      optimize_geometry)

    lih = [("Li", (0, 0, 0.0)), ("H", (0, 0, 3.0))]
    g = tda_gradient_fd(lih, state=1)
    # translational invariance and O(h^2) vs Richardson O(h^4)
    assert np.max(np.abs(g.sum(axis=0))) < 1e-8
    g4 = tda_gradient_fd(lih, state=1, richardson=True)
    assert abs(g[1, 2] - g4[1, 2]) < 1e-5

    opt = ExcitedGeometryOptimizer(lih, state=1, maxiter=30).run()
    assert opt.converged
    Re_exc = abs(opt.atoms_opt[1][1][2] - opt.atoms_opt[0][1][2])
    # stationary point: forces vanish
    g_min = tda_gradient_fd(opt.atoms_opt, state=1)
    assert np.max(np.abs(g_min)) < 2e-3
    # the excited state relaxes to a LONGER bond than the ground state
    gs_atoms, _ = optimize_geometry(lih, basis="sto-3g", method="RHF")
    Re_gs = abs(gs_atoms[1][1][2] - gs_atoms[0][1][2])
    assert Re_exc > Re_gs + 0.05
    # adiabatic < vertical excitation energy
    E_vert = excited_state_energy(gs_atoms, state=1)[0]
    assert opt.e_tot < E_vert
