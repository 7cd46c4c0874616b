"""Nuclear gradients + geometry optimization (reference:
pyqed/qchem/grad.py:9 ``Grad`` — an empty skeleton there, made real).
"""
import numpy as np
import pytest

from pyqed_tpu.qchem import Molecule, Grad, GeometryOptimizer


H2 = lambda r: [("H", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, r))]


def test_grad_translational_invariance_and_sign():
    """At a stretched bond the force pulls the atoms together, and the
    total gradient (net force) vanishes by translational invariance."""
    g = Grad(atoms=H2(1.8), basis="sto-3g").run()
    assert g.de.shape == (2, 3)
    # net force ~ 0
    assert np.max(np.abs(g.de.sum(axis=0))) < 1e-6
    # stretched: dE/dz of atom 2 positive means E grows when stretching
    # further -> at r > re the gradient on atom 2 along +z is... E(r)
    # rises for r > re, so dE/dr > 0: atom-2 z-gradient > 0
    assert g.de[1, 2] > 1e-3
    # compressed bond: opposite sign
    g2 = Grad(atoms=H2(1.0), basis="sto-3g").run()
    assert g2.de[1, 2] < -1e-3


def test_grad_matches_energy_scan_derivative():
    """FD gradient equals the derivative of the 1D bond scan."""
    r = 1.5
    g = Grad(atoms=H2(r), basis="sto-3g", step=1e-3).run()
    h = 1e-3
    ep = Molecule(H2(r + h)).RHF().run().e_tot
    em = Molecule(H2(r - h)).RHF().run().e_tot
    dEdr = (ep - em) / (2 * h)
    assert abs(g.de[1, 2] - dEdr) < 1e-9


def test_grad_from_meanfield_object():
    """Reference calling convention Grad(mf) (pyqed/qchem/grad.py:10)."""
    mf = Molecule(H2(1.4)).RHF()
    g = Grad(mf).run()
    assert g.de.shape == (2, 3)
    assert np.isfinite(g.e_tot)


def test_h2_geometry_optimization_sto3g():
    """RHF/STO-3G H2 equilibrium bond: literature 1.346 bohr (0.712 A;
    Szabo & Ostlund Table 3.11 / standard result)."""
    opt = GeometryOptimizer(H2(1.8), basis="sto-3g", gtol=1e-5).run()
    assert opt.converged
    ropt = np.linalg.norm(opt.atoms_opt[1][1] - opt.atoms_opt[0][1])
    assert abs(ropt - 1.346) < 5e-3
    # optimized energy below both endpoints of the scan
    e_18 = Molecule(H2(1.8)).RHF().run().e_tot
    assert opt.e_tot < e_18
    # gradient ~ 0 at the optimum
    assert np.max(np.abs(opt.grad_final)) < 1e-4


@pytest.mark.slow
def test_water_geometry_optimization_sto3g():
    """Polyatomic optimizer check: RHF/STO-3G water relaxes to the
    literature structure r(OH) = 0.989 A, HOH = 100.0 deg,
    E = -74.9659 Eh (standard STO-3G result; the reference's Grad/
    optimizer do not exist to compare against)."""
    atoms0 = [("O", (0.0, 0.0, 0.25)),
              ("H", (0.0, 1.50, -0.85)),
              ("H", (0.0, -1.50, -0.85))]
    opt = GeometryOptimizer(atoms0, basis="sto-3g", gtol=3e-4,
                            maxiter=40).run()
    assert opt.converged
    xo = np.asarray(opt.atoms_opt[0][1])
    xh1 = np.asarray(opt.atoms_opt[1][1])
    xh2 = np.asarray(opt.atoms_opt[2][1])
    r1 = np.linalg.norm(xh1 - xo) * 0.529177
    r2 = np.linalg.norm(xh2 - xo) * 0.529177
    cosang = np.dot(xh1 - xo, xh2 - xo) / np.linalg.norm(
        xh1 - xo) / np.linalg.norm(xh2 - xo)
    ang = np.degrees(np.arccos(cosang))
    assert abs(r1 - 0.989) < 0.01 and abs(r2 - 0.989) < 0.01, (r1, r2)
    assert abs(ang - 100.0) < 1.0, ang
    assert abs(opt.e_tot - (-74.9659)) < 5e-4


def test_uhf_gradient_oh_radical():
    """Open-shell gradient path: OH radical (doublet) UHF/STO-3G net
    force vanishes by translational invariance and the bond force has
    the right sign on both sides of equilibrium."""
    def oh(r):
        return [("O", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, r))]
    g_long = Grad(atoms=oh(2.2), basis="sto-3g", method="UHF",
                  spin=1).run()
    assert np.max(np.abs(g_long.de.sum(axis=0))) < 1e-6
    assert g_long.de[1, 2] > 1e-3
    g_short = Grad(atoms=oh(1.5), basis="sto-3g", method="UHF",
                   spin=1).run()
    assert g_short.de[1, 2] < -1e-3
