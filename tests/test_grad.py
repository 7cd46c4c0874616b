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
