"""Analytic RKS/UKS nuclear gradients (qchem/grad.py::ks_gradient):
HF-like core + autodiff XC term with exact grid-weight derivatives.
FD cross-checks use the project's own central-difference Grad; the
agreement floor there is the FD truncation (~4e-6 at h=5e-3), so the
slow Richardson pin shows the analytic gradient is exact to ~1e-9.

(reference: pyqed delegates DFT gradients to pyscf —
pyqed/qchem/mol.py:817; native here.)"""
import numpy as np
import pytest

from pyqed_tpu.qchem.mol import Molecule
from pyqed_tpu.qchem.grad import (ks_gradient, scf_gradient,
                                  xc_nuclear_gradient, Grad,
                                  _method_energy)

H2O = [("O", (0.0, 0.0, 0.2217)),
       ("H", (0.0, 1.4309, -0.8867)),
       ("H", (0.0, -1.4309, -0.8867))]


def _rks(xc, basis="sto-3g"):
    mol = Molecule(H2O, basis=basis)
    mf = mol.RKS(xc=xc)
    mf.run()
    assert mf.converged
    return mf


@pytest.mark.slow
@pytest.mark.parametrize("xc", ["svwn", "pbe", "b3lyp"])
def test_rks_gradient_vs_fd(xc):
    mf = _rks(xc)
    ga = ks_gradient(mf)
    gfd = Grad(atoms=H2O, method="RKS", xc=xc, basis="sto-3g").run().de
    # 4e-6: the FD truncation floor at h=5e-3 (Richardson places the
    # analytic error itself at ~7e-10, see the pin below)
    assert np.max(np.abs(ga - gfd)) < 5e-6
    # translational invariance: gradient rows sum to ~0
    assert np.max(np.abs(ga.sum(axis=0))) < 1e-6


@pytest.mark.slow
def test_rks_pbe_gradient_richardson_pin():
    """One component against Richardson-extrapolated FD (O(h^4)):
    the analytic value must sit far below the plain-FD floor."""
    mf = _rks("pbe")
    ga = ks_gradient(mf)

    def fd(i, x, h):
        ap = [(s, np.array(c, float)) for s, c in H2O]
        am = [(s, np.array(c, float)) for s, c in H2O]
        ap[i][1][x] += h
        am[i][1][x] -= h
        return (_method_energy(ap, "sto-3g", "RKS", xc="pbe")
                - _method_energy(am, "sto-3g", "RKS", xc="pbe")) / (2 * h)

    g1 = fd(0, 2, 4e-3)
    g2 = fd(0, 2, 2e-3)
    rich = (4 * g2 - g1) / 3.0
    assert abs(ga[0, 2] - rich) < 1e-7


@pytest.mark.slow
def test_uks_gradient_vs_fd():
    # OH radical (doublet): open-shell path through the spin-resolved
    # functional and per-spin exchange
    oh = [("O", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 1.8324))]
    mol = Molecule(oh, spin=1, basis="sto-3g")
    # conv_tol 1e-10: UKS DIIS on OH plateaus below ~1e-11, and the FD
    # denominator divides SCF noise by h=5e-3, so the FD floor here is
    # ~2e-6 noise + ~4e-6 truncation. The exactness statement is the
    # RKS Richardson pin (same machinery) plus the translational
    # invariance below, which is convergence-independent.
    mf = mol.UKS(xc="pbe", conv_tol=1e-10, max_cycle=300)
    mf.run()
    assert mf.converged
    ga = ks_gradient(mf)
    gfd = Grad(atoms=oh, method="UKS", xc="pbe", spin=1, step=2e-3,
               basis="sto-3g", conv_tol=1e-10, max_cycle=300).run().de
    assert np.max(np.abs(ga - gfd)) < 5e-6
    assert np.max(np.abs(ga.sum(axis=0))) < 1e-8


def test_scf_gradient_dispatch_and_guards():
    mf = _rks("svwn")
    g1 = scf_gradient(mf)            # dispatches to ks_gradient
    g2 = ks_gradient(mf)
    assert np.allclose(g1, g2)
    from pyqed_tpu.qchem.grad import rhf_gradient
    with pytest.raises(TypeError):
        rhf_gradient(mf)             # KS mean-field rejected


def test_xc_gradient_translational_invariance():
    # the XC term alone must be translationally invariant (grid,
    # weights, and AOs all ride the atoms)
    mf = _rks("pbe")
    gxc = xc_nuclear_gradient(mf)
    assert np.max(np.abs(gxc.sum(axis=0))) < 1e-8
