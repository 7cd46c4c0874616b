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
