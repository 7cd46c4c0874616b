"""Orbital-optimized CASSCF (qchem/ci.py::CASSCF) via autodiff.

The reference tree names CASSCF (pyqed/qchem/mol.py dispatch) but ships
no working implementation; ours is pinned by variational inequalities
and the full-space invariance CASSCF == FCI.
"""
import numpy as np
import pytest

from pyqed_tpu.qchem import Molecule, RHF, FCI, CASCI
from pyqed_tpu.qchem.ci import CASSCF


@pytest.fixture(scope="module")
def h2_631g():
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))], basis="6-31g")
    mf = RHF(mol)
    mf.run()
    return mf


def test_casscf_between_casci_and_fci(h2_631g):
    mf = h2_631g
    efci = float(FCI(mf).run()[0])
    ecasci = float(CASCI(mf, 2, 2).run()[0])
    mc = CASSCF(mf, 2, 2)
    e = mc.run()
    assert mc.converged
    # orbital optimization strictly improves CASCI on RHF orbitals
    assert e < ecasci - 1e-4
    # but stays above FCI (smaller variational space)
    assert e > efci - 1e-9
    # known value: H2/6-31G CASSCF(2,2) ~ -1.1462 Eh
    assert abs(e - (-1.14625)) < 5e-4


def test_casscf_full_space_equals_fci():
    """Active space == full space: orbital rotations are redundant and
    CASSCF must reproduce FCI exactly."""
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))], basis="sto-3g")
    mf = RHF(mol)
    mf.run()
    efci = float(FCI(mf).run()[0])
    mc = CASSCF(mf, 2, 2)     # STO-3G H2: 2 orbitals = everything
    e = mc.run()
    assert abs(e - efci) < 1e-9


def test_casscf_orbitals_orthonormal(h2_631g):
    mf = h2_631g
    mc = CASSCF(mf, 2, 2)
    mc.run()
    C = mc.mo_coeff
    S = np.asarray(mf.S)
    assert np.allclose(C.T @ S @ C, np.eye(C.shape[1]), atol=1e-10)
