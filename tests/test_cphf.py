"""Analytic CPHF polarizabilities vs finite-field (reference reaches
polarizabilities only through pyscf properties; in-house here)."""
import numpy as np
import pytest

from pyqed_tpu.qchem import Molecule, RHF, TDHF
from pyqed_tpu.qchem.cphf import polarizability_cphf, polarizability_dynamic

ATOMS = [("O", (0.0, 0.0, 0.2217)),
         ("H", (0.0, 1.4309, -0.8867)),
         ("H", (0.0, -1.4309, -0.8867))]


@pytest.fixture(scope="module")
def mf():
    return RHF(Molecule(ATOMS, basis="6-31g"), conv_tol=1e-12).run()


def test_cphf_matches_finite_field(mf):
    a = polarizability_cphf(mf)
    a_ff = np.asarray(mf.polarizability(eps=2e-3))
    assert np.max(np.abs(a - a_ff)) < 5e-4
    # symmetric, positive definite, C2v diagonal in these axes
    assert np.max(np.abs(a - a.T)) < 1e-10
    assert np.all(np.linalg.eigvalsh(a) > 0)
    assert np.max(np.abs(a - np.diag(np.diag(a)))) < 1e-8


def test_dynamic_static_limit_and_pole(mf):
    e1 = TDHF(mf).run(nroots=1)[0]
    aw = polarizability_dynamic(mf, [0.0, 0.9 * e1])
    assert np.max(np.abs(aw[0] - polarizability_cphf(mf))) < 1e-12
    # dispersion: alpha grows approaching the first pole
    assert np.trace(aw[1]) > np.trace(aw[0])


def test_dynamic_pole_at_tdhf_root(mf):
    """alpha(w) diverges across the first TDHF excitation with a sign
    change (simple-pole structure)."""
    e1 = TDHF(mf).run(nroots=1)[0]
    lo = np.trace(polarizability_dynamic(mf, [e1 - 1e-4])[0])
    hi = np.trace(polarizability_dynamic(mf, [e1 + 1e-4])[0])
    assert lo > 100 and hi < -100
