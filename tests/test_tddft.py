"""TDDFT (TDA/RPA on Kohn-Sham) with the autodiff adiabatic LDA kernel
(reference reaches TDDFT through pyscf, pyqed/qchem/mol.py:817)."""
import numpy as np
import pytest

from pyqed_tpu.qchem import Molecule, RKS, TDA, TDHF
from pyqed_tpu.qchem.cphf import polarizability_cphf
from pyqed_tpu.units import au2ev

WATER = [("O", (0.0, 0.0, 0.2217)),
         ("H", (0.0, 1.4309, -0.8867)),
         ("H", (0.0, -1.4309, -0.8867))]


@pytest.fixture(scope="module")
def water_lda():
    return RKS(Molecule(WATER, basis="6-31g"), xc="svwn",
               conv_tol=1e-11).run()


def test_tda_lda_water(water_lda):
    """TDA-LDA water/6-31G: first singlet at 7.58 eV (in-house pin;
    TDLDA red-shifts ~1 eV vs TDHF's 9.4 eV, the expected LDA trend)."""
    e = np.asarray(TDA(water_lda).run(nroots=3)) * au2ev
    assert e[0] == pytest.approx(7.584, abs=0.02)
    assert np.all(np.diff(e) > 0)


def test_tddft_below_tda(water_lda):
    """Full TDDFT (RPA) roots sit at or below TDA roots."""
    e_tda = np.asarray(TDA(water_lda).run(nroots=3))
    e_rpa = np.asarray(TDHF(water_lda).run(nroots=3))
    assert np.all(e_rpa <= e_tda + 1e-12)


def test_response_alpha_equals_finite_field():
    """The strongest kernel pin: TDDFT linear-response polarizability
    == finite-field KS polarizability (validates f_xc exactly)."""
    mf = RKS(Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))],
                      basis="6-31g"), xc="svwn", conv_tol=1e-11).run()
    a_resp = polarizability_cphf(mf)
    a_ff = np.asarray(mf.polarizability(eps=2e-3))
    assert np.max(np.abs(a_resp - a_ff)) < 5e-4


def test_triplet_kernel_sign(water_lda):
    """Triplet TDA roots lie below singlet (f_aa - f_ab < f_aa + f_ab
    and no Coulomb term)."""
    es = np.asarray(TDA(water_lda, singlet=True).run(nroots=1))
    et = np.asarray(TDA(water_lda, singlet=False).run(nroots=1))
    assert et[0] < es[0]


@pytest.mark.parametrize("xc", ["pbe", "b3lyp", "pbe0"])
def test_gga_hybrid_response_alpha_equals_ff(xc):
    """GGA/hybrid TDDFT kernel (autodiff F(rho, sigma) channel + c_x
    exact exchange): response alpha == finite-field KS alpha."""
    mf = RKS(Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))],
                      basis="6-31g"), xc=xc, conv_tol=1e-11).run()
    a_resp = polarizability_cphf(mf)
    a_ff = np.asarray(mf.polarizability(eps=2e-3))
    assert np.max(np.abs(a_resp - a_ff)) < 5e-4


def test_gga_triplet_kernel_raises():
    mf = RKS(Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))],
                      basis="sto-3g"), xc="pbe", conv_tol=1e-9).run()
    with pytest.raises(NotImplementedError):
        TDA(mf, singlet=False).run(nroots=1)
