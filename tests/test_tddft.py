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


def _fd_kernel(mf, singlet, eps=3e-4):
    """Finite-difference XC kernel through the COMPLETE spin-resolved
    UKS potential (different code path: dft.UKS._xc_uks): perturb
    D_a += eps X, D_b -= eps X (triplet) or both += eps X (singlet) and
    differentiate V_a."""
    from pyqed_tpu.qchem.dft import UKS
    uks = UKS(mf.mol, xc=mf.xc)
    C = np.asarray(mf.mo_coeff)
    D = np.asarray(mf.dm) / 2.0
    nocc, nvir = mf.nocc, C.shape[1] - mf.nocc
    sgn_b = 1.0 if singlet else -1.0
    K = np.zeros((nocc * nvir, nocc * nvir))
    for j in range(nocc):
        for b in range(nvir):
            cj, cb = C[:, j], C[:, nocc + b]
            X = 0.5 * (np.outer(cj, cb) + np.outer(cb, cj))
            _, Vp, _ = uks._xc_uks(D + eps * X, D + sgn_b * eps * X)
            _, Vm, _ = uks._xc_uks(D - eps * X, D - sgn_b * eps * X)
            dV = (np.asarray(Vp) - np.asarray(Vm)) / (2 * eps)
            K[:, j * nvir + b] = (C[:, :nocc].T @ dV
                                  @ C[:, nocc:]).ravel()
    return K


@pytest.mark.slow
@pytest.mark.parametrize("xc", ["pbe", "b3lyp"])
@pytest.mark.parametrize("singlet", [True, False])
def test_gga_kernel_vs_uks_finite_difference(xc, singlet):
    """GGA singlet AND triplet kernels == finite differences of the
    spin-resolved UKS potential (independent code path incl. all
    grad-rho chain terms)."""
    from pyqed_tpu.qchem.tdscf import xc_kernel_ov
    mf = RKS(Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))],
                      basis="6-31g"), xc=xc, conv_tol=1e-11).run()
    K = np.asarray(xc_kernel_ov(mf, singlet=singlet))
    K_fd = _fd_kernel(mf, singlet)
    assert np.max(np.abs(K - K_fd)) < 2e-6


def test_gga_triplet_below_singlet():
    """PBE water: lowest triplet TDA root below the lowest singlet."""
    mf = RKS(Molecule(WATER, basis="6-31g"), xc="pbe",
             conv_tol=1e-10).run()
    es = np.asarray(TDA(mf, singlet=True).run(nroots=1))
    et = np.asarray(TDA(mf, singlet=False).run(nroots=1))
    assert 0.0 < et[0] < es[0]
