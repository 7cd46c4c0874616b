"""Ab-initio LVC builder (reference pyqed/qchem/vibronic.py:22
``LVC_DFT`` — a skeleton there, made real): LiH/STO-3G closed-loop
validation of the full pipeline (Hessian -> normal modes -> TDA ->
FD vibronic couplings -> LVC model).
"""
import numpy as np
import pytest

from pyqed_tpu.qchem.vibronic import LVCBuilder


@pytest.fixture(scope="module")
def lih_builder():
    # optimized RHF/STO-3G LiH bond (re = 2.855 bohr, verified via
    # GeometryOptimizer)
    atoms = [("Li", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 2.8550264))]
    b = LVCBuilder(atoms, nstates=3, dq=0.05)
    b.run()
    return b


def test_normal_mode_frequency(lih_builder):
    """One vibration; RHF/STO-3G LiH harmonic stretch ~1868 cm^-1."""
    b = lih_builder
    assert b.omegas.shape == (1,)
    assert abs(b.omegas[0] * 219474.63 - 1868) < 30


def test_ground_state_gradient_vanishes(lih_builder):
    """kappa_0 ~ 0 at the optimized geometry."""
    assert abs(lih_builder.kappa[0, 0]) < 1e-4


def test_sigma_pi_coupling_zero_by_symmetry(lih_builder):
    """The stretch is sigma-symmetric, so the FD NAC between the
    1Sigma+ and 1Pi TDA states vanishes."""
    assert abs(lih_builder.lam[0, 1, 2]) < 1e-8


def test_lvc_apes_matches_ab_initio(lih_builder):
    """The LVC surfaces (harmonic + linear kappa) reproduce directly
    computed ab initio adiabatic energies at Q = +-0.3 to the cubic
    anharmonicity (~2e-3 Eh here)."""
    b = lih_builder
    for Q in (-0.3, 0.3):
        model = np.sort(np.asarray(b.lvc.APES([Q])).real)
        abinit = np.sort(b.ab_initio_apes(0, Q))
        assert np.max(np.abs(model - abinit)) < 3e-3, Q
    # tighter near the expansion point (the residual here is the
    # state-specific curvature the LVC ansatz shares across states)
    for Q in (-0.1, 0.1):
        model = np.sort(np.asarray(b.lvc.APES([Q])).real)
        abinit = np.sort(b.ab_initio_apes(0, Q))
        assert np.max(np.abs(model - abinit)) < 1e-3, Q


def test_lvc_model_is_runnable(lih_builder):
    """The built model drives the standard LVC machinery: buildH +
    eigenstates on the vibronic product space."""
    lvc = lih_builder.lvc
    H = np.asarray(lvc.buildH())
    assert np.allclose(H, H.conj().T, atol=1e-12)
    w = np.linalg.eigvalsh(H)
    # ZPE-free boson convention: ground vibronic level ~ 0 (shifted
    # only by the tiny residual kappa_0^2 / 2 omega)
    assert abs(w[0]) < 1e-6
    # first vibrational quantum on the ground surface = omega
    assert abs(w[1] - lih_builder.omegas[0]) < 1e-5
