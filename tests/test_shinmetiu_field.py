"""Shin-Metiu model in a static electric field (models/vibronic.py).

Reference: pyqed/models/ShinMetiu.py:871 ShinMetiu2InElectricField.
"""
import numpy as np

from pyqed_tpu.models.vibronic import ShinMetiu, ShinMetiuInField


def test_zero_field_reduces_to_base():
    m0 = ShinMetiu()
    m0.create_grid(64)
    mf = ShinMetiuInField(E=0.0)
    mf.create_grid(64)
    E0, _ = m0.pes([0.1, -0.3])
    E1, _ = mf.pes([0.1, -0.3])
    assert np.max(np.abs(np.asarray(E0) - np.asarray(E1))) < 1e-14


def test_field_parity_symmetry():
    """The model is symmetric under (F, R, r) -> (-F, -R, -r):
    E(F, R) == E(-F, -R)."""
    mp = ShinMetiuInField(E=0.003)
    mp.create_grid(64)
    mm = ShinMetiuInField(E=-0.003)
    mm.create_grid(64)
    ep, _ = mp.pes([0.4])
    em, _ = mm.pes([-0.4])
    assert np.max(np.abs(np.asarray(ep) - np.asarray(em))) < 1e-10


def test_quadratic_stark_shift():
    """R=0 (parity-symmetric point): linear Stark vanishes, quadratic
    shift is negative (ground-state polarizability > 0)."""
    F = 0.002
    m0 = ShinMetiu()
    m0.create_grid(64)
    mp = ShinMetiuInField(E=F)
    mp.create_grid(64)
    mm = ShinMetiuInField(E=-F)
    mm.create_grid(64)
    e0 = float(m0.pes([0.0])[0][0, 0])
    ep = float(mp.pes([0.0])[0][0, 0])
    em = float(mm.pes([0.0])[0][0, 0])
    assert abs(ep - em) < 1e-12              # no linear term at R=0
    d2 = ep + em - 2 * e0
    assert d2 < -1e-6                        # quadratic lowering
    # polarizability from the shift: alpha = -d2/F^2, sane magnitude
    alpha = -d2 / F ** 2
    assert 1.0 < alpha < 1e4


def test_field_tilts_pes():
    """A field along the proton axis breaks the R -> -R degeneracy of
    the double well."""
    m = ShinMetiuInField(E=0.005)
    m.create_grid(64)
    E, _ = m.pes([-2.0, 2.0])
    e = np.asarray(E)[:, 0]
    assert abs(e[0] - e[1]) > 1e-3
