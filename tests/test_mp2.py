"""MP2 tests (the reference has MP2 only as comments/pyscf wrappers,
pyqed/qchem/mol.py:1597).

Pinned two independent ways: (i) the closed-shell spatial-orbital einsum
must equal the spin-orbital MBPT2 sum built from ``spinorb_ints`` (a
completely different code path, antisymmetrized physicists' integrals);
(ii) E_HF > E_MP2 > E_FCI ordering on H2.
"""
import numpy as np
import pytest

from pyqed_tpu.qchem import Molecule, RHF, FCI, MP2, spinorb_ints


def _mbpt2_spinorb(mf):
    hmo, eri_mo = mf.mo_ints()
    _, g = spinorb_ints(hmo, eri_mo)
    eps = np.repeat(np.asarray(mf.mo_energy), 2)
    no = mf.nocc * 2
    nv = len(eps)
    e2 = 0.0
    for i in range(no):
        for j in range(no):
            for a in range(no, nv):
                for b in range(no, nv):
                    e2 += 0.25 * g[i, j, a, b] ** 2 / (
                        eps[i] + eps[j] - eps[a] - eps[b])
    return e2


def test_mp2_h2_vs_spinorbital_mbpt2_and_fci():
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))])
    mf = RHF(mol); mf.run()
    mp = MP2(mf).run()
    # textbook-scale H2/STO-3G correlation (~ -0.0131 Eh) and exact match
    # with the independent spin-orbital route
    assert abs(mp.e_corr - _mbpt2_spinorb(mf)) < 1e-12
    assert -0.0145 < mp.e_corr < -0.012
    e_fci = FCI(mf).run()[0]
    assert mf.e_tot > mp.e_tot > e_fci


def test_mp2_heh_cation():
    mol = Molecule([("He", (0, 0, 0)), ("H", (0, 0, 1.4632))], charge=1)
    mf = RHF(mol); mf.run()
    mp = MP2(mf).run()
    assert abs(mp.e_corr - _mbpt2_spinorb(mf)) < 1e-12
    assert mp.e_corr < 0.0
    # SCS recombination is consistent with its parts
    assert abs((mp.e_scs - mf.e_tot)
               - (1.2 * mp.e_corr_os + mp.e_corr_ss / 3.0)) < 1e-12
    # singlet 2-electron system: same-spin part vanishes identically
    # only for a single occupied orbital pair? no — but OS dominates
    assert mp.e_corr_os < 0.0


def test_mp2_two_electron_ss_zero():
    # 2-electron closed shell: both electrons occupy one spatial orbital
    # -> no same-spin pair exists, E_SS = 0 identically
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))])
    mf = RHF(mol); mf.run()
    mp = MP2(mf).run()
    assert abs(mp.e_corr_ss) < 1e-12


def test_ump2_closed_shell_equals_rmp2():
    from pyqed_tpu.qchem import UHF, UMP2
    mol = Molecule([("He", (0, 0, 0)), ("H", (0, 0, 1.4632))], charge=1)
    mfR = RHF(mol); mfR.run()
    mfU = UHF(mol); mfU.run()
    r = MP2(mfR).run()
    u = UMP2(mfU).run()
    assert abs(r.e_corr - u.e_corr) < 1e-8
    assert abs(u.e_corr_ss) < 1e-10       # two electrons: SS block empty


def test_ump2_doublet_h3():
    from pyqed_tpu.qchem import UHF, UMP2
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.8)),
                    ("H", (0, 0, 3.6))], spin=1)
    mf = UHF(mol); mf.run()
    u = UMP2(mf).run()
    # measured: -0.01207 Eh; correlation negative, all blocks finite
    assert -0.02 < u.e_corr < -0.005
    assert u.e_corr_os < 0.0
