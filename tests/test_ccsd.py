"""CCSD tests (the reference tree has no coupled cluster).

Physics pins: CCSD is EXACT for two-electron systems (== FCI to 1e-9);
the zero-amplitude starting energy is MP2; on H4 the CCSD error vs FCI
collapses by three orders of magnitude relative to MP2.
"""
import numpy as np
import pytest

from pyqed_tpu.qchem import Molecule, RHF, FCI, CCSD, MP2


def test_ccsd_h2_equals_fci():
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))])
    mf = RHF(mol); mf.run()
    cc = CCSD(mf).run()
    assert cc.converged
    e_fci = FCI(mf).run()[0]
    assert abs(cc.e_tot - e_fci) < 1e-9
    # MP2 start consistency (independent implementation)
    assert abs(cc.e_mp2 - MP2(mf).run().e_corr) < 1e-12


def test_ccsd_heh_cation_equals_fci():
    mol = Molecule([("He", (0, 0, 0)), ("H", (0, 0, 1.4632))], charge=1)
    mf = RHF(mol); mf.run()
    cc = CCSD(mf).run()
    e_fci = FCI(mf).run()[0]
    assert abs(cc.e_tot - e_fci) < 1e-8


def test_ccsd_h4_beats_mp2_vs_fci():
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.6)),
                    ("H", (2.2, 0, 0)), ("H", (2.2, 0, 1.6))])
    mf = RHF(mol); mf.run()
    cc = CCSD(mf).run()
    assert cc.converged
    e_fci = FCI(mf).run()[0]
    e_mp2 = MP2(mf).run().e_tot
    # measured: CCSD-FCI = 0.012 mHa, MP2-FCI = 25.3 mHa
    assert abs(cc.e_tot - e_fci) < 1e-4
    assert abs(cc.e_tot - e_fci) < 0.01 * abs(e_mp2 - e_fci)


def test_ccsd_t_zero_for_two_electrons():
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))])
    mf = RHF(mol); mf.run()
    cc = CCSD(mf).run()
    assert cc.ccsd_t() == 0.0


def test_ccsd_t_closes_fci_gap_h4_chain():
    # asymmetric H4 chain: (T) = -0.029 mHa takes CCSD-FCI from
    # 0.030 mHa to 0.0015 mHa (20x closer)
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.5)),
                    ("H", (0, 0, 3.3)), ("H", (0, 0, 5.0))])
    mf = RHF(mol); mf.run()
    cc = CCSD(mf).run()
    et = cc.ccsd_t()
    assert et < 0.0
    e_fci = FCI(mf).run()[0]
    assert abs(cc.e_tot_t - e_fci) < 0.2 * abs(cc.e_tot - e_fci)
    assert abs(cc.e_tot_t - e_fci) < 1e-5
