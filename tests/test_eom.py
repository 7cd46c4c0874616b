"""EOM-CCSD tests (no EOM / coupled cluster in the reference tree).

The determinant-space similarity transform gives three machine-checkable
invariants: <0|Hbar|0> = E_CCSD exactly; the S+D rows of Hbar's
reference column are the converged CCSD residuals (~0); and for
two-electron systems the EOM-EE energies equal FCI exactly.
"""
import numpy as np
import pytest

from pyqed_tpu.qchem import Molecule, RHF, FCI, CCSD, EOMCCSD


def test_eomccsd_h2_equals_fci_excitations():
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))])
    mf = RHF(mol); mf.run()
    cc = CCSD(mf).run()
    eom = EOMCCSD(cc)
    ee = eom.run(nroots=3)
    assert abs(eom.e_cc_check - cc.e_tot) < 1e-10
    assert eom.residual_norm < 1e-8
    efci = FCI(mf).run(nroots=4)
    ee_fci = np.asarray(efci[1:]) - efci[0]
    assert np.max(np.abs(np.asarray(ee) - ee_fci)) < 1e-8


def test_eomccsd_h4_close_to_fci():
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.5)),
                    ("H", (0, 0, 3.3)), ("H", (0, 0, 5.0))])
    mf = RHF(mol); mf.run()
    cc = CCSD(mf).run()
    eom = EOMCCSD(cc)
    ee = eom.run(nroots=4)
    assert abs(eom.e_cc_check - cc.e_tot) < 1e-7
    assert eom.residual_norm < 1e-5
    efci = FCI(mf).run(nroots=5)
    ee_fci = np.asarray(efci[1:]) - efci[0]
    # measured: 1.9 / 1.7 mHa deviations (normal EOM-CCSD accuracy)
    assert np.max(np.abs(np.asarray(ee) - ee_fci)) < 5e-3
