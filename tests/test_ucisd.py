"""Unrestricted CI on a UHF reference (qchem/ci.py UCISD/UFCI).

Reference: pyqed/qchem/ci/cisd.py UCISD (pyscf-backed there).
"""
import numpy as np
import pytest

from pyqed_tpu.qchem import Molecule, RHF, UHF, FCI
from pyqed_tpu.qchem.ci import UFCI, UCISD


def test_ufci_invariant_to_reference_h2():
    """Closed-shell H2: FCI from RHF orbitals == UFCI from UHF orbitals
    (full CI is invariant to the orbital basis)."""
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))], basis="6-31g")
    mf = RHF(mol)
    mf.run()
    efci = float(FCI(mf).run()[0])
    umf = UHF(mol)
    umf.run()
    eufci = float(UFCI(umf).run()[0])
    assert abs(eufci - efci) < 1e-10
    # 2 electrons: CISD == FCI
    assert abs(float(UCISD(umf).run()[0]) - efci) < 1e-10


def test_open_shell_h_atom_exact():
    """One electron: UCI with singles == exact eigenvalue of h."""
    mol = Molecule([("H", (0, 0, 0))], basis="6-31g", spin=1)
    umf = UHF(mol)
    umf.run()
    e = float(UFCI(umf).run()[0])
    # exact: lowest eigenvalue of the one-electron Hamiltonian
    import scipy.linalg
    w = scipy.linalg.eigh(np.asarray(umf.hcore), np.asarray(umf.S),
                          eigvals_only=True)[0]
    assert abs(e - w) < 1e-10


def test_h3_doublet_variational_ordering():
    """Open-shell H3 (doublet): E_UHF >= E_UCISD >= E_UFCI."""
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.8)),
                    ("H", (0, 0, 3.6))], basis="sto-3g", spin=1)
    umf = UHF(mol)
    umf.run()
    eucisd = float(UCISD(umf).run()[0])
    eufci = float(UFCI(umf).run()[0])
    assert umf.e_tot >= eucisd - 1e-10
    assert eucisd >= eufci - 1e-10
    # correlation energy is negative and sane
    assert -0.2 < eufci - umf.e_tot < -1e-4
