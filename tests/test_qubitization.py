"""Qubitization of molecular Hamiltonians (reference:
pyqed/qchem/ci/casci.py get_SO_matrix/qubitization/jordan_wigner/
fix_nelec_by_energy_penalty).

Pins: qubit ground energy (particle-number sector) == FCI/CASCI total
energy exactly; JW == BK spectra; Pauli decomposition reconstructs H;
number penalty selects the physical sector.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.qchem import Molecule, RHF
from pyqed_tpu.qchem.ci import FCI, CASCI
from pyqed_tpu.qchem import qubit as qb


@pytest.fixture(scope="module")
def h2():
    mol = Molecule([("H", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 1.4))],
                   basis="sto-3g", unit="bohr")
    mf = RHF(mol)
    mf.run()
    return mf


def _sector_ground(H, ns, na, nb):
    """Lowest eigenvalue restricted to the (na, nb) particle sector."""
    w, v = np.linalg.eigh(np.asarray(H))
    Na = np.asarray(qb.number_operator(ns, "alpha"))
    Nb = np.asarray(qb.number_operator(ns, "beta"))
    for i in range(len(w)):
        vec = v[:, i]
        if (abs(vec @ Na @ vec - na) < 1e-8
                and abs(vec @ Nb @ vec - nb) < 1e-8):
            return w[i]
    raise AssertionError("no state in sector")


def test_h2_qubit_ground_equals_fci(h2):
    H = qb.qubitize(h2)
    fci = FCI(h2)
    e_fci = float(fci.run()[0])
    e_q = _sector_ground(H, 4, 1, 1)
    assert abs(e_q - e_fci) < 1e-10


def test_jw_bk_same_spectrum(h2):
    Hjw = np.asarray(qb.qubitize(h2, encoding="jw"))
    Hbk = np.asarray(qb.qubitize(h2, encoding="bk"))
    wj = np.linalg.eigvalsh(Hjw)
    wb = np.linalg.eigvalsh(Hbk)
    assert np.max(np.abs(wj - wb)) < 1e-10


def test_pauli_decomposition_reconstructs(h2):
    H = np.asarray(qb.qubitize(h2))
    coefs = qb.pauli_decompose(H, 4)
    # H2/STO-3G in JW is the textbook 15-string Hamiltonian
    assert len(coefs) == 15
    # reconstruct
    def kron_all(s):
        M = np.array([[1.0]], dtype=complex)
        for ch in s:
            M = np.kron(M, qb._PAULIS[ch])
        return M
    Hr = sum(c * kron_all(s) for s, c in coefs.items())
    assert np.max(np.abs(Hr - H)) < 1e-9
    # all coefficients are real (H is Hermitian, strings Hermitian)
    assert all(isinstance(c, float) for c in coefs.values())


def test_fix_nelec_penalty(h2):
    H = qb.qubitize(h2)
    # without penalty: the absolute ground state may live anywhere;
    # with a large penalty, argmin eigenvector is in the (1,1) sector
    Hp = qb.fix_nelec_penalty(H, 4, 1, 1, shift=5.0)
    w, v = np.linalg.eigh(np.asarray(Hp))
    vec = v[:, 0]
    Na = np.asarray(qb.number_operator(4, "alpha"))
    Nb = np.asarray(qb.number_operator(4, "beta"))
    assert abs(vec @ Na @ vec - 1) < 1e-8
    assert abs(vec @ Nb @ vec - 1) < 1e-8
    # and the penalized ground energy equals the sector energy of H
    fci = FCI(h2)
    assert abs(w[0] - float(fci.run()[0])) < 1e-10


def test_casci_qubitization_lih():
    mol = Molecule([("Li", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 3.0))],
                   basis="sto-3g", unit="bohr")
    mf = RHF(mol)
    mf.run()
    cas = CASCI(mf, ncas=2, nelecas=2)
    e_cas = float(cas.run()[0])
    H = qb.qubitize(mf, ncas=2, nelecas=2)
    e_q = _sector_ground(H, 4, 1, 1)
    assert abs(e_q - e_cas) < 1e-10


def test_pauli_string_hamiltonian_api(h2):
    coefs = qb.pauli_string_hamiltonian(h2)
    assert "IIII" in coefs            # identity offset present
    e_id = coefs["IIII"]
    assert np.isfinite(e_id)
