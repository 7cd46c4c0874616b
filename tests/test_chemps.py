"""Ab initio DMRG: exact QC-MPO from (h1e, eri) + ground state vs FCI.

Reference: pyqed/qchem/dmrg.py:834 ``DMRG(mf, D)`` (renormalized blocks
with complementary operators, pyscf integrals there; exact compressed
MPO + this package's SCF/FCI here).
"""
import numpy as np
import pytest

from pyqed_tpu.tn.chemps import (mpo_from_product_terms, qc_mpo,
                                 spin_orbital_terms, number_mpo, DMRGQC)
from pyqed_tpu.qchem import Molecule
from pyqed_tpu.qchem.scf import RHF
from pyqed_tpu.qchem.ci import FCI, spinorb_ints


def _kron_chain(mats):
    out = mats[0]
    for m in mats[1:]:
        out = np.kron(out, m)
    return out


def test_cp_to_mpo_exact():
    """Random sum of product operators: compressed MPO == kron sum."""
    rng = np.random.default_rng(0)
    L, P = 5, 13
    ops = rng.standard_normal((P, L, 2, 2))
    co = rng.standard_normal(P)
    mpo = mpo_from_product_terms(co, ops)
    dense = np.asarray(mpo.to_dense())
    truth = sum(co[t] * _kron_chain(list(ops[t])) for t in range(P))
    np.testing.assert_allclose(dense, truth, atol=1e-12)


def test_mpo_two_sided_rank():
    """Bond profile must shrink toward BOTH ends (right-to-left sweep)."""
    rng = np.random.default_rng(1)
    L, P = 6, 40
    ops = rng.standard_normal((P, L, 2, 2))
    mpo = mpo_from_product_terms(np.ones(P), ops)
    dims = [int(W.shape[1]) for W in mpo.Ws]
    assert dims[-1] == 1 and dims[-2] <= 4 * dims[-1] * 4


def _h2():
    mol = Molecule([("H", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 1.4))],
                   basis="sto-3g", unit="bohr")
    mf = RHF(mol)
    mf.run()
    return mol, mf


def test_qc_mpo_is_exact_hamiltonian():
    """Dense QC-MPO == FCI energy in the N=2 sector (independent code
    paths: JW products + SVD compression vs Slater-Condon rules)."""
    mol, mf = _h2()
    e_fci = FCI(mf).run()[0]
    h, g = spinorb_ints(*mf.mo_ints())
    Hd = np.asarray(qc_mpo(h, g).to_dense())
    np.testing.assert_allclose(Hd, Hd.conj().T, atol=1e-12)
    Nd = np.asarray(number_mpo(4).to_dense())
    w, v = np.linalg.eigh(Hd)
    nvals = np.einsum("ia, ij, ja -> a", v.conj(), Nd, v).real
    e0 = w[np.abs(nvals - 2.0) < 1e-8].min() + mol.energy_nuc()
    np.testing.assert_allclose(e0, e_fci, atol=1e-10)


def test_number_penalty_terms():
    """Penalized MPO == bare MPO + shift*(N-nelec)^2, dense."""
    rng = np.random.default_rng(2)
    n = 2
    hmo = rng.standard_normal((n, n))
    hmo = hmo + hmo.T
    eri = np.zeros((n, n, n, n))
    h, g = spinorb_ints(hmo, eri)
    H0 = np.asarray(qc_mpo(h, g).to_dense())
    Hp = np.asarray(qc_mpo(h, g, nelec=2, shift=1.7).to_dense())
    Nd = np.asarray(number_mpo(2 * n).to_dense())
    pen = 1.7 * (Nd - 2.0 * np.eye(Nd.shape[0])) @ (
        Nd - 2.0 * np.eye(Nd.shape[0]))
    np.testing.assert_allclose(Hp, H0 + pen, atol=1e-10)


def test_dmrgqc_h2_vs_fci():
    mol, mf = _h2()
    e_fci = FCI(mf).run()[0]
    e = DMRGQC(mf, D=16).run()
    np.testing.assert_allclose(e, e_fci, atol=1e-9)


@pytest.mark.slow
def test_dmrgqc_h4_vs_fci():
    mol = Molecule([("H", (0.0, 0.0, 1.8 * i)) for i in range(4)],
                   basis="sto-3g", unit="bohr")
    mf = RHF(mol)
    mf.run()
    e_fci = FCI(mf).run()[0]
    d = DMRGQC(mf, D=32)
    e = d.run()
    # complementary-operator O(k^2) bond scaling, symmetric profile
    dims = [int(W.shape[1]) for W in d.mpo.Ws]
    assert max(dims) <= 64
    np.testing.assert_allclose(e, e_fci, atol=1e-9)


@pytest.mark.slow
def test_dmrgqc_h2o_vs_fci():
    """H2O/STO-3G (14 spin-orbitals): the reference's own demo system
    (pyqed/qchem/dmrg.py __main__)."""
    mol = Molecule([("O", (0.0, 0.0, 0.2217)),
                    ("H", (0.0, 1.4309, -0.8867)),
                    ("H", (0.0, -1.4309, -0.8867))],
                   basis="sto-3g", unit="bohr")
    mf = RHF(mol)
    mf.run()
    e_fci = FCI(mf).run()[0]
    e = DMRGQC(mf, D=64).run()
    np.testing.assert_allclose(e, e_fci, atol=1e-7)
