"""Dense-matrix parity tests for the FSM MPO algebra
(mpo_add / mpo_scale / mpo_shift / spin_squared_mpo / fix_spin_mpo /
fix_nelec_mpo) — regression for the mpo_scale start-row bug (terms
opening at sites k>0 must be scaled too).

Reference semantics: pyqed/qchem/dmrg.py ``DMRG.fix_spin``/``fix_nelec``.
"""
import numpy as np
import pytest

from pyqed_tpu.tn.autompo import (
    autompo_fermion, hubbard_mpo, mpo_add, mpo_scale, mpo_shift,
    spin_squared_mpo, fix_spin_mpo, fix_nelec_mpo,
)


def _rand_h_v(N, seed):
    rng = np.random.default_rng(seed)
    t = rng.normal(size=(N, N))
    t = 0.5 * (t + t.T)
    v = np.triu(rng.normal(size=(N, N)), 1)
    return t, v


def _number_op_dense(N):
    n1 = np.diag([0.0, 1.0])
    I = np.eye(2)
    tot = np.zeros((2 ** N, 2 ** N))
    for i in range(N):
        ops = [I] * N
        ops[i] = n1
        M = ops[0]
        for o in ops[1:]:
            M = np.kron(M, o)
        tot += M
    return tot


def test_mpo_add_dense_parity():
    tA, vA = _rand_h_v(3, 0)
    tB, vB = _rand_h_v(3, 1)
    A, B = autompo_fermion(tA, vA), autompo_fermion(tB, vB)
    got = np.asarray(mpo_add(A, B).to_dense())
    want = np.asarray(A.to_dense()) + np.asarray(B.to_dense())
    assert np.max(np.abs(got - want)) < 1e-12


@pytest.mark.parametrize("c", [2.0, -0.37])
def test_mpo_scale_dense_parity(c):
    # regression: terms opening at k>0 (e.g. n_1 n_2, hoppings from
    # site 1) must be scaled, not just site-0 openings
    t, v = _rand_h_v(4, 2)
    A = autompo_fermion(t, v)
    got = np.asarray(mpo_scale(A, c).to_dense())
    want = c * np.asarray(A.to_dense())
    assert np.max(np.abs(got - want)) < 1e-12


def test_mpo_shift_dense_parity():
    t, v = _rand_h_v(3, 3)
    A = autompo_fermion(t, v)
    got = np.asarray(mpo_shift(A, 1.73).to_dense())
    want = np.asarray(A.to_dense()) + 1.73 * np.eye(2 ** 3)
    assert np.max(np.abs(got - want)) < 1e-12


def test_spin_squared_spectrum():
    # 2 spatial sites / 4 JW sites: every Fock state carries total spin
    # S in {0, 1/2, 1}, so eigvals(S^2) subset of {0, 0.75, 2}
    S2 = np.asarray(spin_squared_mpo(2).to_dense())
    assert np.max(np.abs(S2 - S2.T)) < 1e-12
    w = np.linalg.eigvalsh(S2)
    allowed = np.array([0.0, 0.75, 2.0])
    dist = np.min(np.abs(w[:, None] - allowed[None, :]), axis=1)
    assert np.max(dist) < 1e-10
    # multiplicities on 2 orbitals: S=1 triplet appears exactly 3x
    assert np.sum(np.abs(w - 2.0) < 1e-8) == 3


def test_fix_spin_penalizes_triplet_keeps_singlet():
    shift = 0.5
    H = hubbard_mpo(2, t=1.0, U=4.0)
    Hd = np.asarray(H.to_dense())
    S2 = np.asarray(spin_squared_mpo(2).to_dense())
    Hp = np.asarray(fix_spin_mpo(H, 2, shift=shift, ss=0.0).to_dense())
    # exact operator identity: H + shift * S^2
    assert np.max(np.abs(Hp - (Hd + shift * S2))) < 1e-12
    # simultaneous eigenbasis check: singlet sector energies unchanged,
    # triplet shifted by shift * 2
    wS, U = np.linalg.eigh(S2)
    Hrot = U.T @ Hd @ U
    Hprot = U.T @ Hp @ U
    for k in range(len(wS)):
        blk = np.abs(wS - wS[k]) < 1e-8
        sub = Hrot[np.ix_(blk, blk)]
        subp = Hprot[np.ix_(blk, blk)]
        e = np.linalg.eigvalsh(sub)
        ep = np.linalg.eigvalsh(subp)
        assert np.max(np.abs(ep - (e + shift * wS[k]))) < 1e-10


def test_fix_nelec_sector_energies_exact():
    shift = 2.0
    nelec = 2
    H = hubbard_mpo(2, t=1.0, U=4.0)
    Hd = np.asarray(H.to_dense())
    Hp = np.asarray(fix_nelec_mpo(H, nelec, shift=shift).to_dense())
    Ntot = _number_op_dense(4)
    want = Hd + shift * (Ntot - nelec * np.eye(16)) @ \
        (Ntot - nelec * np.eye(16))
    assert np.max(np.abs(Hp - want)) < 1e-12
    # the N=nelec block is untouched, other blocks pushed up
    wN = np.round(np.diag(Ntot)).astype(int)
    sel = wN == nelec
    assert np.max(np.abs(Hp[np.ix_(sel, sel)] - Hd[np.ix_(sel, sel)])) \
        < 1e-12
