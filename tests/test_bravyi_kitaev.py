"""Bravyi-Kitaev transform (reference:
pyqed/qchem/jordan_wigner/spinless.py:74 — a ``pass`` stub, made real).

Oracle: the BK encoding is a relabeling of occupation bitstrings,
|x> -> |B x mod 2>, so the BK operators must equal P a_j^{JW} P^T
exactly, with P the induced permutation matrix.
"""
import numpy as np

from pyqed_tpu.models.lattice import (
    jordan_wigner_ops, bravyi_kitaev_ops, bravyi_kitaev_matrix,
    bravyi_kitaev_sets)


def _bk_permutation(n):
    """P with P|x> = |Bx mod 2>, qubit 0 = most significant bit (the
    kron ordering used by both JW and BK string builders)."""
    B = bravyi_kitaev_matrix(n)
    dim = 2**n
    P = np.zeros((dim, dim))
    for idx in range(dim):
        x = np.array([(idx >> (n - 1 - q)) & 1 for q in range(n)])
        b = B @ x % 2
        new = sum(int(b[q]) << (n - 1 - q) for q in range(n))
        P[new, idx] = 1.0
    return P


def test_bk_equals_relabeled_jw():
    for n in (2, 3, 4, 5):
        jw = [np.asarray(a) for a in jordan_wigner_ops(n)]
        bk = [np.asarray(a) for a in bravyi_kitaev_ops(n)]
        P = _bk_permutation(n)
        for j in range(n):
            assert np.allclose(bk[j], P @ jw[j] @ P.T, atol=1e-12), (n, j)


def test_bk_anticommutation():
    n = 4
    bk = [np.asarray(a) for a in bravyi_kitaev_ops(n)]
    eye = np.eye(2**n)
    for i in range(n):
        for j in range(n):
            acom = bk[i] @ bk[j].conj().T + bk[j].conj().T @ bk[i]
            assert np.allclose(acom, eye * (i == j), atol=1e-12)
            acom2 = bk[i] @ bk[j] + bk[j] @ bk[i]
            assert np.allclose(acom2, 0.0, atol=1e-12)


def test_bk_weight_advantage():
    """BK parity+update weight is O(log n): for n=8 the worst-case BK
    Pauli weight must be below the JW worst case (n)."""
    n = 8

    def weight(j):
        U, F, P, R = bravyi_kitaev_sets(j, n)
        return 1 + len(U) + max(len(P), len(R))

    assert max(weight(j) for j in range(n)) < n


def test_bk_hubbard_spectrum_matches_jw():
    """Encoding-independence: a small interacting Hamiltonian has the
    same spectrum in either encoding."""
    n, t, U = 4, 1.0, 2.0
    for make in (jordan_wigner_ops, bravyi_kitaev_ops):
        a = [np.asarray(x) for x in make(n)]
        ad = [x.conj().T for x in a]
        H = sum(-t * (ad[i] @ a[i + 1] + ad[i + 1] @ a[i])
                for i in range(n - 1))
        H = H + U * (ad[0] @ a[0]) @ (ad[1] @ a[1])
        w = np.linalg.eigvalsh(H)
        if make is jordan_wigner_ops:
            w_jw = w
    assert np.allclose(w, w_jw, atol=1e-10)
