"""Qubitization of molecular Hamiltonians: second-quantized CAS
Hamiltonian -> qubit operator via the Jordan-Wigner (or Bravyi-Kitaev)
transform.

TPU-native counterpart of the reference's CASCI qubitization surface
(reference: pyqed/qchem/ci/casci.py — ``get_SO_matrix``,
``qubitization:~690``, ``jordan_wigner``,
``fix_nelec_by_energy_penalty``; the reference builds each fermionic
term with per-term Kronecker loops; here all JW mode operators are
materialized once and the two-electron sum is a vectorized contraction
over precomputed excitation matrices).

Spin-orbital convention: 2p = spatial p alpha, 2p+1 = spatial p beta
(matches :func:`pyqed_tpu.qchem.ci.spinorb_ints`).

Validation: the dense qubit Hamiltonian's ground eigenvalue must equal
FCI/CASCI total energies exactly (see tests/test_qubitization.py).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ci import spinorb_ints
from ..models.lattice import jordan_wigner_ops, bravyi_kitaev_ops

__all__ = [
    "active_space_integrals", "qubit_hamiltonian", "qubitize",
    "number_operator", "fix_nelec_penalty", "pauli_decompose",
    "pauli_string_hamiltonian",
]


def active_space_integrals(mf, ncas=None, nelecas=None):
    """Spin-orbital (h, <pq||rs>) of a CAS window plus the scalar
    offset (core energy + nuclear repulsion).

    ncas/nelecas None -> the full MO space (qubitized FCI).
    Returns (h_so, g_so, e_offset) with h_so (2 ncas, 2 ncas) and g_so
    the antisymmetrized physicists' tensor.
    """
    hmo, eri_mo = mf.mo_ints()
    hmo = np.asarray(hmo)
    eri = np.asarray(eri_mo)
    nmo = hmo.shape[0]
    if ncas is None:
        ncas = nmo
    if nelecas is None:
        nelecas = 2 * mf.nocc
    ncore = mf.nocc - nelecas // 2
    act = list(range(ncore, ncore + ncas))
    ecore = 2 * sum(hmo[i, i] for i in range(ncore))
    for i in range(ncore):
        for j in range(ncore):
            ecore += 2 * eri[i, i, j, j] - eri[i, j, j, i]
    heff = np.zeros((ncas, ncas))
    for ai, a in enumerate(act):
        for bi, b in enumerate(act):
            v = hmo[a, b]
            for c in range(ncore):
                v += 2 * eri[a, b, c, c] - eri[a, c, c, b]
            heff[ai, bi] = v
    h_so, g_so = spinorb_ints(heff, eri[np.ix_(act, act, act, act)])
    return h_so, g_so, float(ecore + mf.mol.energy_nuc())


def qubit_hamiltonian(h_so, g_so, e_offset=0.0, encoding="jw"):
    """Dense qubit-space Hamiltonian (2^n, 2^n) of
    H = sum h_pq c_p^+ c_q + 1/4 sum <pq||rs> c_p^+ c_q^+ c_s c_r + E0.

    encoding: 'jw' (Jordan-Wigner) or 'bk' (Bravyi-Kitaev) — both give
    the same spectrum; the encodings differ by the qubit basis.
    The one-body and two-body sums are assembled from the n^2 mode
    excitation matrices E_pq = c_p^+ c_q once (no per-term Kronecker
    rebuild as in the reference's ``jordan_wigner``).
    """
    h_so = np.asarray(h_so)
    g_so = np.asarray(g_so)
    ns = h_so.shape[0]
    ops = (jordan_wigner_ops(ns) if encoding == "jw"
           else bravyi_kitaev_ops(ns))
    c = [np.asarray(o) for o in ops]
    cd = [o.conj().T for o in c]
    dim = c[0].shape[0]
    # E_pq = c_p^+ c_q, reused by both the 1e and 2e sums
    E = np.empty((ns, ns, dim, dim), dtype=complex)
    for p in range(ns):
        for q in range(ns):
            E[p, q] = cd[p] @ c[q]
    H = np.einsum("pq, pqij -> ij", h_so.astype(complex), E,
                  optimize=True)
    # c_p^+ c_q^+ c_s c_r = E_pr E_qs - delta_qr E_ps  (normal order)
    H += 0.25 * np.einsum("pqrs, prij, qsjk -> ik",
                          g_so.astype(complex), E, E, optimize=True)
    H -= 0.25 * np.einsum("pqrs, qr, psik -> ik",
                          g_so.astype(complex), np.eye(ns), E,
                          optimize=True)
    H += e_offset * np.eye(dim)
    return jnp.asarray(H)


def qubitize(mf, ncas=None, nelecas=None, encoding="jw"):
    """mean-field -> dense qubit Hamiltonian over 2*ncas qubits whose
    lowest eigenvalue in the nelecas sector is the CASCI/FCI total
    energy (reference ``CASCI.qubitization``)."""
    h_so, g_so, e0 = active_space_integrals(mf, ncas, nelecas)
    return qubit_hamiltonian(h_so, g_so, e0, encoding)


def number_operator(ns, spin=None, encoding="jw"):
    """Qubit-space particle-number operator; spin='alpha'/'beta'
    restricts to even/odd spin-orbitals."""
    ops = (jordan_wigner_ops(ns) if encoding == "jw"
           else bravyi_kitaev_ops(ns))
    c = [np.asarray(o) for o in ops]
    sel = range(ns) if spin is None else (
        range(0, ns, 2) if spin == "alpha" else range(1, ns, 2))
    N = sum(c[p].conj().T @ c[p] for p in sel)
    return jnp.asarray(N)


def fix_nelec_penalty(H, ns, nelec_a, nelec_b, shift=0.1,
                      encoding="jw"):
    """H + shift [(N_a - nelec_a)^2 + (N_b - nelec_b)^2] — pushes
    wrong-particle-number sectors up so a sector-agnostic ground-state
    search lands in the physical sector (reference
    ``fix_nelec_by_energy_penalty``)."""
    H = np.asarray(H)
    dim = H.shape[0]
    Na = np.asarray(number_operator(ns, "alpha", encoding))
    Nb = np.asarray(number_operator(ns, "beta", encoding))
    Ia = Na - nelec_a * np.eye(dim)
    Ib = Nb - nelec_b * np.eye(dim)
    return jnp.asarray(H + shift * (Ia @ Ia + Ib @ Ib))


# ------------------------------------------------------------------
# Pauli-string decomposition (the measurement-side interface)
# ------------------------------------------------------------------

_PAULIS = {
    "I": np.eye(2, dtype=complex),
    "X": np.array([[0, 1], [1, 0]], dtype=complex),
    "Y": np.array([[0, -1j], [1j, 0]], dtype=complex),
    "Z": np.array([[1, 0], [0, -1]], dtype=complex),
}


def pauli_decompose(H, n_qubits, tol=1e-10):
    """Decompose a dense (2^n, 2^n) Hermitian H into Pauli strings:
    returns {string: real coefficient} with |coef| > tol.

    Implemented as n successive single-qubit partial transforms (each
    a reshape + 4x4 trace contraction) — O(n 4^n) instead of the naive
    4^n full-matrix traces.
    """
    H = np.asarray(H, dtype=complex)
    dim = 2 ** n_qubits
    assert H.shape == (dim, dim)
    labels = "IXYZ"
    basis = np.stack([_PAULIS[s] for s in labels])       # (4, 2, 2)
    # coefficient tensor: start with H reshaped to (2,2)*n and contract
    # each qubit's (row, col) pair with the Pauli basis / 2
    T = H.reshape((2,) * (2 * n_qubits))
    # order axes as (r0, c0, r1, c1, ...)
    perm = []
    for q in range(n_qubits):
        perm += [q, n_qubits + q]
    T = T.transpose(perm)
    for q in range(n_qubits):
        # leading axes: q pauli indices, then (2, 2) of qubit q, rest
        T = np.tensordot(T, basis.conj(), axes=([q, q + 1], [1, 2])) / 2
        # tensordot appends the new pauli axis at the end; bring to q
        T = np.moveaxis(T, -1, q)
    coefs = {}
    for flat, val in enumerate(T.reshape(-1)):
        if abs(val) > tol:
            digits = np.base_repr(flat, base=4).zfill(n_qubits)
            coefs["".join(labels[int(d)] for d in digits)] = float(
                val.real)
    return coefs


def pauli_string_hamiltonian(mf, ncas=None, nelecas=None,
                             encoding="jw", tol=1e-10):
    """mean-field -> {Pauli string: coefficient} for VQE-style use."""
    H = qubitize(mf, ncas, nelecas, encoding)
    n = int(np.log2(np.asarray(H).shape[0]))
    return pauli_decompose(H, n, tol)
