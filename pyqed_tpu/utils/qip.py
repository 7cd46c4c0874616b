"""Quantum-information utilities: reduced density matrices, entropies,
mutual information, entanglement measures.

TPU-native counterpart of the reference QI layer
(reference: pyqed/qip.py — ``reduce_dm:15``, ``mutual_info:91``,
``vn_entropy:202``; pyqed/entanglement.py — ``concurrence:11``;
pyqed/phys.py — ``tracedist:712``, ``hilbert_dist:751``).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp

from ..ops.linalg import dag, ket2dm


def _as_dm(state):
    state = jnp.asarray(state)
    if state.ndim == 1:
        return ket2dm(state)
    return state


def reduce_dm(state, indices: Sequence[int], dims=None):
    """Reduced density matrix on qubits/qudits ``indices``
    (reference: pyqed/qip.py:15)."""
    rho = _as_dm(state)
    N = rho.shape[0]
    if dims is None:
        nq = int(round(np.log2(N)))
        dims = [2] * nq
    nsub = len(dims)
    rho = jnp.reshape(rho, list(dims) + list(dims))
    keep = list(indices)
    traced = [i for i in range(nsub) if i not in keep]
    perm = (keep + traced + [i + nsub for i in keep]
            + [i + nsub for i in traced])
    rho = jnp.transpose(rho, perm)
    d_keep = int(np.prod([dims[i] for i in keep])) if keep else 1
    d_tr = int(np.prod([dims[i] for i in traced])) if traced else 1
    rho = jnp.reshape(rho, (d_keep, d_tr, d_keep, d_tr))
    return jnp.einsum("atbt -> ab", rho)


def vn_entropy(state, indices=None, dims=None, base=None):
    """von Neumann entropy of the reduced state on ``indices``
    (reference: pyqed/qip.py:202)."""
    if indices is not None:
        rho = reduce_dm(state, indices, dims)
    else:
        rho = _as_dm(state)
    w = jnp.linalg.eigvalsh(rho)
    w = jnp.clip(w.real, 1e-300, None)
    S = -jnp.sum(w * jnp.log(w))
    if base is not None:
        S = S / jnp.log(base)
    return S


def mutual_info(state, indices0, indices1, dims=None, base=None):
    """I(A:B) = S(A) + S(B) - S(AB) (reference: pyqed/qip.py:91)."""
    SA = vn_entropy(state, indices0, dims, base)
    SB = vn_entropy(state, indices1, dims, base)
    SAB = vn_entropy(state, list(indices0) + list(indices1), dims, base)
    return SA + SB - SAB


def purity(state):
    rho = _as_dm(state)
    return jnp.real(jnp.trace(rho @ rho))


def concurrence(state):
    """Two-qubit concurrence (reference: pyqed/entanglement.py:11)."""
    rho = _as_dm(state)
    sy = jnp.array([[0, -1j], [1j, 0]])
    YY = jnp.kron(sy, sy)
    rho_tilde = YY @ jnp.conj(rho) @ YY
    evals = jnp.linalg.eigvals(rho @ rho_tilde)
    lam = jnp.sqrt(jnp.clip(jnp.sort(jnp.real(evals))[::-1], 0, None))
    return jnp.maximum(0.0, lam[0] - lam[1] - lam[2] - lam[3])


def tracedist(A, B):
    """Trace distance (reference: pyqed/phys.py:712)."""
    diff = _as_dm(A) - _as_dm(B)
    w = jnp.linalg.eigvalsh(dag(diff) @ diff)
    return 0.5 * jnp.sum(jnp.sqrt(jnp.clip(w.real, 0, None)))


def hilbert_dist(A, B):
    """Hilbert-Schmidt distance (reference: pyqed/phys.py:751)."""
    diff = _as_dm(A) - _as_dm(B)
    return jnp.real(jnp.trace(dag(diff) @ diff))


def fidelity(A, B):
    """Uhlmann fidelity F(rho, sigma)."""
    rho, sigma = _as_dm(A), _as_dm(B)
    w, v = jnp.linalg.eigh(rho)
    sqrt_rho = (v * jnp.sqrt(jnp.clip(w.real, 0, None))) @ dag(v)
    M = sqrt_rho @ sigma @ sqrt_rho
    wm = jnp.linalg.eigvalsh(M)
    return jnp.sum(jnp.sqrt(jnp.clip(wm.real, 0, None))) ** 2


def hadamard():
    return jnp.array([[1.0, 1.0], [1.0, -1.0]]) / jnp.sqrt(2.0)
