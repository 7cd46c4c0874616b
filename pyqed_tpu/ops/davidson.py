"""Davidson / block-Davidson iterative eigensolvers.

TPU-native counterpart of the reference's Davidson module
(reference: pyqed/davidson.py — ``davidson:70`` with optional
Jacobi-Davidson correction, ``block_davidson:155``; used there for
large TDA/CI eigenproblems).

Design: matrix-free ``matvec`` (a dense matrix is wrapped
automatically), a growing orthonormal search space maintained with
batched QR on the MXU, Rayleigh-Ritz via dense ``eigh`` of the (small)
subspace matrix, and diagonal (or Jacobi) preconditioned residual
expansion. The per-iteration linear algebra is jitted; the outer loop
is a Python loop because the subspace size changes shape (restarts cap
it at ``max_space``).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp


def _as_matvec(A):
    if callable(A):
        return A
    Aj = jnp.asarray(A)
    return lambda x: Aj @ x


def davidson(A, neigen, diag=None, tol=1e-8, maxiter=200, max_space=None,
             v0=None, jacobi=False):
    """Lowest ``neigen`` eigenpairs of a Hermitian operator.

    Parameters
    ----------
    A : (n, n) array or matvec callable x (n, k) -> (n, k).
    diag : (n,) diagonal of A (required when A is a callable; used for
        the Davidson preconditioner and the initial unit-vector guess).
    jacobi : use the Jacobi-Davidson correction (I - u u^T)(D - theta)
        denominator instead of the plain Davidson preconditioner
        (reference: pyqed/davidson.py:37 ``jacobi_correction``).

    Returns (eigenvalues (neigen,), eigenvectors (n, neigen)).
    """
    mv = _as_matvec(A)
    if diag is None:
        if callable(A):
            raise ValueError("matrix-free davidson needs diag=")
        diag = jnp.diagonal(jnp.asarray(A))
    diag = jnp.asarray(diag)
    n = diag.shape[0]
    k = int(neigen)
    if max_space is None:
        max_space = min(n, max(6 * k, 24))

    # initial guesses: unit vectors on the smallest diagonal entries
    if v0 is None:
        idx = np.asarray(jnp.argsort(diag))[:k]
        V = np.zeros((n, k))
        V[idx, np.arange(k)] = 1.0
        V = jnp.asarray(V, dtype=diag.dtype)
    else:
        V = jnp.asarray(v0)
        V, _ = jnp.linalg.qr(V)

    @jax.jit
    def rayleigh_ritz(V, AV):
        H = V.conj().T @ AV
        H = 0.5 * (H + H.conj().T)
        w, s = jnp.linalg.eigh(H)
        return w, s

    AV = mv(V)
    theta_old = None
    for it in range(maxiter):
        w, s = rayleigh_ritz(V, AV)
        theta = w[:k]
        X = V @ s[:, :k]          # Ritz vectors
        AX = AV @ s[:, :k]
        R = AX - X * theta[None, :]
        rnorm = jnp.linalg.norm(R, axis=0)
        if bool(jnp.max(rnorm) < tol):
            return np.asarray(theta), np.asarray(X)
        # preconditioned correction vectors
        denom = diag[:, None] - theta[None, :]
        denom = jnp.where(jnp.abs(denom) < 1e-8,
                          jnp.sign(denom) * 1e-8 + (denom == 0) * 1e-8,
                          denom)
        T = R / denom
        if jacobi:
            # project out the current Ritz vectors (Jacobi-Davidson)
            T = T - X @ (X.conj().T @ T)
        # expand, re-orthonormalize the whole space with one QR
        V = jnp.concatenate([V, T], axis=1)
        V, _ = jnp.linalg.qr(V)
        if V.shape[1] > max_space:
            # restart from the current Ritz vectors + fresh corrections
            Vr = jnp.concatenate([X, T], axis=1)
            V, _ = jnp.linalg.qr(Vr)
        AV = mv(V)
    return np.asarray(theta), np.asarray(X)


def block_davidson(A, neig=3, diag=None, tol=1e-9, max_iterations=60,
                   **kwargs):
    """Reference-named alias (pyqed/davidson.py:155) for the blocked
    solver above."""
    return davidson(A, neig, diag=diag, tol=tol, maxiter=max_iterations,
                    **kwargs)
