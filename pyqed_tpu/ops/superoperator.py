"""Liouville-space (superoperator) algebra.

TPU-native counterpart of the reference's superoperator module
(reference: pyqed/superoperator.py — ``liouvillian:29``, ``dm2vec:130``,
``operator_to_superoperator:200``, ``lindblad_dissipator:249``, ``left:256``,
``right:263``, ``kraus:272``, ``obs:313``, ``trace:316``, ``resolvent:320``).

Vectorization convention: **row-major** flatten, i.e. vec(rho)[i*N+j] =
rho[i,j], so  left(a) = kron(a, I),  right(a) = kron(I, a^T)  — identical to
the reference.

Two representations are provided:

- *Dense builders* (``left``/``right``/``op2sop``/``liouvillian``) produce the
  N^2 x N^2 matrix — fine for small N and for eigen-decomposition paths.
- *Matrix-free actions* (``liouvillian_action``) return a closure
  ``L(rho) -> drho`` acting on the (N, N) matrix directly. This is the hot
  path on TPU: each application is a handful of N x N matmuls on the MXU
  instead of an N^2 x N^2 matvec, replacing the reference's scipy.sparse kron
  pattern (the anti-pattern called out in SURVEY.md §7.1).
"""
from __future__ import annotations

import jax.numpy as jnp

from .linalg import dag


# ---------------------------------------------------------------- vectorize

def dm2vec(rho):
    """Flatten a density matrix to a Liouville vector (row-major;
    reference: pyqed/superoperator.py:130)."""
    return jnp.reshape(rho, (-1,))


operator_to_vector = dm2vec


def vec2dm(v, n=None):
    """Inverse of :func:`dm2vec`."""
    if n is None:
        n = int(round(len(v) ** 0.5))
    return jnp.reshape(v, (n, n))


vec2mat = vec2dm


def mat2vec_index(N, i, j):
    """(reference: pyqed/superoperator.py:190) — note the reference uses
    column-major index math here, inconsistent with its own flatten; we keep
    row-major throughout."""
    return i * N + j


def vec2mat_index(N, I):
    return divmod(I, N)


# ---------------------------------------------------------------- dense form

def left(a):
    """Left-multiplication superoperator: vec(a rho) = left(a) vec(rho)."""
    n = a.shape[-1]
    return jnp.kron(a, jnp.eye(n, dtype=a.dtype))


def right(a):
    """Right-multiplication superoperator: vec(rho a) = right(a) vec(rho)."""
    n = a.shape[-1]
    return jnp.kron(jnp.eye(n, dtype=a.dtype), a.T)


def operator_to_superoperator(a, kind="commutator"):
    """Promote an operator to a superoperator
    (reference: pyqed/superoperator.py:200)."""
    if kind in ("commutator", "c", "-"):
        return left(a) - right(a)
    if kind in ("left", "l"):
        return left(a)
    if kind in ("right", "r"):
        return right(a)
    if kind in ("anticommutator", "a", "+"):
        return left(a) + right(a)
    raise ValueError(f"superoperator kind {kind!r} does not exist.")


def op2sop(a, kind="commutator"):
    return operator_to_superoperator(a, kind)


to_super = op2sop


def lindblad_dissipator(l):
    """Dense dissipator  l⊗l* − ½(l†l ⊗ I + I ⊗ (l†l)^T)
    (reference: pyqed/superoperator.py:249)."""
    ld_l = dag(l) @ l
    return jnp.kron(l, l.conj()) - 0.5 * operator_to_superoperator(ld_l, "anticommutator")


def kraus(a):
    """Kraus superoperator for a rho a^† (reference: pyqed/superoperator.py:272)."""
    return right(dag(a)) @ left(a)


def liouvillian(H, c_ops=None):
    """Dense Liouvillian  L = −i[H, ·] + Σ D[c]
    (reference: pyqed/superoperator.py:29)."""
    if c_ops is None:
        c_ops = []
    L = -1j * operator_to_superoperator(H)
    for c in c_ops:
        L = L + lindblad_dissipator(c)
    return L


# ------------------------------------------------------------- matrix-free

def lindbladian_action(l, rho, ldl=None):
    """D[l](rho) = l rho l† − ½{l†l, rho} acting on the matrix directly
    (reference: pyqed/phys.py:985)."""
    if ldl is None:
        ldl = dag(l) @ l
    return l @ rho @ dag(l) - 0.5 * (ldl @ rho + rho @ ldl)

def liouvillian_action(H, c_ops=None):
    """Matrix-free Liouvillian: returns ``L(rho) -> drho/dt`` as a closure of
    N x N matmuls. Equivalent to applying :func:`liouvillian` to vec(rho),
    but O(N^3) per application instead of O(N^4), and MXU-friendly.
    """
    if c_ops is None:
        c_ops = []
    c_ops = [jnp.asarray(c) for c in c_ops]
    cdags = [dag(c) for c in c_ops]
    ldls = [cd @ c for c, cd in zip(c_ops, cdags)]

    def L(rho):
        out = -1j * (H @ rho - rho @ H)
        for c, cd, ldl in zip(c_ops, cdags, ldls):
            out = out + c @ rho @ cd - 0.5 * (ldl @ rho + rho @ ldl)
        return out

    return L


# --------------------------------------------------------------- utilities

def obs_vec(rho_vec, a):
    """Tr[a rho] with rho as a Liouville vector
    (reference: pyqed/superoperator.py:313)."""
    return jnp.vdot(dm2vec(dag(a)), rho_vec)


def trace_vec(rho_vec):
    n = int(round(len(rho_vec) ** 0.5))
    return jnp.vdot(dm2vec(jnp.eye(n)), rho_vec)


def resolvent(omega, L):
    """(omega I − L)^{-1} (reference: pyqed/superoperator.py:320)."""
    idm = jnp.eye(L.shape[0], dtype=L.dtype)
    return jnp.linalg.inv(omega * idm - L)
