"""Dense operator algebra on JAX arrays.

TPU-native counterpart of the reference's operator utilities
(reference: pyqed/phys.py — ``dag:1178``, ``commutator:1156``, ``anticomm:1166``,
``tensor:630``, ``ptrace:672``, ``transform:1121``, ``obs:1266``,
``obs_dm:1257``, ``expect:51``, ``isherm:2216``, ``isunitary:2219``,
``ket2dm:994``, ``norm:1011``, ``tensor_power:1977``, ``project:1959``).

Everything is dense ``jnp`` — the reference's scipy.sparse idioms do not map
to the MXU; for sizes where n^2 explodes, use the matrix-free superoperator
closures in :mod:`pyqed_tpu.ops.superoperator` instead.
"""
from __future__ import annotations

import jax.numpy as jnp


def dag(a):
    """Hermitian conjugate (works for kets and operators)."""
    a = jnp.asarray(a)
    if a.ndim == 1:
        return a.conj()
    return a.conj().T


dagger = dag


def commutator(A, B):
    return A @ B - B @ A


comm = commutator


def anticommutator(A, B):
    return A @ B + B @ A


anticomm = anticommutator


def tensor(*args):
    """Kronecker product of a sequence of operators (QuTiP-style).

    Accepts either ``tensor(a, b, c)`` or ``tensor([a, b, c])``.
    """
    if not args:
        raise TypeError("Requires at least one input argument")
    if len(args) == 1 and isinstance(args[0], (list, tuple)):
        qlist = args[0]
    else:
        qlist = args
    out = jnp.asarray(qlist[0])
    for q in qlist[1:]:
        out = jnp.kron(out, jnp.asarray(q))
    return out


def tensor_power(a, n: int):
    """a ⊗ a ⊗ ... ⊗ a, n times."""
    out = jnp.asarray(a)
    for _ in range(n - 1):
        out = jnp.kron(out, a)
    return out


def ptrace(rho, dims, which="B"):
    """Partial trace over subsystem ``which`` of a bipartite density matrix.

    Matches the reference convention (pyqed/phys.py:672): ``which='B'``
    traces out B and returns rho_A; ``which='A'`` returns rho_B.
    """
    dimA, dimB = dims
    if rho.shape[0] != dimA * dimB:
        raise ValueError("Size of density matrix does not match dimensions.")
    r = jnp.reshape(rho, (dimA, dimB, dimA, dimB))
    if which == "B":
        return jnp.einsum("injn -> ij", r)
    elif which == "A":
        return jnp.einsum("inim -> nm", r)
    raise ValueError("which can only be A or B.")


def transform(A, v):
    """Unitary transform of operator A into the basis given by columns of v:
    v^† A v  (reference: pyqed/phys.py:1121)."""
    return dag(v) @ A @ v


basis_transform = transform


def obs(psi, a):
    """<psi| a |psi> (reference: pyqed/phys.py:1266)."""
    return jnp.vdot(psi, a @ psi)


def obs_dm(rho, a):
    """Tr[a rho] (reference: pyqed/phys.py:1257)."""
    return jnp.trace(a @ rho)


def expect(state, op):
    """Expectation value for either a ket (1d) or a density matrix (2d)."""
    state = jnp.asarray(state)
    if state.ndim == 1:
        return obs(state, op)
    return obs_dm(state, op)


def overlap(bra, ket):
    return jnp.vdot(bra, ket)


def ket2dm(psi):
    """|psi><psi| (reference: pyqed/phys.py:994)."""
    psi = jnp.asarray(psi)
    return jnp.outer(psi, psi.conj())


def norm(psi, dx=1.0):
    """L2 norm integral of a wavefunction (reference: pyqed/phys.py:1011)."""
    return (jnp.vdot(psi, psi) * dx).real


def rk4(y, fun, dt, *args):
    """Classic 4th-order Runge-Kutta step (reference: pyqed/phys.py:1051)."""
    dt2 = dt / 2.0
    k1 = fun(y, *args)
    k2 = fun(y + k1 * dt2, *args)
    k3 = fun(y + k2 * dt2, *args)
    k4 = fun(y + k3 * dt, *args)
    return y + dt / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def isherm(a, tol=1e-10):
    return bool(jnp.allclose(a, dag(a), atol=tol))


def isunitary(m, tol=1e-10):
    m = jnp.asarray(m)
    return bool(jnp.allclose(m @ dag(m), jnp.eye(m.shape[0], dtype=m.dtype), atol=tol))


def isdiag(M, tol=0.0):
    M = jnp.asarray(M)
    off = M - jnp.diag(jnp.diag(M))
    return bool(jnp.all(jnp.abs(off) <= tol))


def project(P, a):
    """Project operator a onto subspace projector P: P a P
    (reference: pyqed/phys.py:1959)."""
    return P @ a @ P


def sort_eig(eigvals, eigvecs):
    """Sort an eigen-decomposition by ascending eigenvalue
    (reference: pyqed/phys.py:554)."""
    idx = jnp.argsort(eigvals)
    return eigvals[idx], eigvecs[:, idx]


def prefix_propagators(Us):
    """All-prefix products of a stack of step propagators:
    out[i] = Us[i] @ Us[i-1] @ ... @ Us[0], computed in log depth with
    ``jax.lax.associative_scan`` (matmul is associative) — the
    parallel-in-time primitive for LINEAR driven dynamics: every step
    propagator is built in one vmapped batch, the whole trajectory's
    cumulative products run as a handful of large MXU matmul rounds
    instead of a sequential per-step scan."""
    import jax

    def combine(a, b):
        # a after b in time-order: out = b_later @ a_earlier? The scan
        # combines left-to-right; with elements ordered in time,
        # (U1, U2) -> U2 @ U1.
        return jnp.einsum("...ij, ...jk -> ...ik", b, a,
                          precision=jax.lax.Precision.HIGHEST)

    return jax.lax.associative_scan(combine, Us)


def magnus2_propagators(H_mid, dt):
    """Batched midpoint-Magnus step propagators exp(-i H_mid[k] dt)
    via one vmapped Hermitian eigendecomposition (H_mid: (nt, n, n))."""
    import jax
    w, V = jnp.linalg.eigh(H_mid)
    phase = jnp.exp(-1j * w * dt)
    return jnp.einsum("tab, tb, tcb -> tac", V, phase, V.conj(),
                      precision=jax.lax.Precision.HIGHEST)


def eigh(a, k=None):
    """Eigendecomposition with optional truncation to the lowest k
    (reference: pyqed/phys.py eigh)."""
    w, v = jnp.linalg.eigh(jnp.asarray(a))
    if k is not None and k < w.shape[-1]:
        return w[..., :k], v[..., :, :k]
    return w, v


def eig_asymm(h):
    """Diagonalize a general (non-symmetric) matrix, sorted ascending by
    real part; real eigenvalues returned real (reference: pyqed/phys.py
    eig_asymm)."""
    e, c = jnp.linalg.eig(jnp.asarray(h))
    if bool(jnp.allclose(e.imag, 0.0)):
        e = e.real
    idx = jnp.argsort(e.real)
    return e[idx], c[:, idx]


# reference-name alias: pyqed/phys.py `sort(eigvals, eigvecs)`
sort = sort_eig


def lindbladian(l, rho):
    """Single-jump Lindblad dissipator applied to rho:
    l rho l† − (1/2){l†l, rho} (reference: pyqed/phys.py lindbladian)."""
    l = jnp.asarray(l)
    rho = jnp.asarray(rho)
    return l @ rho @ dag(l) - 0.5 * anticommutator(dag(l) @ l, rho)


def ldo(b, A):
    """Linear differential operator application A b
    (reference: pyqed/phys.py ldo)."""
    return jnp.asarray(A) @ jnp.asarray(b)
