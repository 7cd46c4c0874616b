"""Matrix-exponential propagation engines.

TPU-native replacement for the reference's propagator machinery
(reference: pyqed/phys.py — ``expm:2049`` (EOM/RK4 on the full matrix),
``propagator:2105``, ``propagator_H_const:2163`` (eigendecomposition path)).

Engines, all jit/scan-friendly:

- ``expm_eig``: e^{-iHt} for Hermitian H via eigh — the setup path.
- ``propagators``: stacked U(k dt) for a time grid, via eigh (Hermitian) or
  scanned RK4 (general / time-dependent).
- ``expm_multiply_taylor``: scaling-and-squaring-free Taylor/Krylov action
  e^{A dt} b without forming e^{A}; the workhorse for Liouvillian stepping
  where A is only available as a matvec closure.
- ``krylov_expm_multiply``: Arnoldi/Lanczos small-subspace action, for stiff
  generators.

The dense eigh paths run on the MXU; the matvec engines are chains of
matmuls under ``lax.fori_loop`` so XLA fuses the AXPYs between them.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .linalg import dag, rk4


def expm_eig(H, t):
    """U(t) = e^{-i H t} for Hermitian H via eigendecomposition."""
    w, v = jnp.linalg.eigh(H)
    return (v * jnp.exp(-1j * w * t)) @ dag(v)


def expm_herm(H, t, prefactor=-1j):
    """e^{prefactor * H * t} for Hermitian H."""
    w, v = jnp.linalg.eigh(H)
    return (v * jnp.exp(prefactor * w * t)) @ dag(v)


def propagators(H, dt, nt, method="diag"):
    """Stack of propagators [U(0), U(dt), ..., U(nt dt)], shape (nt+1, n, n).

    method='diag' (Hermitian H): exact via eigh (reference:
    pyqed/phys.py:2163 'diag' branch). method='rk4': EOM integration
    matching the reference's default 'EOM' path (pyqed/phys.py:2105).
    """
    n = H.shape[-1]
    if method == "diag":
        w, v = jnp.linalg.eigh(H)
        ks = jnp.arange(nt + 1)
        phases = jnp.exp(-1j * w[None, :] * ks[:, None] * dt)  # (nt+1, n)
        return jnp.einsum("an, kn, bn -> kab", v, phases, v.conj())
    elif method == "rk4":
        U0 = jnp.eye(n, dtype=jnp.result_type(H, 1j))

        def step(U, _):
            Unew = rk4(U, lambda u: -1j * (H @ u), dt)
            return Unew, Unew

        _, Us = jax.lax.scan(step, U0, None, length=nt)
        return jnp.concatenate([U0[None], Us], axis=0)
    raise ValueError(f"unknown method {method!r}")


def expm_multiply_taylor(matvec, b, dt=1.0, order=None, nsub=None):
    """y ≈ e^{dt * A} b with A given as ``matvec``.

    Uses ``nsub`` substeps of a truncated Taylor series of order ``order``
    (defaults chosen for ||A dt|| ≲ 1 per substep at double precision).
    Fully traceable; cost = order*nsub matvecs.
    """
    if order is None:
        order = 12
    if nsub is None:
        nsub = 1
    h = dt / nsub

    def substep(b, _):
        term = b
        out = b
        for k in range(1, order + 1):
            term = matvec(term) * (h / k)
            out = out + term
        return out, None

    y, _ = jax.lax.scan(substep, b, None, length=nsub)
    return y


def krylov_expm_multiply(matvec, b, dt=1.0, m=16):
    """y ≈ e^{dt A} b via an m-dim Arnoldi subspace.

    Works for non-Hermitian A (Liouvillians). The small (m, m) Hessenberg
    exponential is evaluated by a Padé-free squared Taylor series, keeping
    everything on-device.
    """
    shape = b.shape
    bvec = jnp.reshape(b, (-1,))
    n = bvec.shape[0]
    beta = jnp.linalg.norm(bvec)
    dtype = jnp.result_type(bvec, 1j)

    V = jnp.zeros((m + 1, n), dtype=dtype)
    H = jnp.zeros((m + 1, m), dtype=dtype)
    V = V.at[0].set(bvec / beta)

    def arnoldi_step(j, carry):
        V, H = carry
        w = jnp.reshape(matvec(jnp.reshape(V[j], shape)), (-1,))
        # modified Gram-Schmidt against all basis vectors (masked)
        def mgs(i, wh):
            w, H = wh
            hij = jnp.where(i <= j, jnp.vdot(V[i], w), 0.0)
            H = H.at[i, j].set(hij)
            w = w - hij * V[i]
            return (w, H)
        w, H = jax.lax.fori_loop(0, m + 1, mgs, (w, H))
        hnext = jnp.linalg.norm(w)
        H = H.at[j + 1, j].set(hnext)
        V = V.at[j + 1].set(w / jnp.where(hnext > 0, hnext, 1.0))
        return (V, H)

    V, H = jax.lax.fori_loop(0, m, arnoldi_step, (V, H))

    Hm = H[:m, :m] * dt
    # exp(Hm) via scaling and squaring with Taylor core
    s = 8  # 2^8 scaling
    A = Hm / (2.0**s)
    E = jnp.eye(m, dtype=dtype)
    term = jnp.eye(m, dtype=dtype)
    for k in range(1, 13):
        term = term @ A / k
        E = E + term
    def sq(_, E):
        return E @ E
    E = jax.lax.fori_loop(0, s, sq, E)

    y = beta * (V[:m].T @ E[:, 0])
    return jnp.reshape(y, shape)


@partial(jax.jit, static_argnames=("order",))
def chebyshev_expm_multiply(H, b, dt, emin, emax, order=32):
    """y ≈ e^{-i H dt} b via Chebyshev expansion for Hermitian H with
    spectrum in [emin, emax]. Cost = ``order`` matvecs, no eigh.
    """
    # rescale H to [-1, 1]
    a = (emax - emin) / 2.0
    c = (emax + emin) / 2.0
    z = a * dt

    def hs(v):
        return ((H @ v) - c * v) / a

    # Chebyshev recursion: e^{-i z x} = sum_k (2-δ_k0) (-i)^k J_k(z) T_k(x)
    from jax.scipy.special import bessel_jn
    Jk = bessel_jn(z, v=order, n_iter=max(50, 2 * order))

    phi0 = b
    phi1 = hs(b)
    acc = Jk[0] * phi0 + 2.0 * (-1j) * Jk[1] * phi1

    def body(k, carry):
        phi_km1, phi_k, acc = carry
        phi_kp1 = 2.0 * hs(phi_k) - phi_km1
        coeff = 2.0 * (-1j) ** (k + 1) * Jk[k + 1]
        acc = acc + coeff * phi_kp1
        return (phi_k, phi_kp1, acc)

    _, _, acc = jax.lax.fori_loop(1, order, body, (phi0, phi1, acc))
    return acc * jnp.exp(-1j * c * dt)


def expm(A, t, method="eig"):
    """U(t) = e^{A t} for one or many times (reference: pyqed/phys.py
    expm — an RK4 'EOM' loop there; exact eig/vmapped here).

    A : (n, n); t : scalar or (nt,). Returns (n, n) or (nt, n, n).
    """
    A = jnp.asarray(A)
    w, V = jnp.linalg.eig(A)
    Vinv = jnp.linalg.inv(V)

    def at(tt):
        return (V * jnp.exp(w * tt)[None, :]) @ Vinv

    t = jnp.asarray(t)
    if t.ndim == 0:
        return at(t)
    return jax.vmap(at)(t)
