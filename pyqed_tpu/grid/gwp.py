"""Wavepacket dynamics in a moving/fixed Gaussian basis.

TPU-native counterpart of the reference moving-Gaussian layer
(reference: pyqed/moving_gaussian.py — ``GWP:29``, ``_overlap:96``,
``_moment``, ``WPD:157`` fixed-basis dynamics, ``WPD2:434``,
``NAWPD:737``; pyqed/ldr/gwp.py moving-basis matrix elements).

All pairwise basis matrix elements (overlap, moments, kinetic) are closed
Gaussian formulas evaluated as broadcast outer products (no double loops);
dynamics in the nonorthogonal basis solves S dc/dt = -i H c with a
generalized eigen-decomposition once (fixed basis).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core.result import Result


@dataclasses.dataclass
class GWP:
    """A 1D Gaussian wavepacket basis function
    (reference: pyqed/moving_gaussian.py:29)."""
    q: float
    p: float = 0.0
    a: float = 1.0
    phase: float = 0.0

    def evaluate(self, x):
        return ((self.a / np.pi) ** 0.25
                * jnp.exp(-0.5 * self.a * (x - self.q) ** 2
                          + 1j * self.p * (x - self.q) + 1j * self.phase))


def overlap_real(aj, qj, ak, qk):
    """<g_j|g_k> for real Gaussians (reference:
    pyqed/moving_gaussian.py:96), broadcastable."""
    dq = qk - qj
    return ((aj * ak) ** 0.25 * jnp.sqrt(2.0 / (aj + ak))
            * jnp.exp(-0.5 * aj * ak / (aj + ak) * dq**2))


def moment_real(aj, qj, ak, qk, n=1):
    """<g_j|(x - q_j)^n|g_k> (reference: pyqed/moving_gaussian.py:?_moment)."""
    S = overlap_real(aj, qj, ak, qk)
    if n == 1:
        return (ak * (qk - qj) / (aj + ak)) * S
    if n == 2:
        return (1.0 / (aj + ak) + ak**2 * (qk - qj) ** 2 / (aj + ak) ** 2) * S
    raise ValueError(n)


def kinetic_real(aj, qj, ak, qk, mass=1.0):
    """<g_j| -1/(2m) d^2/dx^2 |g_k> for real Gaussians (closed form)."""
    S = overlap_real(aj, qj, ak, qk)
    mu = aj * ak / (aj + ak)
    dq = qj - qk
    return S * mu / (2 * mass) * (1.0 - mu * dq**2)


class WPD:
    """Dynamics on one PES in a fixed real-Gaussian basis
    (reference: pyqed/moving_gaussian.py:157).

    H and S built in closed form; evolution c(t) = S^{-1/2} e^{-i Ht' t}
    S^{-1/2} ... via the generalized eigenproblem (Löwdin).
    """

    def __init__(self, centers, widths=None, mass=1.0):
        self.q = np.asarray(centers, dtype=float)
        self.nb = len(self.q)
        self.a = (np.full(self.nb, widths if np.isscalar(widths or 1.0)
                          else 1.0) if widths is None or np.isscalar(widths)
                  else np.asarray(widths, dtype=float))
        if widths is not None and np.isscalar(widths):
            self.a = np.full(self.nb, float(widths))
        self.mass = mass
        self.v = None

    def overlap_matrix(self):
        aj = self.a[:, None]
        ak = self.a[None, :]
        qj = self.q[:, None]
        qk = self.q[None, :]
        return overlap_real(aj, qj, ak, qk)

    def kinetic_matrix(self):
        aj = self.a[:, None]
        ak = self.a[None, :]
        qj = self.q[:, None]
        qk = self.q[None, :]
        return kinetic_real(aj, qj, ak, qk, self.mass)

    def potential_matrix(self, V, nquad=40):
        """<g_j|V|g_k> by Gauss-Hermite quadrature on each pair's product
        Gaussian — vectorized over all pairs."""
        xg, wg = np.polynomial.hermite.hermgauss(nquad)
        aj = self.a[:, None, None]
        ak = self.a[None, :, None]
        qj = self.q[:, None, None]
        qk = self.q[None, :, None]
        p_ = aj + ak
        qc = (aj * qj + ak * qk) / p_
        x = qc + xg[None, None, :] * np.sqrt(2.0 / p_)
        S = np.asarray(overlap_real(self.a[:, None], self.q[:, None],
                                    self.a[None, :], self.q[None, :]))
        Vq = np.asarray(V(x))
        integral = np.einsum("q, jkq -> jk", wg, Vq) / np.sqrt(np.pi)
        return jnp.asarray(S * integral)

    def buildH(self, V):
        S = self.overlap_matrix()
        H = self.kinetic_matrix() + self.potential_matrix(V)
        self.S, self.H = jnp.asarray(S), jnp.asarray(H)
        return self.H, self.S

    def eigenstates(self, V=None, k=5):
        if V is not None or not hasattr(self, "H"):
            self.buildH(V)
        # generalized eigenproblem via Löwdin orthogonalization
        s, U = jnp.linalg.eigh(self.S)
        keep = s > 1e-10
        X = U[:, keep] * (1.0 / jnp.sqrt(s[keep]))[None, :]
        Ht = X.T @ self.H @ X
        w, c = jnp.linalg.eigh(Ht)
        return w[:k], X @ c[:, :k]

    def project(self, psi_fn, xgrid):
        """Expansion coefficients of psi(x) sampled on ``xgrid`` by solving
        S c = b with b_j = <g_j|psi> (trapezoid quadrature)."""
        x = np.asarray(xgrid)
        dx = x[1] - x[0]
        psi = np.asarray(psi_fn(x) if callable(psi_fn) else psi_fn)
        g = ((self.a[None, :] / np.pi) ** 0.25
             * np.exp(-0.5 * self.a[None, :]
                      * (x[:, None] - self.q[None, :]) ** 2))
        b = g.T @ psi * dx
        return jnp.linalg.solve(self.overlap_matrix().astype(complex),
                                jnp.asarray(b))

    def run(self, c0, dt, nt, V=None, nout=1) -> Result:
        """Propagate coefficients: i S dc/dt = H c."""
        if V is not None or not hasattr(self, "H"):
            self.buildH(V)
        s, U = jnp.linalg.eigh(self.S)
        X = U * (1.0 / jnp.sqrt(s))[None, :]
        Ht = X.T @ self.H @ X
        w, Z = jnp.linalg.eigh(Ht)
        c0 = jnp.asarray(c0, dtype=complex)
        # transform c into orthonormal basis: d = X^{-1} c = sqrt(s) U^T c
        d0 = (jnp.sqrt(s)[:, None] * U.T) @ c0
        ns = nt // nout
        times = jnp.arange(ns + 1) * dt * nout
        phases = jnp.exp(-1j * w[None, :] * times[:, None])
        d_t = jnp.einsum("nk, tk, k -> tn", Z, phases, Z.T @ d0)
        c_t = (X @ d_t.T).T
        r = Result(times=times, dt=dt, nt=nt, nout=nout)
        r.states = c_t
        r.psi = c_t[-1]
        return r

    def wavefunction(self, c, x):
        """Reconstruct psi(x) from coefficients."""
        x = jnp.asarray(x)
        g = ((self.a[None, :] / np.pi) ** 0.25
             * jnp.exp(-0.5 * self.a[None, :]
                       * (x[:, None] - self.q[None, :]) ** 2))
        return g @ jnp.asarray(c)


# ===================================================================
# N-dimensional static Gaussian basis with complex momenta
# (reference: pyqed/ldr/gwp.py:94 ``GWP``, :282 ``WPD``, :562 ``WPD2``)
# ===================================================================
from dataclasses import dataclass
from typing import Callable

# basis
# -------------------------------------------------------------------

@dataclass
class GWPBasis:
    """N frozen Gaussians  g(x) = prod_d (2a/pi)^{1/4}
    exp(-a_d (x_d - q_d)^2 + i p_d (x_d - q_d)).

    q, p, a : arrays (N, d).
    """
    q: jnp.ndarray
    p: jnp.ndarray
    a: jnp.ndarray

    @classmethod
    def grid(cls, centers: Sequence[np.ndarray], a=1.0, p=0.0):
        """Direct-product lattice of Gaussians from per-dim center lists."""
        mesh = np.meshgrid(*[np.asarray(c, float) for c in centers],
                           indexing="ij")
        q = np.stack([m.ravel() for m in mesh], axis=-1)
        n, d = q.shape
        return cls(jnp.asarray(q),
                   jnp.broadcast_to(jnp.asarray(p, float), (n, d)) + 0.0,
                   jnp.broadcast_to(jnp.asarray(a, float), (n, d)) + 0.0)

    @property
    def nbasis(self):
        return self.q.shape[0]

    @property
    def ndim(self):
        return self.q.shape[1]

    def evaluate(self, x):
        """Basis functions at points x (M, d) -> (M, N) complex."""
        q, p, a = self.q, self.p, self.a
        dx = x[:, None, :] - q[None, :, :]          # (M, N, d)
        norm = jnp.prod((2 * a / jnp.pi) ** 0.25, axis=-1)
        phase = jnp.sum(-a * dx ** 2 + 1j * p * dx, axis=-1)
        return norm[None, :] * jnp.exp(phase)


def _pair_core(q, p, a):
    """Per-dimension pairwise Gaussian-product data.

    Returns (S, alpha, mu) each (N, N, d):
      S      per-dim overlap <g_j | g_k>_d,
      alpha  product-Gaussian width a_j + a_k,
      mu     complex product-Gaussian center beta/(2 alpha).
    """
    aj, ak = a[:, None, :], a[None, :, :]
    qj, qk = q[:, None, :], q[None, :, :]
    pj, pk = p[:, None, :], p[None, :, :]
    alpha = aj + ak
    beta = 2 * aj * qj + 2 * ak * qk + 1j * (pk - pj)
    gamma = (-aj * qj ** 2 - ak * qk ** 2
             + 1j * (pj * qj - pk * qk))
    norm = (2 * aj / jnp.pi) ** 0.25 * (2 * ak / jnp.pi) ** 0.25
    S = norm * jnp.sqrt(jnp.pi / alpha) * jnp.exp(
        beta ** 2 / (4 * alpha) + gamma)
    return S, alpha, beta / (2 * alpha)


class WPDN:
    """Wavepacket dynamics in a static Gaussian basis (any ndim).

    Parameters
    ----------
    basis : GWPBasis
    mass : scalar or (d,) masses.
    potential : callable x (d,) -> scalar (jax-traceable), or None if
        a DVR-style grid potential is attached later.
    nquad : Gauss–Hermite order for the potential integrals.

    Reference parity: pyqed/ldr/gwp.py:282 ``WPD.buildH/eigenstates/run``.
    """

    def __init__(self, basis: GWPBasis, mass=1.0,
                 potential: Optional[Callable] = None, nquad: int = 24):
        self.basis = basis
        d = basis.ndim
        self.mass = jnp.broadcast_to(jnp.asarray(mass, float), (d,)) + 0.0
        self.potential = potential
        self.nquad = nquad
        self._S = None
        self._H = None

    # ---- matrices -------------------------------------------------
    def overlap(self):
        if self._S is None:
            Sd, _, _ = _pair_core(self.basis.q, self.basis.p, self.basis.a)
            self._S = jnp.prod(Sd, axis=-1)
        return self._S

    def kinetic(self):
        """T = sum_d (-1/2m_d) <g_j| d^2/dx_d^2 |g_k>, closed form.

        d^2/du^2 g_k = [(-2a_k + (-2a_k u + i p_k)^2] g_k with
        u = x - q_k, so only central moments U1, U2 about q_k enter.
        """
        q, p, a = self.basis.q, self.basis.p, self.basis.a
        Sd, alpha, mu = _pair_core(q, p, a)
        ak = a[None, :, :]
        pk = p[None, :, :]
        qk = q[None, :, :]
        M1 = Sd * mu
        M2 = Sd * (mu ** 2 + 1 / (2 * alpha))
        U1 = M1 - qk * Sd
        U2 = M2 - 2 * qk * M1 + qk ** 2 * Sd
        D2 = (-2 * ak - pk ** 2) * Sd - 4j * ak * pk * U1 + 4 * ak ** 2 * U2
        # product over the other dimensions
        allS = jnp.prod(Sd, axis=-1, keepdims=True)
        rest = jnp.where(jnp.abs(Sd) > 0, allS / Sd, 0.0)
        return jnp.sum(-D2 * rest / (2 * self.mass), axis=-1)

    def potential_matrix(self, potential: Optional[Callable] = None):
        """V_jk by per-pair GH quadrature at the complex product center."""
        V = potential if potential is not None else self.potential
        if V is None:
            raise ValueError("no potential supplied")
        q, p, a = self.basis.q, self.basis.p, self.basis.a
        Sd, alpha, mu = _pair_core(q, p, a)
        S = jnp.prod(Sd, axis=-1)
        t, w = np.polynomial.hermite.hermgauss(self.nquad)
        t = jnp.asarray(t)
        w = jnp.asarray(w / np.sqrt(np.pi))
        d = self.basis.ndim
        # tensor-product GH nodes (nquad^d, d) — fine for d <= 3
        nodes = jnp.stack(jnp.meshgrid(*([t] * d), indexing="ij"),
                          axis=-1).reshape(-1, d)
        wts = jnp.prod(jnp.stack(
            jnp.meshgrid(*([w] * d), indexing="ij"), axis=-1)
            .reshape(-1, d), axis=-1)
        scale = 1.0 / jnp.sqrt(alpha)                 # (N, N, d)

        def pair_val(mu_jk, sc_jk):
            x = mu_jk[None, :] + nodes * sc_jk[None, :]
            return jnp.sum(wts * jax.vmap(V)(x))

        n = self.basis.nbasis
        vals = jax.vmap(pair_val)(mu.reshape(n * n, d),
                                  scale.reshape(n * n, d))
        return S * vals.reshape(n, n)

    def buildH(self, potential: Optional[Callable] = None):
        self._H = self.kinetic() + self.potential_matrix(potential)
        return self._H

    # ---- spectra / dynamics ---------------------------------------
    def _pencil(self):
        if self._H is None:
            self.buildH()
        S = self.overlap()
        # Cholesky whitening of the (possibly ill-conditioned) overlap
        w, U = jnp.linalg.eigh(S)
        keep = w > 1e-10 * jnp.max(w)
        X = (U * jnp.where(keep, 1 / jnp.sqrt(jnp.where(keep, w, 1.0)),
                           0.0)[None, :])
        Ht = X.conj().T @ self._H @ X
        E, C = jnp.linalg.eigh(0.5 * (Ht + Ht.conj().T))
        return E, X @ C, X

    def eigenstates(self, k=None):
        """(E, coeffs) of the generalized problem H c = E S c."""
        E, C, _ = self._pencil()
        if k is not None:
            return E[:k], C[:, :k]
        return E, C

    def norm(self, c):
        return jnp.real(c.conj() @ self.overlap() @ c)

    def position(self, c, d=0):
        """<x_d> for coefficient vector c."""
        q, p, a = self.basis.q, self.basis.p, self.basis.a
        Sd, alpha, mu = _pair_core(q, p, a)
        allS = jnp.prod(Sd, axis=-1)
        X = allS / Sd[..., d] * (Sd[..., d] * mu[..., d])
        return jnp.real(c.conj() @ X @ c) / self.norm(c)

    def project(self, psi: Callable):
        """Least-squares coefficients of a target wavefunction psi(x)."""
        # quadrature on a dense per-dim grid spanning the basis
        q = np.asarray(self.basis.q)
        a = np.asarray(self.basis.a)
        lo = q.min(0) - 4 / np.sqrt(a.min(0))
        hi = q.max(0) + 4 / np.sqrt(a.min(0))
        grids = [np.linspace(l, h, 160) for l, h in zip(lo, hi)]
        mesh = np.meshgrid(*grids, indexing="ij")
        x = jnp.asarray(np.stack([m.ravel() for m in mesh], -1))
        dv = float(np.prod([g[1] - g[0] for g in grids]))
        G = self.basis.evaluate(x)                    # (M, N)
        b = G.conj().T @ jax.vmap(psi)(x) * dv        # <g_j|psi>
        S = self.overlap()
        return jnp.linalg.solve(S + 1e-12 * jnp.eye(S.shape[0]), b)

    def run(self, c0, dt, nt, nout=1, e_ops=("x",)):
        """Propagate i S dc/dt = H c exactly via the whitened pencil.

        Returns (times, coeffs (nsteps, N), <x_d> trajectory (nsteps, d)).
        """
        E, C, X = self._pencil()
        S = self.overlap()
        # expansion of c0 in generalized eigenvectors: c0 = C b,
        # b = C^H S c0 (C is S-orthonormal)
        b0 = C.conj().T @ (S @ c0)
        times = jnp.arange(1, nt // nout + 1) * (dt * nout)
        phases = jnp.exp(-1j * E[None, :] * times[:, None])
        cs = (phases * b0[None, :]) @ C.T             # (nsteps, N)
        xs = jnp.stack([jax.vmap(
            lambda c: self.position(c, d))(cs)
            for d in range(self.basis.ndim)], axis=-1)
        return np.asarray(times), cs, np.asarray(xs)


# 2D alias for reference parity (pyqed/ldr/gwp.py:562 WPD2)
WPD2 = WPDN


# ===================================================================
# Variational thawed Gaussian (Heller) dynamics
# (VERDICT row 25 "no variational thawed Gaussians"; reference
# pyqed/moving_gaussian.py keeps only frozen/static bases)
# ===================================================================

class ThawedGaussian:
    """Single thawed Gaussian wavepacket evolved by Heller's TDVP
    equations in d dimensions,

        psi(x) = exp(i [ (x-q)^T A (x-q) + p.(x-q) + gamma ]),

    with q' = p/m,  p' = -grad V,  A' = -2 A M^{-1} A - Hess V / 2,
    gamma' = p.M^{-1}p/2 - V + i tr(M^{-1} A)  (hbar = 1, Im A > 0).

    Exact on (locally) harmonic surfaces; the local harmonic
    approximation (LHA) uses ``jax.grad``/``jax.hessian`` of the
    supplied potential — no hand-coded derivatives.
    """

    def __init__(self, potential: Callable, mass=1.0, ndim: int = 1):
        self.V = lambda x: jnp.sum(jnp.asarray(potential(x)))
        self.grad = jax.grad(self.V)
        self.hess = jax.hessian(self.V)
        self.ndim = ndim
        self.minv = 1.0 / (jnp.broadcast_to(
            jnp.asarray(mass, float), (ndim,)) + 0.0)

    def _rhs(self, q, p, A, gamma):
        Minv = jnp.diag(self.minv)
        dq = self.minv * p
        dp = -self.grad(q)
        dA = -2.0 * A @ Minv @ A - 0.5 * self.hess(q)
        dg = (0.5 * jnp.sum(self.minv * p ** 2) - self.V(q)
              + 1j * jnp.trace(Minv @ A))
        return dq, dp, dA, dg

    def run(self, q0, p0=None, a0=1.0, dt=0.01, nt=100, nout=1):
        """RK4-propagate the Heller parameters.

        a0 : initial width — A(0) = i a0 / 2 (coherent for a0 = m w).
        Returns (times, qs, ps, As, gammas, norms).
        """
        d = self.ndim
        q = jnp.atleast_1d(jnp.asarray(q0, float))
        p = (jnp.zeros(d) if p0 is None
             else jnp.atleast_1d(jnp.asarray(p0, float)))
        A = 0.5j * (jnp.asarray(a0, complex) * jnp.eye(d)
                    if jnp.ndim(a0) == 0 else jnp.asarray(a0, complex))
        gamma = jnp.asarray(0.0, complex)

        def step(carry, _):
            q, p, A, g = carry
            k1 = self._rhs(q, p, A, g)
            k2 = self._rhs(q + dt / 2 * k1[0], p + dt / 2 * k1[1],
                           A + dt / 2 * k1[2], g + dt / 2 * k1[3])
            k3 = self._rhs(q + dt / 2 * k2[0], p + dt / 2 * k2[1],
                           A + dt / 2 * k2[2], g + dt / 2 * k2[3])
            k4 = self._rhs(q + dt * k3[0], p + dt * k3[1],
                           A + dt * k3[2], g + dt * k3[3])
            new = tuple(c + dt / 6 * (a + 2 * b + 2 * cc + dd)
                        for c, a, b, cc, dd in zip(
                            (q, p, A, g), k1, k2, k3, k4))
            return new, new

        def chunk(carry, _):
            out = jax.lax.scan(step, carry, None, length=nout)[0]
            return out, out

        carry = (q, p, A, gamma)
        carry, (qs, ps, As, gs) = jax.lax.scan(
            jax.jit(chunk), carry, None, length=nt // nout)
        times = np.arange(1, nt // nout + 1) * dt * nout
        # norm: |psi|^2 integrates to pi^{d/2} det(2 Im A)^{-1/2}
        #       * exp(-2 Im gamma)
        norms = (np.pi ** (d / 2)
                 / jnp.sqrt(jnp.linalg.det(2 * jnp.imag(As)))
                 * jnp.exp(-2 * jnp.imag(gs)))
        return times, qs, ps, As, gs, norms

    def wavefunction(self, x, q, p, A, gamma):
        dx = jnp.atleast_2d(x) - q[None, :]
        ph = (jnp.einsum("ni, ij, nj -> n", dx, A, dx)
              + dx @ p + gamma)
        return jnp.exp(1j * ph)
