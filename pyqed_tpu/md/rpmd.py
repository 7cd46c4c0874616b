"""Ring-polymer molecular dynamics (RPMD), TPU-native.

Beyond-parity method family: the reference's MD layer is a classical LJ
code (reference: pyqed/md/*.py); it has no path-integral dynamics.  RPMD
[Craig & Manolopoulos, JCP 121, 3368 (2004)] approximates Kubo-transformed
quantum time-correlation functions by classical dynamics of the imaginary-
time ring polymer — n beads coupled by harmonic springs at the Matsubara
frequency omega_n = n / (beta hbar).

TPU design: the bead axis lives in normal-mode space through an orthogonal
transform applied as ONE matmul (MXU), the free ring-polymer step is the
exact normal-mode rotation (symplectic, no spring-force stiffness limit on
dt), and the trajectory ENSEMBLE is a single vmapped ``lax.scan`` — the
classic bead/trajectory double loop becomes two batched axes.

Integrator: symmetric splitting  e^{L dt} ~ e^{L_V dt/2} e^{L_0 dt}
e^{L_V dt/2}  with exact free-RP normal-mode evolution L_0 [Ceriotti et
al., JCP 133, 124104 (2010)]; optional PILE-L thermostat (same paper) for
canonical sampling (T-RPMD); thermostat OFF for microcanonical RPMD
correlation functions.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.result import Result

__all__ = ["RPMD", "kubo_harmonic_xx"]


def normal_mode_matrix(n):
    """Orthogonal bead -> normal-mode transform C (n, n), and the free
    ring-polymer normal-mode frequencies omega_k = 2 omega_n sin(k pi/n)
    in units of omega_n = n/(beta hbar) (returned as sin factors)."""
    C = np.zeros((n, n))
    j = np.arange(n)
    C[0] = 1.0 / np.sqrt(n)
    for k in range(1, n // 2 + 1):
        if 2 * k == n:
            C[k] = (-1.0) ** j / np.sqrt(n)
        else:
            C[k] = np.sqrt(2.0 / n) * np.cos(2 * np.pi * j * k / n)
    for k in range(n // 2 + 1, n):
        C[k] = np.sqrt(2.0 / n) * np.sin(2 * np.pi * j * (n - k) / n)
    sin_fac = 2.0 * np.abs(np.sin(np.pi * np.minimum(np.arange(n),
                                                     n - np.arange(n)) / n))
    return C, sin_fac


def kubo_harmonic_xx(t, omega, beta, mass=1.0):
    """Exact Kubo-transformed position autocorrelation of the harmonic
    oscillator, C_xx(t) = cos(omega t) / (beta m omega^2) — RPMD is exact
    for this case (Craig & Manolopoulos 2004, Sec. III.A)."""
    t = np.asarray(t)
    return np.cos(omega * t) / (beta * mass * omega ** 2)


class RPMD:
    """Ring-polymer MD on a (possibly multidimensional) potential.

    Parameters
    ----------
    potential : callable x(ndim,) -> scalar V (per bead).
    dV : callable x -> (ndim,) gradient; default jax.grad(potential).
    mass : scalar or (ndim,).
    beta : inverse temperature (atomic units, hbar = 1).
    nbeads : number of ring-polymer beads.
    """

    def __init__(self, potential: Callable, beta: float, nbeads: int = 32,
                 dV: Optional[Callable] = None, mass=1.0, ndim: int = 1):
        self.potential = potential
        self.dV = dV if dV is not None else jax.grad(potential)
        self.mass = jnp.atleast_1d(jnp.asarray(mass, dtype=float))
        self.beta = float(beta)
        self.n = int(nbeads)
        self.ndim = ndim
        self.beta_n = self.beta / self.n
        self.omega_n = 1.0 / self.beta_n                  # n/(beta hbar)
        C, sin_fac = normal_mode_matrix(self.n)
        self.C = jnp.asarray(C)
        self.omega_k = jnp.asarray(sin_fac) * self.omega_n   # (n,)

    # ------------------------------------------------------------- pieces
    def _forces(self, x):
        """External force -dV per bead; x (n, ndim) -> (n, ndim)."""
        return -jax.vmap(self.dV)(x)

    def _free_rp(self, x, p, dt):
        """Exact free ring-polymer evolution (normal modes; one matmul
        in, one matmul out — the bead axis hits the MXU)."""
        X = self.C @ x                                    # (n, ndim)
        P = self.C @ p
        w = self.omega_k[:, None]                         # (n, 1)
        m = self.mass[None, :]
        c, s = jnp.cos(w * dt), jnp.sin(w * dt)
        # w=0 centroid mode: x += p dt / m (limit of s/w)
        sw = jnp.where(w > 0, s / jnp.where(w > 0, w, 1.0), dt)
        X_new = c * X + sw * P / m
        P_new = c * P - m * w * s * X
        return self.C.T @ X_new, self.C.T @ P_new

    def _pile(self, p, key, dt, tau0=None):
        """PILE-L thermostat: OU update of normal-mode momenta."""
        gamma = 2.0 * self.omega_k
        g0 = 1.0 / float(tau0) if tau0 else self.omega_n / self.n
        gamma = gamma.at[0].set(g0)
        c1 = jnp.exp(-0.5 * dt * gamma)[:, None]
        m = self.mass[None, :]
        sig = jnp.sqrt((1.0 - c1 ** 2) * m / self.beta_n)
        P = self.C @ p
        xi = jax.random.normal(key, P.shape)
        return self.C.T @ (c1 * P + sig * xi)

    def _step(self, x, p, dt):
        """Velocity-Verlet with exact free-RP core (symplectic)."""
        p = p + 0.5 * dt * self._forces(x)
        x, p = self._free_rp(x, p, dt)
        p = p + 0.5 * dt * self._forces(x)
        return x, p

    def energy(self, x, p):
        """Conserved ring-polymer Hamiltonian (per polymer)."""
        m = self.mass[None, :]
        ke = jnp.sum(p ** 2 / (2.0 * m))
        spring = 0.5 * jnp.sum(m * self.omega_n ** 2
                               * (x - jnp.roll(x, 1, axis=0)) ** 2)
        pot = jnp.sum(jax.vmap(self.potential)(x))
        return ke + spring + pot

    # ------------------------------------------------------- thermal init
    def sample_free(self, key, ntraj, x_center=0.0):
        """Exact thermal sample of the FREE ring polymer (normal-mode
        Gaussians; centroid pinned at x_center) + Maxwell momenta."""
        kx, kp = jax.random.split(jax.random.PRNGKey(key)
                                  if isinstance(key, (int, np.integer)) else key)
        m = self.mass[None, None, :]
        w = self.omega_k[None, :, None]
        sig_x = jnp.where(w > 0,
                          1.0 / jnp.sqrt(self.beta_n * m
                                         * jnp.where(w > 0, w, 1.0) ** 2),
                          0.0)
        X = sig_x * jax.random.normal(kx, (ntraj, self.n, self.ndim))
        X = X.at[:, 0, :].set(jnp.sqrt(float(self.n)) * x_center)
        P = jnp.sqrt(m / self.beta_n) * jax.random.normal(
            kp, (ntraj, self.n, self.ndim))
        CT = self.C.T
        return jnp.einsum("ij, tjd -> tid", CT, X), \
            jnp.einsum("ij, tjd -> tid", CT, P)

    def sample_harmonic(self, key, ntraj, omega, x_center=0.0):
        """EXACT thermal sample of the ring polymer in a harmonic well
        V = m omega^2 x^2 / 2: every normal mode is Gaussian with
        frequency sqrt(omega_k^2 + omega^2) (used to pin the RPMD TCF
        against the closed-form Kubo result without thermostat error)."""
        kx, kp = jax.random.split(jax.random.PRNGKey(key)
                                  if isinstance(key, (int, np.integer)) else key)
        m = self.mass[None, None, :]
        w2 = (self.omega_k[None, :, None] ** 2 + omega ** 2)
        sig_x = 1.0 / jnp.sqrt(self.beta_n * m * w2)
        X = sig_x * jax.random.normal(kx, (ntraj, self.n, self.ndim))
        X = X + jnp.where(jnp.arange(self.n)[None, :, None] == 0,
                          jnp.sqrt(float(self.n)) * x_center, 0.0)
        P = jnp.sqrt(m / self.beta_n) * jax.random.normal(
            kp, (ntraj, self.n, self.ndim))
        CT = self.C.T
        return jnp.einsum("ij, tjd -> tid", CT, X), \
            jnp.einsum("ij, tjd -> tid", CT, P)

    # ------------------------------------------------------------ run/tcf
    def thermalize(self, x0, p0, key, dt=0.05, nsteps=2000, tau0=None):
        """PILE-thermostatted (T-RPMD) propagation to the canonical
        ring-polymer distribution; x0/p0 (ntraj, n, ndim)."""
        key = jax.random.PRNGKey(key) if isinstance(key, (int, np.integer)) else key
        keys = jax.random.split(key, x0.shape[0])

        def one(x, p, k):
            def body(carry, kk):
                x, p = carry
                k1, k2 = jax.random.split(kk)
                p = self._pile(p, k1, dt, tau0)
                x, p = self._step(x, p, dt)
                p = self._pile(p, k2, dt, tau0)
                return (x, p), None
            ks = jax.random.split(k, nsteps)
            (x, p), _ = lax.scan(body, (x, p), ks)
            return x, p

        return jax.jit(jax.vmap(one))(jnp.asarray(x0), jnp.asarray(p0),
                                      keys)

    def run(self, x0, p0, dt=0.05, nt=1000, nout=1) -> Result:
        """Microcanonical (NVE) ring-polymer dynamics of an ensemble;
        x0/p0 (ntraj, n, ndim).  Result: .x/.p (nsnap, ntraj, n, ndim),
        .centroid (nsnap, ntraj, ndim), .energy (nsnap, ntraj)."""
        x0, p0 = jnp.asarray(x0), jnp.asarray(p0)
        ns_steps = nt // nout

        def one(x, p):
            def window(carry, _):
                def fine(i, s):
                    return self._step(*s, dt)
                x, p = lax.fori_loop(0, nout, fine, carry)
                return (x, p), (x, p, jnp.mean(x, axis=0),
                                self.energy(x, p))
            _, out = lax.scan(window, (x, p), None, length=ns_steps)
            return out

        xs, ps, cen, es = jax.jit(jax.vmap(one, in_axes=(0, 0),
                                           out_axes=1))(x0, p0)
        r = Result(dt=dt, nt=nt, nout=nout)
        r.times = np.arange(1, ns_steps + 1) * dt * nout
        r.x, r.p = xs, ps
        r.centroid = cen
        r.energy = es
        return r

    def position_tcf(self, x0, p0, dt=0.05, nt=1000, nout=1):
        """RPMD (Kubo-transformed) position autocorrelation
        C_xx(t) = <xbar(0) . xbar(t)> over the ensemble; returns
        (times, C) including the t=0 point: C[0] = <|xbar(0)|^2>."""
        x0, p0 = jnp.asarray(x0), jnp.asarray(p0)
        res = self.run(x0, p0, dt=dt, nt=nt, nout=nout)
        cen0 = jnp.mean(x0, axis=1)                       # (ntraj, ndim)
        cen = jnp.concatenate([cen0[None], res.centroid], axis=0)
        C = jnp.mean(jnp.sum(cen0[None] * cen, axis=-1), axis=1)
        t = np.concatenate([[0.0], np.asarray(res.times)])
        return t, np.asarray(C)
