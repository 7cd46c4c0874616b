"""Light-driven free (or harmonically confined) electron trajectories.

TPU-native counterpart of the reference script
(reference: pyqed/floquet/free_electron.py:18-74 ``efield``/``force``/
``light_driven_free_electron`` — a solve_ivp script with hard-coded
field parameters and a module-level plotting block). Here the classical
equations of motion

    dq/dt = p/m,   dp/dt = -e E(t) - m w0^2 q

are integrated with a fixed-step RK4 under ``lax.scan`` and batched over
carrier-envelope phases / field strengths with ``vmap``, so a whole CEP
scan is one compiled TPU program. For the truly free electron (w0 = 0)
the quiver solution is analytic, which the tests pin against.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def efield(t, E0=1.0, omega=1.0, cep=0.0, polarization="circular"):
    """Field E(t): circular (reference's cos ex - sin ey) or linear x."""
    ph = omega * t + cep
    if polarization == "circular":
        return E0 * jnp.stack([jnp.cos(ph), -jnp.sin(ph),
                               jnp.zeros_like(t)], axis=-1)
    return E0 * jnp.stack([jnp.cos(ph), jnp.zeros_like(t),
                           jnp.zeros_like(t)], axis=-1)


def light_driven_free_electron(tf=100.0, nt=2000, q0=(0.4, 0.0, 0.0),
                               p0=(0.0, 0.0, 0.0), E0=1.0, omega=1.0,
                               cep=0.0, omega0=0.0, mass=1.0, charge=1.0,
                               polarization="circular"):
    """Propagate q(t), p(t); returns (t, q, p) arrays of shape (nt+1, 3).

    omega0: harmonic confinement frequency (0 = free electron).
    """
    dt = tf / nt
    q0 = jnp.asarray(q0, dtype=jnp.float64 if jax.config.jax_enable_x64
                     else jnp.float32)
    p0 = jnp.asarray(p0, dtype=q0.dtype)

    def rhs(t, q, p):
        f = -charge * efield(t, E0, omega, cep, polarization) \
            - mass * omega0 ** 2 * q
        return p / mass, f

    def step(carry, k):
        t, q, p = carry
        k1q, k1p = rhs(t, q, p)
        k2q, k2p = rhs(t + dt / 2, q + dt / 2 * k1q, p + dt / 2 * k1p)
        k3q, k3p = rhs(t + dt / 2, q + dt / 2 * k2q, p + dt / 2 * k2p)
        k4q, k4p = rhs(t + dt, q + dt * k3q, p + dt * k3p)
        q = q + dt / 6 * (k1q + 2 * k2q + 2 * k3q + k4q)
        p = p + dt / 6 * (k1p + 2 * k2p + 2 * k3p + k4p)
        return (t + dt, q, p), (q, p)

    (tend, qf, pf), (qs, ps) = jax.lax.scan(
        step, (jnp.asarray(0.0, q0.dtype), q0, p0), jnp.arange(nt))
    t = jnp.arange(nt + 1) * dt
    q = jnp.concatenate([q0[None], qs], axis=0)
    p = jnp.concatenate([p0[None], ps], axis=0)
    return t, q, p


def cep_scan(ceps, **kwargs):
    """vmap the trajectory over a batch of carrier-envelope phases."""
    ceps = jnp.asarray(ceps)

    def one(cep):
        return light_driven_free_electron(cep=cep, **kwargs)

    return jax.vmap(one)(ceps)
