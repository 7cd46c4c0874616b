"""Ehrenfest mixed quantum-classical nonadiabatic dynamics.

TPU-native counterpart of the reference's Ehrenfest module
(reference: pyqed/namd/ehrenfest.py — marked "@status: not finished,
work on single Ehrenfest trajectory first" in its own docstring; this
module supplies the finished capability).

Method: classical nuclei + TDSE electrons, mean-field coupling

    i dc/dt   = V(x(t)) c
    m d2x/dt2 = - <c| dV/dx |c> / <c|c>

Integrated with RK4 on the joint (x, p, c) state under ``lax.scan``;
the whole trajectory ENSEMBLE is a single ``vmap`` over the initial
conditions — the TPU replacement for the reference's intended
trajectory loop.  ``dv`` defaults to ``jax.jacfwd`` of the potential,
so any differentiable diabatic model works without hand-coded forces.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.result import Result


class Ehrenfest:
    """Mean-field (Ehrenfest) trajectories on a diabatic model.

    Parameters
    ----------
    v : callable x(ndim,) -> (ns, ns) diabatic potential matrix
        (real or complex Hermitian).
    dv : callable x -> (ndim, ns, ns) gradient; default jacfwd(v).
    mass : scalar or (ndim,) nuclear masses.
    """

    def __init__(self, v: Callable, dv: Optional[Callable] = None,
                 mass=1.0, nstates: int = 2, ndim: int = 1):
        self.v = v
        self.dv = dv if dv is not None else (
            lambda x: jnp.moveaxis(jax.jacfwd(self.v)(x), -1, 0))
        self.mass = jnp.atleast_1d(jnp.asarray(mass, dtype=jnp.float64)
                                   if jax.config.jax_enable_x64
                                   else jnp.asarray(mass))
        self.nstates = nstates
        self.ndim = ndim

    # ------------------------------------------------------------------ rhs
    def _rhs(self, x, p, c):
        V = self.v(x)
        dV = self.dv(x)                              # (ndim, ns, ns)
        nrm = jnp.real(jnp.vdot(c, c))
        F = -jnp.real(jnp.einsum("a, dab, b -> d", jnp.conj(c), dV, c)) / nrm
        return p / self.mass, F, -1j * (V @ c)

    def _step(self, state, dt):
        x, p, c = state
        k1 = self._rhs(x, p, c)
        k2 = self._rhs(x + 0.5 * dt * k1[0], p + 0.5 * dt * k1[1],
                       c + 0.5 * dt * k1[2])
        k3 = self._rhs(x + 0.5 * dt * k2[0], p + 0.5 * dt * k2[1],
                       c + 0.5 * dt * k2[2])
        k4 = self._rhs(x + dt * k3[0], p + dt * k3[1], c + dt * k3[2])
        x = x + dt / 6 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        p = p + dt / 6 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        c = c + dt / 6 * (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2])
        return x, p, c

    def energy(self, x, p, c):
        """Conserved Ehrenfest energy p^2/2m + <c|V|c>/<c|c> (per traj)."""
        V = self.v(x)
        nrm = jnp.real(jnp.vdot(c, c))
        return (jnp.sum(p ** 2 / (2 * self.mass))
                + jnp.real(jnp.einsum("a, ab, b ->", jnp.conj(c), V, c))
                / nrm)

    # ------------------------------------------------------------------ run
    def run(self, x0, p0, c0, dt=0.01, nt=100, nout=1) -> Result:
        """Propagate an ensemble: x0/p0 (ntraj, ndim), c0 (ntraj, ns).

        Returns Result with .x, .p, .c (nsnap, ntraj, ...), .population
        (nsnap, ntraj, ns) and .energy (nsnap, ntraj).
        """
        x0 = jnp.atleast_2d(jnp.asarray(x0))
        p0 = jnp.atleast_2d(jnp.asarray(p0))
        c0 = jnp.atleast_2d(jnp.asarray(c0, dtype=complex))
        ns_steps = nt // nout

        def one_traj(x, p, c):
            def window(state, _):
                def fine(i, s):
                    return self._step(s, dt)
                state = jax.lax.fori_loop(0, nout, fine, state)
                x_, p_, c_ = state
                pop = jnp.abs(c_) ** 2 / jnp.real(jnp.vdot(c_, c_))
                return state, (x_, p_, c_, pop, self.energy(x_, p_, c_))
            _, out = jax.lax.scan(window, (x, p, c), None, length=ns_steps)
            return out

        xs, ps, cs, pops, es = jax.jit(jax.vmap(one_traj, in_axes=(0, 0, 0),
                                                out_axes=1))(x0, p0, c0)
        r = Result(dt=dt, nt=nt, nout=nout)
        r.times = np.arange(1, ns_steps + 1) * dt * nout
        r.x, r.p, r.c = xs, ps, cs
        r.population = pops
        r.energy = es
        return r
