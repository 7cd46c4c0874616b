"""Path-integral Monte Carlo (finite-temperature) — walker-parallel.

TPU-native counterpart of the reference's serial single-particle PIMC
(reference: pyqed/qmc/PIMC/pimc.py:25 ``OneMetropolisStep`` + the
virial estimator from the position histogram, :138).

TPU design: thousands of independent ring polymers advance in parallel
(vmap over the path axis), and within each polymer the beads update in
a CHECKERBOARD (even/odd) pattern — beads couple only to their ring
neighbors, so half of all beads across all paths move per Metropolis
half-sweep. Everything (proposals, acceptance, estimators) is one
jitted ``lax.scan`` on device; dV/dx comes from ``jax.grad`` when not
supplied.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp


class PIMC:
    """Single-particle PIMC in ndim dimensions (ring polymer of M beads).

    Parameters
    ----------
    potential : callable q (ndim,) -> V(q) (scalar, jax-traceable).
    beta : inverse temperature.
    nbeads : Trotter number M (tau = beta / M).
    mass : particle mass.
    ndim : spatial dimension.
    """

    def __init__(self, potential: Callable, beta: float, nbeads: int = 64,
                 mass: float = 1.0, ndim: int = 1,
                 dVdx: Optional[Callable] = None):
        # accept both scalar-returning and shape-(1,) potentials
        self.V = lambda q: jnp.sum(jnp.asarray(potential(q)))
        self.dVdx = dVdx if dVdx is not None else jax.grad(self.V)
        self.beta = beta
        self.M = nbeads
        self.tau = beta / nbeads
        self.mass = mass
        self.ndim = ndim

    def run(self, key, npaths=2048, nsweeps=2000, ntherm=500, step=0.5,
            mesh=None):
        """Returns (E_virial, E_thermo, acceptance, paths_final).

        With ``mesh``, the path axis is sharded over the mesh's first
        axis (the QMC replica parallelism of SURVEY.md §2.9)."""
        M, tau, m, nd = self.M, self.tau, self.mass, self.ndim
        V = self.V
        dV = self.dVdx
        spring = m / (2.0 * tau)

        def Vflat(x):
            # x (..., nd) -> V evaluated pointwise
            return jax.vmap(V)(x.reshape(-1, nd)).reshape(x.shape[:-1])

        def dVflat(x):
            return jax.vmap(dV)(x.reshape(-1, nd)).reshape(x.shape)

        def half_sweep(paths, key, parity):
            """Move beads with index % 2 == parity, all paths at once."""
            key, k1, k2 = jax.random.split(key, 3)
            prop = paths + step * jax.random.uniform(
                k1, paths.shape, minval=-1.0, maxval=1.0)
            left = jnp.roll(paths, 1, axis=1)
            right = jnp.roll(paths, -1, axis=1)
            dS = (spring * jnp.sum(
                (prop - left) ** 2 + (prop - right) ** 2
                - (paths - left) ** 2 - (paths - right) ** 2, axis=-1)
                + tau * (Vflat(prop) - Vflat(paths)))
            accept = (jax.random.uniform(k2, dS.shape)
                      < jnp.exp(-dS))
            bead_par = (jnp.arange(M) % 2 == parity)[None, :]
            take = (accept & bead_par)[..., None]
            return jnp.where(take, prop, paths), key, jnp.mean(
                jnp.where(bead_par, accept, 0.0) * 2.0)

        def centroid_move(paths, key):
            """Rigid whole-polymer displacement — the spring action is
            invariant, so acceptance depends on the potential only.
            Beats the centroid-mode critical slowing of bead moves."""
            key, k1, k2 = jax.random.split(key, 3)
            delta = step * jax.random.uniform(
                k1, (paths.shape[0], 1, nd), minval=-1.0, maxval=1.0)
            prop = paths + delta
            dS = tau * jnp.sum(Vflat(prop) - Vflat(paths), axis=1)
            accept = (jax.random.uniform(k2, (paths.shape[0],))
                      < jnp.exp(-dS))[:, None, None]
            return jnp.where(accept, prop, paths), key

        def sweep(carry, _):
            paths, key = carry
            paths, key, a1 = half_sweep(paths, key, 0)
            paths, key, a2 = half_sweep(paths, key, 1)
            paths, key = centroid_move(paths, key)
            vvals = Vflat(paths)
            e_vir = jnp.mean(vvals) + 0.5 * jnp.mean(
                jnp.sum(paths * dVflat(paths), axis=-1))
            dx2 = jnp.sum((paths - jnp.roll(paths, 1, axis=1)) ** 2,
                          axis=(1, 2))
            e_th = (M * nd / (2.0 * self.beta)
                    - spring / self.beta * jnp.mean(dx2)
                    + jnp.mean(vvals))
            return (paths, key), (e_vir, e_th, 0.5 * (a1 + a2))

        key, k0 = jax.random.split(jax.random.PRNGKey(key)
                                   if isinstance(key, int) else key)
        paths0 = 0.5 * jax.random.normal(k0, (npaths, M, nd))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            paths0 = jax.lax.with_sharding_constraint(
                paths0,
                NamedSharding(mesh, P(mesh.axis_names[0], None, None)))

        @jax.jit
        def mc(paths, key):
            (paths, key), _ = jax.lax.scan(
                sweep, (paths, key), None, length=ntherm)
            (paths, key), (ev, et, acc) = jax.lax.scan(
                sweep, (paths, key), None, length=nsweeps)
            return paths, jnp.mean(ev), jnp.mean(et), jnp.mean(acc)

        paths, ev, et, acc = mc(paths0, key)
        return float(ev), float(et), float(acc), paths
