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
            mesh=None, use_shard_map=False):
        """Returns (E_virial, E_thermo, acceptance, paths_final).

        With ``mesh``, the path axis is sharded over the mesh's first
        axis (the QMC replica parallelism of SURVEY.md §2.9): either
        GSPMD via a sharding constraint (default) or, with
        ``use_shard_map=True``, explicit per-device chains under
        ``shard_map`` — independent PRNG streams per device, scalar
        estimators combined with a single ``pmean`` at the end."""
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

        def mc(paths, key):
            (paths, key), _ = jax.lax.scan(
                sweep, (paths, key), None, length=ntherm)
            (paths, key), (ev, et, acc) = jax.lax.scan(
                sweep, (paths, key), None, length=nsweeps)
            return paths, jnp.mean(ev), jnp.mean(et), jnp.mean(acc)

        if mesh is not None and use_shard_map:
            # each device runs an INDEPENDENT chain over its walker
            # shard with its own PRNG stream; only the final scalar
            # estimators are combined (one pmean each) — zero
            # collectives in the hot sweep loop.
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P
            ax = mesh.axis_names[0]
            ndev = int(np.prod(mesh.devices.shape))
            if npaths % ndev != 0:
                raise ValueError(f"npaths={npaths} must divide over "
                                 f"{ndev} devices")
            keys = jax.random.split(key, ndev)

            def shard_mc(paths, ks):
                paths, ev, et, acc = mc(paths, ks[0])
                pm = lambda x: jax.lax.pmean(x, ax)
                return paths, pm(ev), pm(et), pm(acc)

            mc_run = jax.jit(shard_map(
                shard_mc, mesh=mesh,
                in_specs=(P(ax, None, None), P(ax)),
                out_specs=(P(ax, None, None), P(), P(), P())))
            paths, ev, et, acc = mc_run(paths0, keys)
        else:
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                paths0 = jax.lax.with_sharding_constraint(
                    paths0,
                    NamedSharding(mesh, P(mesh.axis_names[0], None, None)))
            paths, ev, et, acc = jax.jit(mc)(paths0, key)
        return float(ev), float(et), float(acc), paths


class BosonPIMC:
    """Finite-temperature PIMC for N identical BOSONS with explicit
    permutation (exchange) sampling — the physics of the reference's
    QSATS exchange code (reference: pyqed/qmc/MC_exchange/permute3d/ —
    Fortran+MPI replica farm with odd/even sweeps and permutation
    sampling; round-1 VERDICT row 27 "no particle-exchange permutation
    sampling").

    State per replica: beads (N, M, d) plus a permutation P closing the
    ring: bead M-1 of particle k springs to bead 0 of particle P(k).
    Moves: checkerboard bead moves, rigid whole-particle displacements,
    and pair-transposition moves P -> P∘(ij) accepted on the closure
    spring action. Replicas are the vmapped batch axis (the MPI farm).
    """

    def __init__(self, potential: Callable, nparticles: int, beta: float,
                 nbeads: int = 32, mass: float = 1.0, ndim: int = 1):
        self.V = lambda q: jnp.sum(jnp.asarray(potential(q)))
        self.N = nparticles
        self.beta = beta
        self.M = nbeads
        self.tau = beta / nbeads
        self.mass = mass
        self.ndim = ndim

    def run(self, key, nreplicas=256, nsweeps=3000, ntherm=1000,
            step=0.4, exchange=True):
        """Returns (E_thermo, acc_bead, acc_perm, cycle_stats)."""
        N, M, nd, tau, m = self.N, self.M, self.ndim, self.tau, self.mass
        spring = m / (2.0 * tau)
        Vv = self.V

        def Vflat(x):
            return jax.vmap(Vv)(x.reshape(-1, nd)).reshape(x.shape[:-1])

        def springs(x, perm):
            """Total spring action per replica: internal + closure."""
            internal = jnp.sum((x[:, :, 1:] - x[:, :, :-1]) ** 2,
                               axis=(1, 2, 3))
            head = jax.vmap(lambda xr, pr: xr[pr, 0])(x, perm)
            closure = jnp.sum((x[:, :, -1] - head) ** 2, axis=(1, 2))
            return spring * (internal + closure)

        def neighbors(x, perm):
            """Left/right bead neighbors with the permuted ring closure:
            right of (k, M-1) is (P(k), 0); left of (k, 0) is
            (P^{-1}(k), M-1)."""
            def one(xr, pr):
                pinv = jnp.zeros_like(pr).at[pr].set(jnp.arange(N))
                right = jnp.concatenate(
                    [xr[:, 1:], xr[pr, 0][:, None]], axis=1)
                left = jnp.concatenate(
                    [xr[pinv, M - 1][:, None], xr[:, :-1]], axis=1)
                return left, right
            return jax.vmap(one)(x, perm)

        def bead_move(x, perm, key, parity):
            """Per-bead checkerboard Metropolis (local action); bead
            parity separates every spring's two endpoints, including
            the permuted closure bonds (M even)."""
            key, k1, k2 = jax.random.split(key, 3)
            prop = x + step * jax.random.uniform(
                k1, x.shape, minval=-1.0, maxval=1.0)
            left, right = neighbors(x, perm)
            dS = (spring * jnp.sum(
                (prop - left) ** 2 + (prop - right) ** 2
                - (x - left) ** 2 - (x - right) ** 2, axis=-1)
                + tau * (Vflat(prop) - Vflat(x)))
            acc = jax.random.uniform(k2, dS.shape) < jnp.exp(-dS)
            bead_par = (jnp.arange(M) % 2 == parity)[None, None, :]
            take = (acc & bead_par)[..., None]
            return (jnp.where(take, prop, x), key,
                    jnp.mean(jnp.where(bead_par, acc, 0.0) * 2.0))

        def particle_move(x, perm, key):
            key, k1, k2 = jax.random.split(key, 3)
            delta = step * jax.random.uniform(
                k1, (x.shape[0], N, 1, nd), minval=-1.0, maxval=1.0)
            prop = x + delta
            dS = (springs(prop, perm) - springs(x, perm)
                  + tau * jnp.sum(Vflat(prop) - Vflat(x), axis=(1, 2)))
            acc = (jax.random.uniform(k2, (x.shape[0],))
                   < jnp.exp(-dS))[:, None, None, None]
            return jnp.where(acc, prop, x), key

        def perm_move(x, perm, key):
            key, k1, k2, k3 = jax.random.split(key, 4)
            R = x.shape[0]
            i = jax.random.randint(k1, (R,), 0, N)
            j = jax.random.randint(k2, (R,), 0, N)

            def swap_one(p, ii, jj):
                pi, pj = p[ii], p[jj]
                return p.at[ii].set(pj).at[jj].set(pi)

            perm_new = jax.vmap(swap_one)(perm, i, j)
            dS = springs(x, perm_new) - springs(x, perm)
            acc = (jax.random.uniform(k3, (R,)) < jnp.exp(-dS))
            perm = jnp.where(acc[:, None], perm_new, perm)
            return perm, key, jnp.mean(acc * 1.0)

        def energy(x, perm):
            vmean = jnp.mean(Vflat(x))
            S = springs(x, perm)
            e_th = (N * nd * M / (2.0 * self.beta)
                    - jnp.mean(S) / self.beta
                    + N * vmean)
            return e_th

        def sweep(carry, _):
            x, perm, key = carry
            x, key, a0 = bead_move(x, perm, key, 0)
            x, key, a1 = bead_move(x, perm, key, 1)
            x, key = particle_move(x, perm, key)
            if exchange:
                perm, key, ap = perm_move(x, perm, key)
            else:
                ap = 0.0
            return (x, perm, key), (energy(x, perm), 0.5 * (a0 + a1), ap)

        key = jax.random.PRNGKey(key) if isinstance(key, int) else key
        key, k0 = jax.random.split(key)
        x0 = 0.5 * jax.random.normal(k0, (nreplicas, N, M, nd))
        perm0 = jnp.tile(jnp.arange(N)[None, :], (nreplicas, 1))

        @jax.jit
        def mc(x, perm, key):
            (x, perm, key), _ = jax.lax.scan(
                sweep, (x, perm, key), None, length=ntherm)
            (x, perm, key), (es, ab, ap) = jax.lax.scan(
                sweep, (x, perm, key), None, length=nsweeps)
            return x, perm, jnp.mean(es), jnp.mean(ab), jnp.mean(ap)

        x, perm, E, ab, ap = mc(x0, perm0, key)
        # fraction of replicas with a non-identity permutation
        frac_exch = float(jnp.mean(jnp.any(
            perm != jnp.arange(N)[None, :], axis=1) * 1.0))
        return float(E), float(ab), float(ap), frac_exch
