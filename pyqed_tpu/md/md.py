"""Classical molecular dynamics (Lennard-Jones liquid).

TPU-native counterpart of the reference MD toy layer
(reference: pyqed/md/ — initialize.py/potentials.py/measure.py, ~200 LoC
NumPy velocity-Verlet LJ liquid).

All-pairs forces as one batched distance matrix under jit; velocity-Verlet
under ``lax.scan``; observables (T, E, pressure virial) accumulated on
device.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def fcc_lattice(ncell, density):
    """FCC initial positions (reference: pyqed/md/initialize.py)."""
    cell = (4.0 / density) ** (1.0 / 3.0)
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    pos = []
    for i in range(ncell):
        for j in range(ncell):
            for k in range(ncell):
                for b in base:
                    pos.append((np.array([i, j, k]) + b) * cell)
    L = ncell * cell
    return np.array(pos), L


def lj_forces(x, L, rc=2.5):
    """LJ energy/forces with minimum-image PBC — one pairwise matrix."""
    disp = x[:, None, :] - x[None, :, :]
    disp = disp - L * jnp.round(disp / L)
    r2 = jnp.sum(disp**2, axis=-1)
    n = x.shape[0]
    mask = ~jnp.eye(n, dtype=bool)
    r2 = jnp.where(mask, r2, 1.0)
    inside = mask & (r2 < rc**2)
    inv6 = 1.0 / r2**3
    # shifted potential
    u = 4.0 * (inv6**2 - inv6)
    u_c = 4.0 * (rc**-12 - rc**-6)
    U = 0.5 * jnp.sum(jnp.where(inside, u - u_c, 0.0))
    fmag = 24.0 * (2.0 * inv6**2 - inv6) / r2
    F = jnp.sum(jnp.where(inside[..., None], fmag[..., None] * disp, 0.0),
                axis=1)
    virial = 0.5 * jnp.sum(jnp.where(inside, fmag * r2, 0.0))
    return U, F, virial


class LJMD:
    """(reference: pyqed/md/)."""

    def __init__(self, ncell=3, density=0.8, temperature=1.0, rc=2.5):
        self.x0, self.L = fcc_lattice(ncell, density)
        self.n = len(self.x0)
        self.density = density
        self.T0 = temperature
        self.rc = rc

    def run(self, key, dt=0.005, nt=500, nout=10, thermostat_steps=100):
        n, L, rc, T0 = self.n, self.L, self.rc, self.T0
        x0 = jnp.asarray(self.x0)
        v0 = jax.random.normal(key, (n, 3)) * jnp.sqrt(T0)
        v0 = v0 - jnp.mean(v0, axis=0)

        def step(carry, i):
            x, v = carry
            U, F, W = lj_forces(x, L, rc)
            v_half = v + 0.5 * dt * F
            x_new = jnp.mod(x + dt * v_half, L)
            U2, F2, W2 = lj_forces(x_new, L, rc)
            v_new = v_half + 0.5 * dt * F2
            # velocity rescaling thermostat for the first window
            KE = 0.5 * jnp.sum(v_new**2)
            T_inst = 2.0 * KE / (3.0 * n)
            lam = jnp.where(i < thermostat_steps,
                            jnp.sqrt(T0 / jnp.maximum(T_inst, 1e-12)), 1.0)
            v_new = v_new * lam
            P = self.density * T_inst + W2 / (3.0 * L**3)
            return (x_new, v_new), (U2, T_inst, P)

        @jax.jit
        def evolve(x, v):
            return jax.lax.scan(step, (x, v), jnp.arange(nt))

        (xf, vf), (U, T, P) = evolve(x0, v0)
        return dict(x=xf, v=vf, U=U, T=T, P=P)

    def minimize(self, x0=None, nsteps=200, step0=1e-3):
        """Steepest-descent energy minimization (the reference's
        ``MinimizeEnergy`` class, pyqed/md/measure.py:29, is an empty
        skeleton — made real).  Backtracking step control under one
        ``lax.scan``: a move that raises U is rejected and the step
        halved; an accepted move grows the step 10%.  Returns
        (positions, U trace)."""
        L, rc = self.L, self.rc
        x0 = jnp.asarray(self.x0 if x0 is None else x0)

        def body(carry, _):
            x, step = carry
            U, F, _ = lj_forces(x, L, rc)
            fmax = jnp.max(jnp.linalg.norm(F, axis=1))
            trial = jnp.mod(x + step * F / jnp.maximum(fmax, 1e-12), L)
            U2, _, _ = lj_forces(trial, L, rc)
            ok = U2 < U
            x_new = jnp.where(ok, trial, x)
            step_new = jnp.where(ok, step * 1.1, step * 0.5)
            return (x_new, step_new), jnp.where(ok, U2, U)

        @jax.jit
        def run(x):
            return jax.lax.scan(body, (x, jnp.asarray(step0)), None,
                                length=nsteps)

        (xf, _), Utrace = run(x0)
        return xf, Utrace

    def monte_carlo(self, key, nmoves=20000, delta=0.1, x0=None,
                    temperature=None, sample_every=100):
        """Metropolis NVT Monte Carlo (the reference's ``MonteCarlo``
        class, pyqed/md/measure.py:40, is an empty skeleton — made
        real).  One single-particle trial move per scan step; the energy
        change uses only the moved particle's interaction ROW (O(N) per
        move, not O(N^2)).  Returns dict with positions, U samples and
        the acceptance ratio."""
        L, rc, n = self.L, self.rc, self.n
        T = self.T0 if temperature is None else temperature
        beta = 1.0 / T
        x0 = jnp.asarray(self.x0 if x0 is None else x0)

        def row_energy(x, i, xi):
            """LJ energy of particle i at position xi with all others."""
            disp = xi[None, :] - x
            disp = disp - L * jnp.round(disp / L)
            r2 = jnp.sum(disp**2, axis=-1)
            mask = (jnp.arange(n) != i) & (r2 < rc**2)
            r2 = jnp.where(mask, r2, 1.0)
            inv6 = 1.0 / r2**3
            u_c = 4.0 * (rc**-12 - rc**-6)
            return jnp.sum(jnp.where(mask, 4.0 * (inv6**2 - inv6) - u_c,
                                     0.0))

        def body(carry, k):
            x, U, nacc = carry
            ki, kd, ka = jax.random.split(k, 3)
            i = jax.random.randint(ki, (), 0, n)
            xi = x[i]
            trial = jnp.mod(xi + jax.random.uniform(
                kd, (3,), minval=-delta, maxval=delta), L)
            dU = row_energy(x, i, trial) - row_energy(x, i, xi)
            accept = jax.random.uniform(ka) < jnp.exp(
                jnp.minimum(-beta * dU, 0.0))
            x_new = jnp.where(accept, x.at[i].set(trial), x)
            U_new = jnp.where(accept, U + dU, U)
            return (x_new, U_new, nacc + accept), U_new

        @jax.jit
        def run(key, x):
            U0, _, _ = lj_forces(x, L, rc)
            keys = jax.random.split(key, nmoves)
            (xf, Uf, nacc), Utrace = jax.lax.scan(
                body, (x, U0, jnp.asarray(0, jnp.int32)), keys)
            return xf, Uf, nacc, Utrace[::sample_every]

        xf, Uf, nacc, Usamp = run(key, x0)
        return dict(x=xf, U=float(Uf), samples=Usamp,
                    acceptance=float(nacc) / nmoves)

    def rdf(self, x, nbins=100):
        """Radial distribution function g(r)."""
        x = np.asarray(x)
        L = self.L
        disp = x[:, None, :] - x[None, :, :]
        disp = disp - L * np.round(disp / L)
        r = np.sqrt((disp**2).sum(-1))
        iu = np.triu_indices(self.n, 1)
        rs = r[iu]
        hist, edges = np.histogram(rs, bins=nbins, range=(0, L / 2))
        rc_ = 0.5 * (edges[1:] + edges[:-1])
        dr = edges[1] - edges[0]
        shell = 4 * np.pi * rc_**2 * dr
        ideal = shell * self.density * self.n / 2
        return rc_, hist / ideal
