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
