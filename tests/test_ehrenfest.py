"""Ehrenfest mean-field dynamics (grid/ehrenfest.py).

The reference pyqed/namd/ehrenfest.py is unfinished by its own
docstring; these tests pin our implementation to analytic limits.
"""
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.grid.ehrenfest import Ehrenfest


def test_single_surface_harmonic_is_classical():
    """ns=1: Ehrenfest == classical HO trajectory, x(t)=x0 cos(w t)."""
    w0 = 1.3

    def v(x):
        return jnp.array([[0.5 * w0 ** 2 * x[0] ** 2]])

    sol = Ehrenfest(v, mass=1.0, nstates=1, ndim=1)
    x0, p0 = 1.0, 0.0
    dt, nt = 0.002, 1000
    r = sol.run(np.array([[x0]]), np.array([[p0]]),
                np.array([[1.0 + 0j]]), dt=dt, nt=nt, nout=10)
    t = r.times
    xt = np.asarray(r.x)[:, 0, 0]
    assert np.max(np.abs(xt - x0 * np.cos(w0 * t))) < 1e-6


def test_energy_conservation_two_state():
    """Coupled 2-state model: Ehrenfest energy conserved to 1e-8."""
    def v(x):
        d = x[0]
        return jnp.array([[0.5 * d ** 2, 0.3 * jnp.exp(-d ** 2)],
                          [0.3 * jnp.exp(-d ** 2), 0.5 * (d - 1.0) ** 2 + 0.5]])

    sol = Ehrenfest(v, mass=2.0, nstates=2, ndim=1)
    c0 = np.array([[1.0, 0.0]], complex)
    r = sol.run(np.array([[-1.0]]), np.array([[1.5]]), c0,
                dt=0.001, nt=2000, nout=100)
    e = np.asarray(r.energy)[:, 0]
    assert np.max(np.abs(e - e[0])) < 1e-8


def test_frozen_nucleus_rabi():
    """Constant coupling, flat surfaces -> exact 2-level Rabi populations."""
    delta, g = 0.7, 0.25

    def v(x):
        return jnp.array([[0.0, g], [g, delta]]) + 0.0 * x[0]

    # dv = 0 -> nucleus never moves; electrons do exact Rabi
    sol = Ehrenfest(v, mass=1.0, nstates=2, ndim=1)
    dt, nt = 0.001, 3000
    r = sol.run(np.array([[0.0]]), np.array([[0.0]]),
                np.array([[1.0, 0.0]], complex), dt=dt, nt=nt, nout=50)
    t = r.times
    Omega = np.sqrt(delta ** 2 + 4 * g ** 2)
    p1_exact = (2 * g / Omega) ** 2 * np.sin(Omega * t / 2) ** 2
    p1 = np.asarray(r.population)[:, 0, 1]
    assert np.max(np.abs(p1 - p1_exact)) < 1e-8
    assert np.max(np.abs(np.asarray(r.x))) < 1e-12


def test_ensemble_vmap_shapes():
    """Ensemble run: many trajectories in one vmap."""
    def v(x):
        return jnp.array([[0.5 * x[0] ** 2, 0.1],
                          [0.1, 0.5 * x[0] ** 2 + 1.0]])

    sol = Ehrenfest(v, mass=1.0, nstates=2, ndim=1)
    ntraj = 16
    rng = np.random.default_rng(0)
    x0 = rng.normal(0, 0.3, (ntraj, 1))
    p0 = rng.normal(0, 0.3, (ntraj, 1))
    c0 = np.tile(np.array([1.0, 0.0], complex), (ntraj, 1))
    r = sol.run(x0, p0, c0, dt=0.01, nt=50, nout=10)
    assert np.asarray(r.x).shape == (5, ntraj, 1)
    assert np.asarray(r.population).shape == (5, ntraj, 2)
    pops = np.asarray(r.population)
    assert np.allclose(pops.sum(-1), 1.0, atol=1e-10)
