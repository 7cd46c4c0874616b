"""Nonequilibrium DMFT (Bethe lattice, two-time KB) tests.

The reference's pyqed/gw/dmft.py noneq section is untranslated C++
pseudocode (invalid Python); these pin the working rebuild in
pyqed_tpu/negf/dmft.py::NoneqDMFT.

Physics of the partial-equilibrium setup (no Matsubara branch): every
diagonal product state is e^{alpha N} and commutes with the Hubbard
Hamiltonian, so LOCAL observables (n, double occupancy, energies) are
exactly stationary — the nontrivial content is (a) the SPECTRAL
dynamics of G^R and (b) that the collision integrals preserve the
stationarity (a conserving-approximation check the Phi-derivable 2B
solver must pass and plain IPT need not).
"""
import numpy as np
import pytest

from pyqed_tpu.negf.dmft import NoneqDMFT


def _bethe_gr_exact(ts, v):
    """Free Bethe-lattice G^R(t) = -i * FT[semicircular DOS]: computed
    by direct quadrature of rho(w) = sqrt(4v^2 - w^2)/(2 pi v^2)."""
    w = np.linspace(-2 * v, 2 * v, 4001)
    rho = np.sqrt(np.maximum(4 * v ** 2 - w ** 2, 0.0)) / (2 * np.pi * v ** 2)
    ph = np.exp(-1j * np.outer(ts, w))
    return -1j * np.trapezoid(rho * ph, w, axis=1)


def test_noneq_dmft_free_matches_semicircle():
    """U = 0: the self-consistent two-time G^R(t, 0) must converge to
    the exact semicircular-DOS retarded GF (= -i J1(2vt)/(vt))."""
    v, nt, dt = 0.5, 150, 0.05
    d = NoneqDMFT(0.0, v=v, nt=nt, dt=dt)
    d.run(niter=30, tol=1e-12)
    ts = np.arange(nt) * dt
    gr = d.retarded_t0()
    exact = _bethe_gr_exact(ts, v)
    err = np.max(np.abs(gr - exact))       # O(dt^2) trapezoid march
    assert err < 3e-4
    # spot-check the Bessel closed form too
    from scipy.special import j1
    tb = ts[10:]
    closed = -1j * j1(2 * v * tb) / (v * tb)
    # (1e-5: quadrature error of the 4001-point DOS integral itself)
    assert np.max(np.abs(exact[10:] - closed)) < 1e-5
    # particle-hole symmetry: n(t) = 1/2 to the Heun diagonal's accuracy
    assert np.max(np.abs(d.density() - 0.5)) < 1e-7


@pytest.mark.parametrize("solver", ["2b", "ipt"])
def test_noneq_dmft_stationarity(solver):
    """n0 = 0.8, U = 1.5: the initial state e^{alpha N} commutes with
    H — n(t), d(t) = n^2, and the Galitskii-Migdal energies must stay
    EXACTLY constant.  Both impurity solvers preserve this through
    cancellation (not absence) of collision terms; with the
    second-order march the drift is at round-off.  (Before the
    trapezoid-weight fix in kb2t._march the first-order integrator
    error showed up here as an apparent 'IPT drift' of 4.5e-3.)"""
    d = NoneqDMFT(1.5, v=0.5, nt=80, dt=0.06, n0=0.8, solver=solver)
    d.run(niter=20, mix=0.6)
    n = d.density()
    assert np.max(np.abs(n - 0.8)) < 1e-10
    docc = d.double_occupancy()
    assert np.max(np.abs(docc - 0.64)) < 1e-10
    assert np.max(np.abs(d.kinetic_energy())) < 1e-10
    assert np.max(np.abs(d.total_energy())) < 1e-10
    # ... while the self-energy itself is NOT zero (real cancellation)
    import jax.numpy as jnp
    assert float(jnp.max(jnp.abs(d.SL))) > 0.1


def test_noneq_dmft_interaction_reshapes_spectrum():
    """U = 2 quench: the retarded GF departs from the free semicircle
    (spectral weight transfer) while staying causal: G^R(t,t) = -i."""
    v, nt, dt = 0.5, 64, 0.08
    free = NoneqDMFT(0.0, v=v, nt=nt, dt=dt)
    free.run(niter=25, tol=1e-12)
    ints = NoneqDMFT(2.0, v=v, nt=nt, dt=dt)
    ints.run(niter=25, tol=1e-10)
    dg = np.max(np.abs(ints.retarded_t0() - free.retarded_t0()))
    assert dg > 0.05                   # interaction visibly acts
    GR, _ = ints.G
    k = np.arange(nt)
    eq = np.asarray(GR[k, k, 0, 0])
    assert np.max(np.abs(eq + 1j)) < 1e-12


def test_noneq_dmft_weak_coupling_stays_near_free():
    """U = 0.2 quench: G stays within O(U^2) of the free solution."""
    v, nt, dt = 0.5, 64, 0.08
    free = NoneqDMFT(0.0, v=v, nt=nt, dt=dt)
    free.run(niter=25, tol=1e-12)
    weak = NoneqDMFT(0.2, v=v, nt=nt, dt=dt)
    weak.run(niter=25, tol=1e-12)
    dg = np.max(np.abs(weak.retarded_t0() - free.retarded_t0()))
    assert dg < 0.05          # O(U^2) = 0.04 scale
    assert dg > 1e-6          # ... but the interaction did act
