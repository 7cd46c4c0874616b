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

from pyqed_tpu.negf.dmft import NoneqDMFT, NoneqDMFTThermal


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


# ----------------------------------------------------------------------
# three-branch contour (Matsubara + mixed): initial correlations
# ----------------------------------------------------------------------

def test_march3_exact_two_level():
    """The decisive unit test of the three-branch march: impurity level
    hybridized to ONE bath level with Σ = V² g_bath prescribed
    analytically on all contour branches; the exact answer is the
    thermal 2x2 quadratic model.  This pinned the mixed-term
    conventions (the G^⌐ star term carries +1, the lesser ⋆ term −i in
    the real-G^M convention) — with either sign flipped the errors
    below are O(0.1) instead of O(dt²)."""
    import jax.numpy as jnp
    from pyqed_tpu.negf.kb2t import _march3_jit

    eps_i, eps_b, V, beta = 0.3, -0.4, 0.4, 6.0
    nt, dt, ntau = 64, 0.05, 128
    dtau = beta / ntau
    ts = np.arange(nt) * dt
    tau = np.arange(ntau + 1) * dtau
    fb = 1 / (np.exp(beta * eps_b) + 1)
    H2 = np.array([[eps_i, V], [V, eps_b]])
    w2, U2 = np.linalg.eigh(H2)
    f2 = 1 / (np.exp(beta * w2) + 1)

    def GL_exact(t, tp):
        M = (U2 * np.exp(-1j * w2 * t)) @ np.diag(f2) \
            @ (U2 * np.exp(-1j * w2 * tp)).conj().T
        return 1j * M[0, 0]

    SR = np.zeros((nt, nt, 1, 1), complex)
    SL = np.zeros((nt, nt, 1, 1), complex)
    SV = np.zeros((nt, ntau + 1, 1, 1), complex)
    T1, T2 = np.meshgrid(ts, ts, indexing="ij")
    SR[:, :, 0, 0] = V ** 2 * (-1j) * (T1 >= T2) \
        * np.exp(-1j * eps_b * (T1 - T2))
    SL[:, :, 0, 0] = V ** 2 * 1j * fb * np.exp(-1j * eps_b * (T1 - T2))
    SV[:, :, 0, 0] = V ** 2 * 1j * fb \
        * np.exp(tau * eps_b)[None, :] * np.exp(-1j * eps_b * ts)[:, None]
    GM = np.zeros((ntau + 1, 1, 1), complex)
    for k, tk in enumerate(tau):
        M = (U2 * np.exp(-tk * w2)) @ np.diag(1 - f2) @ U2.conj().T
        GM[k, 0, 0] = -M[0, 0]
    GV0 = -1j * GM[::-1]
    hs = np.full((nt, 1, 1), eps_i, complex)
    GR, GL, GV = _march3_jit(jnp.asarray(hs), jnp.asarray(GM),
                             jnp.asarray(GV0), jnp.asarray(SR),
                             jnp.asarray(SL), jnp.asarray(SV),
                             dt, dtau, beta)
    # occupation stays at the exact thermal value
    k = np.arange(nt)
    n = np.real(np.asarray(-1j * GL[k, k, 0, 0]))
    n_exact = np.real(-1j * GL_exact(0, 0))
    assert np.max(np.abs(n - n_exact)) < 3e-3
    # two-time lesser function matches the exact quadratic model
    for (a, b) in [(10, 5), (30, 20), (50, 10), (63, 63)]:
        err = abs(complex(GL[a, b, 0, 0]) - GL_exact(ts[a], ts[b]))
        assert err < 3e-3, (a, b, err)


def test_thermal_free_stationarity():
    """U = 0 with the full contour: the free THERMAL Bethe state is
    stationary — E_kin(t) stays at the exact finite thermal value
    (partial equilibrium gives 0 here: the mixed branch carries the
    initial hopping correlations)."""
    v, beta = 0.5, 8.0
    d = NoneqDMFTThermal(0.0, v=v, nt=64, dt=0.08, beta=beta, ntau=96)
    d.run(niter=25, tol=1e-12)
    assert np.max(np.abs(d.density() - 0.5)) < 1e-4
    Ek = d.kinetic_energy()
    w = np.linspace(-2 * v, 2 * v, 100001)
    rho = np.sqrt(np.maximum(4 * v ** 2 - w ** 2, 0)) \
        / (2 * np.pi * v ** 2)
    f = 1 / (np.exp(beta * w) + 1)
    Ek_exact = 2 * np.trapezoid(rho * f * w, w)
    assert abs(Ek[0] - Ek_exact) < 2e-3
    assert np.max(np.abs(Ek - Ek_exact)) < 5e-3      # stays put
    # two-time stationarity: G^<(t,t') = G^<_eq(t−t')
    GR, GL, GV = d.G
    ts = np.arange(64) * 0.08
    def gl_eq(trel):
        return 1j * np.trapezoid(rho * f * np.exp(-1j * w * trel), w)
    for (a, b) in [(40, 20), (30, 30), (50, 45)]:
        assert abs(complex(GL[a, b, 0, 0]) - gl_eq(ts[a] - ts[b])) < 5e-3


def test_thermal_quench_eckstein_werner():
    """U: 0 -> 2 quench from the free thermal state — the protocol
    partial equilibrium provably cannot express: the double occupancy
    relaxes DOWN from its uncorrelated 1/4 and partially revives, the
    density stays pinned at half filling, and the total energy is
    conserved through the early relaxation (2B, Phi-derivable)."""
    d = NoneqDMFTThermal(2.0, v=0.5, nt=64, dt=0.08, beta=8.0,
                         ntau=96, solver="2b")
    d.run(niter=20, mix=0.6)
    assert np.max(np.abs(d.density() - 0.5)) < 1e-3
    docc = d.double_occupancy()
    assert abs(docc[0] - 0.25) < 2e-3
    assert docc.min() < 0.16                 # real relaxation
    assert docc.min() > 0.05                 # ... physical
    # partial revival after the minimum
    kmin = int(np.argmin(docc))
    assert docc[-1] > docc[kmin] + 0.002
    # energy conservation through the first half (trapezoid horizon)
    Et = d.total_energy()
    assert np.max(np.abs(Et[:32] - Et[0])) < 0.01
