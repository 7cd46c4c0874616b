"""QTF: Bohmian trajectories with friction relax to the ground state
(reference: pyqed/qt/1D/QTF_1D.py — Morse oscillator, the script's own
closing check compares E_total against the analytic Morse E0)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.grid.qtraj import QTF


def _morse(a=1.02, De=0.176 / 100.0):
    def derivs(x):
        d = 1.0 - jnp.exp(-a * x)
        v0 = De * d ** 2
        dv = 2.0 * De * d * a * jnp.exp(-a * x)
        return v0, dv
    return derivs


@pytest.mark.slow
def test_qtf_morse_ground_state():
    am = 916.0
    a, De = 1.02, 0.176 / 100.0
    omega = a * np.sqrt(2.0 * De / am)
    E0 = omega / 2.0 - omega ** 2 / (16.0 * De)   # exact Morse E0

    # packet at the minimum, 10x too narrow (the reference scenario:
    # a0 = 18.32 vs ground-state m*omega = 1.83); friction bleeds the
    # width-mode excess until the ensemble sits at E0
    solver = QTF(ntraj=2001, mass=am, order=5, friction=0.02)
    x, p, r, w = solver.sample(a0=9.16 * 2, x0=0.0)
    res = solver.run(x, p, r, w, _morse(a, De), dt=0.5, nt=32000,
                     nout=200)
    Etot = res.observables[:, 3]
    assert abs(Etot[-1] - E0) / E0 < 0.02
    # energy decreases monotonically (relaxation, not blow-up)
    assert np.all(np.diff(Etot) < 1e-6)
    # quantum potential energy stays positive (the reference aborts on
    # Eu < 0)
    assert np.all(res.observables[:, 2] > 0)


def test_qtf_harmonic_ground_state():
    # HO: V = x^2/2 (m=1): E0 = 1/2; relaxation must find it
    def derivs(x):
        return x ** 2 / 2.0, x

    solver = QTF(ntraj=1001, mass=1.0, order=1, friction=0.25)
    x, p, r, w = solver.sample(a0=1.2, x0=0.4)
    res = solver.run(x, p, r, w, derivs, dt=0.02, nt=4000, nout=100)
    Etot = res.observables[:, 3]
    assert abs(Etot[-1] - 0.5) < 0.01


def test_qtf_no_friction_conserves_energy():
    def derivs(x):
        return x ** 2 / 2.0, x

    solver = QTF(ntraj=1001, mass=1.0, order=1, friction=0.0)
    # squeezed Gaussian (a0 = 1/2 vs ground-state a0 = 1): LQF is
    # exact for Gaussians, so RK4 conserves E to O(dt^4) + quadrature
    x, p, r, w = solver.sample(a0=0.5, x0=0.8)
    res = solver.run(x, p, r, w, derivs, dt=0.02, nt=1000, nout=50)
    Etot = res.observables[:, 3]
    assert np.ptp(Etot) / Etot.mean() < 1e-3


def test_qtf_mc_sampling_still_works():
    # Monte-Carlo sampling path (key=...) — looser conservation
    def derivs(x):
        return x ** 2 / 2.0, x

    solver = QTF(ntraj=4000, mass=1.0, order=1, friction=0.0)
    x, p, r, w = solver.sample(a0=0.5, x0=0.8, key=3)
    res = solver.run(x, p, r, w, derivs, dt=0.02, nt=500, nout=50)
    Etot = res.observables[:, 3]
    assert np.ptp(Etot) / Etot.mean() < 0.1
