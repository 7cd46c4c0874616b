"""QMC tests: DMC/PIMC/VMC vs analytic harmonic-oscillator results, and
the native C++ engine vs the JAX path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqed_tpu.qmc import DMC, PIMC, VMC, dmc_native


class TestDMC:
    def test_harmonic_ground_state_pure(self):
        """Pure DMC on V = x^2/2: E0 = 0.5."""
        dmc = DMC(ndim=1, potential=lambda x: 0.5 * jnp.sum(x**2))
        E, trace, xf = dmc.run(jax.random.PRNGKey(0), nwalkers=4096,
                               nsteps=1500, dt=0.01, eref=0.5, nequil=500)
        assert np.isclose(float(E), 0.5, atol=0.02), float(E)

    def test_harmonic_importance_sampled_exact(self):
        """With the exact trial psi_T = e^{-x^2/2}, E_L = 0.5 exactly —
        zero-variance principle."""
        dmc = DMC(ndim=1,
                  local_energy=lambda x: 0.5 * jnp.ones(()),
                  drift=lambda x: -x)
        E, trace, xf = dmc.run(jax.random.PRNGKey(1), nwalkers=1024,
                               nsteps=300, dt=0.02, eref=0.5, nequil=100)
        assert abs(float(E) - 0.5) < 1e-10

    def test_3d_harmonic(self):
        dmc = DMC(ndim=3, potential=lambda x: 0.5 * jnp.sum(x**2))
        E, *_ = dmc.run(jax.random.PRNGKey(2), nwalkers=4096, nsteps=1500,
                        dt=0.01, eref=1.5, nequil=500)
        assert np.isclose(float(E), 1.5, atol=0.05), float(E)


class TestPIMC:
    def test_harmonic_thermal_energy(self):
        """<E> of the thermal HO: 0.5/tanh(beta/2)."""
        beta = 2.0
        pimc = PIMC(lambda q: 0.5 * jnp.sum(q**2), beta=beta, nbeads=48)
        ev, et, acc, _ = pimc.run(jax.random.PRNGKey(3), npaths=512,
                                  nsweeps=1200, ntherm=500, step=0.4)
        exact = 0.5 / np.tanh(beta / 2)
        assert np.isclose(ev, exact, rtol=0.05), (ev, exact)


class TestVMC:
    def test_harmonic_variational_minimum(self):
        """Gaussian trial e^{-a x^2}: E(a) = a/2 + 1/(8a); at a=0.5,
        E = 0.5 (exact)."""
        def log_psi(a, x):
            return -a * jnp.sum(x**2)

        def local_e(a, x):
            # -1/2 psi''/psi + V = a - 2 a^2 x^2 + x^2/2
            return jnp.sum(a - 2 * a**2 * x**2 + 0.5 * x**2)

        vmc = VMC(log_psi, local_e, ndim=1)
        E, trace, xf = vmc.run(jax.random.PRNGKey(4), 0.5, nwalkers=2048,
                               nsteps=800, nequil=300)
        assert abs(float(E) - 0.5) < 1e-8  # zero variance at exact a
        E2, *_ = vmc.run(jax.random.PRNGKey(5), 0.3, nwalkers=4096,
                         nsteps=1500, nequil=500)
        exact = 0.3 / 2 + 1 / (8 * 0.3)
        assert np.isclose(float(E2), exact, atol=0.02)


class TestNativeEngine:
    def test_builds_and_matches_analytic(self):
        E, trace, walkers = dmc_native(potential="harmonic", ndim=1,
                                       nwalkers=8192, nsteps=2000,
                                       nequil=800, dt=0.01, eref0=0.5)
        assert np.isclose(E, 0.5, atol=0.02), E
        # walker distribution ~ ground-state density (sigma^2 = 1/2 for
        # pure DMC the mixed distribution is psi_0 ~ N(0, 1))
        assert 0.5 < walkers.std() ** 2 < 1.6

    def test_native_matches_jax_path(self):
        """C++ engine and JAX DMC agree on E0 within stochastic error."""
        E_cpp, *_ = dmc_native(potential="quartic", ndim=1, p0=0.0,
                               nwalkers=8192, nsteps=2500, nequil=1000,
                               dt=0.005, eref0=0.4)
        dmc = DMC(ndim=1, potential=lambda x: 0.25 * jnp.sum(x**4))
        E_jax, *_ = dmc.run(jax.random.PRNGKey(7), nwalkers=8192,
                            nsteps=2500, dt=0.005, eref=0.4, nequil=1000)
        assert np.isclose(E_cpp, float(E_jax), atol=0.03), (E_cpp, float(E_jax))
