"""Ring-polymer MD tests.

Beyond-parity method (the reference's MD layer is classical LJ only);
pinned against closed forms: RPMD is EXACT for the harmonic oscillator
(Craig & Manolopoulos, JCP 121, 3368 (2004)) — Kubo-transformed position
autocorrelation, quantum thermal <x^2> (4x the classical value at
beta*omega = 8), classical limit at nbeads = 1.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.md.rpmd import RPMD, kubo_harmonic_xx, normal_mode_matrix

OMEGA, BETA, M = 1.0, 8.0, 1.0


def _harm():
    return RPMD(lambda x: 0.5 * M * OMEGA ** 2 * jnp.sum(x ** 2),
                beta=BETA, nbeads=32, mass=M)


def test_normal_mode_matrix_orthogonal():
    for n in (1, 2, 7, 32):
        C, sin_fac = normal_mode_matrix(n)
        assert np.allclose(C @ C.T, np.eye(n), atol=1e-12)
        assert sin_fac[0] == 0.0


def test_rpmd_quantum_x2_harmonic():
    # bead-averaged <x^2> = (1/2 m omega) coth(beta omega / 2): the
    # quantum value 0.5003, vs classical 1/(beta m omega^2) = 0.125
    rp = _harm()
    x0, _ = rp.sample_harmonic(0, 4000, OMEGA)
    x2 = float(jnp.mean(jnp.sum(x0 ** 2, axis=-1)))
    exact = 0.5 / (M * OMEGA) / np.tanh(BETA * OMEGA / 2)
    assert abs(x2 - exact) / exact < 0.05
    assert x2 > 3.0 * 0.125          # far from the classical value


def test_rpmd_kubo_tcf_harmonic_exact():
    rp = _harm()
    x0, p0 = rp.sample_harmonic(0, 4000, OMEGA)
    t, C = rp.position_tcf(x0, p0, dt=0.05, nt=200, nout=4)
    Cex = kubo_harmonic_xx(t, OMEGA, BETA, M)
    assert np.max(np.abs(C - Cex)) < 0.02 * Cex[0] + 1e-3


def test_rpmd_energy_conservation():
    rp = _harm()
    x0, p0 = rp.sample_harmonic(1, 8, OMEGA)
    res = rp.run(x0, p0, dt=0.02, nt=500, nout=50)
    e = np.asarray(res.energy)
    scale = np.mean(np.abs(e[0]))
    assert np.max(np.abs(e - e[0:1])) / scale < 1e-3


def test_rpmd_classical_limit_nbeads1():
    rp1 = RPMD(lambda x: 0.5 * jnp.sum(x ** 2), beta=BETA, nbeads=1,
               mass=1.0)
    x0 = jnp.ones((1, 1, 1))
    p0 = jnp.zeros((1, 1, 1))
    r = rp1.run(x0, p0, dt=0.01, nt=700, nout=7)
    xc = np.asarray(r.centroid)[:, 0, 0]
    assert np.max(np.abs(xc - np.cos(np.asarray(r.times)))) < 1e-4


def test_rpmd_pile_thermalization():
    # PILE thermostat drives a cold start to the canonical ring-polymer
    # distribution: bead-averaged <x^2> reaches the quantum value
    rp = _harm()
    ntraj = 512
    x0 = jnp.zeros((ntraj, 32, 1))
    p0 = jnp.zeros((ntraj, 32, 1))
    x, p = rp.thermalize(x0, p0, key=2, dt=0.05, nsteps=3000)
    x2 = float(jnp.mean(jnp.sum(x ** 2, axis=-1)))
    exact = 0.5 / (M * OMEGA) / np.tanh(BETA * OMEGA / 2)
    assert abs(x2 - exact) / exact < 0.1


def test_rpmd_anharmonic_runs_and_conserves():
    # quartic anharmonicity: no closed form, pin the invariants
    rp = RPMD(lambda x: 0.5 * jnp.sum(x ** 2) + 0.1 * jnp.sum(x ** 4),
              beta=2.0, nbeads=16, mass=1.0)
    x0, p0 = rp.sample_free(3, 16)
    res = rp.run(x0, p0, dt=0.02, nt=400, nout=40)
    e = np.asarray(res.energy)
    scale = np.mean(np.abs(e[0]))
    assert np.max(np.abs(e - e[0:1])) / scale < 1e-3


def test_rpmd_numpy_integer_seed():
    # regression: np.int64 seeds bypassed PRNGKey coercion
    rp = RPMD(lambda x: 0.5 * jnp.sum(x ** 2), beta=4.0, nbeads=8,
              mass=1.0)
    x0, p0 = rp.sample_harmonic(np.int64(3), 16, 1.0)
    assert x0.shape == (16, 8, 1)
