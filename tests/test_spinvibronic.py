"""Renner-Teller + spin-orbit vibronic model (Poluyanov-Domcke,
Chem. Phys. 301, 111 (2004)) — the reference's SpinVibronic is a broken
sketch (pyqed/models/vibronic.py:314: declared ``def``, non-Hermitian).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.models import SpinVibronic


def test_single_point_hermitian_and_closed_forms():
    x, y = 0.7, -0.4
    rho2 = x * x + y * y
    m = SpinVibronic(omega=1.0, e_so=0.3, kappa=0.12, g=0.25)
    h = np.asarray(m.single_point(x, y))
    assert np.max(np.abs(h - h.conj().T)) == 0.0

    # linear (SO-induced) coupling only: E = w rho^2/2 +- sqrt(e^2/4 + k^2 rho^2)
    mk = SpinVibronic(e_so=0.3, kappa=0.12, g=0.0)
    w = np.sort(np.linalg.eigvalsh(np.asarray(mk.single_point(x, y))))
    gap = np.sqrt(0.3**2 / 4 + 0.12**2 * rho2)
    want = 0.5 * rho2 + np.array([-gap, -gap, gap, gap])
    assert np.max(np.abs(w - want)) < 1e-12

    # quadratic Renner-Teller only: E = w rho^2/2 +- sqrt(e^2/4 + g^2 rho^4/4)
    mg = SpinVibronic(e_so=0.3, kappa=0.0, g=0.25)
    w = np.sort(np.linalg.eigvalsh(np.asarray(mg.single_point(x, y))))
    gap = np.sqrt(0.3**2 / 4 + 0.25**2 * rho2**2 / 4)
    want = 0.5 * rho2 + np.array([-gap, -gap, gap, gap])
    assert np.max(np.abs(w - want)) < 1e-12


def test_apes_cylindrical_symmetry():
    """The full model (kappa and g together) has exactly cylindrical
    adiabatic surfaces: H(phi+d) = U H(phi) U^+ with
    U = diag(1, e^{-id}, e^{-2id}, e^{-3id})."""
    m = SpinVibronic(omega=1.0, e_so=0.3, kappa=0.12, g=0.25)
    rho = 0.9
    phis = np.linspace(0, 2 * np.pi, 9)
    ws = np.array([np.linalg.eigvalsh(np.asarray(
        m.single_point(rho * np.cos(f), rho * np.sin(f)))) for f in phis])
    assert np.max(np.abs(ws - ws[0])) < 1e-12


def test_buildV_matches_single_point():
    m = SpinVibronic(omega=1.0, e_so=0.3, kappa=0.12, g=0.25)
    x = np.linspace(-4, 4, 15)
    y = np.linspace(-4, 4, 17)
    V = np.asarray(m.buildV(x, y))
    for (i, j) in [(0, 0), (5, 7), (14, 16)]:
        assert np.max(np.abs(V[i, j] - np.asarray(
            m.single_point(x[i], y[j])))) < 1e-14
    # Hermitian on the whole grid
    assert np.max(np.abs(V - np.conj(np.swapaxes(V, -1, -2)))) == 0.0


def test_spo_dynamics_conserves_norm_and_energy():
    """4-state SPON propagation on the complex Hermitian diabatic PES:
    norm and energy conserved; SOC + vibronic coupling transfers
    population out of the initial spin-orbital state."""
    m = SpinVibronic(omega=1.0, e_so=0.25, kappa=0.15, g=0.3)
    n = 64
    x = np.linspace(-7, 7, n, endpoint=False)
    solver = m.spo(x, x)
    X, Y = np.meshgrid(x, x, indexing="ij")
    g0 = (1 / np.pi) ** 0.5 * np.exp(-0.5 * ((X - 1.0) ** 2 + Y ** 2))
    psi0 = np.zeros((n, n, 4), complex)
    psi0[..., 0] = g0
    dx = x[1] - x[0]
    psi0 /= np.sqrt(np.sum(np.abs(psi0) ** 2) * dx * dx)
    res = solver.run(psi0, dt=0.005, nt=400, nout=100)
    pops = np.asarray(res.population)
    norms = pops.sum(axis=1)
    assert np.max(np.abs(norms - 1.0)) < 1e-8
    assert pops[-1, 0] < 0.999          # coupling moved population
    # energy conservation via the stored APES/propagator consistency:
    # recompute <H> on first/last snapshots
    V = np.asarray(m.buildV(x, x))
    k = 2 * np.pi * np.fft.fftfreq(n, d=dx)
    KX, KY = np.meshgrid(k, k, indexing="ij")
    T = (KX ** 2 + KY ** 2) / 2

    def energy(psi):
        ev = np.sum(np.conj(psi) * np.einsum("xyab, xyb -> xya", V, psi)).real
        psik = np.fft.fft2(psi, axes=(0, 1)) / n**2 * n  # unitary-ish; ratio only
        ek = np.sum(T[..., None] * np.abs(psik) ** 2)
        ek *= np.sum(np.abs(psi) ** 2) / np.sum(np.abs(psik) ** 2)
        return (ev + ek) * dx * dx

    states = np.asarray(res.states)
    e0 = energy(states[0].reshape(n, n, 4))
    e1 = energy(states[-1].reshape(n, n, 4))
    assert abs(e1 - e0) < 1e-5 * max(abs(e0), 1.0)   # O(dt^2) splitting
