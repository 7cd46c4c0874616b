"""Adiabatic-representation NAMD propagator.

Gold pin: propagating in the adiabatic representation with the FULL
transformed kinetic operator (order=2) must reproduce the diabatic SPO
dynamics after basis transformation — the two routes are unitarily
equivalent.  (reference: pyqed/namd/adiabatic.py:34 NAMD / :252 hpsi —
first-order truncation, mass hard-coded to a module global there.)
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqed_tpu.grid import SPO, NAMD, diabatic_to_adiabatic_1d


def _model(nx=256):
    x = np.linspace(-12, 12, nx, endpoint=False)
    e1 = 0.01 * np.tanh(x / 2.0)
    c = 0.005 * np.exp(-(x**2) / 8.0)
    dpes = np.zeros((nx, 2, 2))
    dpes[:, 0, 0] = e1
    dpes[:, 1, 1] = -e1
    dpes[:, 0, 1] = dpes[:, 1, 0] = c
    de1 = 0.01 / 2.0 / np.cosh(x / 2.0) ** 2
    dc = -x / 4.0 * c
    ddpes = np.zeros((nx, 2, 2))
    ddpes[:, 0, 0] = de1
    ddpes[:, 1, 1] = -de1
    ddpes[:, 0, 1] = ddpes[:, 1, 0] = dc
    return x, dpes, ddpes


def _initial(x):
    x0, k0, a = -5.0, 12.0, 1.0
    g = (1 / (np.pi * a)) ** 0.25 * np.exp(
        -(x - x0) ** 2 / (2 * a) + 1j * k0 * (x - x0))
    psi0 = np.zeros((x.size, 2), complex)
    psi0[:, 0] = g
    return psi0


MASS, DT, NT = 1000.0, 0.25, 4000


def _pops():
    x, dpes, ddpes = _model()
    v, U, nac = diabatic_to_adiabatic_1d(x, dpes, ddpes=ddpes)
    psi0_ad = _initial(x)
    psi0_dia = np.einsum("xab, xb -> xa", U, psi0_ad)
    spo = SPO(x, mass=MASS, nstates=2)
    spo.set_dpes(dpes)
    r = spo.run(jnp.asarray(psi0_dia), dt=DT, nt=NT,
                return_states=False, nout=NT)
    psi_ad = np.einsum("xba, xb -> xa", U, np.asarray(r.psi))
    pop_dia = np.sum(np.abs(psi_ad) ** 2, axis=0) * (x[1] - x[0])
    return x, v, nac, psi0_ad, pop_dia


def test_order2_matches_diabatic_spo():
    x, v, nac, psi0_ad, pop_dia = _pops()
    solver = NAMD(x, v, nac, mass=MASS, order=2)
    r = solver.run(jnp.asarray(psi0_ad), dt=DT, nt=NT, nout=NT)
    pop_ad = np.asarray(solver.population(r.psi))
    # population transfer is substantial (a real nonadiabatic event)
    assert pop_dia[1] > 0.1
    np.testing.assert_allclose(pop_ad, pop_dia, atol=2e-4)
    # norm and energy conserved by the full (anti-Hermitian-coupling) H
    assert abs(float(solver.norm(r.psi)) - 1.0) < 1e-4
    e0 = float(solver.energy(jnp.asarray(psi0_ad)))
    assert abs(float(solver.energy(r.psi)) - e0) < 1e-5 * max(1.0, abs(e0))


def test_order1_reference_truncation_close_but_nonunitary():
    x, v, nac, psi0_ad, pop_dia = _pops()
    solver = NAMD(x, v, nac, mass=MASS, order=1)
    r = solver.run(jnp.asarray(psi0_ad), dt=DT, nt=NT, nout=NT)
    pop_ad = np.asarray(solver.population(r.psi))
    # the reference's truncation lands near the true answer...
    np.testing.assert_allclose(pop_ad.sum(), 1.0, atol=0.05)
    np.testing.assert_allclose(pop_ad, pop_dia, atol=0.05)
    # ...but is NOT exactly norm-conserving (that's the order-2 terms)
    assert abs(float(solver.norm(r.psi)) - 1.0) > 1e-3


def test_fd_nac_route_and_observables():
    x, dpes, _ = _model()
    v, U, nac = diabatic_to_adiabatic_1d(x, dpes)   # FD NACs
    psi0 = _initial(x)
    solver = NAMD(x, v, nac, mass=MASS, order=2)
    pop_op = np.zeros((2, 2))
    pop_op[1, 1] = 1.0
    r = solver.run(jnp.asarray(psi0), dt=DT, nt=400, nout=100,
                   e_ops=[pop_op])
    # states/times include the t=0 point (package Result convention)
    assert np.asarray(r.observables).shape == (5, 1)
    assert r.times[0] == 0.0 and np.asarray(r.states).shape[0] == 5
    np.testing.assert_allclose(np.asarray(r.observables)[0, 0],
                               np.sum(np.abs(psi0[:, 1]) ** 2)
                               * (x[1] - x[0]), atol=1e-12)
    assert np.all(np.isfinite(np.asarray(r.observables)))
    # antisymmetry of the returned couplings
    np.testing.assert_allclose(nac, -np.transpose(nac, (0, 2, 1)),
                               atol=1e-14)


def test_input_validation():
    x = np.linspace(-1, 1, 16, endpoint=False)
    v = np.zeros((16, 2))
    nac = np.zeros((16, 2, 2))
    with pytest.raises(ValueError):
        NAMD(x, v[:, :1].repeat(3, 1), nac)
    with pytest.raises(ValueError):
        NAMD(x, v, nac, order=3)
    with pytest.raises(ValueError):
        NAMD(x, v, nac).run(np.zeros((16, 3), complex), 0.1, 1)


def test_vibronic_adiabatic_model_front_door():
    """VibronicAdiabatic.run dispatches to NAMD
    (reference: pyqed/models/vibronic.py:598 — dead holder there)."""
    from pyqed_tpu.models import VibronicAdiabatic
    x, dpes, ddpes = _model(nx=128)
    m = VibronicAdiabatic.from_diabatic(x, dpes, mass=MASS, ddpes=ddpes)
    assert m.nstates == 2 and m.v.shape == (128, 2)
    psi0 = _initial(x)
    r = m.run(jnp.asarray(psi0), dt=0.5, nt=200, nout=200)
    pops = np.sum(np.abs(np.asarray(r.psi)) ** 2, axis=0) * (x[1] - x[0])
    assert np.isclose(pops.sum(), 1.0, atol=1e-6)
