"""Explicit-field phase-cycled 2DES (signal/field2des.py).

Validations:
  1. phase cycling EXACTLY cancels everything without a third-pulse
     interaction (even-order terms carry no polarization);
  2. the extracted component is third-order: linear in each field
     amplitude;
  3. the rephasing spectrum peaks on the (-w0, -w0) diagonal.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu import pauli, DrudeBath, HEOMSolver
from pyqed_tpu.signal.field2des import (field_2des_rephasing,
                                        rephasing_spectrum)

OM0 = 1.0


@pytest.fixture(scope="module")
def tls_solver():
    _, sx, _, sz = [np.asarray(p) for p in pauli()]
    H = 0.5 * OM0 * sz
    bath = DrudeBath(temperature=0.5, cutoff=0.5, reorg=0.01)
    bath.set_bath_ops([jnp.asarray(sz)])
    sol = HEOMSolver(jnp.asarray(H, dtype=complex), bath=bath, lmax=1,
                     decomposition="pade", nexp=1)
    rho0 = np.array([[1.0, 0], [0, 0]], complex)
    return sol, rho0, sx


def _run(sol, rho0, mu, e_amps, t1s=None, nt3=256):
    if t1s is None:
        t1s = np.arange(8) * 0.4
    return field_2des_rephasing(sol, rho0, mu, t1s, t2=0.5, nt3=nt3,
                                dt=0.02, pulse_width=0.3, e_amps=e_amps,
                                omega_c=OM0)


def test_third_order_scaling_and_cycling(tls_solver):
    sol, rho0, mu = tls_solver
    P3, _, _ = _run(sol, rho0, mu, (0.05, 0.05, 0.05))
    ref = np.abs(P3).max()
    assert ref > 1e-7                       # signal exists
    # linear in E1
    P3b, _, _ = _run(sol, rho0, mu, (0.10, 0.05, 0.05))
    assert abs(np.abs(P3b).max() / ref - 2.0) < 0.05
    # linear in E3
    P3c, _, _ = _run(sol, rho0, mu, (0.05, 0.05, 0.10))
    assert abs(np.abs(P3c).max() / ref - 2.0) < 0.05
    # no third pulse -> phase-cycled signal vanishes identically
    P30, _, _ = _run(sol, rho0, mu, (0.05, 0.05, 0.0))
    assert np.abs(P30).max() / ref < 1e-10


def test_rephasing_peak_on_diagonal(tls_solver):
    sol, rho0, mu = tls_solver
    t1s = np.arange(20) * 0.4
    P3, _, t3s = _run(sol, rho0, mu, (0.05, 0.05, 0.05), t1s=t1s,
                      nt3=512)
    w1, w3, S = rephasing_spectrum(P3, t1s, t3s)
    i, j = np.unravel_index(np.argmax(np.abs(S)), S.shape)
    dw1 = w1[1] - w1[0]
    dw3 = w3[1] - w3[0]
    assert abs(w1[i] + OM0) < 2 * dw1
    assert abs(w3[j] + OM0) < 2 * dw3
