"""OQS front-door class + small phys compat names.

Reference: pyqed/oqs.py:574 (OQS holder; dispatch stubs dead there),
pyqed/mol.py:1296 (polar), pyqed/wpd.py:1965 (square_barrier).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu import OQS
from pyqed_tpu.ops import polar, square_barrier
from pyqed_tpu.open import LindbladSolver


def _tls():
    H = jnp.array([[0.0, 0.5], [0.5, 1.0]])
    sm = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    rho0 = jnp.array([[0.0, 0.0], [0.0, 1.0]], dtype=jnp.complex64)
    return H, sm, rho0


def test_oqs_lindblad_matches_direct_solver():
    H, sm, rho0 = _tls()
    e_ops = [jnp.array([[1.0, 0.0], [0.0, 0.0]])]
    sys = OQS(H, c_ops=[0.3 * sm], e_ops=e_ops)
    r1 = sys.lindblad(rho0, dt=0.05, nt=40)
    r2 = LindbladSolver(H, c_ops=[0.3 * sm], e_ops=e_ops).run(rho0, 0.05, 40)
    np.testing.assert_allclose(np.asarray(r1.observables),
                               np.asarray(r2.observables), atol=1e-12)


def test_oqs_setters_and_correlation():
    H, sm, rho0 = _tls()
    sys = OQS(np.zeros((2, 2)))
    sys.setH(H)
    sys.configure(c_ops=[0.3 * sm], e_ops=None)
    assert sys.nstates == 2
    corr = sys.correlation_2p_1t(rho0, [sm + sm.T, sm + sm.T], dt=0.05, nt=20)
    corr = np.asarray(corr)
    assert corr.shape[-1] >= 20 or corr.size >= 20
    assert np.all(np.isfinite(corr))
    with pytest.raises(ValueError):
        sys.correlation_2p_1t(rho0, [sm, sm], dt=0.05, nt=5, method="heom")


def test_oqs_heom_uses_configured_c_ops():
    """OQS(H, c_ops=[...]).heom(...) must forward the coupling operators
    (the reference's heom stub used self.c_ops — pyqed/oqs.py:755)."""
    from pyqed_tpu.open.bath import DrudeBath
    H, sm, rho0 = _tls()
    Q = sm + sm.T
    sys = OQS(H, c_ops=[Q])
    bath = DrudeBath(temperature=1.0, cutoff=1.0, reorg=0.05)
    r = sys.heom(rho0, dt=0.02, nt=20, bath=bath, lmax=2,
                 e_ops=[jnp.array([[1.0, 0.0], [0.0, 0.0]])])
    assert np.all(np.isfinite(np.asarray(r.observables)))


def test_oqs_setters_refresh_nstates():
    sys = OQS(np.zeros((2, 2)))
    sys.set_hamiltonian(np.zeros((3, 3)))
    assert sys.nstates == 3
    sys.setH(np.zeros((4, 4)))
    assert sys.nstates == 4


def test_oqs_tcl2_requires_c_op_message():
    H, sm, rho0 = _tls()
    sys = OQS(H)          # no c_ops configured
    with pytest.raises(ValueError, match="tcl2 requires"):
        sys.tcl2(rho0, dt=0.05, nt=5)


def test_polar_and_square_barrier():
    rho, phi = polar(1.0, 1.0)
    assert np.isclose(float(rho), np.sqrt(2.0))
    assert np.isclose(float(phi), np.pi / 4)
    x = jnp.linspace(-1.0, 3.0, 9)
    v = np.asarray(square_barrier(x, width=2.0, height=5.0))
    # barrier occupies [0, 2): zero before, height inside, zero after
    assert np.isclose(v[0], 0.0) and np.isclose(v[-1], 0.0)
    assert np.isclose(v[4], 5.0)  # x=1.0 inside
