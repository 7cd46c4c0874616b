"""Reference top-level API drop-ins (`from pyqed import X` surface):
real implementations re-exported for name parity, plus the phys.py
conveniences made real (several are stubs in the reference —
driven_dissipative_dynamics at pyqed/phys.py:1464 is an empty return).
"""
import numpy as np
import jax

import pyqed_tpu
from pyqed_tpu.ops.operators import (
    pauli, sigmam, lowering, raising, multi_spin, norm2,
    is_positive_def, jacobi_anger, propagator)


def test_root_name_parity():
    for name in ("level_scheme", "set_style", "subplots", "surf",
                 "export", "read_result", "schmidt_decompose",
                 "hom_schmidt", "quantum_dynamics", "driven_dynamics",
                 "driven_dissipative_dynamics", "multi_spin",
                 "propagator", "propagator_H_const", "liouvillian",
                 "Analyser", "ChebDVR", "QRM", "Frenkel2_s", "lowering",
                 "raising", "norm2", "jacobi_anger"):
        assert hasattr(pyqed_tpu, name), name


def test_raising_lowering_multi_spin():
    sm = np.asarray(lowering())
    sp = np.asarray(raising())
    assert np.allclose(sp, sm.conj().T)
    H, low = multi_spin([1.0, 1.5], 2)
    w = np.sort(np.linalg.eigvalsh(np.asarray(H)))
    assert np.allclose(w, [0.0, 1.0, 1.5, 2.5], atol=1e-12)
    # collective lowering annihilates the ground state
    assert np.allclose(np.asarray(low)[:, 0], 0.0)


def test_propagator_unitarity_and_phase():
    s0, sx, sy, sz = pauli()
    U = np.asarray(propagator(np.asarray(sz), 0.7))
    assert np.allclose(U @ U.conj().T, np.eye(2), atol=1e-12)
    assert np.allclose(np.diag(U), [np.exp(-0.7j), np.exp(0.7j)])
    # batched times
    Us = np.asarray(propagator(np.asarray(sz), np.array([0.0, 0.7])))
    assert np.allclose(Us[0], np.eye(2), atol=1e-12)
    assert np.allclose(Us[1], U, atol=1e-12)


def test_quantum_dynamics_rabi():
    """quantum_dynamics (reference phys.py:1325): Rabi oscillation."""
    from pyqed_tpu import quantum_dynamics
    s0, sx, sy, sz = pauli()
    Om = 0.5
    r = quantum_dynamics(0.5 * Om * np.asarray(sx),
                         np.array([1.0, 0.0], complex),
                         dt=0.01, Nt=400, obs_ops=[np.asarray(sz)])
    t = np.arange(401) * 0.01 * Om
    exact = np.cos(t * 1.0)        # <sz> = cos(Omega t)
    got = np.real(np.asarray(r.observables)[:, 0])
    assert np.max(np.abs(got - exact[:len(got)])) < 1e-6


def test_driven_dissipative_dynamics_decay():
    """With no drive amplitude the wrapper reduces to plain Lindblad
    decay of the excited population, exp(-gamma t)."""
    from pyqed_tpu import driven_dissipative_dynamics, Pulse
    s0, sx, sy, sz = pauli()
    gamma = 0.3
    pulse = Pulse(omegac=1.0, tau=5.0, amplitude=0.0, tc=5.0)
    rho0 = np.array([[0.0, 0.0], [0.0, 1.0]], complex)  # excited
    # sigmam annihilates |1> (basis (ground, excited))
    r = driven_dissipative_dynamics(
        0.5 * np.asarray(sz), np.asarray(sx), rho0, pulse,
        c_ops=[np.sqrt(gamma) * np.asarray(sigmam())],
        dt=0.01, Nt=500, obs_ops=[np.diag([0.0, 1.0])])
    t = np.arange(0, 501) * 0.01
    got = np.real(np.asarray(r.observables)[:, 0])
    assert np.max(np.abs(got - np.exp(-gamma * t[:len(got)]))) < 1e-5


def test_misc_utilities():
    assert is_positive_def(np.diag([1.0, 2.0]))
    assert not is_positive_def(np.diag([1.0, -2.0]))
    f = np.ones((4, 5))
    assert abs(float(norm2(f, 0.5, 0.5)) - 4 * 5 * 0.25) < 1e-12
    from scipy.special import jv
    assert np.allclose(complex(jacobi_anger(2, 0.3)), -jv(2, 0.3))


def test_residual_class_name_aliases():
    """Reference drop-in class names added in round 2 (see
    docs/migration.md class-name index)."""
    from pyqed_tpu.grid.ldr import LDR2_Jacobi, LDR2Jacobi
    from pyqed_tpu.tn.mps import MatrixProductState, MPS
    from pyqed_tpu.open.bath import Ohmic, OhmicBath
    from pyqed_tpu.ml.nn import NeuralNetwork, MLP
    from pyqed_tpu.grid.rate import Rate, RateFluxSide
    from pyqed_tpu.grid.spo import ResultSPO2, ResultSPO
    assert LDR2_Jacobi is LDR2Jacobi
    assert MatrixProductState is MPS
    assert Ohmic is OhmicBath
    assert NeuralNetwork is MLP
    assert Rate is RateFluxSide
    assert ResultSPO2 is ResultSPO
