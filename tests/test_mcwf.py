"""Monte-Carlo wave function (quantum-jump) unraveling tests.

Beyond-parity (the reference has no stochastic unraveling); pinned
against the package's own deterministic LindbladSolver (independent code
path: density-matrix RK4 vs pure-state jump trajectories) and the exact
unitary limit.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.open import MCWFSolver, mcsolve, LindbladSolver
from pyqed_tpu import pauli, SESolver

_, SX, SY, SZ = [np.asarray(p) for p in pauli()]
SM = np.array([[0.0, 1.0], [0.0, 0.0]], complex)
P1 = np.diag([0.0, 1.0]).astype(complex)


def test_mcwf_matches_lindblad_driven_damped_tls():
    H = 0.5 * SZ + 0.3 * SX
    gamma = 0.2
    psi0 = np.array([0.0, 1.0], complex)
    mc = MCWFSolver(H, c_ops=[np.sqrt(gamma) * SM])
    res = mc.run(psi0, dt=0.01, nt=800, ntraj=2000, nout=20, key=0,
                 e_ops=[P1, SX.astype(complex)])
    lb = LindbladSolver(jnp.asarray(H, dtype=complex),
                        c_ops=[jnp.sqrt(gamma) * jnp.asarray(SM)])
    rl = lb.run(np.outer(psi0, psi0.conj()), dt=0.01, Nt=800, nout=20,
                e_ops=[jnp.asarray(P1), jnp.asarray(SX, dtype=complex)])
    a = np.real(np.asarray(res.observables))
    b = np.real(np.asarray(rl.observables))[1:]        # drop t=0 row
    # MC error ~ 1/sqrt(2000) ~ 0.02 (measured 0.010/0.017 at key=0)
    assert np.max(np.abs(a - b)) < 0.04
    # standard error reported and of the right magnitude
    assert np.all(np.asarray(res.observables_std) < 0.05)


def test_mcwf_unitary_limit_exact():
    H = 0.5 * SZ + 0.3 * SX
    psi0 = np.array([0.0, 1.0], complex)
    r2 = MCWFSolver(H, c_ops=[]).run(psi0, dt=0.01, nt=400, ntraj=2,
                                     nout=20, key=1, e_ops=[P1])
    r3 = SESolver(jnp.asarray(H, dtype=complex)).run(
        psi0=jnp.asarray(psi0), dt=0.01, Nt=400, nout=20,
        e_ops=[jnp.asarray(P1)])
    aa = np.real(np.asarray(r2.observables))[:, 0]
    bb = np.real(np.asarray(r3.observables))[:, 0]
    bb = bb[1:] if bb.shape[0] == aa.shape[0] + 1 else bb
    assert np.max(np.abs(aa - bb)) < 1e-10
    assert np.all(np.asarray(r2.njumps) == 0)


def test_mcwf_two_channel_branching():
    # pure decay |1> -> |0> through two channels: jump counts split in
    # proportion to the rates (here 3:1)
    g1, g2 = 0.3, 0.1
    H = np.zeros((2, 2))
    psi0 = np.array([0.0, 1.0], complex)
    # distinguishable channels: decay to different sublevels of a qutrit
    H3 = np.zeros((3, 3))
    c1 = np.zeros((3, 3), complex); c1[0, 2] = np.sqrt(g1)
    c2 = np.zeros((3, 3), complex); c2[1, 2] = np.sqrt(g2)
    psi0 = np.array([0.0, 0.0, 1.0], complex)
    p0 = np.diag([1.0, 0, 0]).astype(complex)
    p1 = np.diag([0, 1.0, 0]).astype(complex)
    res = MCWFSolver(H3, c_ops=[c1, c2]).run(
        psi0, dt=0.02, nt=1500, ntraj=3000, nout=150, key=3,
        e_ops=[p0, p1])
    pops = np.real(np.asarray(res.observables))[-1]
    # t -> inf: P(0)/P(1) = g1/g2 = 3
    assert abs(pops[0] + pops[1] - 1.0) < 0.02       # fully decayed
    assert abs(pops[0] - 0.75) < 0.04
    assert abs(pops[1] - 0.25) < 0.04


def test_mcsolve_convenience():
    res = mcsolve(0.5 * SZ, np.array([1.0, 0.0], complex),
                  c_ops=[0.2 * SM], e_ops=[P1], dt=0.05, nt=40,
                  ntraj=16, key=1)
    assert np.asarray(res.observables).shape == (40, 1)


def test_mcwf_dark_state_never_jumps():
    """A state annihilated by every collapse operator (dark state) must
    propagate deterministically: unit norm, zero jumps, exact unitary
    observables (regression: zero jump weights used to feed
    random.choice an all-zero p)."""
    # qutrit: |0>,|1> dark doublet mixed by H; c only collapses |2>
    H = jnp.zeros((3, 3), dtype=complex)
    H = H.at[0, 1].set(0.3).at[1, 0].set(0.3)
    c = jnp.zeros((3, 3), dtype=complex).at[0, 2].set(1.0)   # |0><2|
    P0 = jnp.diag(jnp.array([1.0, 0, 0])).astype(complex)
    psi0 = jnp.array([1.0, 0, 0], complex)
    res = mcsolve(H, psi0, c_ops=[c], e_ops=[P0], dt=0.05, nt=400,
                  ntraj=8, key=3)
    t = np.asarray(res.times)
    p0 = np.real(np.asarray(res.observables)[:, 0])
    assert int(np.asarray(res.njumps).max()) == 0
    assert np.max(np.abs(p0 - np.cos(0.3 * t) ** 2)) < 1e-10
    # deterministic: zero MC error
    assert float(np.max(np.abs(np.asarray(res.observables_std)))) < 1e-12


def test_mcwf_std_complex_for_nonhermitian_eop():
    sm = jnp.zeros((2, 2), dtype=complex).at[0, 1].set(1.0)
    H = 0.5 * jnp.diag(jnp.array([1.0, -1.0])).astype(complex)
    psi0 = jnp.array([1.0, 1.0], complex) / np.sqrt(2)
    res = mcsolve(H, psi0, c_ops=[0.4 * sm], e_ops=[sm], dt=0.02,
                  nt=200, ntraj=64, key=1)
    std = np.asarray(res.observables_std)
    assert np.iscomplexobj(std)
    assert np.max(np.abs(std.imag)) > 0.0       # scatter in both quads
