"""TT/MPS-compressed SPO-LDR dynamics (tn/ttspo.py) vs the dense flagship.

The reference TT_LDR (pyqed/mps/namd.py:147) is an unfinished sketch;
these tests pin OUR implementation against the dense LDRN propagator,
which itself is oracle-tested against the reference (test_ref_oracle).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.tn.ttspo import (TT_LDR, tt_compress, tt_to_dense, tt_norm,
                                hadamard_apply)
from pyqed_tpu.tn.ttals import tt_svd
from pyqed_tpu.grid.ldr import LDRN


def _model2d(levels=(3, 3), ns=2):
    """Two-state 2D model with smooth APES and nontrivial overlap."""
    domains = [(-4.0, 4.0), (-4.0, 4.0)]
    ldr = LDRN(domains, list(levels), nstates=ns, mass=[1.0, 1.2])
    X, Y = np.meshgrid(ldr.x[0], ldr.x[1], indexing="ij")
    v = np.zeros((*X.shape, ns))
    v[..., 0] = 0.5 * (X ** 2 + 1.2 * Y ** 2)
    v[..., 1] = 0.5 * ((X - 0.5) ** 2 + Y ** 2) + 1.0
    # smoothly rotating local electronic states -> nontrivial overlap
    theta = 0.3 * np.arctan2(Y, X + 0.1)
    states = np.zeros((*X.shape, ns, ns))
    states[..., 0, 0] = np.cos(theta)
    states[..., 1, 0] = np.sin(theta)
    states[..., 0, 1] = -np.sin(theta)
    states[..., 1, 1] = np.cos(theta)
    return domains, ldr, v, states, X, Y


def _gauss2d(X, Y, ns):
    psi = np.zeros((*X.shape, ns), complex)
    psi[..., 0] = np.exp(-((X - 0.8) ** 2) - 0.8 * (Y + 0.5) ** 2
                         + 0.3j * X)
    psi /= np.linalg.norm(psi)
    return psi


def test_tt_compress_roundtrip():
    rng = np.random.default_rng(0)
    T = rng.standard_normal((5, 6, 4, 3)) + 1j * rng.standard_normal(
        (5, 6, 4, 3))
    cores = tt_svd(T, max_rank=64)
    cores = tt_compress([jnp.asarray(G) for G in cores], chi_max=64)
    assert np.allclose(np.asarray(tt_to_dense(cores)), T, atol=1e-10)
    nrm = tt_norm(cores)
    assert abs(nrm - np.linalg.norm(T)) < 1e-8


def test_hadamard_apply():
    rng = np.random.default_rng(1)
    V = rng.standard_normal((4, 5, 3))
    psi = rng.standard_normal((4, 5, 3)) + 1j * rng.standard_normal((4, 5, 3))
    v_tt = [jnp.asarray(G) for G in tt_svd(V, max_rank=32)]
    p_tt = [jnp.asarray(G) for G in tt_svd(psi, max_rank=32)]
    out = hadamard_apply(v_tt, p_tt, chi_max=64)
    assert np.allclose(np.asarray(tt_to_dense(out)), V * psi, atol=1e-10)


def test_ttspo_diabatic_vs_dense():
    """Full-rank TT-SPO (diabatic) == dense Strang splitting, 1e-8."""
    domains, ldr, v, _, X, Y = _model2d()
    ns = 2
    dt, nt = 0.02, 8
    psi0 = _gauss2d(X, Y, ns)

    tt = TT_LDR(domains, [3, 3], nstates=ns, mass=[1.0, 1.2])
    tt.set_apes(v)
    out = tt.run(psi0, dt, nt, rank_state=128, rank_pes=128)

    # dense Strang with the same ingredients
    ldr.set_apes(v)
    ldr.build_ovlp(None)
    ldr.buildK(dt)
    expV2 = np.exp(-0.5j * dt * v)
    K0 = np.asarray(ldr.exp_K[0])
    K1 = np.asarray(ldr.exp_K[1])
    psi = psi0.copy()
    for _ in range(nt):
        psi = expV2 * psi
        psi = np.einsum("im, mjs -> ijs", K0, psi)
        psi = np.einsum("jn, ins -> ijs", K1, psi)
        psi = expV2 * psi
    psi_tt = np.asarray(tt_to_dense(out["cores_list"][-1]))
    assert np.max(np.abs(psi_tt - psi)) < 1e-8
    assert abs(out["norms"][-1] - 1.0) < 1e-8


def test_ttldr_nonadiabatic_vs_dense():
    """Full-rank TT-LDR == dense LDRN short-time propagator stepping."""
    domains, ldr, v, states, X, Y = _model2d()
    ns = 2
    dt, nt = 0.02, 6
    psi0 = _gauss2d(X, Y, ns)

    ldr.set_apes(v)
    A = np.asarray(ldr.build_ovlp(states))
    U = np.asarray(ldr.short_time_propagator(dt))

    n = ldr.ntot * ns
    psi = psi0.reshape(n).copy()
    for _ in range(nt):
        psi = U @ psi
    psi_dense = psi.reshape(*ldr.nx, ns)

    tt = TT_LDR(domains, [3, 3], nstates=ns, mass=[1.0, 1.2])
    tt.set_apes(v)
    tt.set_ovlp(A)
    out = tt.run(psi0, dt, nt, rank_state=256, rank_pes=256, rank_ovlp=256)
    psi_tt = np.asarray(tt_to_dense(out["cores_list"][-1]))
    assert np.max(np.abs(psi_tt - psi_dense)) < 1e-8

    # rdm from the TT zipper matches the dense rdm
    # rdm_el convention pinned: rho[a, b] = sum conj(psi_a) psi_b
    rho_dense = np.einsum("ija, ijb -> ab", psi_dense.conj(), psi_dense)
    assert np.max(np.abs(out["rdm_el"][-1] - rho_dense)) < 1e-8


def test_ttldr_rank_truncation_converges():
    """Truncated ranks approach the full-rank answer monotonically-ish."""
    domains, ldr, v, states, X, Y = _model2d()
    ns = 2
    dt, nt = 0.02, 5
    psi0 = _gauss2d(X, Y, ns)
    ldr.set_apes(v)
    A = np.asarray(ldr.build_ovlp(states))

    ref = None
    errs = []
    for rank in (4, 12, 256):
        tt = TT_LDR(domains, [3, 3], nstates=ns, mass=[1.0, 1.2])
        tt.set_apes(v)
        tt.set_ovlp(A)
        out = tt.run(psi0, dt, nt, rank_state=rank, rank_pes=256,
                     rank_ovlp=256)
        psi = np.asarray(tt_to_dense(out["cores_list"][-1]))
        if ref is None:
            pass
        errs.append(psi)
    full = errs[-1]
    e4 = np.max(np.abs(errs[0] - full))
    e12 = np.max(np.abs(errs[1] - full))
    assert e12 < e4
    assert e12 < 1e-3


def test_ttspo_e_ops_expectations():
    """run(e_ops=...) returns diagonal-observable expectations."""
    domains, ldr, v, _, X, Y = _model2d()
    tt = TT_LDR(domains, [3, 3], nstates=2, mass=[1.0, 1.2])
    tt.set_apes(v)
    psi0 = _gauss2d(X, Y, 2)
    Xop = np.broadcast_to(X[..., None], (*X.shape, 2)).copy()
    out = tt.run(psi0, 0.02, 3, rank_state=64, rank_pes=64, e_ops=[Xop])
    assert "expect" in out and out["expect"].shape == (4, 1)
    # t=0 value == dense <psi|X|psi>
    x0 = np.sum(np.abs(psi0) ** 2 * Xop)
    assert abs(out["expect"][0, 0].real - x0) < 1e-10
