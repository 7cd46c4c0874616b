"""Tensor-network tests: MPS algebra, MPO expectation, DMRG, TEBD.

Golden references: exact diagonalization of small chains and the TFIM
analytic ground energy.
"""
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.tn import (
    MPS, MPO, DMRG, two_site_dmrg, tebd, mpo_tfim, mpo_heisenberg,
)
from pyqed_tpu.models import TFIM


def tfim_exact_energy(L, J=1.0, h=1.0):
    """Exact finite open-chain TFIM ground energy via free fermions is
    involved; use dense ED instead (L small)."""
    H = np.asarray(TFIM(L, J=J, h=h).buildH())
    return np.linalg.eigvalsh(H)[0]


class TestMPS:
    def test_from_dense_roundtrip(self):
        rng = np.random.default_rng(0)
        L, d = 5, 2
        psi = rng.normal(size=d**L) + 1j * rng.normal(size=d**L)
        psi /= np.linalg.norm(psi)
        mps = MPS.from_dense(jnp.asarray(psi), [d] * L)
        back = np.asarray(mps.to_dense())
        assert np.max(np.abs(back - psi)) < 1e-10

    def test_product_state_expectation(self):
        up = [1.0, 0.0]
        dn = [0.0, 1.0]
        mps = MPS.from_product_state([up, dn, up])
        sz = jnp.array([[1.0, 0], [0, -1.0]], dtype=complex)
        vals = np.asarray(mps.site_expectation_value(sz)).real
        assert np.allclose(vals, [1, -1, 1])

    def test_correlation_function(self):
        rng = np.random.default_rng(1)
        L, d = 4, 2
        psi = rng.normal(size=d**L) + 1j * rng.normal(size=d**L)
        psi /= np.linalg.norm(psi)
        mps = MPS.from_dense(jnp.asarray(psi), [d] * L)
        sz = np.diag([1.0, -1.0]).astype(complex)
        got = complex(mps.correlation_function(jnp.asarray(sz), 0,
                                               jnp.asarray(sz), 3))
        op = np.kron(np.kron(sz, np.eye(4)), sz)
        ref = psi.conj() @ op @ psi
        assert abs(got - ref) < 1e-10

    def test_entanglement_entropy_product_state(self):
        mps = MPS.from_product_state([[1, 0], [0, 1], [1, 0]])
        S = np.asarray(mps.entanglement_entropy())
        assert np.max(np.abs(S)) < 1e-12


class TestMPO:
    def test_tfim_mpo_dense_matches_ed(self):
        L = 4
        H_mpo = np.asarray(mpo_tfim(L, J=1.0, h=0.7).to_dense())
        H_ed = np.asarray(TFIM(L, J=1.0, h=0.7).buildH())
        assert np.max(np.abs(H_mpo - H_ed)) < 1e-10

    def test_expect_vs_dense(self):
        rng = np.random.default_rng(2)
        L = 4
        psi = rng.normal(size=2**L) + 1j * rng.normal(size=2**L)
        psi /= np.linalg.norm(psi)
        mps = MPS.from_dense(jnp.asarray(psi), [2] * L)
        mpo = mpo_tfim(L, J=1.0, h=0.3)
        got = complex(mpo.expect(mps))
        ref = psi.conj() @ np.asarray(mpo.to_dense()) @ psi
        assert abs(got - ref) < 1e-8


class TestDMRG:
    def test_tfim_ground_state(self):
        L = 8
        mpo = mpo_tfim(L, J=1.0, h=1.0)
        up = [1.0, 0.0]
        mps = MPS.from_product_state([up] * L)
        energies, gs = two_site_dmrg(mpo, mps, chi_max=24, sweeps=8)
        E_ref = tfim_exact_energy(L, 1.0, 1.0)
        assert abs(energies[-1] - E_ref) < 1e-6, (energies[-1], E_ref)

    def test_heisenberg_ground_state(self):
        L = 8
        mpo = mpo_heisenberg(L, J=1.0)
        state = [[1.0, 0.0], [0.0, 1.0]] * (L // 2)
        mps = MPS.from_product_state(state)
        energies, gs = two_site_dmrg(mpo, mps, chi_max=32, sweeps=10)
        # dense ED reference
        H = np.asarray(mpo_heisenberg(L, J=1.0).to_dense())
        E_ref = np.linalg.eigvalsh(H)[0]
        assert abs(energies[-1] - E_ref) < 1e-6, (energies[-1], E_ref)


class TestTEBD:
    def test_tebd_vs_exact_quench(self):
        """Global quench of a small TFIM chain: TEBD vs exact evolution."""
        import scipy.linalg
        L = 6
        J, h = 1.0, 0.8
        sx = np.array([[0, 1], [1, 0]], dtype=complex)
        sz = np.diag([1.0, -1.0]).astype(complex)
        # bond Hamiltonian evenly distributing the field
        hbond = (-J * np.kron(sz, sz)
                 - h / 2 * (np.kron(sx, np.eye(2)) + np.kron(np.eye(2), sx)))
        # exact H with this bond decomposition (fields on edges get h/2)
        H = np.zeros((2**L, 2**L), dtype=complex)
        for i in range(L - 1):
            op = np.kron(np.kron(np.eye(2**i), hbond), np.eye(2**(L - i - 2)))
            H += op
        up = [1.0, 0.0]
        mps0 = MPS.from_product_state([up] * L)
        psi0 = np.asarray(mps0.to_dense())
        dt, nt = 0.05, 40
        mps_t = tebd(mps0, jnp.asarray(hbond), dt, nt, chi_max=32)
        psi_t = np.asarray(mps_t.to_dense())
        exact = scipy.linalg.expm(-1j * H * dt * nt) @ psi0
        fidelity = abs(np.vdot(exact, psi_t))
        assert fidelity > 1 - 1e-4, fidelity


def test_ncon_matches_reference_and_einsum():
    """ncon label convention vs the ACTUAL reference contractor and
    direct einsum (reference: pyqed/mps/ncon.py:14)."""
    import sys
    import os
    import numpy as np
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from ref_oracle import load_reference_module
    from pyqed_tpu.tn.ncon import ncon

    rng = np.random.default_rng(2)
    A = rng.standard_normal((3, 4, 5))
    B = rng.standard_normal((5, 4, 6))
    C = rng.standard_normal((6, 3))

    mine = np.asarray(ncon([A, B, C], [[-2, 1, 2], [2, 1, 3], [3, -1]]))
    exp = np.einsum("dab, bac, ce -> ed", A, B, C)
    assert np.allclose(mine, exp, atol=1e-12)

    # the reference uses the py2-era `from collections import Iterable`
    # (removed in 3.10) — shim it to load the actual code on 3.12
    import collections
    import collections.abc
    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable
    ref_ncon = load_reference_module("mps.ncon")
    r = ref_ncon.ncon([A, B, C], [[-2, 1, 2], [2, 1, 3], [3, -1]])
    assert np.allclose(mine, r, atol=1e-12)

    # full trace (no open legs)
    D = rng.standard_normal((4, 4))
    tr = float(np.asarray(ncon([D], [[1, 1]])))
    assert abs(tr - np.trace(D)) < 1e-12


class TestMPSCompressCorrlen:
    def test_compress_exact_when_rank_small(self):
        """A chi=2 state compressed at chi_max=4 is unchanged."""
        from pyqed_tpu.tn.mps import MPS
        rng = np.random.default_rng(2)
        v = rng.standard_normal(2 ** 6) + 1j * rng.standard_normal(2 ** 6)
        v /= np.linalg.norm(v)
        mps = MPS.from_dense(v, [2] * 6)
        small = mps.compress(2)
        again = small.compress(4)
        assert np.abs(np.abs(np.vdot(np.asarray(small.to_dense()),
                                     np.asarray(again.to_dense()))) - 1.0) < 1e-10

    def test_compress_truncation_error_monotone(self):
        from pyqed_tpu.tn.mps import MPS
        rng = np.random.default_rng(4)
        v = rng.standard_normal(2 ** 8) + 1j * rng.standard_normal(2 ** 8)
        v /= np.linalg.norm(v)
        mps = MPS.from_dense(v, [2] * 8)
        dense = np.asarray(mps.to_dense())
        fids = []
        for chi in (2, 4, 8, 16):
            c = mps.compress(chi)
            fids.append(abs(np.vdot(dense, np.asarray(c.to_dense()))))
        assert all(fids[i] <= fids[i + 1] + 1e-12 for i in range(3))
        assert fids[-1] > 1 - 1e-10          # chi=16 is exact for L=8

    def test_correlation_length_ising_like(self):
        """Uniform infinite MPS built from a known 2x2 transfer structure:
        product state has xi -> 0 (lambda2 = 0 -> -inf log -> xi = 0);
        use a weakly entangled B and check xi matches the dense transfer
        matrix eigenvalue ratio."""
        from pyqed_tpu.tn.mps import MPS
        rng = np.random.default_rng(7)
        B = rng.standard_normal((3, 2, 3)) * 0.5
        B = B / np.sqrt(np.einsum("apb, apb ->", B, B))
        mps = MPS([jnp.asarray(B)], bc="infinite")
        xi = mps.correlation_length()
        T = np.einsum("apb, cpd -> acbd", B, B).reshape(9, 9)
        lam = np.sort(np.abs(np.linalg.eigvals(T)))[::-1]
        assert abs(xi - (-1.0 / np.log(lam[1] / lam[0]))) < 1e-8
