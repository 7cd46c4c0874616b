"""2D Shin-Metiu PCET family: TRUE-ORACLE parity vs the reference
classes exec'd from /root/reference (pyqed/models/ShinMetiu.py:289,
706, 871) plus internal consistency (batched pes, NAC vs finite
difference, zero-field limits)."""
import numpy as np
import pytest

from pyqed_tpu.models.shinmetiu2d import (
    ShinMetiu2D, ShinMetiu2DMagnetic, ShinMetiu2DElectric)
from ref_oracle import load_reference_module

DOM = [[-6.0, 6.0], [-6.0, 6.0]]
NPTS = 15          # reference create_grid level 4
LEVEL = 4
R_TEST = np.array([0.5, 0.5])


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_module("models.ShinMetiu")


class TestShinMetiu2D:
    def test_single_point_oracle(self, ref_mod):
        ref = ref_mod.ShinMetiu2(method="exact", nstates=3)
        ref.create_grid(LEVEL, DOM)
        w_ref, u_ref = ref.single_point(R_TEST)

        sm = ShinMetiu2D(nstates=3)
        sm.create_grid(DOM, NPTS)
        assert np.allclose(sm.x, ref.x, atol=1e-12)
        w, u = sm.single_point(R_TEST)
        assert np.allclose(w, w_ref, atol=1e-8)
        # same adiabatic states up to sign
        ovlp = np.abs(np.einsum("ik, ik -> k", u.conj(), u_ref))
        assert np.allclose(ovlp, 1.0, atol=1e-8)

    def test_pes_batched_equals_pointwise(self):
        sm = ShinMetiu2D(nstates=2)
        sm.create_grid(DOM, 9)
        Rs = np.array([[-0.5, 0.2], [0.0, 0.5], [0.7, 0.9]])
        E, U = sm.pes(Rs)
        for i, R in enumerate(Rs):
            w, _ = sm.single_point(R)
            assert np.allclose(E[i], w, atol=1e-10)
        A = sm.electronic_overlap()
        assert A.shape == (3, 2, 3, 2)
        # same-point overlap = identity (orthonormal eigencolumns)
        for a in range(3):
            assert np.allclose(np.abs(A[a, :, a, :]), np.eye(2),
                               atol=1e-10)

    def test_nac_vs_finite_difference(self):
        sm = ShinMetiu2D(nstates=3)
        sm.create_grid(DOM, NPTS)
        R = np.array([0.3, 0.4])
        w, u = sm.single_point(R)
        F = sm.nonadiabatic_coupling(w, u, R)
        diag = np.array([F[k, k] for k in range(3)])
        assert np.allclose(diag, 0.0)
        # F_mu^{ba} = <b|d_mu a>: central difference with sign locking
        dR = 1e-5

        def lock(v):
            s = np.sign(np.real(np.einsum("ij, ij -> j", u.conj(), v)))
            return v * np.where(s == 0, 1.0, s)[None, :]

        for mu in range(2):
            step = np.zeros(2)
            step[mu] = dR
            up = lock(sm.single_point(R + step)[1])
            um = lock(sm.single_point(R - step)[1])
            du = (up - um) / (2 * dR)
            fd = np.einsum("ib, ia -> ba", u.conj(), du)
            off = ~np.eye(3, dtype=bool)
            assert np.allclose(F[:, :, mu][off], fd[off], atol=2e-5)

    def test_parallel_transport_continuity(self):
        sm = ShinMetiu2D(nstates=2)
        sm.create_grid(DOM, 9)
        path = [np.array([x, 0.3]) for x in np.linspace(-0.5, 0.5, 5)]
        E, U = sm.parallel_transport(path)
        # consecutive states overlap positively after sign fixing
        for i in range(len(path) - 1):
            ov = np.real(np.einsum("ij, ij -> j", U[i].conj(), U[i + 1]))
            assert np.all(ov > 0.9)


class TestFields:
    def test_magnetic_oracle(self, ref_mod):
        B = 5.0e4  # Tesla
        ref = ref_mod.ShinMetiu2InMagneticField(
            method="exact", nstates=3, B=B)
        ref.create_grid(LEVEL, DOM)
        ref.build()
        w_ref, _ = ref.single_point(R_TEST)

        sm = ShinMetiu2DMagnetic(nstates=3, B=B)
        sm.create_grid(DOM, NPTS)
        w, _ = sm.single_point(R_TEST)
        assert np.allclose(w, w_ref, atol=1e-8)

    def test_zero_field_limits_agree(self):
        # B=0 magnetic and E=0 electric share the (proper box-length)
        # kinetic convention and must coincide exactly
        smB = ShinMetiu2DMagnetic(nstates=3, B=0.0)
        smB.create_grid(DOM, 9)
        smE = ShinMetiu2DElectric(nstates=3, E=(0.0, 0.0))
        smE.create_grid(DOM, 9)
        wB, _ = smB.single_point(R_TEST)
        wE, _ = smE.single_point(R_TEST)
        assert np.allclose(wB, wE, atol=1e-12)

    def test_electric_oracle(self, ref_mod):
        E = [0.02, 0.01]
        ref = ref_mod.ShinMetiu2InElectricField(
            method="exact", nstates=3, E=E)
        ref.create_grid(LEVEL, DOM)
        ref.build()
        w_ref, _ = ref.single_point(R_TEST)

        sm = ShinMetiu2DElectric(nstates=3, E=E)
        sm.create_grid(DOM, NPTS)
        w, _ = sm.single_point(R_TEST)
        assert np.allclose(w, w_ref, atol=1e-8)

    def test_field_mutation_invalidates_cache(self):
        # setting .E / .B after a solve must refresh the field hcore
        sm = ShinMetiu2DElectric(nstates=1, E=(0.0, 0.0))
        sm.create_grid(DOM, 9)
        w0, _ = sm.single_point(R_TEST)
        sm.E = (0.05, 0.0)
        w1, _ = sm.single_point(R_TEST)
        fresh = ShinMetiu2DElectric(nstates=1, E=(0.05, 0.0))
        fresh.create_grid(DOM, 9)
        wf, _ = fresh.single_point(R_TEST)
        assert np.allclose(w1, wf, atol=1e-12)
        assert abs(w1[0] - w0[0]) > 1e-6

        smB = ShinMetiu2DMagnetic(nstates=1, B=0.0)
        smB.create_grid(DOM, 9)
        wB0, _ = smB.single_point(R_TEST)
        smB.B = 5e4 / 2.35051756758e5        # au (property holds au)
        wB1, _ = smB.single_point(R_TEST)
        assert abs(wB1[0] - wB0[0]) > 1e-8

    def test_parallel_transport_complex_phase(self):
        # magnetic eigenvectors are complex; transported states must
        # have real-positive consecutive overlaps (full U(1) transport)
        sm = ShinMetiu2DMagnetic(nstates=2, B=5e4)
        sm.create_grid(DOM, 9)
        path = [np.array([x, 0.3]) for x in np.linspace(-0.4, 0.4, 4)]
        E, U = sm.parallel_transport(path)
        for i in range(len(path) - 1):
            ov = np.einsum("ij, ij -> j", U[i].conj(), U[i + 1])
            assert np.all(np.abs(ov.imag) < 1e-8)
            assert np.all(ov.real > 0.9)

    def test_reference_style_signatures(self):
        # reference-positional ctor + create_grid(level, domains)
        from pyqed_tpu.models import ShinMetiu2
        ref_style = ShinMetiu2("exact", 3)
        ref_style.create_grid(LEVEL, DOM)
        ours = ShinMetiu2D(nstates=3)
        ours.create_grid(DOM, NPTS)
        assert ref_style.nx == ours.nx == NPTS
        w1, _ = ref_style.single_point(R_TEST)
        w2, _ = ours.single_point(R_TEST)
        assert np.allclose(w1, w2, atol=1e-12)

    def test_electronic_overlap_guard(self):
        sm = ShinMetiu2D(nstates=2)
        sm.create_grid(DOM, 9)
        with pytest.raises(ValueError):
            sm.electronic_overlap()

    def test_electric_field_breaks_symmetry(self):
        # with E along x the R -> -R symmetry of the APES is broken
        sm = ShinMetiu2DElectric(nstates=1, E=[0.05, 0.0])
        sm.create_grid(DOM, 9)
        wp, _ = sm.single_point(np.array([0.6, 0.0]))
        wm, _ = sm.single_point(np.array([-0.6, 0.0]))
        assert abs(wp[0] - wm[0]) > 1e-4
