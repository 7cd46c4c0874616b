"""DVR and LDR tests against analytic spectra and SPO cross-validation."""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.grid.dvr import (
    SincDVR, SineDVR, HermiteDVR, ExponentialDVR, DVRN, kinetic,
)
from pyqed_tpu.grid.ldr import LDRN, LDR2
from pyqed_tpu.grid import SPO2
from pyqed_tpu import gwp


class TestDVR1D:
    def test_sinc_sho(self):
        d = SincDVR(L=20.0, npts=128)
        E, exact = d.sho_test(num_eigs=5)
        assert np.max(np.abs(E - exact)) < 1e-8

    def test_sine_sho(self):
        d = SineDVR(-10.0, 10.0, 127)
        E, exact = d.sho_test(num_eigs=5)
        assert np.max(np.abs(E - exact)) < 1e-8

    def test_hermite_sho(self):
        d = HermiteDVR(40)
        E, exact = d.sho_test(num_eigs=5)
        assert np.max(np.abs(E - exact)) < 1e-8

    def test_exponential_sho(self):
        d = ExponentialDVR(64, L=20.0)
        E, exact = d.sho_test(num_eigs=5)
        assert np.max(np.abs(E - exact)) < 1e-8

    def test_sine_infinite_well(self):
        """Box eigenvalues (pi n / L)^2 / 2 from the sine DVR with V=0
        (reference test: pyqed/dvr/dvr_1d.py:240)."""
        L = 10.0
        d = SineDVR(0.0, L, 63)
        E, _ = d.run(lambda x: 0.0 * x, num_eigs=5)
        exact = np.pi**2 * np.arange(1, 6) ** 2 / (2 * L**2)
        assert np.max(np.abs(np.asarray(E) - exact)) < 1e-10

    def test_sine_expT_unitary_and_correct(self):
        import scipy.linalg
        d = SineDVR(-5.0, 5.0, 31)
        dt = 0.1
        U = np.asarray(d.expT(dt))
        assert np.allclose(U @ U.conj().T, np.eye(31), atol=1e-10)
        Uref = scipy.linalg.expm(-1j * np.asarray(d.t()) * dt)
        assert np.max(np.abs(U - Uref)) < 1e-8

    def test_morse(self):
        d = SincDVR(L=40.0, npts=256, x0=14.0)
        E, exact = d.morse_test(D=3.0, a=0.5, num_eigs=4)
        assert np.max(np.abs(E - exact)) < 1e-6


class TestDVRN:
    def test_2d_sho(self):
        dx = SineDVR(-8.0, 8.0, 31)
        dy = SineDVR(-8.0, 8.0, 31)
        g = DVRN([dx, dy])
        E, _ = g.run(lambda X, Y: 0.5 * (X**2 + Y**2), num_eigs=4)
        assert np.allclose(np.asarray(E)[:4], [1.0, 2.0, 2.0, 3.0], atol=1e-8)


class TestLDR:
    def test_ldr_matches_spo_diabatic(self):
        """With identity electronic overlap (diabatic, uncoupled adiabats),
        LDR == single-surface sine-DVR propagation; cross-check 1D HO
        autocorrelation against analytic coherent-state evolution."""
        levels = [6]
        dom = [(-10.0, 10.0)]
        sol = LDRN(dom, levels, ndim=1, nstates=1)
        x = sol.x[0]
        V = 0.5 * x**2
        sol.apes = jnp.asarray(V)[:, None]
        psi0 = np.asarray(gwp(jnp.asarray(x), a=1.0, x0=1.0))[:, None]
        period = 2 * np.pi
        nt = 1600
        dt = period / nt
        res = sol.run(jnp.asarray(psi0), dt, nt, nout=nt)
        psiT = np.asarray(res.psi)[:, 0]
        # full revival after one period (phase exp(-i*T/2) for ZPE)
        dx = x[1] - x[0]
        overlap = abs(np.vdot(psi0[:, 0], psiT) * dx)
        assert overlap > 1 - 1e-5

    def test_ldr2_two_state_vs_spo2(self):
        """2-state 2D LDR with the exact adiabatic overlap matrix must agree
        with diabatic SPO2 on the same model (both exact as dt->0)."""
        nx = ny = 15
        level = 4  # 2^4 - 1 = 15 points
        dom = [(-6.0, 6.0), (-6.0, 6.0)]
        sol = LDR2(domains=dom, levels=[level, level], nstates=2)
        x, y = sol.x
        X, Y = np.meshgrid(x, y, indexing="ij")
        v1 = 0.5 * (X**2 + Y**2)
        v2 = 0.5 * ((X - 0.5) ** 2 + Y**2) + 0.5
        c = 0.1 * np.ones_like(X)
        v = np.zeros((nx, ny, 2, 2))
        v[..., 0, 0] = v1
        v[..., 1, 1] = v2
        v[..., 0, 1] = v[..., 1, 0] = c

        # adiabatic data: per-point eigh
        vflat = v.reshape(-1, 2, 2)
        w, u = np.linalg.eigh(vflat)
        apes = w.reshape(nx, ny, 2)
        states = u.reshape(nx, ny, 2, 2)  # [..., diabatic c, adiabatic a]

        sol.apes = jnp.asarray(apes - apes.min())
        sol.build_ovlp(jnp.asarray(states))

        # initial state: ground adiabatic state amplitude of a Gaussian
        # placed on diabatic state 0
        g = np.exp(-0.5 * ((X - 0.3) ** 2 + Y**2))
        g /= np.sqrt((np.abs(g) ** 2).sum() * sol.dx[0] * sol.dx[1])
        psi_dia = np.zeros((nx, ny, 2), dtype=complex)
        psi_dia[..., 0] = g
        # transform to adiabatic: psi_a = sum_c U*_{ca} psi_c
        psi_adi = np.einsum("xyca, xyc -> xya", states.conj(), psi_dia)

        dt, nt = 0.005, 100
        res = sol.run(jnp.asarray(psi_adi), dt, nt, nout=nt)
        psi_adi_T = np.asarray(res.psi)

        # back to diabatic for comparison
        psi_dia_T = np.einsum("xyca, xya -> xyc", states, psi_adi_T)

        spo = SPO2(x, y, masses=[1.0, 1.0], nstates=2)
        spo.set_dpes(jnp.asarray(v - apes.min()))
        res2 = spo.run(jnp.asarray(psi_dia), dt=dt, nt=nt, nout=nt)
        psi_spo = np.asarray(res2.psi)

        # both are O(dt^2) splittings of the same H; they agree to O(dt^2)
        err = np.max(np.abs(psi_dia_T - psi_spo))
        assert err < 5e-3, err
        # norm conservation
        norm = (np.abs(psi_adi_T) ** 2).sum() * sol.dx[0] * sol.dx[1]
        assert np.isclose(norm, 1.0, atol=1e-8)

    def test_ldr_hamiltonian_hermitian(self):
        sol = LDRN([(-5.0, 5.0)], [4], ndim=1, nstates=2)
        x = sol.x[0]
        apes = np.stack([0.5 * x**2, 0.5 * x**2 + 1.0], axis=-1)
        sol.apes = jnp.asarray(apes)
        sol.build_ovlp()
        sol.buildK(0.01)
        H = np.asarray(sol.buildH())
        assert np.allclose(H, H.conj().T, atol=1e-10)
