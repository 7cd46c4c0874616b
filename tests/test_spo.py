"""Split-operator propagator tests.

Golden physics: harmonic-oscillator coherent-state revival, Morse-potential
ground state stationarity, norm conservation, 2-state Rabi-like diabatic
population transfer vs dense-matrix exact propagation, and parity with a
NumPy reference implementing the algorithm of pyqed/wpd.py:692-732.
"""
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.grid import SPO, SPO2, SPON
from pyqed_tpu import gwp


class TestSPO1D:
    def test_harmonic_coherent_oscillation(self):
        """A displaced Gaussian in a HO oscillates with period 2pi/omega."""
        omega, m = 1.0, 1.0
        x = np.linspace(-10, 10, 256, endpoint=False)
        spo = SPO(x, mass=m, nstates=1)
        spo.set_potential(0.5 * m * omega**2 * x**2)
        psi0 = np.asarray(gwp(jnp.asarray(x), a=m * omega, x0=1.0, p0=0.0))
        period = 2 * np.pi / omega
        nt = 2000
        dt = period / nt
        res = spo.run(psi0, dt=dt, nt=nt, nout=nt)
        psi_T = np.asarray(res.psi[:, 0])
        overlap = np.abs(np.vdot(psi0, psi_T) * (x[1] - x[0]))
        assert overlap > 1 - 1e-6
        # norm conserved
        assert np.isclose(np.asarray(res.population)[-1].sum(), 1.0, atol=1e-10)

    def test_ho_groundstate_stationary(self):
        x = np.linspace(-8, 8, 128, endpoint=False)
        spo = SPO(x, mass=1.0, nstates=1)
        spo.set_potential(0.5 * x**2)
        psi0 = np.asarray(gwp(jnp.asarray(x), a=1.0))
        res = spo.run(psi0, dt=0.01, nt=500, nout=500)
        # |<psi0 | psi(t)>| = 1 for a stationary state
        fid = np.abs(np.vdot(psi0, np.asarray(res.psi[:, 0])) * (x[1] - x[0]))
        assert fid > 1 - 1e-8

    def test_parity_with_numpy_reference(self):
        """1-surface SPO vs a direct NumPy transcription of the reference
        algorithm (half-V, K, half-V per step; pyqed/wpd.py:218-247)."""
        x = np.linspace(-5, 15, 128, endpoint=False)
        D, a, re = 2.0, 0.5, 1.0
        V = D * (1 - np.exp(-a * (x - re))) ** 2
        m = 10.0
        psi0 = np.asarray(gwp(jnp.asarray(x), a=np.sqrt(2 * D * a**2 * m), x0=0.5))
        dt, nt = 0.02, 200

        spo = SPO(x, mass=m, nstates=1)
        spo.set_potential(V)
        res = spo.run(psi0.copy(), dt=dt, nt=nt, nout=nt)
        psi_tpu = np.asarray(res.psi[:, 0])

        # NumPy reference
        k = 2 * np.pi * np.fft.fftfreq(len(x), x[1] - x[0])
        expK = np.exp(-0.5j * k**2 / m * dt)
        expV2 = np.exp(-1j * V * dt / 2)
        psi = psi0.copy()
        for _ in range(nt):
            psi = expV2 * psi
            psi = np.fft.ifft(expK * np.fft.fft(psi))
            psi = expV2 * psi
        assert np.max(np.abs(psi - psi_tpu)) < 1e-10


class TestSPO2:
    def test_two_state_parity_with_numpy(self):
        """2D 2-state diabatic propagation vs NumPy reference
        (pyqed/wpd.py:583-623 per-point eigh + :692 Strang loop)."""
        nx = ny = 32
        x = np.linspace(-6, 6, nx, endpoint=False)
        y = np.linspace(-6, 6, ny, endpoint=False)
        X, Y = np.meshgrid(x, y, indexing="ij")
        v1 = 0.5 * (X**2 + Y**2)
        v2 = 0.5 * ((X - 1) ** 2 + Y**2) + 1.0
        c = 0.2 * np.exp(-0.5 * (X**2 + Y**2))

        spo = SPO2(x, y, masses=[1.0, 1.0], nstates=2)
        spo.set_DPES([v1, v2], [[(0, 1), c]])

        psi0 = np.zeros((nx, ny, 2), dtype=complex)
        g = np.exp(-0.5 * ((X - 0.5) ** 2 + Y**2)) / np.sqrt(np.pi)
        g /= np.sqrt(np.sum(np.abs(g) ** 2) * (x[1] - x[0]) * (y[1] - y[0]))
        psi0[:, :, 0] = g

        dt, nt = 0.02, 100
        res = spo.run(psi0.copy(), dt=dt, nt=nt, nout=nt)
        psi_tpu = np.asarray(res.psi)

        # NumPy reference
        kx = 2 * np.pi * np.fft.fftfreq(nx, x[1] - x[0])
        ky = 2 * np.pi * np.fft.fftfreq(ny, y[1] - y[0])
        KX, KY = np.meshgrid(kx, ky, indexing="ij")
        expK = np.exp(-1j * (KX**2 / 2 + KY**2 / 2) * dt)
        v = np.zeros((nx, ny, 2, 2))
        v[..., 0, 0] = v1
        v[..., 1, 1] = v2
        v[..., 0, 1] = v[..., 1, 0] = c
        expV2 = np.zeros((nx, ny, 2, 2), dtype=complex)
        for i in range(nx):
            for j in range(ny):
                w, u = np.linalg.eigh(v[i, j])
                expV2[i, j] = u @ np.diag(np.exp(-1j * w * dt / 2)) @ u.conj().T
        psi = psi0.copy()
        for _ in range(nt):
            psi = np.einsum("ijab, ijb -> ija", expV2, psi)
            psik = np.fft.fft2(psi, axes=(0, 1))
            psik *= expK[..., None]
            psi = np.fft.ifft2(psik, axes=(0, 1))
            psi = np.einsum("ijab, ijb -> ija", expV2, psi)

        assert np.max(np.abs(psi - psi_tpu)) < 1e-9
        # populations sum to 1
        pops = np.asarray(res.population)
        assert np.allclose(pops.sum(axis=1), 1.0, atol=1e-9)
        # population actually transferred
        assert pops[-1, 1] > 1e-4

    def test_rdm_el_hermitian(self):
        nx = ny = 16
        x = np.linspace(-5, 5, nx, endpoint=False)
        y = np.linspace(-5, 5, ny, endpoint=False)
        spo = SPO2(x, y, nstates=2)
        rng = np.random.default_rng(0)
        psi = rng.normal(size=(nx, ny, 2)) + 1j * rng.normal(size=(nx, ny, 2))
        rho = np.asarray(spo.rdm_el(jnp.asarray(psi)))
        assert np.allclose(rho, rho.conj().T)


class TestJacobi:
    def test_jacobi_constant_inertia_matches_linear(self):
        """I(x) = const: jacobi factorization == linear KEO (both exact
        per-factor; same Strang error)."""
        nx = ny = 32
        x = np.linspace(-6, 6, nx, endpoint=False)
        y = np.linspace(-np.pi, np.pi, ny, endpoint=False)
        X, Y = np.meshgrid(x, y, indexing="ij")
        v1 = 0.5 * X**2 + 0.3 * (1 - np.cos(Y))
        v2 = v1 + 0.5
        c = 0.05 * np.ones_like(X)
        mu, I0 = 2.0, 3.0

        psi0 = np.zeros((nx, ny, 2), dtype=complex)
        g = np.exp(-X**2 - Y**2)
        g /= np.sqrt((np.abs(g)**2).sum() * (x[1]-x[0]) * (y[1]-y[0]))
        psi0[..., 0] = g

        from pyqed_tpu.grid import SPO2
        lin = SPO2(x, y, masses=[mu, I0], nstates=2)
        lin.set_DPES([v1, v2], [[(0, 1), c]])
        r1 = lin.run(psi0.copy(), dt=0.01, nt=100, nout=100)

        jac = SPO2(x, y, masses=[mu, lambda xx: I0 * np.ones_like(xx)],
                   nstates=2, coords="jacobi")
        jac.set_DPES([v1, v2], [[(0, 1), c]])
        r2 = jac.run(psi0.copy(), dt=0.01, nt=100, nout=100)

        # K factors commute when I is constant -> identical evolution
        assert np.max(np.abs(np.asarray(r1.psi) - np.asarray(r2.psi))) < 1e-10

    def test_jacobi_variable_inertia_norm_conserved(self):
        nx = ny = 32
        x = np.linspace(0.5, 6, nx, endpoint=False)
        y = np.linspace(-np.pi, np.pi, ny, endpoint=False)
        X, Y = np.meshgrid(x, y, indexing="ij")
        v = 0.5 * (X - 2.0)**2 + 0.2 * (1 - np.cos(Y))
        from pyqed_tpu.grid import SPO2
        jac = SPO2(x, y, masses=[2.0, lambda xx: 2.0 * xx**2],
                   nstates=1, coords="jacobi")
        jac.set_dpes(v)
        g = np.exp(-2*(X - 2.0)**2 - Y**2).astype(complex)
        g /= np.sqrt((np.abs(g)**2).sum() * (x[1]-x[0]) * (y[1]-y[0]))
        r = jac.run(g[..., None], dt=0.005, nt=200, nout=200)
        assert np.isclose(float(np.asarray(r.population)[-1].sum()), 1.0,
                          atol=1e-8)


class TestSPODftKernel:
    def test_dft_fold_matches_fft_path(self):
        """kernel='dft' (Strang step folded into one matrix, nout
        composed by matrix power) must reproduce the FFT path."""
        from pyqed_tpu.grid.spo import SPO
        x = np.linspace(-3, 20, 256, endpoint=False)
        psi0 = np.exp(-(x - 2.0) ** 2).astype(complex)
        psi0 /= np.sqrt(np.sum(abs(psi0) ** 2) * (x[1] - x[0]))

        def make(kern):
            s = SPO(x, mass=1.0, nstates=1, kernel=kern)
            s.set_potential(lambda xx: 8.0 * (1 - np.exp(-0.5 * xx)) ** 2)
            return s

        r1 = make("xla").run(psi0[:, None], dt=0.005, nt=200, nout=20)
        r2 = make("dft").run(psi0[:, None], dt=0.005, nt=200, nout=20)
        assert np.max(np.abs(np.asarray(r1.psi) - np.asarray(r2.psi))) < 1e-10
        assert np.max(np.abs(np.asarray(r1.population)
                             - np.asarray(r2.population))) < 1e-10

    def test_dft_two_state(self):
        from pyqed_tpu.grid.spo import SPO
        nx = 128
        x = np.linspace(-8, 8, nx, endpoint=False)
        v = np.zeros((nx, 2, 2))
        v[:, 0, 0] = 0.5 * x ** 2
        v[:, 1, 1] = 0.5 * x ** 2 + 1.0
        v[:, 0, 1] = v[:, 1, 0] = 0.2
        psi0 = np.zeros((nx, 2), complex)
        psi0[:, 0] = np.exp(-(x - 1.0) ** 2)
        psi0 /= np.sqrt(np.sum(abs(psi0) ** 2) * (x[1] - x[0]))
        rs = []
        for kern in ("xla", "dft"):
            s = SPO(x, mass=1.0, nstates=2, kernel=kern)
            s.set_dpes(v)
            rs.append(s.run(psi0, dt=0.01, nt=100, nout=10))
        assert np.max(np.abs(np.asarray(rs[0].population)
                             - np.asarray(rs[1].population))) < 1e-10


class TestSPO3Jacobi:
    def _dense_H(self, x, y, z, mu1, mu2, v):
        """Dense J=0 triatomic Jacobi H on the full (nx*ny*nz) grid,
        with T_r, T_R, and the angular term built from exact FFT
        differentiation matrices (the operator SPO3 jacobi splits)."""
        def fftmat(k2, n):
            F = np.exp(-2j * np.pi * np.outer(np.arange(n), np.arange(n)) / n)
            return (F.conj().T * k2[None, :]) @ F / n
        nx, ny, nz = len(x), len(y), len(z)
        kx = 2 * np.pi * np.fft.fftfreq(nx, x[1] - x[0])
        ky = 2 * np.pi * np.fft.fftfreq(ny, y[1] - y[0])
        kz = 2 * np.pi * np.fft.fftfreq(nz, z[1] - z[0])
        Tx = fftmat(kx ** 2 / (2 * mu1), nx)
        Ty = fftmat(ky ** 2 / (2 * mu2), ny)
        j2 = fftmat(kz ** 2, nz)
        Ix, Iy, Iz = np.eye(nx), np.eye(ny), np.eye(nz)
        H = (np.kron(np.kron(Tx, Iy), Iz)
             + np.kron(np.kron(Ix, Ty), Iz))
        binv = (1 / (2 * mu1 * x ** 2)[:, None]
                + 1 / (2 * mu2 * y ** 2)[None, :])
        H = H + np.kron(np.diag(binv.ravel()), j2)
        H = H + np.diag(v.ravel())
        return H

    def test_vs_dense_expm_converges(self):
        """One SPO3-jacobi Strang step -> exact expm as dt -> 0 at
        second order (error ratio ~4 when dt halves)."""
        from scipy.linalg import expm
        from pyqed_tpu.grid import SPO3
        nx = ny = nz = 8
        x = np.linspace(1.2, 3.2, nx, endpoint=False)
        y = np.linspace(1.5, 3.5, ny, endpoint=False)
        z = np.linspace(-np.pi, np.pi, nz, endpoint=False)
        mu1, mu2 = 1.5, 2.0
        X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
        v = 0.5 * (X - 2.0) ** 2 + 0.4 * (Y - 2.4) ** 2 \
            + 0.2 * (1 - np.cos(Z))
        H = self._dense_H(x, y, z, mu1, mu2, v)
        g = np.exp(-2 * (X - 2.0) ** 2 - 2 * (Y - 2.4) ** 2 - Z ** 2)
        g = (g / np.linalg.norm(g)).astype(complex)

        errs = []
        for dt in (0.02, 0.01):
            spo = SPO3(x, y, z, masses=(mu1, mu2), nstates=1,
                       coords="jacobi")
            spo.set_dpes(v)
            spo.build(dt)
            out = spo._peo(spo._keo(spo._peo(jnp.asarray(g[..., None]),
                                             half=True)), half=True)
            exact = (expm(-1j * H * dt) @ g.ravel()).reshape(g.shape)
            errs.append(np.max(np.abs(np.asarray(out)[..., 0] - exact)))
        assert errs[0] / errs[1] > 3.3, errs
        assert errs[1] < 2e-5, errs

    def test_norm_and_energy_conserved(self):
        from pyqed_tpu.grid import SPO3
        nx = ny = 16
        nz = 16
        x = np.linspace(1.0, 4.0, nx, endpoint=False)
        y = np.linspace(1.2, 4.2, ny, endpoint=False)
        z = np.linspace(-np.pi, np.pi, nz, endpoint=False)
        X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
        v1 = 0.5 * (X - 2.0) ** 2 + 0.5 * (Y - 2.5) ** 2 \
            + 0.3 * (1 - np.cos(Z))
        v2 = v1 + 0.8
        c = 0.05 * np.ones_like(X)
        spo = SPO3(x, y, z, masses=(2.0, 3.0), nstates=2, coords="jacobi")
        spo.set_DPES([v1, v2], [[(0, 1), c]])
        g = np.exp(-2 * (X - 2.0) ** 2 - 2 * (Y - 2.5) ** 2 - Z ** 2)
        dv = (x[1] - x[0]) * (y[1] - y[0]) * (z[1] - z[0])
        g /= np.sqrt((np.abs(g) ** 2).sum() * dv)
        psi0 = np.zeros(g.shape + (2,), complex)
        psi0[..., 0] = g
        r = spo.run(psi0, dt=0.005, nt=200, nout=100)
        pops = np.asarray(r.population)
        assert np.isclose(pops[-1].sum(), 1.0, atol=1e-8)
        assert pops[-1, 1] > 1e-4   # population actually transfers


def test_spo_checkpoint_resume(tmp_path):
    """Interrupted + resumed SPO run == uninterrupted run exactly
    (SURVEY §5.4; same contract as the HEOM checkpoint test)."""
    import numpy as np
    import jax.numpy as jnp
    from pyqed_tpu.grid.spo import SPO

    x = np.linspace(-8, 8, 64, endpoint=False)
    spo = SPO(x, mass=1.0)
    spo.set_potential(0.5 * x ** 2)
    psi0 = np.exp(-(x - 1.0) ** 2).astype(complex)
    psi0 /= np.linalg.norm(psi0)

    full = spo.run(jnp.asarray(psi0[:, None]), dt=0.02, nt=40, nout=4)

    ck = str(tmp_path / "spo_ck.npz")
    spo2 = SPO(x, mass=1.0)
    spo2.set_potential(0.5 * x ** 2)
    # run only the first 3 windows, checkpointing every window...
    try:
        spo2.run(jnp.asarray(psi0[:, None]), dt=0.02, nt=12, nout=4,
                 checkpoint=ck, checkpoint_every=1)
    finally:
        pass
    # ...then resume to the full 10 windows
    spo3 = SPO(x, mass=1.0)
    spo3.set_potential(0.5 * x ** 2)
    resumed = spo3.run(jnp.asarray(psi0[:, None]), dt=0.02, nt=40, nout=4,
                       resume=ck)
    assert np.max(np.abs(np.asarray(resumed.psi)
                         - np.asarray(full.psi))) < 1e-12
    assert np.allclose(np.asarray(resumed.times)[-1],
                       np.asarray(full.times)[-1])


def test_spo_resume_rejects_mismatched_dt(tmp_path):
    import numpy as np
    import jax.numpy as jnp
    import pytest
    from pyqed_tpu.grid.spo import SPO

    x = np.linspace(-8, 8, 32, endpoint=False)
    spo = SPO(x, mass=1.0)
    spo.set_potential(0.5 * x ** 2)
    psi0 = np.exp(-x ** 2).astype(complex)[:, None]
    ck = str(tmp_path / "ck.npz")
    spo.run(jnp.asarray(psi0), dt=0.02, nt=8, nout=4, checkpoint=ck)
    with pytest.raises(ValueError, match="resume dt"):
        spo.run(jnp.asarray(psi0), dt=0.05, nt=8, nout=4, resume=ck)
