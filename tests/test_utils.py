"""Utility-layer tests: QI measures, colored noise, Wigner, non-Hermitian."""
import numpy as np
import jax
import jax.numpy as jnp

from pyqed_tpu.utils import (
    reduce_dm, vn_entropy, mutual_info, concurrence, tracedist, fidelity,
    cnoise, autocorrelation, wigner, nonherm_eig, diabatic_to_adiabatic,
)
from pyqed_tpu import ket2dm


class TestQIP:
    def test_bell_state(self):
        bell = jnp.array([1.0, 0, 0, 1.0]) / jnp.sqrt(2.0)
        rhoA = np.asarray(reduce_dm(bell, [0]))
        assert np.allclose(rhoA, np.eye(2) / 2, atol=1e-12)
        S = float(vn_entropy(bell, [0], base=2))
        assert np.isclose(S, 1.0, atol=1e-10)
        C = float(concurrence(bell))
        assert np.isclose(C, 1.0, atol=1e-8)
        I = float(mutual_info(bell, [0], [1], base=2))
        assert np.isclose(I, 2.0, atol=1e-8)

    def test_product_state_no_entanglement(self):
        psi = jnp.kron(jnp.array([1.0, 0]), jnp.array([0.6, 0.8]))
        assert float(vn_entropy(psi, [0])) < 1e-10
        assert float(concurrence(psi)) < 1e-8

    def test_distances(self):
        rho = np.diag([0.7, 0.3]).astype(complex)
        sigma = np.diag([0.3, 0.7]).astype(complex)
        assert np.isclose(float(tracedist(jnp.asarray(rho), jnp.asarray(sigma))), 0.4)
        assert np.isclose(float(fidelity(jnp.asarray(rho), jnp.asarray(rho))), 1.0, atol=1e-10)


class TestNoise:
    def test_ou_statistics(self):
        key = jax.random.PRNGKey(0)
        D, tau, dt = 0.01, 0.5, 0.01
        eps = np.asarray(cnoise(key, 3000, 600, dt=dt, tau=tau, D=D))
        # variance D/tau
        var = eps[1500:].var()
        assert np.isclose(var, D / tau, rtol=0.1)
        # correlation time: C(lag)/C(0) = exp(-lag*dt/tau)
        c = np.asarray(autocorrelation(jnp.asarray(eps[1500:]), nlag=60))
        ratio = c[50] / c[0]
        assert np.isclose(ratio, np.exp(-50 * dt / tau), atol=0.1)


class TestWigner:
    def test_pure_tone_localized(self):
        """WVD of a complex exponential concentrates at its frequency."""
        N = 128
        d = 0.1
        t = np.arange(N) * d
        w0 = 2.0
        x = np.exp(1j * w0 * t)
        W, freqs = wigner(jnp.asarray(x), d)
        W = np.asarray(W).real
        mid = N // 2
        peak_freq = freqs[np.argmax(W[:, mid])]
        # reference convention (pyqed/wigner.py:216): ifft along tau and
        # freqs/2 puts the tone e^{+i w0 t} at -w0 on the returned axis
        assert abs(peak_freq + w0) < 0.5


class TestNonHerm:
    def test_biorthogonal_eig(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(5, 5)) + 1j * rng.normal(size=(5, 5))
        w, U1, U2 = nonherm_eig(A)
        assert np.allclose(np.asarray(U2) @ np.asarray(U1), np.eye(5), atol=1e-10)
        assert np.allclose(A @ np.asarray(U1),
                           np.asarray(U1) * np.asarray(w)[None, :], atol=1e-9)

    def test_diabatic_to_adiabatic_hermitian(self):
        x = np.linspace(-2, 2, 11)
        v = np.zeros((11, 2, 2))
        v[:, 0, 0] = x**2
        v[:, 1, 1] = (x - 1) ** 2
        v[:, 0, 1] = v[:, 1, 0] = 0.1
        apes, U = diabatic_to_adiabatic(v)
        for i in range(11):
            w = np.linalg.eigvalsh(v[i])
            assert np.allclose(np.asarray(apes)[i], w, atol=1e-12)


class TestDavidson:
    """Davidson/block-Davidson (reference: pyqed/davidson.py:70,155)."""

    def test_matches_eigh(self):
        from pyqed_tpu.ops.davidson import davidson
        rng = np.random.default_rng(0)
        n = 300
        A = np.diag(np.arange(n, dtype=float)) \
            + 1e-3 * rng.normal(size=(n, n))
        A = (A + A.T) / 2
        w, X = davidson(A, 4, tol=1e-10)
        wr = np.linalg.eigvalsh(A)[:4]
        assert np.max(np.abs(w - wr)) < 1e-9
        assert np.max(np.abs(A @ X - X * w[None, :])) < 1e-7

    def test_matrix_free_jacobi(self):
        from pyqed_tpu.ops.davidson import davidson
        rng = np.random.default_rng(3)
        n = 250
        A = np.diag(np.linspace(0, 10, n)) \
            + 5e-3 * rng.normal(size=(n, n))
        A = (A + A.T) / 2
        w, _ = davidson(lambda x: A @ x, 3, diag=np.diag(A), jacobi=True)
        wr = np.linalg.eigvalsh(A)[:3]
        assert np.max(np.abs(w - wr)) < 1e-8

    def test_tda_matrix(self):
        """Davidson on a real TDA response matrix reproduces eigh."""
        from pyqed_tpu.ops.davidson import block_davidson
        from pyqed_tpu.qchem import Molecule
        from pyqed_tpu.qchem.tdscf import tda_matrix
        mol = Molecule([("O", (0.0, 0.0, 0.0)),
                        ("H", (0.0, -1.43, 1.11)),
                        ("H", (0.0, 1.43, 1.11))], basis="sto-3g")
        mf = mol.RHF().run()
        A = np.asarray(tda_matrix(mf))
        w, _ = block_davidson(A, neig=3, tol=1e-10)
        assert np.max(np.abs(w - np.linalg.eigvalsh(A)[:3])) < 1e-8


class TestStyle:
    """Plotting layer smoke tests (reference: pyqed/style.py)."""

    def test_curve_and_export(self, tmp_path):
        from pyqed_tpu.utils import style
        x = np.linspace(0, 1, 20)
        f = str(tmp_path / "c.png")
        fig, ax = style.curve(x, np.sin(x), xlabel="t", ylabel="y",
                              output=f)
        import os
        assert os.path.getsize(f) > 0
        d = style.export(x, np.sin(x), fname=str(tmp_path / "c.dat"))
        assert len(open(d).readlines()) == 20

    def test_matplot_surf_levels(self, tmp_path):
        from pyqed_tpu.utils import style
        x = np.linspace(-1, 1, 16)
        y = np.linspace(-1, 1, 18)
        F = np.outer(np.sin(3 * x), np.cos(2 * y))
        f1 = str(tmp_path / "m.png")
        style.matplot(x, y, F, output=f1, diverge=True, contour=True)
        f2 = str(tmp_path / "s.png")
        style.surf(x, y, F, fname=f2)
        f3 = str(tmp_path / "l.png")
        style.level_scheme([0.0, 1.0, 1.2, 2.5], fname=f3)
        f4 = str(tmp_path / "g.dat")
        style.export(x, y, F, fname=f4)
        import os
        for f in (f1, f2, f3):
            assert os.path.getsize(f) > 0
        # gnuplot blocks: one blank line per x slice
        assert open(f4).read().count("\n\n") >= len(x) - 1

    def test_two_scales_and_surfaces(self, tmp_path):
        from pyqed_tpu.utils import style
        x = np.linspace(0, 2, 12)
        style.two_scales(x, np.sin(x), np.cos(x),
                         output=str(tmp_path / "t.png"))
        y = np.linspace(0, 2, 14)
        s1 = np.outer(x, y)
        style.plot_surfaces(x, y, [s1, s1 + 1.0],
                            fname=str(tmp_path / "p.png"))
