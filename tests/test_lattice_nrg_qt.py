"""Lattice/NRG/QT/scattering tests."""
import numpy as np
import jax
import jax.numpy as jnp

from pyqed_tpu.models.lattice import FermiHubbard, BoseHubbard, jordan_wigner_ops
from pyqed_tpu.open.nrg import NRG
from pyqed_tpu.grid.scattering import LippmannSchwingerSolver
from pyqed_tpu.grid.qtraj import QT, lqf
from pyqed_tpu import dag, pauli


class TestJordanWigner:
    def test_anticommutation(self):
        c = jordan_wigner_ops(3)
        for i in range(3):
            for j in range(3):
                anti = np.asarray(c[i] @ dag(c[j]) + dag(c[j]) @ c[i])
                expected = np.eye(8) if i == j else np.zeros((8, 8))
                assert np.allclose(anti, expected, atol=1e-12), (i, j)
                anti2 = np.asarray(c[i] @ c[j] + c[j] @ c[i])
                assert np.allclose(anti2, 0, atol=1e-12)


class TestHubbard:
    def test_two_site_exact(self):
        """Half-filled 2-site Hubbard: E0 = U/2 - sqrt((U/2)^2 + 4t^2)."""
        t, U = 1.0, 4.0
        hub = FermiHubbard(t, U, 2, nelec=2)
        E = np.asarray(hub.run(nstates=1))
        exact = U / 2 - np.sqrt((U / 2) ** 2 + 4 * t**2)
        assert np.isclose(E[0], exact, atol=1e-8), (E[0], exact)

    def test_atomic_limit(self):
        hub = FermiHubbard(0.0, 3.0, 2)
        hub.jordan_wigner()
        w = np.linalg.eigvalsh(np.asarray(hub.H))
        # spectrum contains 0 (empty), and U for each double occupation
        assert np.isclose(w[0], 0.0, atol=1e-12)
        assert np.any(np.isclose(w, 3.0, atol=1e-12))

    def test_bose_hubbard_atomic(self):
        bh = BoseHubbard(0.0, 2.0, 2, nmax=2, mu=0.0)
        w = np.asarray(bh.run(nstates=1))
        assert np.isclose(w[0], 0.0, atol=1e-12)


class TestNRG:
    def test_chain_mapping_spectral_sum(self):
        """eta0 = integral of J and chain couplings positive/decaying."""
        I, X, Y, Z = pauli()
        nrg = NRG(0.5 * (1.0 * np.asarray(Z) + 0.1 * np.asarray(X)))
        eps, t = nrg.discretize(12, s=1.0, omegac=1.0, alpha=0.1)
        assert np.all(eps > 0)
        assert np.all(t[:-1] > 0)
        # Wilson chain parameters decay like Lambda^{-n}
        assert eps[6] < eps[1]

    def test_flow_runs(self):
        I, X, Y, Z = pauli()
        nrg = NRG(0.5 * (-0.0 * np.asarray(Z) + 0.1 * np.asarray(X)))
        flow = nrg.run(N=4, nz=4, nkeep=24, alpha=0.05)
        assert len(flow) == 4
        for shell in flow:
            assert np.all(np.isfinite(shell))
            assert shell[0] == 0.0  # ground state at 0


class TestScattering:
    def test_free_particle_transmission(self):
        """Zero potential: |psi| = 1 everywhere."""
        sol = LippmannSchwingerSolver(-5, 5, 100, V=lambda x: np.zeros_like(x))
        psi, T = sol.run(np.array([1.0, 2.0]))
        assert np.allclose(np.asarray(T), 1.0, atol=1e-10)

    def test_barrier_transmission_vs_analytic(self):
        """High-energy limit: transmission -> 1; low energy suppressed."""
        V0, w = 2.0, 1.0
        sol = LippmannSchwingerSolver(-8, 8, 400,
                                      V=lambda x: V0 * (np.abs(x) < w / 2))
        psi, T = sol.run(np.array([0.5, 6.0]))
        T = np.asarray(T)
        assert T[0] < 0.9      # below barrier: suppressed
        assert T[1] > 0.93     # far above barrier: nearly free


class TestQT:
    def test_free_gaussian_spreading(self):
        """LQF trajectories of a free Gaussian reproduce the analytic width
        growth sigma(t)^2 = sigma0^2 + (t/(2 m sigma0))^2."""
        ntraj = 2000
        qt = QT(ntraj, 1, mass=[1.0])
        key = jax.random.PRNGKey(42)
        sigma0 = 1.0 / np.sqrt(2.0)
        qt.sample(key, x0=[0.0], sigma=[sigma0])
        qt.set_force(lambda x: jnp.zeros_like(x))
        res = qt.run(dt=0.01, nt=200, nout=200)
        t = 2.0
        var_exact = sigma0**2 + (t / (2 * 1.0 * sigma0)) ** 2
        x = np.asarray(res.x)[:, 0]
        var = x.var()
        assert np.isclose(var, var_exact, rtol=0.1), (var, var_exact)

    def test_harmonic_coherent_motion(self):
        """In a HO the ensemble mean follows the classical trajectory."""
        qt = QT(2000, 1, mass=[1.0])
        qt.sample(jax.random.PRNGKey(1), x0=[1.0], sigma=[1 / np.sqrt(2)])
        qt.set_force(lambda x: -x)
        res = qt.run(dt=0.01, nt=314, nout=314)
        # <x>(t) = cos(t); at t = 3.14 ~ -1
        assert np.isclose(float(res.xAve[-1, 0]), np.cos(3.14), atol=0.05)


def test_qpot_friction_variant():
    """qpot (dissipative AQP, pyqed/qt/lqf.py:405): exact linear fields
    are recovered exactly -> closed-form quantum/friction forces."""
    import numpy as np
    import jax.numpy as jnp
    from pyqed_tpu.grid.qtraj import qpot

    rng = np.random.default_rng(3)
    s2, x0, p0, b, m = 0.3, 0.5, 0.7, 0.2, 2.0
    x = rng.normal(x0, np.sqrt(s2), 4000)
    w = np.ones_like(x) / len(x)
    r = -(x - x0) / (2 * s2)
    p = p0 + b * (x - x0)
    Eu, fq, fr = qpot(x, p, r, w, mass=m)
    assert np.max(np.abs(np.asarray(fq)[:, 0]
                         - r * (-1 / (2 * s2)) / m)) < 1e-10
    assert np.max(np.abs(np.asarray(fr)[:, 0] + r * b / m)) < 1e-10
    Eu_exact = -(np.dot(w, r ** 2) + (-1 / (2 * s2))) / (2 * m)
    assert abs(float(Eu) - Eu_exact) < 1e-10


def test_qpot_poly_higher_order():
    """Polynomial AQP (pyqed/qt/1D/HigherOrder_1D.py:81, parametrized
    order): exact cubic/quadratic fields recovered; order=1 == qpot."""
    import numpy as np
    from pyqed_tpu.grid.qtraj import qpot_poly, qpot

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 3000)
    w = np.ones_like(x) / len(x)
    r = -0.5 * x + 0.1 * x ** 2 - 0.05 * x ** 3
    p = 0.3 + 0.2 * x - 0.15 * x ** 2
    m = 1.7
    Eu, fq, fr = qpot_poly(x, p, r, w, mass=m, order=5)
    dr = -0.5 + 0.2 * x - 0.15 * x ** 2
    ddr = 0.2 - 0.3 * x
    dp = 0.2 - 0.3 * x
    assert np.max(np.abs(np.asarray(fq)
                         - (2 * r * dr + ddr) / (2 * m))) < 1e-10
    assert np.max(np.abs(np.asarray(fr)
                         + (2 * r * dp + (-0.3)) / (2 * m))) < 1e-10
    assert abs(float(Eu) + np.dot(w, r ** 2 + dr) / (2 * m)) < 1e-12
    E1, f1, g1 = qpot_poly(x, p, r, w, mass=m, order=1)
    E2, f2, g2 = qpot(x, p, r, w, mass=m)
    assert np.max(np.abs(np.asarray(f1) - np.asarray(f2)[:, 0])) < 1e-12
