"""NEGF/Keldysh and G0W0 tests."""
import numpy as np
import jax.numpy as jnp
import scipy.linalg

from pyqed_tpu.negf import (
    NEGF, green_from_H_const, KBSolver, second_born, G0W0, volterra_int,
)
from pyqed_tpu.qchem import Molecule, RHF, FCI


class TestFreeGreens:
    def test_retarded_matches_expm(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(3, 3))
        H = (A + A.T) / 2
        nt, dt = 20, 0.1
        G = green_from_H_const(jnp.asarray(H), beta=5.0, nt=nt, ntau=4, dt=dt)
        for (i, j) in [(5, 2), (10, 0), (3, 3)]:
            exact = -1j * scipy.linalg.expm(-1j * H * (i - j) * dt)
            assert np.allclose(np.asarray(G.retarded[i, j]), exact, atol=1e-10)
        # t < t' vanishes
        assert np.allclose(np.asarray(G.retarded[2, 5]), 0.0)

    def test_lesser_gives_fermi_density(self):
        """rho(t) = -i G<(t,t)^T must equal the equilibrium Fermi density,
        time-independent."""
        rng = np.random.default_rng(1)
        A = rng.normal(size=(3, 3))
        H = (A + A.T) / 2
        beta, mu = 4.0, 0.1
        G = green_from_H_const(jnp.asarray(H), beta=beta, nt=10, ntau=4,
                               dt=0.1, mu=mu)
        w, V = np.linalg.eigh(H)
        f = 1 / (np.exp(beta * (w - mu)) + 1)
        rho_exact = (V * f) @ V.T
        for n in [0, 5, 10]:
            rho = np.asarray(G.rho(n))
            assert np.allclose(rho, rho_exact, atol=1e-10), n

    def test_spectral_function_peaks(self):
        H = np.diag([-0.5, 0.5])
        G = green_from_H_const(jnp.asarray(H), beta=50.0, nt=800, ntau=2,
                               dt=0.05)
        w = np.linspace(-1.5, 1.5, 301)
        A = np.asarray(G.spectral(jnp.asarray(w)))
        # peaks near +-0.5
        assert abs(w[np.argmax(A * (w > 0))] - 0.5) < 0.1


class TestKB:
    def test_noninteracting_limit(self):
        H = np.diag([-0.3, 0.4])
        kb = KBSolver(jnp.asarray(H), U=0.0, beta=8.0, nt=20, dt=0.1)
        G = kb.run()
        G0 = green_from_H_const(jnp.asarray(H), 8.0, 20, 1, 0.1)
        assert np.allclose(np.asarray(G.retarded), np.asarray(G0.retarded))

    def test_second_born_conserves_trace_and_damps(self):
        """Interacting dimer: the 2B self-energy must damp the retarded GF
        (|G^R| decays) while keeping hermiticity of rho."""
        H = np.array([[0.0, -0.5], [-0.5, 0.0]])
        kb = KBSolver(jnp.asarray(H), U=1.0, beta=5.0, nt=30, dt=0.1)
        G = kb.run(max_iter=30)
        rho = np.asarray(G.rho(15))
        assert np.allclose(rho, rho.conj().T, atol=1e-6)
        # damping: interacting |G^R(t, 0)| < free at late t
        G0 = green_from_H_const(jnp.asarray(H), 5.0, 30, 1, 0.1)
        late = np.abs(np.asarray(G.retarded[30, 0])).sum()
        late0 = np.abs(np.asarray(G0.retarded[30, 0])).sum()
        assert late < late0 + 1e-9

    def test_volterra_reproduces_dyson_column(self):
        """g = g0 + K*g with K = Sigma*g0 must match dense solve."""
        rng = np.random.default_rng(2)
        nt, n, dt = 15, 2, 0.05
        g0 = rng.normal(size=(nt + 1, n, n)) + 1j * rng.normal(size=(nt + 1, n, n))
        K = np.zeros((nt + 1, nt + 1, n, n), dtype=complex)
        for i in range(nt + 1):
            for j in range(i + 1):
                K[i, j] = rng.normal(size=(n, n)) * 0.1
        g = np.asarray(volterra_int(jnp.asarray(g0), jnp.asarray(K), dt))
        # check the equation holds at a few rows (trapezoid)
        for i in [5, 10, 15]:
            rhs = g0[i].copy()
            for j in range(i + 1):
                w = 0.5 if j in (0, i) else 1.0
                rhs += dt * w * K[i, j] @ g[j]
            assert np.allclose(g[i], rhs, atol=1e-10), i


class TestG0W0:
    def test_h2_ip_improves_on_koopmans(self):
        """H2/STO-3G: exact IP = E(H2+) - E(H2) with E(H2+) from the exact
        one-electron problem; GW@HF IP should beat Koopmans."""
        R = 1.4
        mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, R))])
        mf = RHF(mol).run()
        E_h2 = FCI(mf).run()[0]
        # H2+ : single electron -> lowest eigenvalue of hcore (+ enuc)
        S, T, V, eri = mol.intor()
        import scipy.linalg as sla
        w = sla.eigh(np.asarray(T + V), np.asarray(S), eigvals_only=True)
        E_h2p = w[0] + mol.energy_nuc()
        ip_exact = E_h2p - E_h2

        gw = G0W0(mf)
        gw.run()
        ip_koopmans = -float(mf.mo_energy[mf.nocc - 1])
        ip_gw = float(gw.ip)
        assert abs(ip_gw - ip_exact) < abs(ip_koopmans - ip_exact), \
            (ip_gw, ip_koopmans, ip_exact)
