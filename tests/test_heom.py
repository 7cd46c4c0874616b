"""Driven HEOM dynamics (system drive H + edip*E(t))."""
import numpy as np
import jax.numpy as jnp
import pytest


class TestDrivenHEOM:
    """Driven dissipative dynamics: H(t) = H + edip*pulse(t)
    (reference: pyqed/heom/deom.py:676 generate_time)."""

    def _setup(self, reorg):
        from pyqed_tpu import pauli, DrudeBath, HEOMSolver
        I, sx, sy, sz = pauli()
        H = 0.5 * np.asarray(sz)
        bath = DrudeBath(temperature=0.5, cutoff=0.5, reorg=reorg)
        bath.set_bath_ops([jnp.asarray(sz)])
        sol = HEOMSolver(jnp.asarray(H, dtype=complex), bath=bath,
                         lmax=2, decomposition="pade", nexp=2)
        return sol, np.asarray(sx), H

    def test_zero_coupling_matches_von_neumann(self):
        sol, mu, H = self._setup(reorg=1e-10)

        def pulse(t):
            return 0.2 * jnp.cos(1.0 * t)

        rho0 = np.array([[1.0, 0], [0, 0]], complex)
        dt, nt = 0.002, 1500
        sz = np.diag([1.0, -1.0]).astype(complex)
        res = sol.run(jnp.asarray(rho0), dt=dt, nt=nt,
                      e_ops=[jnp.asarray(sz)],
                      edip=jnp.asarray(mu, dtype=complex), pulse=pulse)
        rho = rho0.copy()
        traj = [np.trace(sz @ rho).real]

        def rhs(r, t):
            Ht = H + mu * (0.2 * np.cos(t))
            return -1j * (Ht @ r - r @ Ht)

        for k in range(nt):
            t = k * dt
            k1 = rhs(rho, t)
            k2 = rhs(rho + dt / 2 * k1, t + dt / 2)
            k3 = rhs(rho + dt / 2 * k2, t + dt / 2)
            k4 = rhs(rho + dt * k3, t + dt)
            rho = rho + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            traj.append(np.trace(sz @ rho).real)
        err = np.max(np.abs(np.asarray(res.observables[:, 0].real)
                            - np.asarray(traj)))
        assert err < 1e-8

    def test_chunked_equals_single_run_driven(self, tmp_path):
        """Checkpointed windows see the correct ABSOLUTE time (the w0
        offset is traced, not baked) — split == single for a
        time-dependent field."""
        sol, mu, _ = self._setup(reorg=0.05)

        def pulse(t):
            return 0.3 * jnp.sin(0.7 * t)

        rho0 = np.array([[1.0, 0], [0, 0]], complex)
        sz = jnp.asarray(np.diag([1.0, -1.0]).astype(complex))
        kw = dict(dt=0.004, nt=500, e_ops=[sz],
                  edip=jnp.asarray(mu, dtype=complex), pulse=pulse)
        r1 = sol.run(jnp.asarray(rho0), **kw)
        r2 = sol.run(jnp.asarray(rho0),
                     checkpoint=str(tmp_path / "ck.npz"),
                     checkpoint_every=7, **kw)
        assert np.max(np.abs(np.asarray(r1.observables)
                             - np.asarray(r2.observables))) < 1e-12

    def test_driven_with_bath_physical(self):
        """With a real bath the driven dynamics stays a density matrix:
        unit trace, hermitian, bounded populations."""
        sol, mu, _ = self._setup(reorg=0.05)

        def pulse(t):
            return 0.3 * jnp.cos(1.0 * t)

        rho0 = np.array([[1.0, 0], [0, 0]], complex)
        res = sol.run(jnp.asarray(rho0), dt=0.004, nt=1000,
                      edip=jnp.asarray(mu, dtype=complex), pulse=pulse)
        rho = np.asarray(res.rho)
        assert abs(np.trace(rho) - 1.0) < 1e-8
        assert np.max(np.abs(rho - rho.conj().T)) < 1e-8
        w = np.linalg.eigvalsh(rho)
        assert w.min() > -1e-6 and w.max() < 1.0 + 1e-6


class TestHEOMPropagatorAnd2T:
    """Dense hierarchy propagator + genuine two-time HEOM correlator
    (reference: pyqed/oqs.py HEOMSolver.propagator marches RK4;
    its correlation_3op_2t silently falls back to Lindblad)."""

    def _solver(self):
        from pyqed_tpu import pauli, DrudeBath, HEOMSolver
        _, sx, _, sz = [np.asarray(p) for p in pauli()]
        H = 0.5 * sz + 0.2 * sx
        bath = DrudeBath(temperature=0.5, cutoff=0.5, reorg=0.05)
        bath.set_bath_ops([jnp.asarray(sz)])
        return HEOMSolver(jnp.asarray(H, dtype=complex), bath=bath, lmax=2,
                          decomposition="pade", nexp=1), sx, sz

    def test_propagator_matches_run(self):
        sol, sx, sz = self._solver()
        rho0 = np.array([[1.0, 0], [0, 0]], complex)
        nt, dt = 40, 0.02
        Us = np.asarray(sol.propagator(dt, nt))
        nado = Us.shape[1] // 4
        ados0 = np.zeros((nado, 2, 2), complex)
        ados0[0] = rho0
        rho_exact = (Us[-1] @ ados0.ravel()).reshape(nado, 2, 2)[0]
        res = sol.run(jnp.asarray(rho0), dt=dt, nt=nt, nout=nt)
        assert np.max(np.abs(np.asarray(res.rho) - rho_exact)) < 1e-7

    def test_correlation_3op_2t_row0_matches_1t(self):
        sol, sx, sz = self._solver()
        rho0 = np.array([[0.7, 0.2], [0.2, 0.3]], complex)
        a = jnp.asarray(sx, dtype=complex)
        b = jnp.asarray(sz, dtype=complex)
        c = jnp.asarray(sx, dtype=complex)
        ntau = 30
        corr2 = np.asarray(sol.correlation_3op_2t(
            jnp.asarray(rho0), [a, b, c], dt=0.02, nt=5, ntau=ntau))
        corr1 = np.asarray(sol.correlation_3op_1t(
            jnp.asarray(rho0), [a, b, c], dt=0.02, nt=ntau, nout=1))
        assert corr2.shape == (5, ntau)
        # row t=0 of the 2-time function = the 1-time correlator
        # (both sample at tau=0 first)
        assert np.max(np.abs(corr2[0, :] - corr1[:ntau])) < 1e-8

    def test_correlation_3op_2t_stationarity_in_equilibrium(self):
        """Seeded from the hierarchy steady state, the correlator is
        independent of the waiting time t."""
        sol, sx, sz = self._solver()
        rho0 = np.eye(2, dtype=complex) / 2
        # relax toward equilibrium first
        res = sol.run(jnp.asarray(rho0), dt=0.02, nt=2000, nout=2000)
        rho_eq = np.asarray(res.rho)
        a = jnp.asarray(sx, dtype=complex)
        b = jnp.asarray(sz, dtype=complex)
        corr2 = np.asarray(sol.correlation_3op_2t(
            jnp.asarray(rho_eq), [a, b, a], dt=0.02, nt=40, ntau=10))
        # NOTE rho_eq as the rho_0 slice is only approximately the full
        # hierarchy steady state (higher ADOs re-equilibrate), so allow
        # a loose drift bound; rows must be nearly equal
        drift = np.max(np.abs(corr2[-1] - corr2[20]))
        assert drift < 5e-3 * max(np.abs(corr2).max(), 1e-30)


class TestMultiBath:
    """Independent per-state baths (the bath=[(Q, c, nu), ...] list API
    flattening several coupling operators into one hierarchy)."""

    def test_two_bath_pure_dephasing_analytic(self):
        """Exact second-order-cumulant closed form for TWO independent
        baths coupled to the two level projectors.

        H = diag(e1, e2), H_SB = |1><1| B_1 + |2><2| B_2 with independent
        Gaussian baths C_j(t) = sum_k c_jk exp(-nu_jk t).  Pure dephasing
        is exactly solvable:

            rho_12(t) = rho_12(0) e^{-i w12 t} e^{-g_1(t) - g_2(t)*},
            g_j(t) = sum_k c_jk / nu_jk^2 (nu_jk t + e^{-nu_jk t} - 1),

        (the bath-2 factor enters conjugated: lnF = -(a-b)[a g - b g*]
        with (a,b) = (0,1) for Q_2 = |2><2|).  HEOM with those exact
        exponential modes must reproduce it; populations are constant.
        """
        from pyqed_tpu.open import HEOMSolver

        e1, e2 = 0.3, -0.2
        H = np.diag([e1, e2]).astype(complex)
        P1 = np.diag([1.0, 0.0]).astype(complex)
        P2 = np.diag([0.0, 1.0]).astype(complex)
        c1, nu1 = [0.02 + 0.005j], [0.8]
        c2, nu2 = [0.015 - 0.003j, 0.01], [0.5, 1.3]

        sol = HEOMSolver(jnp.asarray(H),
                         bath=[(jnp.asarray(P1), c1, nu1),
                               (jnp.asarray(P2), c2, nu2)], lmax=6)
        rho0 = 0.5 * np.ones((2, 2), dtype=complex)
        dt, nt, nout = 0.005, 2000, 50
        res = sol.run(jnp.asarray(rho0), dt=dt, nt=nt, nout=nout,
                      store_ados=False,
                      e_ops=[jnp.asarray(P1),
                             jnp.asarray(np.array([[0, 1], [0, 0]],
                                                  dtype=complex))])
        t = np.asarray(res.times)
        obs = np.asarray(res.observables)
        pop1 = np.real(obs[:, 0])
        # Tr(|1><2| rho) = rho_21; conjugate to compare with rho_12
        rho12 = np.conj(obs[:, 1])

        def g(cs, nus, t):
            out = np.zeros_like(t, dtype=complex)
            for c, nu in zip(cs, nus):
                out += c / nu**2 * (nu * t + np.exp(-nu * t) - 1.0)
            return out

        exact = 0.5 * np.exp(-1j * (e1 - e2) * t
                             - g(c1, nu1, t) - np.conj(g(c2, nu2, t)))
        assert np.max(np.abs(pop1 - 0.5)) < 1e-9          # pure dephasing
        assert np.max(np.abs(rho12 - exact)) < 1e-7

    def test_q_bath_pair_api_matches_bath_ops(self):
        """bath=[(Q, DrudeBath)] pairs == DrudeBath.set_bath_ops([Q])
        (bitwise: both flatten to the same modes)."""
        from pyqed_tpu.open import HEOMSolver
        from pyqed_tpu.open.bath import DrudeBath

        H = jnp.asarray(0.5 * np.diag([1., -1.])
                        + 0.3 * np.array([[0, 1], [1, 0]]), dtype=complex)
        Q = jnp.asarray(np.diag([1., -1.]).astype(complex))
        b = DrudeBath(temperature=0.5, cutoff=0.5, reorg=0.05)
        b.set_bath_ops([Q])
        rho0 = jnp.asarray(np.diag([1., 0.]).astype(complex))
        obs = []
        for bath in (b, [(Q, b)]):
            sol = HEOMSolver(H, bath=bath, lmax=3, nexp=2)
            obs.append(np.asarray(
                sol.run(rho0, dt=0.01, nt=300, e_ops=[Q]).observables))
        assert np.array_equal(obs[0], obs[1])

    def test_steady_state_is_run_long_time_limit(self):
        """HEOMSolver.steady_state (null vector of the dense hierarchy
        Liouvillian) == the long-time limit of run() to machine
        precision; the hierarchy null space is one-dimensional."""
        from pyqed_tpu.open import HEOMSolver
        from pyqed_tpu.open.bath import DrudeBath

        H = jnp.asarray(0.5 * np.diag([1., -1.])
                        + 0.2 * np.array([[0, 1], [1, 0]]), dtype=complex)
        Q = jnp.asarray(np.diag([1., -1.]).astype(complex))
        b = DrudeBath(temperature=0.5, cutoff=0.5, reorg=0.05)
        b.set_bath_ops([Q])
        sol = HEOMSolver(H, bath=b, lmax=3, nexp=1)

        L = np.asarray(sol.liouvillian_dense())
        s = np.linalg.svd(L, compute_uv=False)
        assert s[-1] < 1e-12 and s[-2] > 1e-3      # unique null vector

        rho_ss = np.asarray(sol.steady_state())
        assert abs(np.trace(rho_ss) - 1.0) < 1e-12
        assert np.allclose(rho_ss, rho_ss.conj().T, atol=1e-12)
        nt = 32000
        res = sol.run(jnp.asarray(np.diag([1., 0.]).astype(complex)),
                      dt=0.05, nt=nt, nout=nt)
        assert np.max(np.abs(np.asarray(res.rho) - rho_ss)) < 1e-10

    def test_equilibrium_correlator_exact_with_full_steady_seed(self):
        """Seeding correlation_3op_2t with steady_state(full=True) makes
        the equilibrium correlator stationary to machine precision (the
        rho_0-slice-only seed drifts at ~1e-3 while higher ADOs
        re-equilibrate — that behavior is pinned loosely in
        TestCorrelation)."""
        from pyqed_tpu.open import HEOMSolver
        from pyqed_tpu.open.bath import DrudeBath

        H = jnp.asarray(0.5 * np.diag([1., -1.])
                        + 0.2 * np.array([[0, 1], [1, 0]]), dtype=complex)
        Q = jnp.asarray(np.diag([1., -1.]).astype(complex))
        b = DrudeBath(temperature=0.5, cutoff=0.5, reorg=0.05)
        b.set_bath_ops([Q])
        sol = HEOMSolver(H, bath=b, lmax=3, nexp=1)
        ados_ss = sol.steady_state(full=True)
        sx = jnp.asarray(np.array([[0, 1], [1, 0]], complex))
        corr = np.asarray(sol.correlation_3op_2t(
            None, [sx, Q, sx], dt=0.02, nt=40, ntau=12, ados0=ados_ss))
        assert np.max(np.abs(corr[-1] - corr[0])) < 1e-12


class TestExactLineshape:
    """Independent-boson (pure-dephasing) model — the one exactly
    solvable open-system problem: with Q = |e><e| the dipole correlator
    is e^{-i E t - g(t)}, g(t) = sum_k c_k (e^{-nu_k t} + nu_k t - 1)
    / nu_k^2 built from the SAME exponential modes the hierarchy uses
    (reference: the cumulant lineshape the HEOM must reproduce; pins the
    full RHS — gathers, occupation weights, left/right coefficients —
    against a closed form)."""

    def test_pure_dephasing_correlator_matches_closed_form(self):
        from pyqed_tpu.open import HEOMSolver
        from pyqed_tpu.open.bath import DrudeBath

        E = 1.0
        H = jnp.asarray(np.diag([0.0, E]).astype(complex))
        Q = jnp.asarray(np.diag([0.0, 1.0]).astype(complex))
        b = DrudeBath(temperature=1.0, cutoff=0.5, reorg=0.05)
        b.set_bath_ops([Q])
        sol = HEOMSolver(H, bath=b, lmax=7, nexp=2)
        mu = jnp.asarray(np.array([[0, 1], [1, 0]], complex))
        rho0 = jnp.asarray(np.diag([1.0, 0.0]).astype(complex))

        dt, nt = 0.003, 600
        corr = np.asarray(sol.correlation_2op_1t(rho0, mu, mu, dt, nt))
        t = np.arange(len(corr)) * dt
        g = np.zeros_like(t, dtype=complex)
        for _, c, nu in sol._modes:
            g += c * (np.exp(-nu * t) + nu * t - 1.0) / nu**2
        exact = np.exp(-1j * E * t - g)
        assert np.max(np.abs(corr - exact)) < 1e-6

    def test_full_seed_branch_matches_run_branch(self):
        """correlation_2op_1t(ados0=) (tau leg of correlation_3op_2t)
        == the run()-based branch when seeded with the same factorized
        stack — the two code paths implement one convention <A(t)B>."""
        from pyqed_tpu.open import HEOMSolver
        from pyqed_tpu.open.bath import DrudeBath

        H = jnp.asarray(0.5 * np.diag([1., -1.])
                        + 0.2 * np.array([[0, 1], [1, 0]]), dtype=complex)
        Q = jnp.asarray(np.diag([1., -1.]).astype(complex))
        b = DrudeBath(temperature=0.5, cutoff=0.5, reorg=0.05)
        b.set_bath_ops([Q])
        sol = HEOMSolver(H, bath=b, lmax=3, nexp=1)
        sx = jnp.asarray(np.array([[0, 1], [1, 0]], complex))
        rho0 = np.diag([0.7, 0.3]).astype(complex)

        dt, nt = 0.01, 60
        via_run = np.asarray(sol.correlation_2op_1t(
            jnp.asarray(rho0), sx, Q, dt, nt))
        _, nado = sol.rhs_fn(jnp.complex128)
        stack = jnp.zeros((nado, 2, 2), dtype=complex).at[0].set(
            jnp.asarray(rho0))
        via_seed = np.asarray(sol.correlation_2op_1t(
            None, sx, Q, dt, nt, ados0=stack))
        assert via_run.shape == via_seed.shape == (nt + 1,)
        assert np.max(np.abs(via_run - via_seed)) < 1e-12

    def test_absorption_peaks_at_transition(self):
        """HEOMSolver.absorption: exact-equilibrium linear absorption of
        a weakly damped two-level system peaks at the transition
        frequency (within the Lamb shift / grid resolution) and
        dominates the baseline."""
        from pyqed_tpu.open import HEOMSolver
        from pyqed_tpu.open.bath import DrudeBath

        E = 1.0
        H = jnp.asarray(np.diag([0.0, E]).astype(complex))
        Q = jnp.asarray(np.array([[0, 1], [1, 0]], complex))
        b = DrudeBath(temperature=0.2, cutoff=0.5, reorg=0.02)
        b.set_bath_ops([Q])
        sol = HEOMSolver(H, bath=b, lmax=3, nexp=1)
        mu = np.array([[0, 1], [1, 0]], complex)
        omegas = np.linspace(0.5, 1.5, 101)
        S = np.asarray(sol.absorption(omegas, mu, ntau=1500))
        assert S.shape == omegas.shape
        peak = omegas[int(np.argmax(S))]
        assert abs(peak - E) < 0.1
        assert S.max() > 5.0 * abs(S[0])
