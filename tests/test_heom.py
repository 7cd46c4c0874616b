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
