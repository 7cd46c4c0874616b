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
