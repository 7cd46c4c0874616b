"""DEOM tests: scaled-hierarchy dynamics vs unscaled HEOM, dense propagator
consistency, frequency-domain 2DES map vs direct time evolution."""
import numpy as np
import jax.numpy as jnp
import scipy.linalg

from pyqed_tpu import pauli
from pyqed_tpu.open import DEOMSolver, DEOMBath, HEOMSolver, DrudeBath


def make_solver(lmax=3, npsd=1):
    _, sx, _, sz = pauli()
    H = 0.5 * np.asarray(sz) + 0.5 * np.asarray(sx)
    bath = DEOMBath.drude(temperature=0.5, cutoff=0.5, reorg=0.05, npsd=npsd)
    sol = DEOMSolver(system=H, bath=bath, coupling=np.asarray(sz), lmax=lmax)
    return sol, H


class TestDEOM:
    def test_rho0_matches_unscaled_heom(self):
        """The scaled (DEOM) and unscaled (HEOM) hierarchies are related by
        an invertible ADO rescaling — rho_0(t) must be identical."""
        _, sx, _, sz = pauli()
        H = 0.5 * np.asarray(sz) + 0.5 * np.asarray(sx)
        rho0 = np.diag([1.0, 0.0]).astype(complex)

        sol, _ = make_solver(lmax=4, npsd=2)
        res_deom = sol.run(jnp.asarray(rho0), dt=0.01, nt=500,
                           p1=jnp.asarray(np.asarray(sz).astype(complex)))

        bath = DrudeBath(temperature=0.5, cutoff=0.5, reorg=0.05)
        bath.set_bath_ops([sz])
        heom = HEOMSolver(jnp.asarray(H), bath=bath, lmax=4,
                          decomposition="pade", nexp=2)
        res_heom = heom.run(jnp.asarray(rho0), dt=0.01, nt=500,
                            e_ops=[jnp.asarray(np.asarray(sz).astype(complex))])

        a = np.asarray(res_deom.observables[:, 0]).real
        b = np.asarray(res_heom.observables[:, 0]).real
        assert np.max(np.abs(a - b)) < 1e-8

    def test_dense_propagator_matches_rhs(self):
        """expm of the dense hierarchy Liouvillian == RK4 hierarchy run."""
        sol, H = make_solver(lmax=2, npsd=1)
        rho0 = np.diag([1.0, 0.0]).astype(complex)
        res = sol.run(jnp.asarray(rho0), dt=0.002, nt=250)
        M = sol.gen_propagator()
        nado = sol._nado
        v0 = np.zeros(nado * 4, dtype=complex)
        v0[:4] = rho0.flatten()
        v = scipy.linalg.expm(M * 0.5) @ v0
        rho_exact = v[:4].reshape(2, 2)
        assert np.max(np.abs(np.asarray(res.rho) - rho_exact)) < 1e-9

    def test_correlation_map_vs_time_domain(self):
        """S(wx, wy) from the resolvent formula vs brute-force: for T=0 and
        b=c=identity, S(wx, wy) = tvec . D G(wx) G(wy) A rho —
        cross-check against numpy resolvents."""
        sol, H = make_solver(lmax=2, npsd=1)
        _, sx, _, sz = pauli()
        sxn = np.asarray(sx).astype(complex)
        eye = np.eye(2, dtype=complex)
        rho0 = np.diag([1.0, 0.0]).astype(complex)
        wx = np.linspace(-2, 2, 5) + 0.13
        wy = np.linspace(-2, 2, 4) + 0.07
        S = np.asarray(sol.correlation_4op_3t(sxn, eye, eye, sxn,
                                              jnp.asarray(rho0), 0.0,
                                              jnp.asarray(wx), jnp.asarray(wy)))
        M = sol.propagator
        nado = sol._nado
        N = nado * 4
        v0 = np.zeros(N, dtype=complex)
        v0[:4] = (sxn @ rho0).flatten()
        tvec = np.zeros(N, dtype=complex)
        tvec[:4] = np.eye(2).flatten()
        AD = np.kron(np.eye(nado), np.kron(sxn, np.eye(2)))
        ref = np.zeros((5, 4), dtype=complex)
        for i in range(5):
            Gx = np.linalg.inv(-M - 1j * wx[i] * np.eye(N))
            for j in range(4):
                Gy = np.linalg.inv(-M - 1j * wy[j] * np.eye(N))
                ref[i, j] = tvec @ (AD @ (Gx @ (Gy @ v0)))
        assert np.max(np.abs(S - ref)) / np.max(np.abs(ref)) < 1e-7


class TestDEOMGmres:
    def test_gmres_resolvent_matches_eig(self):
        """Matrix-free GMRES 2DES map == host-eig path (VERDICT weak #6:
        on-device resolvent solves for large hierarchies)."""
        from pyqed_tpu.open.deom import DEOMSolver, DEOMBath
        bath = DEOMBath.drude(temperature=1.0, cutoff=0.5, reorg=0.05,
                              npsd=1)
        H = np.array([[0.5, 0.1], [0.1, -0.5]])
        Q = np.array([[[1.0, 0], [0, -1.0]]])
        sol = DEOMSolver(system=H, bath=bath, coupling=Q, lmax=3)
        dip = np.array([[0.0, 1.0], [1.0, 0.0]])
        rho0 = np.array([[1.0, 0], [0, 0.0]])
        wx = np.linspace(0.6, 1.5, 4)
        wy = np.linspace(-1.5, -0.6, 3)
        S_eig = np.asarray(sol.correlation_4op_3t(
            dip, dip, dip, dip, rho0, 2.0, wx, wy))
        S_gm = np.asarray(sol.correlation_4op_3t_gmres(
            dip, dip, dip, dip, rho0, 2.0, wx, wy, nt_T=400))
        rel = np.max(np.abs(S_eig - S_gm)) / np.max(np.abs(S_eig))
        assert rel < 1e-6


class TestDEOMDriven:
    """set_pulse_system_func / set_pulse_coupling_func / set_*_dipole
    (reference: pyqed/heom/deom.py DEOMSolver setters)."""

    def test_driven_system_matches_driven_heom(self):
        """DEOM with a pulsed system dipole == HEOMSolver.run(edip=, pulse=)."""
        _, sx, _, sz = pauli()
        H = 0.5 * np.asarray(sz)
        rho0 = np.diag([1.0, 0.0]).astype(complex)

        def pulse(t):
            return 0.2 * jnp.exp(-((t - 2.0) ** 2) / 0.5) * jnp.cos(t)

        sol, _ = make_solver(lmax=3, npsd=1)
        sol.set_system(H)
        sol.set_system_dipole(-np.asarray(sx))   # H(t) = H - E(t) mu
        sol.set_pulse_system_func(pulse)
        res = sol.run(jnp.asarray(rho0), dt=0.005, nt=1000,
                      p1=jnp.asarray(np.asarray(sz).astype(complex)))

        bath = DrudeBath(temperature=0.5, cutoff=0.5, reorg=0.05)
        bath.set_bath_ops([sz])
        heom = HEOMSolver(jnp.asarray(H, dtype=complex), bath=bath, lmax=3,
                          decomposition="pade", nexp=1)
        res2 = heom.run(jnp.asarray(rho0), dt=0.005, nt=1000,
                        e_ops=[jnp.asarray(np.asarray(sz).astype(complex))],
                        edip=jnp.asarray(np.asarray(sx), dtype=complex),
                        pulse=pulse)
        a = np.asarray(res.observables[:, 0]).real
        b = np.asarray(res2.observables[:, 0]).real
        assert np.max(np.abs(a - b)) < 1e-7

    def test_driven_coupling_changes_dynamics_smoothly(self):
        """Pulse on the COUPLING operator: zero-amplitude drive == undriven;
        finite drive perturbs the dynamics."""
        _, sx, _, sz = pauli()
        rho0 = np.diag([1.0, 0.0]).astype(complex)

        sol, _ = make_solver(lmax=3, npsd=1)
        base = sol.run(jnp.asarray(rho0), dt=0.01, nt=400,
                       p1=jnp.asarray(np.asarray(sz).astype(complex)))

        sol2, _ = make_solver(lmax=3, npsd=1)
        sol2.set_coupling_dipole(np.asarray(sx))
        sol2.set_pulse_coupling_func(lambda t: 0.0 * t)
        same = sol2.run(jnp.asarray(rho0), dt=0.01, nt=400,
                        p1=jnp.asarray(np.asarray(sz).astype(complex)))
        a = np.asarray(base.observables[:, 0]).real
        b = np.asarray(same.observables[:, 0]).real
        assert np.max(np.abs(a - b)) < 1e-12

        sol3, _ = make_solver(lmax=3, npsd=1)
        sol3.set_coupling_dipole(np.asarray(sx))
        sol3.set_pulse_coupling_func(lambda t: 0.3 * jnp.sin(t))
        diff = sol3.run(jnp.asarray(rho0), dt=0.01, nt=400,
                        p1=jnp.asarray(np.asarray(sz).astype(complex)))
        c = np.asarray(diff.observables[:, 0]).real
        assert np.max(np.abs(a - c)) > 1e-4
        # trace preserved under the coupling drive
        assert abs(np.trace(np.asarray(diff.rho)) - 1.0) < 1e-8
