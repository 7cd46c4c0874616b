"""Open-system solver tests: Lindblad, Liouville-eig, Redfield, HEOM.

Golden references: analytic 2-level decay, QuTiP-convention NumPy
transcriptions of the reference algorithms (pyqed/oqs.py,
pyqed/superoperator.py), and cross-method consistency (time-stepping vs
eigen-series vs hierarchy).
"""
import numpy as np
import jax.numpy as jnp
import scipy.linalg

from pyqed_tpu import pauli, basis, ket2dm, dag, sigmam
from pyqed_tpu.open import (
    LindbladSolver, LiouvilleSolver, RedfieldSolver, HEOMSolver,
    HEOMSolverDrude, DrudeBath,
)
from pyqed_tpu.ops.superoperator import liouvillian, dm2vec, vec2dm


def np_liouvillian(H, c_ops):
    n = H.shape[0]
    I = np.eye(n)
    L = -1j * (np.kron(H, I) - np.kron(I, H.T))
    for c in c_ops:
        cd = c.conj().T
        L += np.kron(c, c.conj()) - 0.5 * (np.kron(cd @ c, I) + np.kron(I, (cd @ c).T))
    return L


class TestLindblad:
    def test_two_level_decay_analytic(self):
        """Excited-state decay: p1(t) = e^{-gamma t}."""
        gamma = 0.1
        H = jnp.diag(jnp.array([0.0, 1.0]))
        sm = sigmam()
        c = jnp.sqrt(gamma) * sm
        rho0 = ket2dm(basis(2, 1))
        solver = LindbladSolver(H, c_ops=[c])
        res = solver.run(rho0, dt=0.01, Nt=1000, e_ops=[ket2dm(basis(2, 1))])
        t = np.asarray(res.times)
        p1 = np.asarray(res.observables[:, 0]).real
        assert np.max(np.abs(p1 - np.exp(-gamma * t))) < 1e-8

    def test_parity_with_dense_expm(self):
        """RK4 matrix-free trajectory vs exact expm(L t) rho0."""
        rng = np.random.default_rng(0)
        n = 3
        A = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
        H = (A + A.conj().T) / 2
        c1 = 0.3 * (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
        rho0 = np.zeros((n, n), dtype=complex)
        rho0[0, 0] = 1.0
        L = np_liouvillian(H, [c1])
        t = 0.5
        rho_exact = (scipy.linalg.expm(L * t) @ rho0.flatten()).reshape(n, n)
        solver = LindbladSolver(jnp.asarray(H), c_ops=[jnp.asarray(c1)])
        res = solver.run(jnp.asarray(rho0), dt=0.001, Nt=500)
        assert np.max(np.abs(np.asarray(res.rho) - rho_exact)) < 1e-9

    def test_steady_state(self):
        gamma = 0.2
        _, sx, _, _ = pauli()
        H = jnp.diag(jnp.array([0.0, 1.0])) + 0.1 * sx
        c = jnp.sqrt(gamma) * sigmam()
        solver = LindbladSolver(H, c_ops=[c])
        rho_ss = solver.steady_state()
        # L rho_ss = 0
        L = np_liouvillian(np.asarray(H), [np.asarray(c)])
        assert np.max(np.abs(L @ np.asarray(rho_ss).flatten())) < 1e-10
        assert np.isclose(np.trace(np.asarray(rho_ss)).real, 1.0)

    def test_driven_lindblad(self):
        """List-form H = [H0, [mu, f]] matches a NumPy reference."""
        _, sx, _, _ = pauli()
        H0 = np.diag([0.0, 1.0]).astype(complex)
        mu = np.asarray(sx)
        f = lambda t: 0.05 * jnp.cos(t)
        gamma = 0.05
        c = np.sqrt(gamma) * np.asarray(sigmam())
        rho0 = ket2dm(basis(2, 0))
        solver = LindbladSolver([jnp.asarray(H0), [jnp.asarray(mu), f]],
                                c_ops=[jnp.asarray(c)])
        dt, Nt = 0.01, 300
        res = solver.run(jnp.asarray(rho0), dt=dt, Nt=Nt,
                         e_ops=[jnp.asarray(np.diag([0, 1.0]).astype(complex))])

        def np_rhs(rho, t):
            Ht = H0 - f(t) * mu
            out = -1j * (Ht @ rho - rho @ Ht)
            cd = c.conj().T
            out += c @ rho @ cd - 0.5 * (cd @ c @ rho + rho @ cd @ c)
            return out

        rho = np.asarray(rho0).astype(complex)
        t = 0.0
        obs = [rho[1, 1]]
        for _ in range(Nt):
            k1 = np_rhs(rho, t)
            k2 = np_rhs(rho + k1 * dt / 2, t + dt / 2)
            k3 = np_rhs(rho + k2 * dt / 2, t + dt / 2)
            k4 = np_rhs(rho + k3 * dt, t + dt)
            rho = rho + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            t += dt
            obs.append(rho[1, 1])
        assert np.max(np.abs(np.asarray(res.observables[:, 0]) - np.array(obs))) < 1e-10

    def test_correlation_3op_1t_vs_expm(self):
        _, sx, _, _ = pauli()
        H = np.diag([0.0, 1.0]).astype(complex)
        gamma = 0.1
        c = np.sqrt(gamma) * np.asarray(sigmam())
        rho0 = np.diag([1.0, 0.0]).astype(complex)
        solver = LindbladSolver(jnp.asarray(H), c_ops=[jnp.asarray(c)])
        dt, Nt = 0.01, 100
        corr = solver.correlation_3op_1t(jnp.asarray(rho0),
                                         [np.eye(2), sx, sx], dt=dt, Nt=Nt)
        L = np_liouvillian(H, [c])
        seed = (np.asarray(sx) @ rho0).flatten()
        ref = []
        for k in range(Nt + 1):
            v = scipy.linalg.expm(L * k * dt) @ seed
            ref.append(np.trace(np.asarray(sx) @ v.reshape(2, 2)))
        assert np.max(np.abs(np.asarray(corr) - np.array(ref))) < 1e-9


class TestLiouvilleSolver:
    def test_evolve_matches_time_stepping(self):
        _, sx, _, sz = pauli()
        H = jnp.diag(jnp.array([0.0, 1.0])) + 0.2 * sx
        c = 0.3 * sigmam()
        rho0 = ket2dm(basis(2, 1))
        ls = LiouvilleSolver(H, c_ops=[c])
        ls.eigenstates()
        tlist = np.linspace(0, 10, 21)
        r1 = ls.evolve(rho0, tlist, e_ops=[sz])
        solver = LindbladSolver(H, c_ops=[c])
        r2 = solver.run(rho0, dt=0.0005, Nt=20000, e_ops=[sz], nout=1000)
        assert np.max(np.abs(np.asarray(r1.observables[:, 0])
                             - np.asarray(r2.observables[:, 0]))) < 1e-8

    def test_correlation_2op_1t_vs_expm(self):
        _, sx, _, _ = pauli()
        H = jnp.diag(jnp.array([0.0, 1.0]))
        c = 0.25 * sigmam()
        rho0 = np.asarray(ket2dm(basis(2, 0)))
        ls = LiouvilleSolver(H, c_ops=[c])
        ls.eigenstates()
        tlist = np.linspace(0, 5, 11)
        corr = ls.correlation_2op_1t(jnp.asarray(rho0), [sx, sx], tlist)
        L = np_liouvillian(np.asarray(H).astype(complex),
                           [np.asarray(c).astype(complex)])
        ref = []
        for t in tlist:
            v = scipy.linalg.expm(L * t) @ (np.asarray(sx) @ rho0).flatten()
            ref.append(np.trace(np.asarray(sx) @ v.reshape(2, 2)))
        assert np.max(np.abs(np.asarray(corr) - np.array(ref))) < 1e-9

    def test_correlation_3op_2t_consistency(self):
        """Eigen-series 2-time correlation vs nested time stepping."""
        _, sx, _, _ = pauli()
        H = jnp.diag(jnp.array([0.0, 1.0]))
        c = 0.3 * sigmam()
        rho0 = ket2dm(basis(2, 1))
        ls = LiouvilleSolver(H, c_ops=[c])
        ls.eigenstates()
        dt = 0.01
        Nt, Ntau = 5, 5
        tlist = np.arange(Nt) * dt * 20
        taulist = np.arange(Ntau) * dt * 20
        c1 = ls.correlation_3op_2t(rho0, [sx, sx, sx], tlist, taulist)
        solver = LindbladSolver(H, c_ops=[c])
        c2 = solver.correlation_3op_2t(rho0, [sx, sx, sx], dt=dt * 20,
                                       Nt=Nt, Ntau=Ntau)
        assert np.max(np.abs(np.asarray(c1) - np.asarray(c2))) < 1e-6


class TestRedfield:
    def test_tensor_parity_with_numpy(self):
        """Redfield tensor vs direct transcription of pyqed/oqs.py:519-570."""
        rng = np.random.default_rng(3)
        n = 4
        A = rng.normal(size=(n, n))
        H = (A + A.T) / 2
        a_op = rng.normal(size=(n, n))
        a_op = (a_op + a_op.T) / 2
        spectrum = lambda w: 0.1 / (1 + np.exp(-w / 0.2)) + 0.01

        solver = RedfieldSolver(jnp.asarray(H), c_ops=[jnp.asarray(a_op)],
                                spectra=[spectrum])
        R, evecs = solver.redfield_tensor()

        # NumPy reference
        evals_np, evecs_np = np.linalg.eigh(H)
        W = evals_np[:, None] - evals_np[None, :]
        C = spectrum(-W)
        Aeb = evecs_np.conj().T @ a_op @ evecs_np
        Lk = C * Aeb
        I = np.eye(n)
        op2sop = lambda x: np.kron(x, I) - np.kron(I, x.T)
        left = lambda x: np.kron(x, I)
        right = lambda x: np.kron(I, x.T)
        Rnp = op2sop(Aeb) @ (left(Lk) - right(Lk.conj().T))
        Rnp = -1j * op2sop(np.diag(evals_np)) - Rnp
        # eigenbases may differ by column signs; compare in a sign-fixed way
        signs = np.sign(np.sum(np.asarray(evecs) * evecs_np, axis=0))
        evecs_fixed = evecs_np * signs
        Aeb2 = evecs_fixed.conj().T @ a_op @ evecs_fixed
        Lk2 = C * Aeb2
        Rnp2 = -1j * op2sop(np.diag(evals_np)) - (
            op2sop(Aeb2) @ (left(Lk2) - right(Lk2.conj().T)))
        assert np.max(np.abs(np.asarray(R) - Rnp2)) < 1e-10

    def test_evolve_trace_preserving_and_relaxes(self):
        n = 3
        E = np.array([0.0, 0.5, 1.0])
        H = np.diag(E)
        a_op = np.zeros((n, n))
        a_op[0, 1] = a_op[1, 0] = 1.0
        a_op[1, 2] = a_op[2, 1] = 1.0
        beta = 10.0
        # detailed-balance-ish spectrum: S(w>0) absorbs, S(w<0) suppressed
        spectrum = lambda w: 0.1 * np.where(w > 0, 1.0, np.exp(beta * w))
        solver = RedfieldSolver(jnp.asarray(H), c_ops=[jnp.asarray(a_op)],
                                spectra=[spectrum])
        rho0 = np.zeros((n, n), dtype=complex)
        rho0[2, 2] = 1.0
        res = solver.evolve(jnp.asarray(rho0), dt=0.05, Nt=2000,
                            e_ops=[jnp.asarray(np.diag([1.0, 0, 0]))])
        tr = np.trace(np.asarray(res.rho))
        assert np.isclose(tr.real, 1.0, atol=1e-8)
        # ground population grows
        p0 = np.asarray(res.observables[:, 0]).real
        assert p0[-1] > 0.5

    def test_propagator_vs_evolve(self):
        rng = np.random.default_rng(5)
        n = 3
        A = rng.normal(size=(n, n))
        H = (A + A.T) / 2
        a_op = np.eye(n) * 0 + np.diag(rng.normal(size=n))
        spectrum = lambda w: 0.05 * np.ones_like(w)
        solver = RedfieldSolver(jnp.asarray(H), c_ops=[jnp.asarray(a_op)],
                                spectra=[spectrum])
        solver.redfield_tensor()
        t = np.array([0.0, 0.5, 1.0])
        U = solver.propagator(t)
        rho0 = np.zeros((n, n), dtype=complex)
        rho0[n - 1, n - 1] = 1.0
        e_op = np.diag(np.arange(n)).astype(complex)
        obs = solver.expect(jnp.asarray(rho0), [jnp.asarray(e_op)])
        res = solver.evolve(jnp.asarray(rho0), dt=0.001, Nt=1000,
                            e_ops=[jnp.asarray(e_op)], nout=500)
        assert np.max(np.abs(np.asarray(obs[:, 0])
                             - np.asarray(res.observables[:, 0]))) < 1e-7


class TestHEOM:
    def test_parity_with_reference_euler_heom(self):
        """rho_0(t) parity vs a NumPy transcription of the reference high-T
        HEOM (pyqed/oqs.py:1856-1873, Euler + i^n-rescaled ADOs)."""
        _, sx, _, sz = pauli()
        eps, Delta = 0.5, 1.0
        H = 0.5 * eps * np.asarray(sz) + 0.5 * Delta * np.asarray(sx)
        Q = np.asarray(sz).astype(complex)
        T, gamma, reorg = 1.0, 0.5, 0.05
        nado = 8
        dt, nt = 0.002, 500
        rho0 = np.zeros((2, 2), dtype=complex)
        rho0[0, 0] = 1.0

        solver = HEOMSolverDrude(jnp.asarray(H), c_ops=[jnp.asarray(Q)])
        res = solver.run(jnp.asarray(rho0), dt, nt, temperature=T,
                         cutoff=gamma, reorganization=reorg, nado=nado,
                         method="euler",
                         e_ops=[jnp.asarray(np.diag([1.0, 0]).astype(complex))])

        # NumPy reference transcription
        ado = np.zeros((2, 2, nado), dtype=complex)
        ado[:, :, 0] = rho0
        D0 = reorg * gamma * (1 / np.tanh(gamma / (2 * T)) - 1j)
        comm = lambda A, B: A @ B - B @ A
        acomm = lambda A, B: A @ B + B @ A
        obs_ref = [rho0[0, 0]]
        for k in range(nt):
            new = ado.copy()
            new[:, :, 0] = ado[:, :, 0] - 1j * comm(H, ado[:, :, 0]) * dt \
                - comm(Q, ado[:, :, 1]) * dt
            for n_ in range(1, nado - 1):
                new[:, :, n_] = ado[:, :, n_] + (-1j * comm(H, ado[:, :, n_])
                    - comm(Q, ado[:, :, n_ + 1]) - n_ * gamma * ado[:, :, n_]
                    + n_ * (D0.real * comm(Q, ado[:, :, n_ - 1])
                            + 1j * D0.imag * acomm(Q, ado[:, :, n_ - 1]))) * dt
            ado = new
            obs_ref.append(ado[0, 0, 0])
        obs_ref = np.array(obs_ref)

        got = np.asarray(res.observables[:, 0])
        assert np.max(np.abs(got - obs_ref)) < 1e-10

    def test_heom_reduces_to_lindblad_markovian_limit(self):
        """Fast bath (gamma >> system) at high T: HEOM ~ weak-coupling
        result; here just check trace preservation + hermiticity + rk4
        stability."""
        _, sx, _, sz = pauli()
        H = 0.5 * np.asarray(sx)
        bath = DrudeBath(temperature=1.0, cutoff=2.0, reorg=0.02)
        bath.set_bath_ops([jnp.asarray(sz)])
        solver = HEOMSolver(jnp.asarray(H), bath=bath, lmax=4, nexp=2)
        rho0 = jnp.asarray(np.diag([1.0, 0.0]).astype(complex))
        res = solver.run(rho0, dt=0.01, nt=500,
                         e_ops=[jnp.asarray(np.diag([1.0, 0]).astype(complex))])
        rho_f = np.asarray(res.rho)
        assert np.isclose(np.trace(rho_f).real, 1.0, atol=1e-8)
        assert np.max(np.abs(rho_f - rho_f.conj().T)) < 1e-8
        p = np.asarray(res.observables[:, 0]).real
        assert np.all(p > -1e-6) and np.all(p < 1 + 1e-6)

    def test_matsubara_vs_pade_converge_together(self):
        """Padé spectrum decomposition converges superexponentially: pade-3
        vs pade-5 agree to ~1e-4, and matsubara-16 approaches the Padé
        answer (its convergence is only ~1/N)."""
        _, sx, _, sz = pauli()
        H = 0.5 * np.asarray(sz) + 0.5 * np.asarray(sx)
        rho0 = jnp.asarray(np.diag([1.0, 0.0]).astype(complex))
        pz = jnp.asarray(np.asarray(sz).astype(complex))
        out = {}
        for dec, nexp in [("matsubara", 16), ("pade", 3), ("pade", 5)]:
            bath = DrudeBath(temperature=0.5, cutoff=0.5, reorg=0.05)
            bath.set_bath_ops([jnp.asarray(sz)])
            solver = HEOMSolver(jnp.asarray(H), bath=bath, lmax=3,
                                decomposition=dec, nexp=nexp)
            res = solver.run(rho0, dt=0.01, nt=800, e_ops=[pz])
            out[(dec, nexp)] = np.asarray(res.observables[:, 0]).real
        assert np.max(np.abs(out[("pade", 3)] - out[("pade", 5)])) < 1e-4
        assert np.max(np.abs(out[("matsubara", 16)] - out[("pade", 5)])) < 5e-3


class TestProny:
    def test_recovers_exponentials(self):
        from pyqed_tpu.open.bath import prony_decomposition
        t = np.arange(400) * 0.05
        a_true = np.array([0.5 + 0.1j, 0.2 - 0.3j])
        g_true = np.array([0.3 + 1.0j, 1.2 - 0.4j])
        C = sum(a * np.exp(-g * t) for a, g in zip(a_true, g_true))
        a, g, err = prony_decomposition(C, 0.05, 2, return_error=True)
        assert err < 1e-10
        # recovered rates match (order-free)
        for gt in g_true:
            assert np.min(np.abs(g - gt)) < 1e-8

    def test_fits_drude_correlation(self):
        from pyqed_tpu.open.bath import DrudeBath, prony_decomposition
        b = DrudeBath(temperature=0.5, cutoff=0.5, reorg=0.05)
        c, nu = b.matsubara(200)
        t = np.arange(600) * 0.1
        C = np.sum(c[:, None] * np.exp(-np.outer(nu, t)), axis=0)
        a, g, err = prony_decomposition(C, 0.1, 6, return_error=True)
        assert err < 1e-6 * np.abs(C[0])
        assert len(g) <= 6


class TestLindbladPropagatorMethod:
    def test_matches_rk4(self):
        """method='propagator' (dense RK4-polynomial step, composed per
        window) is bit-compatible stepping with method='rk4'."""
        from pyqed_tpu.open.lindblad import LindbladSolver
        rng = np.random.default_rng(3)
        n = 8
        H = rng.normal(size=(n, n))
        H = (H + H.T) / 2
        c = np.zeros((n, n))
        c[0, 3] = 0.3
        rho0 = np.zeros((n, n))
        rho0[2, 2] = 1.0
        eop = np.diag(rng.random(n))
        r1 = LindbladSolver(H, [c], e_ops=[eop]).run(
            rho0, dt=0.002, Nt=500, nout=10)
        r2 = LindbladSolver(H, [c], e_ops=[eop]).run(
            rho0, dt=0.002, Nt=500, nout=10, method="propagator")
        assert np.max(np.abs(np.asarray(r1.observables)
                             - np.asarray(r2.observables))) < 1e-12
        assert np.max(np.abs(np.asarray(r1.rho)
                             - np.asarray(r2.rho))) < 1e-12


class TestParallelInTime:
    def test_prefix_propagators_vs_sequential(self):
        from pyqed_tpu.ops.linalg import (prefix_propagators,
                                          magnus2_propagators)
        rng = np.random.default_rng(0)
        n, nsteps, dt = 12, 400, 0.002
        H0 = rng.normal(size=(n, n))
        H0 = (H0 + H0.T) / 2
        mu = rng.normal(size=(n, n))
        mu = (mu + mu.T) / 2
        ts = dt * np.arange(nsteps)
        Hmid = H0[None] + (0.05 * np.cos(1.05 * (ts + dt / 2)))[:, None,
                                                                None] * mu
        Us = magnus2_propagators(jnp.asarray(Hmid), dt)
        pref = prefix_propagators(Us)
        # sequential product oracle
        seq = np.eye(n, dtype=complex)
        for k in range(nsteps):
            seq = np.asarray(Us[k]) @ seq
        assert np.max(np.abs(np.asarray(pref[-1]) - seq)) < 1e-10
        # unitarity
        P = np.asarray(pref[-1])
        assert np.max(np.abs(P.conj().T @ P - np.eye(n))) < 1e-10


class TestGenericCorrelation:
    """Generic quantum-regression drivers (reference:
    pyqed/correlation.py:17; the 4p_2t stub at :13 made real)."""

    def test_3p_1t_matches_lindblad_solver(self):
        import numpy as np
        import jax.numpy as jnp
        from pyqed_tpu.open import LindbladSolver
        from pyqed_tpu.open.correlation import correlation_3p_1t
        n = 4
        rng = np.random.default_rng(3)
        H = rng.normal(size=(n, n)); H = (H + H.T) / 2
        l = rng.normal(size=(n, n)) * 0.3
        A = rng.normal(size=(n, n)); B = rng.normal(size=(n, n))
        C = rng.normal(size=(n, n))
        rho0 = np.zeros((n, n)); rho0[0, 0] = 1.0
        tl = np.arange(1, 81) * 0.01
        t, corr = correlation_3p_1t(H, rho0, (A, B, C), c_ops=[l],
                                    tlist=tl)
        # oracle: dense expm of the Liouvillian, same contraction
        import scipy.linalg as sla
        I = np.eye(n)
        L = -1j * (np.kron(H, I) - np.kron(I, H.T)) \
            + np.kron(l, l.conj()) \
            - 0.5 * (np.kron(l.T @ l, I) + np.kron(I, (l.T @ l).T))
        rv = (C @ rho0 @ A).ravel()
        ref = []
        for tk in tl:
            r = (sla.expm(L * tk) @ rv).reshape(n, n)
            ref.append(np.trace(B @ r))
        assert np.max(np.abs(np.asarray(corr) - np.asarray(ref))) < 1e-6

    def test_4p_2t_reduces_to_3p(self):
        """D = identity, t1 = one step: first row of the 2-time map
        equals the 1-time function."""
        import numpy as np
        from pyqed_tpu.open.correlation import (correlation_3p_1t,
                                                correlation_4p_2t)
        n = 3
        rng = np.random.default_rng(5)
        H = rng.normal(size=(n, n)); H = (H + H.T) / 2
        A = rng.normal(size=(n, n)); B = rng.normal(size=(n, n))
        rho0 = np.diag([0.6, 0.3, 0.1])
        cmat = correlation_4p_2t(H, rho0, (A, B, np.eye(n), np.eye(n)),
                                 dt=0.02, nt1=3, nt2=40)
        t, corr = correlation_3p_1t(H, rho0, (np.eye(n), A @ B, np.eye(n)),
                                    dt=0.02, nt=40)
        assert np.max(np.abs(np.asarray(cmat)[0] - np.asarray(corr))) < 1e-10


def test_redfield_steady_state_long_time_limit():
    """RedfieldSolver.steady_state (reference stub made real): matches
    the long-time limit of evolve and is stationary."""
    n = 3
    E = np.array([0.0, 0.5, 1.0])
    H = np.diag(E)
    a_op = np.zeros((n, n))
    a_op[0, 1] = a_op[1, 0] = 1.0
    a_op[1, 2] = a_op[2, 1] = 1.0
    beta = 2.0
    spectrum = lambda w: 0.1 * np.where(w > 0, 1.0, np.exp(beta * w))
    solver = RedfieldSolver(jnp.asarray(H), c_ops=[jnp.asarray(a_op)],
                            spectra=[spectrum])
    rho_ss = np.asarray(solver.steady_state())
    assert abs(np.trace(rho_ss) - 1.0) < 1e-10
    assert np.allclose(rho_ss, rho_ss.conj().T, atol=1e-12)
    rho0 = np.zeros((n, n), dtype=complex)
    rho0[2, 2] = 1.0
    res = solver.evolve(jnp.asarray(rho0), dt=0.05, Nt=6000)
    assert np.max(np.abs(np.asarray(res.rho) - rho_ss)) < 1e-6


def test_drude_redfield_spectrum_is_half_fourier():
    """DrudeBath.redfield_spectrum == numerical int_0^inf C(t) e^{iwt} dt
    (the RedfieldSolver `spectra` convention), and 2 Re Gamma obeys
    detailed balance S(-w) = e^{-beta w} S(w)."""
    from pyqed_tpu.open.bath import DrudeBath

    b = DrudeBath(temperature=0.4, cutoff=0.7, reorg=0.06)
    # (1) half-FT identity on the SAME finite mode set
    c, nu = b.matsubara(nexp=60)
    Gamma = b.redfield_spectrum(nexp=60)
    t = np.linspace(0, 120.0, 240001)
    C60 = np.sum(c[:, None] * np.exp(-np.outer(nu, t)), axis=0)
    for w in (-1.3, -0.2, 0.0, 0.45, 2.1):
        num = np.trapezoid(C60 * np.exp(1j * w * t), t)
        assert abs(Gamma(w) - num) < 2e-6, (w, Gamma(w), num)
    # (2) converged 2 Re Gamma == closed-form power spectrum
    #     S(w) = 2 J(w) (n_B(w) + 1), which carries detailed balance
    lam, gam, beta = 0.06, 0.7, 1.0 / 0.4
    G = b.redfield_spectrum(nexp=40, decomposition="pade")
    for w in (-1.1, -0.3, 0.3, 1.1):
        J = 2 * lam * gam * w / (w**2 + gam**2)
        S_exact = 2 * J * (1.0 / np.expm1(beta * w) + 1.0)
        assert abs(2 * np.real(G(w)) - S_exact) < 1e-10 * abs(S_exact)
