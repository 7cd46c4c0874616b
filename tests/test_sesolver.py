"""SESolver parity tests against a NumPy reference implementation.

The NumPy reference reproduces the algorithm of pyqed/mol.py:1603
(_quantum_dynamics: RK4 on -iHpsi) and pyqed/mol.py:1862 (driven_dynamics
with H(t) = H0 - mu E(t)); agreement gate 1e-8 (BASELINE.md).
"""
import numpy as np
import jax.numpy as jnp

from pyqed_tpu import Mol, SESolver, Pulse, pauli, basis, ket2dm, au2ev, au2fs


def np_rk4(y, f, dt, *args):
    k1 = f(y, *args)
    k2 = f(y + k1 * dt / 2, *args)
    k3 = f(y + k2 * dt / 2, *args)
    k4 = f(y + k3 * dt, *args)
    return y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


class TestSESolver:
    def test_rabi_oscillation_analytic(self):
        """Two-level Rabi problem has a closed-form solution."""
        Delta = 0.0
        Omega = 0.2
        _, sx, _, sz = pauli()
        H = 0.5 * Omega * sx + 0.5 * Delta * sz
        psi0 = basis(2, 0)
        dt, nt = 0.01, 2000
        res = SESolver(H).run(psi0=psi0, dt=dt, Nt=nt, e_ops=[ket2dm(basis(2, 1))])
        times = np.asarray(res.times)
        p1 = np.asarray(res.observables[:, 0]).real
        exact = np.sin(Omega * times / 2) ** 2
        assert np.max(np.abs(p1 - exact)) < 1e-8

    def test_rk4_parity_with_numpy_reference(self):
        rng = np.random.default_rng(0)
        n = 6
        A = rng.normal(size=(n, n))
        H = (A + A.T) / 2
        psi0 = rng.normal(size=n) + 1j * rng.normal(size=n)
        psi0 /= np.linalg.norm(psi0)
        e_op = np.diag(rng.normal(size=n)).astype(complex)

        dt, nt, nout = 0.005, 200, 10
        res = SESolver(jnp.asarray(H)).run(psi0=jnp.asarray(psi0), dt=dt,
                                           Nt=nt, e_ops=[jnp.asarray(e_op)],
                                           nout=nout)

        # NumPy reference: RK4 every dt, observable every nout steps
        psi = psi0.copy()
        obs_ref = [np.vdot(psi, e_op @ psi)]
        for k in range(nt // nout):
            for _ in range(nout):
                psi = np_rk4(psi, lambda y: -1j * H @ y, dt)
            obs_ref.append(np.vdot(psi, e_op @ psi))
        obs_ref = np.array(obs_ref)

        assert np.max(np.abs(np.asarray(res.observables[:, 0]) - obs_ref)) < 1e-10
        assert np.max(np.abs(np.asarray(res.psi) - psi)) < 1e-10

    def test_expm_stepping_matches_rk4(self):
        rng = np.random.default_rng(2)
        n = 5
        A = rng.normal(size=(n, n))
        H = jnp.asarray((A + A.T) / 2)
        psi0 = jnp.asarray(np.eye(n)[:, 0].astype(complex))
        r1 = SESolver(H).run(psi0=psi0, dt=0.002, Nt=500, method="rk4")
        r2 = SESolver(H).run(psi0=psi0, dt=0.002, Nt=500, method="expm")
        assert np.max(np.abs(np.asarray(r1.psi) - np.asarray(r2.psi))) < 1e-9

    def test_driven_dynamics_parity(self):
        """Driven two-level system vs NumPy reference with the same
        time-evaluation convention (field evaluated at RK4 stage times)."""
        _, sx, _, sz = pauli()
        H0 = np.diag([0.0, 1.0 / au2ev]).astype(complex)
        mu = np.asarray(sx).astype(complex)
        pulse = Pulse(omegac=1.0 / au2ev, tau=2.0 / au2fs, amplitude=0.01)
        dt, nt = 0.5, 400
        t0 = -10.0 / au2fs
        psi0 = np.array([1.0, 0.0], dtype=complex)

        res = SESolver(jnp.asarray(H0)).run(
            psi0=jnp.asarray(psi0), dt=dt, Nt=nt, t0=t0, pulse=pulse,
            edip=jnp.asarray(mu),
            e_ops=[jnp.asarray(np.diag([0.0, 1.0]).astype(complex))])

        def efield(t):
            return np.real(0.01 * np.exp(-(t - 0) ** 2 / 2 / (2.0 / au2fs) ** 2)
                           * np.exp(-1j * (1.0 / au2ev) * t))

        def rhs(y, t):
            return -1j * ((H0 - efield(t) * mu) @ y)

        psi = psi0.copy()
        t = t0
        obs_ref = [abs(psi[1]) ** 2]
        for _ in range(nt):
            k1 = rhs(psi, t)
            k2 = rhs(psi + k1 * dt / 2, t + dt / 2)
            k3 = rhs(psi + k2 * dt / 2, t + dt / 2)
            k4 = rhs(psi + k3 * dt, t + dt)
            psi = psi + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            t += dt
            obs_ref.append(abs(psi[1]) ** 2)
        obs_ref = np.array(obs_ref)

        assert np.max(np.abs(np.asarray(res.observables[:, 0]).real - obs_ref)) < 1e-10

    def test_correlation_3op_1t(self):
        """<A B(t) C> on a two-level system vs direct matrix exponentials."""
        import scipy.linalg
        _, sx, _, sz = pauli()
        H = np.asarray(0.5 * np.asarray(sz)).astype(complex)
        psi0 = np.array([1.0, 1.0], dtype=complex) / np.sqrt(2)
        dt, nt = 0.01, 100
        corr = SESolver(jnp.asarray(H)).correlation_3op_1t(
            jnp.asarray(psi0), [sx, sx, sx], dt, nt)
        ref = []
        for k in range(nt):
            U = scipy.linalg.expm(-1j * H * k * dt)
            ref.append(psi0.conj() @ np.asarray(sx) @ U.conj().T @ np.asarray(sx)
                       @ U @ np.asarray(sx) @ psi0)
        assert np.max(np.abs(np.asarray(corr) - np.array(ref))) < 1e-8


class TestMol:
    def test_eigenstates_and_groundstate(self):
        rng = np.random.default_rng(1)
        A = rng.normal(size=(4, 4))
        H = (A + A.T) / 2
        m = Mol(jnp.asarray(H))
        w, v = m.eigenstates()
        assert np.allclose(np.asarray(H) @ np.asarray(v[:, 0]),
                           np.asarray(w[0]) * np.asarray(v[:, 0]), atol=1e-10)

    def test_nonhermH(self):
        m = Mol(jnp.diag(jnp.array([0.0, 1.0])))
        m.set_decay_for_all(0.1)
        Hn = m.get_nonhermH()
        assert np.allclose(np.asarray(Hn), np.diag([0, 1.0]) - 1j * np.diag([0, 0.1]))
