"""Mol API surface made real: Floquet drive, deom wiring, multi-molecule
aggregates, momentum-from-position (reference: pyqed/mol.py — Floquet's
target class is commented out there, get_p_from_r calls the nonexistent
np.substract)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu import pauli, DrudeBath
from pyqed_tpu.models.mol import Mol
from pyqed_tpu.floquet import Floquet


def _tls(omega0=1.0):
    _, sx, _, sz = [np.asarray(p) for p in pauli()]
    H = 0.5 * omega0 * sz
    return Mol(jnp.asarray(H, dtype=complex), edip=jnp.asarray(sx, complex))


class TestFloquetFinite:
    def test_matches_rk4_driven_tls(self):
        """Floquet decomposition == direct RK4 of H(t) = H0 - E0 cos(wt) mu
        for a strongly driven two-level system, at non-stroboscopic times."""
        om0, omd, E0 = 1.0, 0.8, 0.3
        mol = _tls(om0)
        flo = mol.Floquet(omd, E0, nt=41)
        psi0 = np.array([1.0, 0.0], complex)
        times = np.linspace(0.0, 25.0, 6)[1:]
        psis = np.asarray(flo.run(psi0, times))

        H0 = np.asarray(mol.H)
        mu = np.asarray(mol.edip)
        dt = 1e-3

        def rk4_to(tmax):
            n = int(round(tmax / dt))
            psi = psi0.copy()
            for k in range(n):
                t = k * dt

                def f(y, tt):
                    return -1j * ((H0 - E0 * np.cos(omd * tt) * mu) @ y)
                k1 = f(psi, t)
                k2 = f(psi + 0.5 * dt * k1, t + 0.5 * dt)
                k3 = f(psi + 0.5 * dt * k2, t + 0.5 * dt)
                k4 = f(psi + dt * k3, t + dt)
                psi = psi + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            return psi

        for t, p in zip(times, psis):
            ref = rk4_to(t)
            assert np.abs(np.abs(np.vdot(ref, p)) - 1.0) < 1e-6
            assert np.max(np.abs(p - ref)) < 1e-5

    def test_quasienergy_weak_drive_limit(self):
        """E0 -> 0: quasienergies reduce to the static eigenvalues
        folded into the first BZ."""
        mol = _tls(0.62)
        flo = mol.Floquet(2.3, 1e-9, nt=21)
        eps, _ = flo.states()
        stat = np.linalg.eigvalsh(np.asarray(mol.H))
        folded = np.sort((stat + 2.3 / 2) % 2.3 - 2.3 / 2)
        assert np.allclose(np.sort(np.asarray(eps)), folded, atol=1e-6)

    def test_norm_conserved(self):
        flo = Floquet(jnp.diag(jnp.array([0.0, 1.0])).astype(complex),
                      jnp.asarray(np.array([[0, 1], [1, 0]], complex)),
                      omegad=1.1, E0=0.4, nt=41)
        psis = np.asarray(flo.run(np.array([0.6, 0.8], complex),
                                  np.linspace(0, 30, 7)))
        assert np.allclose(np.linalg.norm(psis, axis=1), 1.0, atol=1e-8)


class TestMolAggregates:
    def test_multi_two_site(self):
        mol = _tls()
        H2, mu2 = mol.multi(2)
        H, I, mu = [np.asarray(a) for a in (mol.H, mol.idm, mol.edip)]
        assert np.allclose(np.asarray(H2),
                           np.kron(H, I) + np.kron(I, H), atol=1e-14)
        assert np.allclose(np.asarray(mu2),
                           np.kron(mu, I) + np.kron(I, mu), atol=1e-14)

    def test_multi_three_site_spectrum_additive(self):
        mol = _tls(0.7)
        H3, _ = mol.multi(3)
        w1 = np.linalg.eigvalsh(np.asarray(mol.H))
        w3 = np.sort(np.linalg.eigvalsh(np.asarray(H3)))
        exact = np.sort([a + b + c for a in w1 for b in w1 for c in w1])
        assert np.allclose(w3, exact, atol=1e-12)


def test_mol_deom_returns_running_solver():
    mol = _tls()
    bath = DrudeBath(temperature=0.5, cutoff=0.5, reorg=0.02)
    sol = mol.deom(bath, coupling=jnp.asarray(np.diag([1.0, -1.0]), complex),
                   lmax=2, nexp=1)
    rho0 = jnp.asarray(np.array([[0.5, 0.3], [0.3, 0.5]], complex))
    res = sol.run(rho0, dt=0.01, nt=200, nout=50)
    rho = np.asarray(res.rho)
    assert abs(np.trace(rho) - 1.0) < 1e-8
    assert np.abs(rho[0, 1]) < 0.3                     # bath dephases


def test_get_p_from_r_harmonic_oscillator():
    """For the HO, p = i m w [a+ - a]/sqrt(2mw) exactly; check against
    get_p_from_r built from x-matrix + eigenenergies."""
    n = 8
    w0 = 1.3
    a = np.diag(np.sqrt(np.arange(1, n)), k=1)
    x = (a + a.T) / np.sqrt(2 * w0)
    p_exact = 1j * np.sqrt(w0 / 2) * (a.T - a)
    H = np.diag((np.arange(n) + 0.5) * w0)
    mol = Mol(jnp.asarray(H, complex), edip=jnp.asarray(x, complex))
    p = np.asarray(mol.get_p_from_r())
    # truncation corrupts only the (n-1, n-1) corner-adjacent elements
    assert np.allclose(p[:-1, :-1], p_exact[:-1, :-1], atol=1e-12)


def test_mol_getters():
    mol = _tls()
    assert np.allclose(np.asarray(mol.get_edip()), np.asarray(mol.edip))
    dm = np.asarray(mol.get_dm())
    assert abs(np.trace(dm) - 1.0) < 1e-14
    assert np.allclose(dm, dm.conj().T)
