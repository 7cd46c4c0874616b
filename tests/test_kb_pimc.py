"""Tests: two-time Kadanoff-Baym Volterra march + walker-parallel PIMC
(round-1 VERDICT next-round item #10)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqed_tpu.negf.kb2t import KBSolver2T
from pyqed_tpu.qmc.pimc import PIMC


class TestKB2T:
    H = np.array([[0.0, 0.3], [0.3, 0.5]])

    def test_free_matches_equilibrium(self):
        """Drive off, U=0: GR/GL must match the analytic equilibrium
        Green functions (VERDICT done criterion)."""
        nt, dt, beta = 50, 0.05, 5.0
        sol = KBSolver2T(lambda t: self.H, nt, dt, beta=beta, U=0.0)
        GR, GL = sol.run()
        w, V = np.linalg.eigh(self.H)
        f = 1 / (np.exp(beta * w) + 1)
        rho0 = (V * f) @ V.conj().T
        for n in range(0, nt, 12):
            for j in range(0, n + 1, 12):
                t, tp = n * dt, j * dt
                exR = -1j * (V * np.exp(-1j * w * (t - tp))) @ V.conj().T
                Ut = (V * np.exp(-1j * w * t)) @ V.conj().T
                Utp = (V * np.exp(1j * w * tp)) @ V.conj().T
                exL = 1j * Ut @ rho0 @ Utp
                assert np.max(np.abs(np.asarray(GR[n, j]) - exR)) < 5e-4
                assert np.max(np.abs(np.asarray(GL[n, j]) - exL)) < 5e-4

    def test_occupations_conserved_without_drive(self):
        sol = KBSolver2T(lambda t: self.H, 40, 0.05, beta=5.0, U=0.0)
        sol.run()
        occ = sol.occupations()
        assert np.max(np.abs(occ - occ[0])) < 1e-10

    def test_quench_response(self):
        """A quench at t=1 must move the occupations (the fixed-point
        KBSolver could not describe this)."""
        def hq(t):
            kick = 0.4 if t > 1.0 else 0.0
            return self.H + kick * np.array([[0, 1.0], [1.0, 0]])

        sol = KBSolver2T(hq, 50, 0.05, beta=5.0, U=0.0)
        sol.run()
        occ = sol.occupations()
        assert np.max(np.abs(occ - occ[0])) > 5e-3
        # trace conserved (unitary one-body dynamics)
        assert np.max(np.abs(occ.sum(1) - occ[0].sum())) < 1e-8

    def test_second_born_damps(self):
        nt, dt = 50, 0.05
        free = KBSolver2T(lambda t: self.H, nt, dt, beta=5.0, U=0.0)
        GRf, _ = free.run()
        corr = KBSolver2T(lambda t: self.H, nt, dt, beta=5.0, U=1.0)
        GRc, _ = corr.run(sc_iter=2)
        assert (abs(np.asarray(GRc[nt - 1, 0])[0, 0])
                < abs(np.asarray(GRf[nt - 1, 0])[0, 0]))
        # causality intact
        assert np.max(np.abs(np.asarray(GRc[0, nt - 1]))) < 1e-12


class TestPIMC:
    def test_harmonic_energy(self):
        """HO at finite T: E = (w/2) coth(beta w/2)
        (VERDICT done criterion: PIMC HO energy vs analytic at T>0)."""
        beta = 1.0
        pimc = PIMC(lambda x: 0.5 * x ** 2, beta=beta, nbeads=64)
        ev, et, acc, _ = pimc.run(0, npaths=2048, nsweeps=1200,
                                  ntherm=500)
        E_exact = 0.5 / np.tanh(0.5 * beta)
        assert abs(ev - E_exact) < 0.03
        assert abs(et - E_exact) < 0.08
        assert 0.1 < acc < 0.9

    def test_temperature_dependence(self):
        """Colder -> closer to the 0.5 ground-state energy."""
        hot = PIMC(lambda x: 0.5 * x ** 2, beta=0.5, nbeads=32)
        cold = PIMC(lambda x: 0.5 * x ** 2, beta=4.0, nbeads=96)
        ev_h, *_ = hot.run(1, npaths=1024, nsweeps=800, ntherm=400)
        ev_c, *_ = cold.run(2, npaths=1024, nsweeps=800, ntherm=400)
        assert ev_h > ev_c
        assert abs(ev_c - 0.5 / np.tanh(2.0)) < 0.05

    def test_sharded_paths(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from pyqed_tpu.parallel import make_mesh
        mesh = make_mesh({"walker": 8})
        pimc = PIMC(lambda x: 0.5 * x ** 2, beta=1.0, nbeads=32)
        ev, et, acc, _ = pimc.run(3, npaths=2048, nsweeps=600,
                                  ntherm=300, mesh=mesh)
        assert abs(ev - 0.5 / np.tanh(0.5)) < 0.05

    def test_shard_map_chains(self):
        """Explicit shard_map path: independent per-device chains with
        their own PRNG streams, pmean-combined estimators."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from pyqed_tpu.parallel import make_mesh
        mesh = make_mesh({"walker": 8})
        pimc = PIMC(lambda x: 0.5 * x ** 2, beta=1.0, nbeads=32)
        ev, et, acc, paths = pimc.run(5, npaths=2048, nsweeps=600,
                                      ntherm=300, mesh=mesh,
                                      use_shard_map=True)
        assert abs(ev - 0.5 / np.tanh(0.5)) < 0.05
        assert 0.1 < acc < 0.9


class TestBosonPIMC:
    @pytest.mark.slow
    def test_two_boson_exchange_statistics(self):
        """N=2 ideal bosons in a 1D HO: the permutation-sampling PIMC
        must reproduce the BOSONIC canonical energy, distinguishable
        mode the Boltzmann one (the QSATS exchange physics;
        reference: pyqed/qmc/MC_exchange/permute3d/)."""
        import jax.numpy as jnp
        from pyqed_tpu.qmc.pimc import BosonPIMC
        beta = 2.0

        def Z1(b):
            return 1.0 / (2 * np.sinh(b / 2))

        db = 1e-6
        E_dist = -(np.log(Z1(beta + db) ** 2)
                   - np.log(Z1(beta - db) ** 2)) / (2 * db)
        Zb = lambda b: 0.5 * (Z1(b) ** 2 + Z1(2 * b))
        E_bose = -(np.log(Zb(beta + db))
                   - np.log(Zb(beta - db))) / (2 * db)

        bp = BosonPIMC(lambda q: 0.5 * jnp.sum(q ** 2), nparticles=2,
                       beta=beta, nbeads=32)
        E_b, ab, ap, frac = bp.run(0, nreplicas=384, nsweeps=2500,
                                   ntherm=1200)
        E_d, *_ = bp.run(1, nreplicas=384, nsweeps=2500, ntherm=1200,
                         exchange=False)
        assert abs(E_b - E_bose) < 0.04
        assert abs(E_d - E_dist) < 0.04
        # the two ensembles are statistically distinguishable
        assert E_d - E_b > 0.05
        # permutation sector is genuinely sampled
        assert 0.2 < frac < 0.7
