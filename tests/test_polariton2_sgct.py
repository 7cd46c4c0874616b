"""Tests: VibronicPolariton2 + Berry curvature, sparse-grid combination
technique, ShinMetiu 2-electron model, NAQT (round-1 VERDICT rows
9/11/20/26)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.models.polariton_grid import (
    GridMol2, VibronicPolariton2, berry_curvature_field)
from pyqed_tpu.models.cavity import Cavity
from pyqed_tpu.grid.smolyak import SGCT_LDR, combination_technique
from pyqed_tpu.models.shinmetiu2e import ShinMetiu2e1d
from pyqed_tpu.grid.qtraj import NAQT
from pyqed_tpu.grid.spo import SPON


class TestBerryCurvature:
    def test_conical_intersection_pi(self):
        """E(x)e Jahn-Teller: total Berry phase around the CI = pi
        (the reference's berry_curvature is a `pass` stub)."""
        n = 41
        x = np.linspace(-2, 2, n)
        X, Y = np.meshgrid(x, x, indexing="ij")
        v = np.zeros((n, n, 2, 2))
        v[..., 0, 0] = X
        v[..., 1, 1] = -X
        v[..., 0, 1] = v[..., 1, 0] = Y
        w, u = jnp.linalg.eigh(jnp.asarray(v))
        F = np.asarray(berry_curvature_field(u[..., 0]))
        assert abs(abs(F.sum()) - np.pi) < 1e-10

    def test_no_ci_zero_phase(self):
        n = 31
        x = np.linspace(1.0, 3.0, n)      # CI at origin excluded
        X, Y = np.meshgrid(x, x, indexing="ij")
        v = np.zeros((n, n, 2, 2))
        v[..., 0, 0] = X
        v[..., 1, 1] = -X
        v[..., 0, 1] = v[..., 1, 0] = Y
        w, u = jnp.linalg.eigh(jnp.asarray(v))
        F = np.asarray(berry_curvature_field(u[..., 0]))
        assert abs(F.sum()) < 1e-10


class TestVibronicPolariton2:
    def test_end_to_end(self):
        n = 31
        x = np.linspace(-5, 5, n)
        X, Y = np.meshgrid(x, x, indexing="ij")
        v = np.zeros((n, n, 2, 2))
        v[..., 0, 0] = 0.5 * (X ** 2 + Y ** 2)
        v[..., 1, 1] = 0.5 * ((X - 0.5) ** 2 + Y ** 2) + 1.0
        v[..., 0, 1] = v[..., 1, 0] = 0.1 * Y
        mol = GridMol2(x, x, v, np.array([[0.0, 1.0], [1.0, 0.0]]))
        cav = Cavity(freq=1.0, n_cav=2)
        vp = VibronicPolariton2(mol, cav, g=0.05)
        vp.dpes_global()
        assert vp.v.shape == (n, n, 4, 4)
        E0, gs = vp.ground_state()
        assert 0 < E0 < 1.5
        r = vp.run(dt=0.02, nt=20)
        pops = np.asarray(r.population)[-1]
        assert abs(pops.sum() - 1.0) < 1e-6
        F = np.asarray(vp.berry_curvature(1))
        assert np.all(np.isfinite(F))


class TestSGCT:
    def test_coefficients_2d(self):
        idx, c = combination_technique(2, 4)
        # |l|=4 sets get +1, |l|=3 sets get -1
        assert all(ci == 1 for l, ci in zip(idx, c) if sum(l) == 4)
        assert all(ci == -1 for l, ci in zip(idx, c) if sum(l) == 3)

    def test_2d_coherent_state(self):
        def dpes(grids):
            X, Y = np.meshgrid(*grids, indexing="ij")
            return (0.5 * (X ** 2 + Y ** 2))[..., None, None]

        def psi0(grids):
            X, Y = np.meshgrid(*grids, indexing="ij")
            return np.exp(-((X - 1.0) ** 2 + Y ** 2) / 2)[..., None]

        sg = SGCT_LDR([(-7, 7), (-7, 7)], q=8, dpes_fn=dpes,
                      psi0_fn=psi0, nstates=1)
        t, xavg, _ = sg.run(dt=0.02, nt=60, nout=10)
        assert np.max(np.abs(xavg - np.cos(t))) < 1e-3


class TestShinMetiu2e:
    def test_symmetric_pes_and_correlation(self):
        sm = ShinMetiu2e1d(nstates=3)
        sm.create_grid((-14, 14), 40)
        wp, _ = sm.single_point(1.5)
        wm, _ = sm.single_point(-1.5)
        assert np.max(np.abs(wp - wm)) < 1e-10
        w0, u0 = sm.single_point(0.0)
        assert w0[0] < w0[1] < w0[2]
        # ground state is a spatial singlet
        assert sm.exchange_symmetry(u0)[0] == 1.0
        # HF upper-bounds the exact ground state
        mf = sm.scf(0.0)
        assert mf.e_tot > w0[0]
        assert mf.e_tot - w0[0] < 0.1


class TestNAQT:
    def test_matches_spo_constant_coupling(self):
        """Ehrenfest-LQF is exact for identical harmonic surfaces with
        constant coupling — NAQT must match SPO."""
        import jax.numpy as jnp

        def dpes1(x):
            xx = x[0]
            return jnp.array([[0.5 * xx ** 2, 0.15],
                              [0.15, 0.5 * xx ** 2 + 1.0]])

        nx = 192
        xg = np.linspace(-8, 8, nx, endpoint=False)
        v = np.zeros((nx, 2, 2))
        v[:, 0, 0] = 0.5 * xg ** 2
        v[:, 1, 1] = 0.5 * xg ** 2 + 1.0
        v[:, 0, 1] = v[:, 1, 0] = 0.15
        spo = SPON([xg], masses=[1.0], nstates=2, kernel="xla")
        spo.set_dpes(v)
        psi0 = np.zeros((nx, 2), complex)
        psi0[:, 1] = np.exp(-(xg - 1.0) ** 2)
        psi0 /= np.sqrt(np.sum(np.abs(psi0) ** 2) * (xg[1] - xg[0]))
        dt, nt = 0.005, 200
        pop_spo = np.asarray(spo.run(psi0, dt=dt, nt=nt,
                                     nout=40).population)
        naqt = NAQT(1000, 1, 2, dpes1)
        x, p, c = naqt.sample(a=[2.0], x0=[1.0], state=1)
        r = naqt.run(x, p, c, dt=dt, nt=nt, nout=40)
        assert np.max(np.abs(pop_spo - r.population)) < 1e-8


class TestShinMetiu3d:
    def test_symmetric_pes(self):
        from pyqed_tpu.models.shinmetiu2e import ShinMetiu3d
        sm = ShinMetiu3d(nstates=2)
        sm.create_grid([(-4, 4), (-4, 4), (-4, 4)], 17)
        wp, _ = sm.single_point([0.8, 0, 0])
        wm, _ = sm.single_point([-0.8, 0, 0])
        w0, _ = sm.single_point([0.0, 0, 0])
        assert np.max(np.abs(wp - wm)) < 1e-10
        assert w0[0] < wp[0]          # symmetric position more bound
        assert w0[0] < 0 < w0[1] or w0[0] < w0[1]
