"""FMO 7-site exciton-transfer tests (beyond parity — the canonical
multi-bath HEOM workload: Ishizaki & Fleming, PNAS 106, 17255 (2009),
Hamiltonian from Adolphs & Renger, Biophys. J. 91, 2778 (2006)).

Exercises the bath=[(Q, c, nu), ...] multi-operator hierarchy flattening
with SEVEN independent site baths — the largest-M HEOM in the suite.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.models.named import FMO
from pyqed_tpu.units import au2fs


def _populations(res):
    return np.real(np.asarray(res.observables))


class TestFMO:
    def test_hamiltonian_sane(self):
        m = FMO()
        H = np.asarray(m.H)
        assert H.shape == (7, 7)
        assert np.allclose(H, H.conj().T)
        assert abs(np.trace(H)) < 1e-12          # mean removed
        # strongest couplings: 1-2 and 5-6 (cm^-1 values -87.7, 81.1)
        off = np.abs(H - np.diag(np.diag(H)))
        i, j = np.unravel_index(np.argmax(off), off.shape)
        assert {i, j} == {0, 1}

    def test_transfer_300K(self):
        """Site 1 -> 3 transfer at 300 K over 1 ps: trace preserved,
        populations physical, site 1 drains while site 3 fills
        (Ishizaki-Fleming Fig. 2B: p1(1ps) ~ 0.3, p3 monotone rise)."""
        m = FMO()
        sol = m.heom(temperature=300.0, lmax=3, nexp=0)
        dt = 20.0
        nt = int(1000.0 / au2fs / dt)
        res = sol.run(m.initial_state(0), dt=dt, nt=nt, nout=nt // 50,
                      e_ops=m.site_projectors())
        p = _populations(res)
        assert np.max(np.abs(p.sum(axis=1) - 1.0)) < 1e-8
        assert p.min() > -1e-8
        assert 0.15 < p[-1, 0] < 0.45            # site 1 drained
        assert p[-1, 2] > 0.15                   # site 3 filled
        assert np.all(np.diff(p[len(p) // 2:, 2]) > -1e-3)  # ~monotone tail

    @pytest.mark.slow
    def test_coherent_beats_slower_at_77K(self):
        """The site 1<->2 coherent oscillation survives longer at 77 K
        than at 300 K (the hallmark FMO result)."""
        m = FMO()
        dt = 20.0
        nt = int(400.0 / au2fs / dt)

        def beat_amplitude(T):
            sol = m.heom(temperature=T, lmax=3, nexp=1)
            res = sol.run(m.initial_state(0), dt=dt, nt=nt, nout=4,
                          e_ops=m.site_projectors()[:1])
            p1 = _populations(res)[:, 0]
            t = np.asarray(res.times) * au2fs
            late = p1[t > 200.0]                  # oscillation after 200 fs
            return np.max(late) - np.min(late)

        assert beat_amplitude(77.0) > beat_amplitude(300.0) + 0.01

    @pytest.mark.slow
    def test_lmax_convergence(self):
        """Hierarchy depth 3 vs 4 agree at the percent level by 500 fs
        (the 300 K / 35 cm^-1 regime converges fast in lmax)."""
        m = FMO()
        dt = 20.0
        nt = int(500.0 / au2fs / dt)
        p = {}
        for lmax in (3, 4):
            sol = m.heom(temperature=300.0, lmax=lmax, nexp=0)
            res = sol.run(m.initial_state(0), dt=dt, nt=nt, nout=nt,
                          e_ops=m.site_projectors())
            p[lmax] = _populations(res)[-1]
        assert np.max(np.abs(p[3] - p[4])) < 0.01

    @pytest.mark.slow
    def test_weak_coupling_matches_redfield(self):
        """With the reorganization energy scaled down 10x the dynamics is
        Born-Markov; HEOM (same exponential modes) must agree with the
        Redfield populations."""
        dt = 20.0
        nt = int(600.0 / au2fs / dt)

        def deviation(reorg_cm):
            m = FMO(reorg_cm=reorg_cm)
            rho0 = m.initial_state(0)
            e_ops = m.site_projectors()
            sol = m.heom(temperature=300.0, lmax=2, nexp=1)
            p_heom = _populations(sol.run(rho0, dt=dt, nt=nt, nout=nt,
                                          e_ops=e_ops))[-1]
            red = m.redfield(temperature=300.0, nexp=1)
            res = red.evolve(rho0, dt=dt, Nt=nt, e_ops=e_ops)
            p_red = np.real(np.asarray(res.observables))[-1]
            return np.max(np.abs(p_heom - p_red))

        # the spectra are the half-Fourier Gamma(w) of the SAME modes, so
        # decomposition error cancels and the residual is Redfield's
        # beyond-Born-Markov error: small, and strictly shrinking as
        # reorg -> 0 (measured 0.0118 -> 0.0076 for 3.5 -> 1.75 cm^-1)
        d1, d2 = deviation(3.5), deviation(1.75)
        assert d1 < 0.02
        assert d2 < 0.75 * d1
