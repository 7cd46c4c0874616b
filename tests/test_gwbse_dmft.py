"""Tests: GW-BSE, real-time TDHF, IPT-DMFT, electron-phonon Migdal
(round-1 VERDICT coverage row 44 — all four were absent; the reference
modules are stubs/pseudocode, so physics oracles are used instead)."""
import numpy as np
import pytest

from pyqed_tpu.qchem.mol import Molecule
from pyqed_tpu.qchem.tdscf import TDHF
from pyqed_tpu.negf.gwbse import GWBSE
from pyqed_tpu.negf.rt_tdhf import RTTDHF
from pyqed_tpu.negf.dmft import DMFT
from pyqed_tpu.negf.eph import (band, gf0, gf0_ph, fan_migdal_sigma,
                                spectral_function)


@pytest.fixture(scope="module")
def h2():
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))],
                   basis="sto-3g")
    return mol.RHF().run()


@pytest.fixture(scope="module")
def h2_631g():
    mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))],
                   basis="6-31g")
    return mol.RHF().run()


class TestGWBSE:
    def test_unscreened_hf_equals_tdhf(self, h2_631g):
        """BSE with HF energies and no screening must reproduce TDHF
        exactly — the internal consistency anchor."""
        bse = GWBSE(h2_631g)
        e_u = np.sort(bse.run(use_gw=False, screened=False))
        e_t = np.sort(TDHF(h2_631g).run(nroots=len(e_u)))
        assert np.max(np.abs(e_u[:4] - e_t[:4])) < 1e-10

    def test_full_gwbse(self, h2_631g):
        bse = GWBSE(h2_631g)
        e_gw = bse.run_gw()
        # GW widens the HF HOMO-LUMO gap slightly for H2
        assert np.all(np.isfinite(e_gw))
        e_bse = np.sort(bse.run())
        e_t = np.sort(TDHF(h2_631g).run(nroots=len(e_bse)))
        assert np.all(np.isfinite(e_bse)) and e_bse[0] > 0
        # screening red-shifts the lowest excitation vs bare TDHF
        assert e_bse[0] < e_t[0]


class TestRTTDHF:
    def test_kick_matches_linear_response(self, h2):
        e_lr = TDHF(h2).run(nroots=1)[0]
        rt = RTTDHF(h2)
        freqs, S = rt.absorption(dt=0.05, nt=6000, kick=1e-3)
        peak = freqs[np.argmax(np.abs(S))]
        assert abs(peak - e_lr) < 0.01

    def test_trace_conserved(self, h2):
        rt = RTTDHF(h2)
        rt.run(dt=0.05, nt=500, kick=1e-2)
        assert abs(np.trace(np.asarray(rt.P)).real - 2.0) < 1e-8


class TestDMFT:
    def test_metal_vs_mott(self):
        """Small U: quasiparticle weight near 1 and finite A(0);
        large U: Mott insulator (|G(iw_0)| collapses)."""
        metal = DMFT(U=0.5, t=0.5, beta=16)
        metal.run()
        ins = DMFT(U=4.0, t=0.5, beta=16)
        ins.run()
        assert 0.8 < metal.quasiparticle_weight() < 1.0
        # Z falls monotonically with U (the r4 sign fix: the acausal
        # kernel had Z RISING to 12 at U=2)
        zs = []
        for U in (1.0, 2.0, 3.0):
            d = DMFT(U=U, t=0.5, beta=16)
            d.run()
            zs.append(d.quasiparticle_weight())
        assert metal.quasiparticle_weight() > zs[0] > zs[1] > zs[2] > 0
        assert zs[2] < 0.1                     # deep Mott side
        # causality: Im Sigma(iw_n) <= 0 on the upper branch
        import numpy as np
        assert np.all(metal.Sigma.imag[:8] < 1e-12)
        # -Im G(iw0) ~ pi*A(0): metallic stays near the U=0 value 2/pi*...
        a_metal = -metal.G[0].imag
        a_ins = -ins.G[0].imag
        assert a_metal > 3 * a_ins
        assert abs(metal.density() - 0.5) < 1e-6

    def test_u0_semicircular(self):
        d = DMFT(U=0.0, t=0.5, beta=16)
        G = d.run(niter=5)
        iw = d.iw
        Gfree = 2.0 / (iw + np.sqrt(iw ** 2 - 1.0))
        assert np.max(np.abs(G - Gfree)) < 1e-8


class TestEPh:
    def test_free_gfs(self):
        w = np.linspace(-3, 3, 11)
        g = np.asarray(gf0(w, np.array([0.5]), eta=0.1))
        assert np.allclose(g[:, 0], 1.0 / (w - 0.5 + 0.1j))
        d = np.asarray(gf0_ph(w, 1.0, eta=0.1))
        assert np.all(np.isfinite(d))

    def test_migdal_qp_shift_and_sideband(self):
        """Holstein band bottom: QP shifts DOWN; spectral weight is
        depleted from the bare pole."""
        ws = np.linspace(-4, 2, 1201)
        A0 = np.asarray(spectral_function(ws, [0.0], g=0.0, w0=0.5,
                                          eta=2e-2))[:, 0]
        A = np.asarray(spectral_function(ws, [0.0], g=0.6, w0=0.5,
                                         eta=2e-2))[:, 0]
        peak0 = ws[np.argmax(A0)]
        peak = ws[np.argmax(A)]
        assert abs(peak0 - (-2.0)) < 0.02
        assert peak < peak0 - 0.02     # polaron shift
        # sum rule approximately preserved
        dw = ws[1] - ws[0]
        assert abs(np.sum(A) * dw - 1.0) < 0.05
