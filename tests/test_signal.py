"""SOS spectroscopy parity tests against NumPy transcriptions of the
reference loops (pyqed/signal/sos.py)."""
import numpy as np
import jax.numpy as jnp

from pyqed_tpu import Mol, au2ev, au2mev
from pyqed_tpu.signal import (
    absorption, TPA, ESA, GSB, SE, photon_echo, DQC_R1, DQC_R2, cars, etpa,
)
from pyqed_tpu.signal.tdes import ESA as ESA_t, GSB as GSB_t, SE as SE_t
from pyqed_tpu.models.pulse import Biphoton


def make_mol():
    E = np.array([0.0, 0.5, 1.1, 1.3]) / au2ev
    H = np.diag(E)
    dip = np.zeros((4, 4))
    dip[0, 1] = dip[1, 0] = 1.0
    dip[0, 2] = dip[2, 0] = 1.0
    dip[0, 3] = dip[3, 0] = 1.0
    dip[1, 2] = dip[2, 1] = 1.0
    dip[1, 3] = dip[3, 1] = 1.0
    m = Mol(jnp.asarray(H), edip=jnp.asarray(dip), edip_rms=jnp.asarray(dip))
    m.set_decay_for_all(50 / au2mev)
    return m, E, dip


def lorentz_np(x, w):
    return 1 / np.pi * w / (w**2 + x**2)


class TestAbsorption:
    def test_absorption_vs_numpy(self):
        m, E, dip = make_mol()
        omegas = np.linspace(0, 2, 100) / au2ev
        sig = np.asarray(absorption(m, omegas))
        gamma = np.asarray(m.gamma)
        ref = sum(abs(dip[j, 0]) ** 2 * lorentz_np(omegas - E[j], gamma[j])
                  for j in range(1, 4))
        assert np.max(np.abs(sig - ref)) < 1e-10


class TestTPA:
    def test_tpa_vs_numpy_loops(self):
        m, E, dip = make_mol()
        gamma = np.asarray(m.gamma)
        omegaps = np.linspace(0.5, 1.5, 50) / au2ev
        e_idx, f_idx = [1, 2, 3], [2, 3]
        sig = np.asarray(TPA(E, dip, omegaps, None, e_idx, f_idx, gamma))
        # reference transcription (pyqed/signal/sos.py:349-377)
        ref = np.zeros(len(omegaps))
        for k, omegap in enumerate(omegaps):
            w1 = w2 = omegap / 2
            for f in f_idx:
                tmp = 0
                for mm in e_idx:
                    tmp += dip[f, mm] * dip[mm, 0] / (w1 - (E[mm] - E[0]) + 1j * gamma[mm])
                    tmp += dip[f, mm] * dip[mm, 0] / (w2 - (E[mm] - E[0]) + 1j * gamma[mm])
                ref[k] += abs(tmp) ** 2 * lorentz_np(omegap - E[f] + E[0], gamma[f])
        assert np.max(np.abs(sig - ref)) / np.max(np.abs(ref)) < 1e-12


class TestPhotonEcho:
    def _np_pathways(self, E, dip, omega1, omega3, t2, e_idx, f_idx, gamma):
        """Transcription of pyqed/signal/sos.py ESA:498/GSB:624/SE:731 with
        explicit [i=omega1, j=omega3] orientation."""
        n1, n3 = len(omega1), len(omega3)
        esa = np.zeros((n1, n3), dtype=complex)
        gsb = np.zeros((n1, n3), dtype=complex)
        se = np.zeros((n1, n3), dtype=complex)
        a = 0
        for i, w1 in enumerate(omega1):
            for j, w3 in enumerate(omega3):
                for b in e_idx:
                    G_ab = 1 / (w1 - (E[a] - E[b]) + 1j * (gamma[a] + gamma[b]) / 2)
                    # GSB
                    c = 0
                    for d in e_idx:
                        G_dc = 1 / (w3 - (E[d] - E[c]) + 1j * (gamma[d] + gamma[c]) / 2)
                        gsb[i, j] += dip[a, b] * dip[b, c] * dip[c, d] * dip[d, a] * G_dc * G_ab
                    for cc in e_idx:
                        U_cb = -1j * np.exp(-1j * (E[cc] - E[b]) * t2
                                            - (gamma[cc] + gamma[b]) / 2 * t2)
                        # ESA
                        for d in f_idx:
                            G_db = 1 / (w3 - (E[d] - E[b]) + 1j * (gamma[d] + gamma[b]) / 2)
                            esa[i, j] -= (dip[b, a] * dip[cc, a] * dip[d, cc]
                                          * dip[b, d] * G_db * U_cb * G_ab)
                        # SE
                        for d in [0]:
                            G_cd = 1 / (w3 - (E[cc] - E[d]) + 1j * (gamma[cc] + gamma[d]) / 2)
                            se[i, j] += (dip[a, b] * dip[cc, a] * dip[d, cc]
                                         * dip[b, d] * G_cd * U_cb * G_ab)
        return esa, gsb, se

    def test_pathways_vs_numpy(self):
        m, E, dip = make_mol()
        gamma = np.asarray(m.gamma)
        omega1 = -np.linspace(0.3, 1.6, 7) / au2ev
        omega3 = np.linspace(0.3, 1.6, 9) / au2ev
        t2 = 10.0
        e_idx, f_idx, g_idx = [1, 2, 3], [2, 3], [0]
        esa_np, gsb_np, se_np = self._np_pathways(E, dip, omega1, omega3, t2,
                                                  e_idx, f_idx, gamma)
        esa = np.asarray(ESA(E, dip, omega1, omega3, t2, g_idx, e_idx, f_idx, gamma))
        gsb = np.asarray(GSB(E, dip, omega1, omega3, t2, g_idx, e_idx, gamma))
        se = np.asarray(SE(E, dip, omega1, omega3, t2, g_idx, e_idx, gamma))
        assert np.max(np.abs(esa - esa_np)) / np.max(np.abs(esa_np)) < 1e-12
        assert np.max(np.abs(gsb - gsb_np)) / np.max(np.abs(gsb_np)) < 1e-12
        assert np.max(np.abs(se - se_np)) / np.max(np.abs(se_np)) < 1e-12

    def test_photon_echo_api(self):
        m, _, _ = make_mol()
        pump = np.linspace(0.3, 1.6, 20) / au2ev
        probe = np.linspace(0.3, 1.6, 20) / au2ev
        S = photon_echo(m, pump, probe, t2=0.0, e_idx=[1, 2, 3], f_idx=[2, 3])
        assert S.shape == (20, 20)
        assert np.all(np.isfinite(np.asarray(S)))

    def test_time_domain_fourier_consistency(self):
        """FT of the time-domain GSB pathway ~ the frequency-domain GSB at
        matching (w1, w3) (up to grid resolution)."""
        m, E, dip = make_mol()
        gamma = np.asarray(m.gamma)
        e_idx, g_idx = [1, 2, 3], [0]
        t = np.linspace(0, 8000, 8192)
        # GSB(t1, t2=0, t3) — t2 axis length 1
        Rt = np.asarray(GSB_t(E, dip, g_idx, e_idx, gamma, t, np.array([0.0]), t))[:, 0, :]
        # damped FT to (w1>0 as -w1, w3), trapezoid rule
        dt = t[1] - t[0]
        wgt = np.ones(len(t))
        wgt[0] = wgt[-1] = 0.5
        w = np.linspace(0.3, 1.6, 5) / au2ev
        # S(w1, w3) = int dt1 dt3 e^{+i w1 t1} e^{+i w3 t3} R with w1 = -w
        F1 = np.exp(1j * np.outer(-w, t)) * dt * wgt   # (W1, T1) with omega1=-w
        F3 = np.exp(1j * np.outer(w, t)) * dt * wgt
        Sw = F1 @ Rt @ F3.T
        # the time-domain pathway carries U_ac(t2=0) = -i relative to the
        # frequency-domain GSB (which has no t2 propagator)
        Sref = -1j * np.asarray(GSB(E, dip, -w, w, 0.0, g_idx, e_idx, gamma))
        # G(w) from FT of -i theta(t) e^{-iwt-gt} is exact up to grid cutoffs
        assert np.max(np.abs(Sw - Sref)) / np.max(np.abs(Sref)) < 5e-3


class TestDQC:
    def test_dqc_r2_vs_numpy(self):
        m, E, dip = make_mol()
        gamma = np.asarray(m.gamma)
        e_idx, f_idx = [1, 2, 3], [2, 3]
        w2 = np.linspace(0.8, 2.6, 6) / au2ev
        w3 = np.linspace(0.3, 1.6, 5) / au2ev
        tau1 = 5.0
        sig = np.asarray(DQC_R2(E, dip, omega2=w2, omega3=w3, tau1=tau1,
                                e_idx=e_idx, f_idx=f_idx, gamma=gamma))
        ref = np.zeros((len(w2), len(w3)), dtype=complex)
        a = 0
        for i, pump in enumerate(w2):
            for j, probe in enumerate(w3):
                for b in e_idx:
                    U_ba = np.exp(-1j * (E[b] - E[a]) * tau1
                                  - (gamma[b] + gamma[a]) / 2 * tau1)
                    for c in f_idx:
                        G_ca = 1 / (pump - (E[c] - E[a]) + 1j * (gamma[c] + gamma[a]) / 2)
                        for d in e_idx:
                            G_da = 1 / (probe - (E[d] - E[a]) + 1j * (gamma[d] + gamma[a]) / 2)
                            ref[i, j] += (dip[b, a] * dip[c, b] * dip[d, c]
                                          * dip[a, d] * U_ba * G_ca * G_da)
        assert np.max(np.abs(sig - ref)) / np.max(np.abs(ref)) < 1e-12

    def test_dqc_r1_vs_numpy(self):
        m, E, dip = make_mol()
        gamma = np.asarray(m.gamma)
        e_idx, f_idx = [1, 2, 3], [2, 3]
        w2 = np.linspace(0.8, 2.6, 6) / au2ev
        w3 = np.linspace(0.3, 1.6, 5) / au2ev
        tau1 = 5.0
        sig = np.asarray(DQC_R1(E, dip, omega2=w2, omega3=w3, tau1=tau1,
                                e_idx=e_idx, f_idx=f_idx, gamma=gamma))
        ref = np.zeros((len(w2), len(w3)), dtype=complex)
        a = 0
        for i, pump in enumerate(w2):
            for j, probe in enumerate(w3):
                for b in e_idx:
                    U_ba = -1j * np.exp(-1j * (E[b] - E[a]) * tau1
                                        - (gamma[b] + gamma[a]) / 2 * tau1)
                    for c in f_idx:
                        G_ca = 1 / (pump - (E[c] - E[a]) + 1j * (gamma[c] + gamma[a]) / 2)
                        for d in e_idx:
                            G_cd = 1 / (probe - (E[c] - E[d]) + 1j * (gamma[c] + gamma[d]) / 2)
                            ref[i, j] += (dip[b, a] * dip[c, b] * dip[d, a]
                                          * dip[d, c] * U_ba * G_ca * G_cd)
        ref = -ref
        assert np.max(np.abs(sig - ref)) / np.max(np.abs(ref)) < 1e-12


class TestETPA:
    def test_etpa_vs_numpy_loops(self):
        m, E, dip = make_mol()
        epp = Biphoton(0.0, 0.04 / au2ev, Te=10.0 * 41.341)  # Te in au
        p = np.linspace(-0.5, 0.5, 64) / au2ev
        epp.set_grid(jnp.asarray(p), jnp.asarray(p))
        epp.get_jsa()
        pump = np.linspace(0.9, 1.5, 5) / au2ev
        sig = np.asarray(etpa(pump, m, epp, g_idx=0, e_idx=[1], f_idx=[2, 3]))

        t1, t2, jta = [np.asarray(x) for x in epp.get_jta()]
        T1, T2 = np.meshgrid(t1, t2)
        theta = np.heaviside(T2 - T1, 0.5)
        ref = np.zeros(len(pump), dtype=complex)
        for j, omegap in enumerate(pump):
            w1 = w2 = omegap / 2
            for f in [2, 3]:
                for e in [1]:
                    D = dip[e, 0] * dip[f, e]
                    det2 = E[f] - E[e] - w2
                    det1 = E[e] - E[0] - w1
                    ref[j] += D * np.sum(theta * np.exp(1j * det2 * T2 + 1j * det1 * T1) * jta)
                    ref[j] += D * np.sum(theta * np.exp(1j * det2 * T2 + 1j * det1 * T1) * jta.T)
        assert np.max(np.abs(sig - ref)) / np.max(np.abs(ref)) < 1e-10


class TestCars:
    def test_cars_shape_and_finite(self):
        m, E, dip = make_mol()
        shift = np.linspace(0, 1, 32) / au2ev
        omega1 = np.linspace(0.4, 1.6, 16) / au2ev
        S = np.asarray(cars(E, dip, shift, omega1))
        assert S.shape == (32, 16)
        assert np.all(np.isfinite(S))


class TestT2Batch:
    def test_t2series_matches_loop(self):
        m, E, dip = make_mol()
        from pyqed_tpu.signal.sos import photon_echo_t2series
        from pyqed_tpu.signal import photon_echo
        pump = np.linspace(0.3, 1.6, 10) / au2ev
        t2s = np.array([0.0, 5.0, 20.0])
        S = np.asarray(photon_echo_t2series(m, pump, pump, t2s,
                                            e_idx=[1, 2, 3], f_idx=[2, 3]))
        for i, t2 in enumerate(t2s):
            ref = np.asarray(photon_echo(m, pump, pump, t2=t2,
                                         e_idx=[1, 2, 3], f_idx=[2, 3]))
            assert np.allclose(S[i], ref, rtol=1e-12), t2


def test_photon_echo_factored_equals_vmapped():
    """Low-rank factored t2-series == vmapped pathway sum (exact
    algebraic identity; machine precision)."""
    import numpy as np
    from pyqed_tpu.models.mol import Mol
    from pyqed_tpu.signal.sos import (photon_echo_t2series,
                                      photon_echo_t2series_factored)
    rng = np.random.default_rng(5)
    E = np.array([0.0, 1.0, 1.1, 1.25, 2.1, 2.3])
    dip = rng.random((6, 6))
    dip = dip + dip.T
    mol = Mol(np.diag(E), dip)
    mol.gamma = np.array([0.0, 0.02, 0.03, 0.025, 0.05, 0.06])
    w = np.linspace(0.8, 1.4, 41)
    t2s = [0.0, 3.0, 10.0]
    S1 = np.asarray(photon_echo_t2series(mol, w, w, t2s,
                                         e_idx=[1, 2, 3], f_idx=[4, 5]))
    S2 = np.asarray(photon_echo_t2series_factored(mol, w, w, t2s,
                                                  e_idx=[1, 2, 3],
                                                  f_idx=[4, 5]))
    assert np.max(np.abs(S1 - S2)) / np.max(np.abs(S1)) < 1e-12
