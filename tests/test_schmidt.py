"""Schmidt decomposition / HOM-via-Schmidt (models/pulse.py).

Reference: pyqed/optics.py:881,922 — hom_schmidt there references an
undefined variable and schmidt_decompose's svd path raises; both are
made real here and cross-validated.
"""
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.models.pulse import (Biphoton, hom, hom_schmidt,
                                    schmidt_decompose, schmidt_number,
                                    field_to_intensity, intensity_to_field,
                                    fwhm_to_std, std_to_fwhm)


def _jsa_grid():
    p = np.linspace(-0.3, 0.3, 64)
    q = np.linspace(-0.3, 0.3, 64)
    b = Biphoton(omegap=2.0, bw=0.04, Te=40.0, phase_matching="Gaussian")
    b.set_grid(p, q)
    f = np.asarray(b.get_jsa())
    return p, q, f


def test_schmidt_reconstruction():
    p, q, f = _jsa_grid()
    dp, dq = p[1] - p[0], q[1] - q[0]
    s, phi, chi = schmidt_decompose(f, dp, dq, nmodes=min(f.shape))
    rec = np.einsum("a, pa, qa -> pq", np.asarray(s), np.asarray(phi),
                    np.asarray(chi))
    assert np.max(np.abs(rec - f)) < 1e-10
    # mode orthonormality with continuum measure
    G = np.asarray(phi).T.conj() @ np.asarray(phi) * dp
    assert np.allclose(G, np.eye(G.shape[0]), atol=1e-10)


def test_schmidt_number_limits():
    p, q, _ = _jsa_grid()
    dp, dq = p[1] - p[0], q[1] - q[0]
    P, Q = np.meshgrid(p, q, indexing="ij")
    # separable JSA -> K = 1
    sep = np.exp(-P ** 2 / 0.01) * np.exp(-Q ** 2 / 0.02)
    assert abs(schmidt_number(sep, dp, dq) - 1.0) < 1e-10
    # strongly (anti)correlated -> K >> 1
    corr = np.exp(-(P + Q) ** 2 / 2e-4) * np.exp(-(P - Q) ** 2 / 2e-1)
    assert schmidt_number(corr, dp, dq) > 5.0


def test_hom_schmidt_matches_direct():
    p, q, f = _jsa_grid()
    tau = np.linspace(-300.0, 300.0, 31)
    direct = np.asarray(hom(p, q, jnp.asarray(f), tau))
    via_schmidt = np.asarray(hom_schmidt(p, q, f, tau, nmodes=40))
    assert np.max(np.abs(direct - via_schmidt)) < 1e-6


def test_rdm_vs_svd_schmidt_coeffs():
    p, q, f = _jsa_grid()
    dp, dq = p[1] - p[0], q[1] - q[0]
    s1, _, _ = schmidt_decompose(f, dp, dq, nmodes=6, method="svd")
    s2, _, _ = schmidt_decompose(f, dp, dq, nmodes=6, method="rdm")
    assert np.allclose(np.asarray(s1), np.asarray(s2), atol=1e-8)


def test_field_intensity_roundtrip():
    E = 0.003
    assert abs(intensity_to_field(field_to_intensity(E)) - E) < 1e-15
    assert abs(fwhm_to_std(std_to_fwhm(7.3)) - 7.3) < 1e-12


def test_coherent_state():
    """a|alpha> = alpha|alpha>, Poisson number distribution."""
    import math
    from pyqed_tpu.ops.operators import coherent, coherent_dm, destroy
    N, al = 40, 0.7 + 0.3j
    psi = np.asarray(coherent(N, al))
    a = np.zeros((N, N))
    a[np.arange(N - 1), np.arange(1, N)] = np.sqrt(np.arange(1, N))
    ev = psi.conj() @ (a @ psi)
    assert abs(ev - al) < 1e-12
    n = np.arange(N)
    exact = np.exp(-abs(al) ** 2) * abs(al) ** (2 * n) / np.array(
        [math.factorial(int(k)) for k in n])
    assert np.max(np.abs(np.abs(psi) ** 2 - exact)) < 1e-12
    dm = np.asarray(coherent_dm(N, al))
    assert abs(np.trace(dm) - 1.0) < 1e-12
    assert np.max(np.abs(dm - np.outer(psi, psi.conj()))) < 1e-14


def test_schmidt_complex_chirped_jsa():
    """Complex (chirped) JSA: reconstruction and HOM-via-Schmidt hold
    (regression: svd chi was conjugated, rdm chi over-normalized)."""
    import jax.numpy as jnp
    from pyqed_tpu.models.pulse import hom
    p = np.linspace(-0.3, 0.3, 64)
    q = np.linspace(-0.3, 0.3, 64)
    P, Q = np.meshgrid(p, q, indexing="ij")
    f = (np.exp(-(P + Q) ** 2 / 0.002 - (P - Q) ** 2 / 0.05)
         * np.exp(1j * 40 * P * Q))
    dp, dq = p[1] - p[0], q[1] - q[0]
    for m in ("svd", "rdm"):
        s, phi, chi = schmidt_decompose(f, dp, dq, nmodes=64, method=m)
        rec = np.einsum("a, pa, qa -> pq", np.asarray(s), np.asarray(phi),
                        np.asarray(chi))
        assert np.max(np.abs(rec - f)) < 1e-7, m
    tau = np.linspace(-300, 300, 21)
    d = np.asarray(hom(p, q, jnp.asarray(f), tau))
    hs = np.asarray(hom_schmidt(p, q, f, tau, nmodes=64))
    assert np.max(np.abs(d - hs)) < 1e-10


class TestBiphotonDetect:
    """Biphoton.pump/detect (reference: pyqed/optics.py — pump references
    undefined globals there; _detection_amplitude transcribed from the
    physics)."""

    def _epp(self):
        from pyqed_tpu.models.pulse import Biphoton
        from pyqed_tpu.units import au2ev, au2fs
        p = np.linspace(-2, 2, 64) / au2ev
        epp = Biphoton(omegap=3 / au2ev, bw=0.2 / au2ev, Te=10 / au2fs,
                       p=p, q=p)
        epp.get_jsa()
        return epp

    def test_pump_normalized_gaussian_ridge(self):
        epp = self._epp()
        a = np.asarray(epp.pump())
        # peak on the anti-diagonal p + q = 0
        i, j = np.unravel_index(np.argmax(a), a.shape)
        assert abs(epp.p[i] + epp.q[j]) < 2 * (epp.p[1] - epp.p[0])
        # |alpha|^2 integrates to 1 along the p+q axis
        s = np.linspace(-4, 4, 2001) / 27.211386245988
        bw = epp.pump_bandwidth
        val = np.trapezoid(np.abs(np.sqrt(1 / (np.sqrt(2 * np.pi) * bw))
                                  * np.exp(-s**2 / (4 * bw**2))) ** 2, s)
        assert abs(val - 1.0) < 1e-6

    def test_detect_symmetric_exchange(self):
        """With omega_s = omega_i the detection amplitude is symmetric
        under t1 <-> t2 when the JTA is exchange-symmetric."""
        epp = self._epp()
        t1, t2, d = epp.detect()
        d = np.asarray(d)
        assert d.shape == (len(epp.p), len(epp.q))
        # JSA symmetric in (p, q) -> d(t1,t2) = d(t2,t1)
        assert np.allclose(d, d.T, atol=1e-8 * np.abs(d).max())
        assert np.abs(d).max() > 0
