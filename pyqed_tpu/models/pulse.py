"""Laser pulses and entangled-photon (biphoton) sources.

TPU-native counterpart of the reference optics module
(reference: pyqed/optics.py — ``Pulse:230``, ``GaussianPulse:353``,
``ChirpedPulse:454``, ``Biphoton:545``, ``intensity_to_field:22``,
``_jsa:791``, ``jta:737``, ``rdm:761``, ``hom:844``).

All field evaluations are jnp-traceable so pulses can be evaluated inside
jitted RK4 stages (the reference re-evaluates ``pulse.efield(t)`` per stage
in Python: pyqed/mol.py:1903).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..units import au2ev, au2fs, alpha as fine_structure, au2watt_per_centimeter_squared
from ..ops.math import rect, sinc, interval
from ..ops.linalg import dag

FWHM_FACTOR = 2.3548200450309493  # 2 sqrt(2 ln 2)


def intensity_to_field(I):
    """E (a.u.) from intensity in W/cm^2 (reference: pyqed/optics.py:22)."""
    return np.sqrt(2.0 * I * 4.0 * np.pi / au2watt_per_centimeter_squared / fine_structure)


def std_to_fwhm(tau):
    return FWHM_FACTOR * tau


class Pulse:
    """Gaussian pulse; ``efield`` returns the *real* field
    Re[A e^{-(t-tc)^2/2tau^2} e^{-i w (t-tc)}]
    (reference: pyqed/optics.py:230-340)."""

    def __init__(self, omegac=3.0 / au2ev, tau=5.0 / au2fs, tc=0.0, delay=0.0,
                 amplitude=0.001, intensity=None, cep=0.0, beta=0.0,
                 polarization=None):
        self.delay = delay
        self.tc = tc
        self.tau = tau
        self.fwhm = tau * FWHM_FACTOR
        self.sigma = tau
        self.omegac = omegac
        self.unit = 'au'
        self.amplitude = intensity_to_field(intensity) if intensity is not None else amplitude
        self.cep = cep
        self.bandwidth = 1.0 / tau
        self.duration = 2.0 * tau
        self.beta = beta
        self.ndim = 1
        self.polarization = polarization

    def envelop(self, t):
        return self.amplitude * jnp.exp(-((t - self.tc) ** 2) / 2.0 / self.tau**2)

    def spectrum(self, omega):
        return (self.amplitude * self.tau * jnp.sqrt(2.0 * jnp.pi)
                * jnp.exp(-((omega - self.omegac) ** 2) * self.tau**2 / 2.0))

    def efield(self, t):
        E = (self.amplitude
             * jnp.exp(-((t - self.tc) ** 2) / 2.0 / self.tau**2)
             * jnp.exp(-1j * self.omegac * (t - self.tc)))
        return jnp.real(E)

    def field(self, t):
        return self.efield(t)

    def efield_complex(self, t):
        """Positive-frequency analytic field (half the real field's analytic
        signal, used by perturbative signal drivers)."""
        return (self.amplitude
                * jnp.exp(-((t - self.tc) ** 2) / 2.0 / self.tau**2)
                * jnp.exp(-1j * self.omegac * (t - self.tc)))

    def E(self, t):
        if self.polarization is None:
            raise ValueError("polarization not set")
        pol = jnp.asarray(self.polarization)
        return jnp.real(pol * self.efield_complex(t))


class GaussianPulse(Pulse):
    """cos-carrier Gaussian pulse (reference: pyqed/optics.py:353-455)."""

    def efield(self, t):
        return (self.amplitude
                * jnp.exp(-((t - self.tc) ** 2) / 2.0 / self.tau**2)
                * jnp.cos(self.omegac * (t - self.tc)))


class ChirpedPulse(Pulse):
    """Linearly chirped Gaussian pulse (reference: pyqed/optics.py:454-545)."""

    def efield(self, t):
        u = t - self.tc
        E = (self.amplitude * jnp.exp(-(u**2) / 2.0 / self.tau**2)
             * jnp.exp(-1j * self.omegac * u)
             * jnp.exp(-1j * self.beta * self.omegac * u**2 / self.tau))
        return jnp.real(E)

    def spectrum(self, omega):
        a = 0.5 / self.tau**2 + 1j * self.beta * self.omegac / self.tau
        return (self.amplitude * jnp.sqrt(jnp.pi / a)
                * jnp.exp(-((omega - self.omegac) ** 2) / 4.0 / a))


# --------------------------------------------------------------- biphoton

def jsa(p, q, pump_bw, model="sinc", Te=None):
    """Joint spectral amplitude for an SPDC pair
    (reference: pyqed/optics.py:791-836)."""
    P, Q = jnp.meshgrid(p, q)
    sigma_plus = pump_bw

    pump = (jnp.sqrt(1.0 / (jnp.sqrt(2.0 * jnp.pi) * sigma_plus))
            * jnp.exp(-((P + Q) ** 2) / 4.0 / sigma_plus**2))

    if model == "Gaussian":
        sigma_minus = 1.0 / Te
        beta = (jnp.sqrt(1.0 / jnp.sqrt(2.0 * jnp.pi) / sigma_minus)
                * jnp.exp(-((P - Q) ** 2) / 4.0 / sigma_minus**2))
        return jnp.sqrt(2.0) * pump * beta
    elif model == "sinc":
        beta = jnp.sqrt(0.5 * Te / jnp.pi) * sinc(Te * (P - Q) / 4.0)
        return pump * beta
    raise ValueError(f"unknown phase-matching model {model!r}")


def jta(t2, t1, omegap, sigmap, Te):
    """Analytic joint temporal amplitude for type-II SPDC
    (reference: pyqed/optics.py:737-760)."""
    omegas = omegap / 2.0
    omegai = omegap / 2.0
    tau = t2 - t1
    return (jnp.sqrt(sigmap / Te) * (2.0 * jnp.pi) ** 0.75
            * rect(tau / 2.0 / Te)
            * jnp.exp(-(sigmap**2) * (t1 + t2) ** 2 / 4.0)
            * jnp.exp(-1j * omegas * t1 - 1j * omegai * t2))


def rdm(f, dx=1.0, dy=1.0, which="x"):
    """Reduced density matrix of a 2D amplitude
    (reference: pyqed/optics.py:761)."""
    f = jnp.asarray(f)
    if which == "x":
        return f @ dag(f) * dy
    elif which == "y":
        return f.T @ jnp.conj(f) * dx
    raise ValueError("which can only be x or y.")


def hom(p, q, f, tau):
    """Hong-Ou-Mandel coincidence dip (reference: pyqed/optics.py:844),
    vectorized over the delay array."""
    dp = interval(p)
    dq = interval(q)
    P, Q = jnp.meshgrid(p, q)
    phases = jnp.exp(1j * (P - Q)[None, :, :] * jnp.asarray(tau)[:, None, None])
    overlap = jnp.sum(f.conj()[None] * f.T[None] * phases, axis=(1, 2)).real * dp * dq
    return 0.5 - 0.5 * overlap


class Biphoton:
    """Entangled photon pair (reference: pyqed/optics.py:545-760)."""

    def __init__(self, omegap, bw, Te, p=None, q=None, phase_matching="sinc"):
        self.omegap = omegap
        self.pump_bandwidth = bw
        self.phase_matching = phase_matching
        self.signal_center_frequency = omegap / 2.0
        self.idler_center_frequency = omegap / 2.0
        self.entanglement_time = Te
        self.jsa = None
        self.jta = None
        self.p = p
        self.q = q
        if p is not None:
            self.dp = interval(p)
            self.dq = interval(q)
        self.grid = [p, q]

    def set_grid(self, p, q):
        self.p, self.q = p, q
        self.dp, self.dq = interval(p), interval(q)

    def get_jsa(self):
        self.jsa = jsa(self.p, self.q, self.pump_bandwidth,
                       model=self.phase_matching, Te=self.entanglement_time)
        return self.jsa

    def get_jta(self):
        from ..ops.fft import fft2
        if self.jsa is None:
            raise ValueError("jsa is None. Call get_jsa() first.")
        ts, ti, jta_ = fft2(self.jsa, self.dp, self.dq)
        self.jta = jta_
        return ts, ti, jta_

    def pump(self, bandwidth=None):
        """Pump spectral envelope alpha(p + q) on the (p, q) grid
        (reference: pyqed/optics.py Biphoton.pump — which references
        undefined globals p, q there; evaluated on the stored grid
        here)."""
        if bandwidth is None:
            bandwidth = self.pump_bandwidth
        P, Q = jnp.meshgrid(jnp.asarray(self.p), jnp.asarray(self.q),
                            indexing="ij")
        return jnp.sqrt(1.0 / (jnp.sqrt(2.0 * jnp.pi) * bandwidth)) * \
            jnp.exp(-(P + Q) ** 2 / (4.0 * bandwidth ** 2))

    def detect(self):
        """Two-photon detection amplitude <0|E(t1)E(t2)|Phi> on the
        temporal grid conjugate to (p, q): both photon-ordering terms,
        carrier phases restored (reference: pyqed/optics.py
        ``_detection_amplitude``). Returns (t1, t2, d)."""
        from ..ops.fft import fft2
        if self.jsa is None:
            raise ValueError("Please call get_jsa() first.")
        om_s = self.signal_center_frequency
        om_i = self.idler_center_frequency
        t1, t2, jta_ = fft2(self.jsa, self.dp, self.dq)
        T1, T2 = jnp.meshgrid(jnp.asarray(t1), jnp.asarray(t2))
        amp = jnp.sqrt(om_s * om_i)
        d = (jnp.exp(-1j * om_i * T1 - 1j * om_s * T2) * amp * jta_.T
             + jnp.exp(-1j * om_s * T1 - 1j * om_i * T2) * amp * jta_)
        return t1, t2, d

    def bandwidth(self, which="signal"):
        p, q = self.p, self.q
        dp, dq = interval(p), interval(q)
        f = self.jsa
        if which == "signal":
            rho = rdm(f, dy=dq, which="x")
            return jnp.sqrt(jnp.diagonal(rho) @ (p**2) * dp).real
        rho = rdm(f, dx=dp, which="y")
        return jnp.sqrt(jnp.diagonal(rho) @ (q**2) * dq).real

    def rdm(self, which="signal"):
        if which == "signal":
            return rdm(self.jsa, dy=self.dq, which="x")
        return rdm(self.jsa, dx=self.dp, which="y")

    def schmidt_number(self):
        """Schmidt number K of the JSA (effective mode count)."""
        if self.jsa is None:
            self.get_jsa()
        return schmidt_number(self.jsa, self.dp, self.dq)

    def g2(self):
        """Unheralded second-order coherence of the signal beam
        (reference: pyqed/optics.py:672 ``Biphoton.g2`` — a ``pass``
        stub, made real).

        For SPDC twin beams each marginal is a K-mode thermal state, so
        g2(0) = 1 + Tr(rho_s^2) = 1 + 1/K  with K the Schmidt number:
        2 for a separable (single-Schmidt-mode) JSA, -> 1 for highly
        entangled multimode light."""
        return 1.0 + 1.0 / self.schmidt_number()


class Analyser:
    """Pulse characterization: FROG trace and spectrogram of a sampled
    field (reference: pyqed/optics.py:182 ``Analyser`` — FROG:190,
    spectrogram:212).

    The SHG-FROG trace I(w, tau) = |int dt E(t) E(t - tau) e^{i w t}|^2
    is one vmapped FFT over the gate-delay axis."""

    def __init__(self, E, t):
        self.E = jnp.asarray(E)
        self.t = np.asarray(t)
        self.dt = float(self.t[1] - self.t[0])

    def frog(self, gate=None):
        """Returns (omega, tau, trace (nw, ntau)) — SHG FROG when
        gate is None (gate = the field itself)."""
        E = self.E
        g = E if gate is None else jnp.asarray(gate)
        n = E.size
        shifts = jnp.arange(-(n // 2), n // 2)

        def one(s):
            gs = jnp.roll(g, s)
            mask = jnp.where(s >= 0, jnp.arange(n) >= s,
                             jnp.arange(n) < n + s)
            sig = E * gs * mask
            return jnp.abs(jnp.fft.fftshift(
                jnp.fft.fft(sig))) ** 2 * self.dt ** 2

        trace = jax.vmap(one)(shifts).T        # (nw, ntau)
        omega = 2 * np.pi * np.fft.fftshift(np.fft.fftfreq(n, self.dt))
        tau = shifts * self.dt
        return omega, np.asarray(tau), trace

    FROG = frog

    def spectrogram(self, window_width=None):
        """Gated power spectrum with a Gaussian gate (Wigner-style
        spectrogram; reference pyqed/optics.py:212)."""
        n = self.E.size
        w = window_width or (self.t[-1] - self.t[0]) / 10
        gate = jnp.exp(-((self.t - self.t[n // 2]) / w) ** 2)
        return self.frog(gate=gate)


def field_to_intensity(E):
    """Intensity (W/cm^2) from field amplitude (a.u.) — inverse of
    ``intensity_to_field`` (reference: pyqed/optics.py)."""
    return E ** 2 * au2watt_per_centimeter_squared * fine_structure \
        / (8.0 * np.pi)


def fwhm_to_std(fwhm):
    """Gaussian sigma from FWHM (reference: pyqed/optics.py)."""
    return fwhm / FWHM_FACTOR


def schmidt_decompose(f, dp, dq, nmodes=5, method="svd"):
    """Schmidt decomposition of a joint spectral amplitude:
    f(p, q) = sum_a s_a phi_a(p) chi_a(q)
    (reference: pyqed/optics.py:922 — its 'rdm' path uses a plain
    ``np.linalg.eig`` on the non-symmetrized kernels and its 'svd' path
    raises NotImplementedError; here SVD is the primary, numerically
    orthogonal route, with 'rdm' kept via eigh of the Hermitian kernels).

    Returns (s (nmodes,), phi (np, nmodes), chi (nq, nmodes)) with
    continuum normalization int |phi|^2 dp = 1.
    """
    f = jnp.asarray(f)
    if method == "svd":
        U, S, Vh = jnp.linalg.svd(f, full_matrices=False)
        s = S * jnp.sqrt(dp * dq)
        phi = U / jnp.sqrt(dp)
        # f = U S Vh -> chi_a(q) = Vh[a, q] (NOT its conjugate: conjugating
        # breaks f = sum_a s_a phi_a chi_a for complex/chirped JSAs)
        chi = Vh.T / jnp.sqrt(dq)
    elif method == "rdm":
        k1 = f @ jnp.conj(f).T * dp * dq
        w1, phi = jnp.linalg.eigh(k1)
        idx = jnp.argsort(w1)[::-1]
        w1, phi = w1[idx], phi[:, idx]
        s = jnp.sqrt(jnp.clip(w1, 0))
        phi = phi / jnp.sqrt(dp)
        # partner modes: s_a chi_a(q) = sum_p conj(phi_a(p)) f(p, q) dp —
        # already continuum-normalized (no extra 1/sqrt(dq))
        chi = f.T @ jnp.conj(phi) * dp
        chi = chi / jnp.maximum(s[None, :], 1e-300)
    else:
        raise ValueError(method)
    return s[:nmodes], phi[:, :nmodes], chi[:, :nmodes]


def schmidt_number(f, dp, dq):
    """Entanglement (Schmidt) number K = (sum s^2)^2 / sum s^4."""
    s, _, _ = schmidt_decompose(f, dp, dq, nmodes=min(f.shape))
    s2 = s ** 2
    return float(jnp.sum(s2) ** 2 / jnp.sum(s2 ** 2))


def hom_schmidt(p, q, f, tau, nmodes=8):
    """HOM coincidence via Schmidt modes (reference:
    pyqed/optics.py:881 — the reference body references an undefined
    ``tau`` and never ran; made real here, validated against the direct
    ``hom`` integral in tests)."""
    p = jnp.asarray(p)
    q = jnp.asarray(q)
    dp = float(p[1] - p[0])
    dq = float(q[1] - q[0])
    s, phi, chi = schmidt_decompose(f, dp, dq, nmodes=nmodes)
    tau = jnp.asarray(tau)
    # tmp1[a,b](t) = int dp phi_a*(p) chi_b(p) e^{i p t}
    eip = jnp.exp(1j * p[None, :] * tau[:, None])      # (nt, np)
    A = jnp.einsum("pa, pb, tp -> tab", jnp.conj(phi), chi, eip) * dp
    eiq = jnp.exp(-1j * q[None, :] * tau[:, None])
    B = jnp.einsum("qb, qa, tq -> tab", phi, jnp.conj(chi), eiq) * dq
    corr = jnp.einsum("a, b, tab, tab -> t", s, s, A, B)
    return 0.5 - 0.5 * jnp.real(corr)
