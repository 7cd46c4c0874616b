"""Pump-probe (transient absorption) and third-order susceptibility.

TPU-native counterparts of the reference's pump-probe driver and
response-function module (reference: pyqed/signal/sos.py:56
``TransientAbsorption`` + ``_fft``:108; pyqed/susceptibility.py —
``response1_freq``..``response4_freq``, mixed time/frequency-domain
third-order response of a multi-level system).

Design: the reference loops driven SESolver runs over probe delays in
Python; here ONE jitted ``lax.scan`` propagates the driven TDSE and the
whole delay batch rides a single ``vmap`` — the polarization difference
and the windowed Fourier transform stay on device.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


# ====================================================== pump-probe (TA)

class TransientAbsorption:
    """Pump-probe transient absorption of an N-level system
    (reference: pyqed/signal/sos.py:56).

    Parameters
    ----------
    mol : Mol-like (H, edip attributes).
    pump, probe : Pulse objects (probe.delay is overridden per delay).
    delays : (nd,) probe delays.
    """

    def __init__(self, mol, pump, probe, delays):
        self.mol = mol
        self.pump = pump
        self.probe = probe
        self.delays = jnp.asarray(delays)

    def run(self, dt, nt, freqs=None, t0=None, damp=1e-5):
        """Returns (freqs, S (nfreq, ndelays)) — the dispersed
        pump-probe spectrum from the probe-induced polarization.
        """
        mol = self.mol
        H = jnp.asarray(mol.H).astype(complex)
        mu = jnp.asarray(mol.edip).astype(complex)
        w0, v0 = jnp.linalg.eigh(H)
        psi0 = v0[:, 0]

        pump, probe = self.pump, self.probe
        if t0 is None:
            t0 = -5.0 * pump.duration
        if freqs is None:
            freqs = jnp.linspace(0.0, 2.0 * float(jnp.max(w0 - w0[0])), 200)
        freqs = jnp.asarray(freqs)
        times = t0 + dt * jnp.arange(nt)

        def evolve(delay, with_probe):
            def rhs(psi, t):
                E = pump.efield(t)
                E = E + jnp.where(with_probe,
                                  probe.efield(t - delay), 0.0)
                Ht = H - E * mu
                return -1j * (Ht @ psi)

            def step(carry, t):
                psi = carry
                k1 = rhs(psi, t)
                k2 = rhs(psi + k1 * (dt / 2), t + dt / 2)
                k3 = rhs(psi + k2 * (dt / 2), t + dt / 2)
                k4 = rhs(psi + k3 * dt, t + dt)
                psi = psi + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
                pol = jnp.vdot(psi, mu @ psi)
                return psi, pol

            _, pol = jax.lax.scan(step, psi0.astype(complex), times)
            return pol

        @jax.jit
        def spectrum(delays):
            pol0 = evolve(0.0, False)

            def one(delay):
                dp = evolve(delay, True) - pol0
                # windowed FT about the probe arrival
                # (reference _fft: sos.py:108)
                phase = jnp.exp(1j * freqs[:, None]
                                * (times - delay)[None, :]
                                - damp * ((times - delay) ** 2)[None, :])
                return phase @ dp * dt

            return jax.vmap(one)(delays).T     # (nfreq, ndelays)

        S = spectrum(self.delays)
        return np.asarray(freqs), S


# =============================================== third-order responses

def _G(en, gamma, a, b, omega):
    """Frequency-domain Green's function G_ab(w)
    (reference: pyqed/susceptibility.py:17)."""
    return 1.0 / (omega - (en[a] - en[b])
                  + 0.5j * (gamma[a] + gamma[b]))


def _lineshape(en, gamma, a, b, t):
    """(reference: pyqed/susceptibility.py:13), t >= 0."""
    return jnp.exp(-1j * (en[a] - en[b]) * t
                   - 0.5 * (gamma[a] + gamma[b]) * t)


def _resp_core(en, dip, gamma, omega1, omega3, t2, kind):
    """Vectorized R_k(w3, t2, w1): the reference's triple state loops
    (susceptibility.py:20-60) contracted into one einsum over (b, c, d)
    with broadcast (w1, w3) grids."""
    en = jnp.asarray(en)
    dip = jnp.asarray(dip)
    gamma = jnp.asarray(gamma)
    n = en.shape[0]
    w1 = jnp.asarray(omega1).reshape(-1)
    w3 = jnp.asarray(omega3).reshape(-1)
    a = 0

    d4 = jnp.einsum("b, bc, cd, d -> bcd", dip[a, :], dip, dip, dip[:, a])
    Ed = en[:, None] - en[None, :]
    Gm = lambda w: 1.0 / (w[:, None, None] - Ed[None, :, :]
                          + 0.5j * (gamma[:, None] + gamma[None, :]))
    G3 = Gm(w3)   # (nw3, n, n)
    G1 = Gm(w1)
    U = jnp.exp(-1j * Ed * t2 - 0.5 * (gamma[:, None] + gamma[None, :]) * t2)

    if kind == 1:       # G(d,c,w3) U(d,b,t2) G(d,a,w1)
        return jnp.einsum("bcd, xdc, db, yd -> xy",
                          d4, G3, U, G1[:, :, a])
    if kind == 2:       # G(d,c,w3) U(d,b,t2) G(a,b,w1)
        return jnp.einsum("bcd, xdc, db, yb -> xy",
                          d4, G3, U, G1[:, a, :])
    if kind == 3:       # G(d,c,w3) U(a,c,t2) G(a,b,w1)
        return jnp.einsum("bcd, xdc, c, yb -> xy",
                          d4, G3, U[a, :], G1[:, a, :])
    if kind == 4:       # G(d,a,w3) U(c,a,t2) G(d,a,w1)
        return jnp.einsum("bcd, xd, c, yd -> xy",
                          d4, G3[:, :, a], U[:, a], G1[:, :, a])
    raise ValueError(kind)


def response1_freq(en, dip, gamma, omega3, t2, omega1):
    """(reference: pyqed/susceptibility.py:28)."""
    return _resp_core(en, dip, gamma, omega1, omega3, t2, 1)


def response2_freq(en, dip, gamma, omega3, t2, omega1):
    """(reference: pyqed/susceptibility.py:37). Note the reference
    restricts d >= c in its loop; the unrestricted sum is kept here
    (the restriction drops Hermitian-partner terms)."""
    return _resp_core(en, dip, gamma, omega1, omega3, t2, 2)


def response3_freq(en, dip, gamma, omega3, t2, omega1):
    """(reference: pyqed/susceptibility.py:46)."""
    return _resp_core(en, dip, gamma, omega1, omega3, t2, 3)


def response4_freq(en, dip, gamma, omega3, t2, omega1):
    """(reference: pyqed/susceptibility.py:56)."""
    return _resp_core(en, dip, gamma, omega1, omega3, t2, 4)


def chi1(en, dip, gamma, omega):
    """Linear susceptibility chi^(1)(w) of an N-level system in its
    ground state: sum_e |mu_ge|^2 [G_eg(w) - G_ge(w)]."""
    en = jnp.asarray(en)
    dip = jnp.asarray(dip)
    gamma = jnp.asarray(gamma)
    w = jnp.asarray(omega).reshape(-1)
    de = en - en[0]
    g = 0.5 * (gamma + gamma[0])
    mu2 = jnp.abs(dip[0, :]) ** 2
    return jnp.sum(
        mu2[None, :] * (1.0 / (de[None, :] - w[:, None] - 1j * g[None, :])
                        + 1.0 / (de[None, :] + w[:, None] + 1j * g[None, :])),
        axis=1)


def chi3(en, dip, gamma, omega3, t2, omega1):
    """Third-order susceptibility map: sum of the four response
    pathways (reference: pyqed/susceptibility.py driver)."""
    tot = 0
    for k, fn in enumerate((response1_freq, response2_freq,
                            response3_freq, response4_freq), 1):
        tot = tot + fn(en, dip, gamma, omega3, t2, omega1)
    return tot


# -------------------------------------------------------------------
# fully frequency-domain responses + permutation-symmetrized chi^(3)
# (reference: pyqed/susceptibility.py:68-111 response*_fd /
# ``susceptibility`` — the reference driver overwrites chi instead of
# accumulating and reuses pathway 1 for the conjugates of pathways
# 3/4; the Mukamel sum is done correctly here)
# -------------------------------------------------------------------

def _resp_fd_core(en, dip, gamma, w123, w12, w1, kind, eps=1e-12):
    """Frequency-domain pathway R_kind(w123, w12, w1) (scalars or
    broadcastable arrays); the three propagators act on the same index
    pairs as (G3, U(t2), G1) of the time-domain ``_resp_core``.

    ``eps`` regularizes the population poles (i == j with zero
    dephasing) that are genuinely divergent in degenerate mixing,
    e.g. chi3(w, -w, w) with an undamped ground state."""
    en = jnp.asarray(en)
    dip = jnp.asarray(dip)
    gamma = jnp.asarray(gamma)
    a = 0
    d4 = jnp.einsum("b, bc, cd, d -> bcd", dip[a, :], dip, dip, dip[:, a])
    Ed = en[:, None] - en[None, :]
    Gam = 0.5 * (gamma[:, None] + gamma[None, :]) + eps

    def G(w, i, j):
        return 1.0 / (jnp.asarray(w)[..., None, None, None]
                      - Ed[i, j] + 1j * Gam[i, j])

    b, c, d = jnp.meshgrid(jnp.arange(en.shape[0]),
                           jnp.arange(en.shape[0]),
                           jnp.arange(en.shape[0]), indexing="ij")
    if kind == 1:
        val = G(w123, d, c) * G(w12, d, b) * G(w1, d, a)
    elif kind == 2:
        val = G(w123, d, c) * G(w12, d, b) * G(w1, a, b)
    elif kind == 3:
        val = G(w123, d, c) * G(w12, a, c) * G(w1, a, b)
    elif kind == 4:
        val = G(w123, d, a) * G(w12, c, a) * G(w1, d, a)
    else:
        raise ValueError(kind)
    return jnp.sum(d4 * val, axis=(-3, -2, -1))


def response1_fd(en, dip, gamma, w123, w12, w1):
    return _resp_fd_core(en, dip, gamma, w123, w12, w1, 1)


def response2_fd(en, dip, gamma, w123, w12, w1):
    return _resp_fd_core(en, dip, gamma, w123, w12, w1, 2)


def response3_fd(en, dip, gamma, w123, w12, w1):
    return _resp_fd_core(en, dip, gamma, w123, w12, w1, 3)


def response4_fd(en, dip, gamma, w123, w12, w1):
    return _resp_fd_core(en, dip, gamma, w123, w12, w1, 4)


def susceptibility(en, dip, gamma, omega_in):
    """chi^(3)(-w_s; w1, w2, w3) for an N-level system, w_s = sum w_n.

    Mukamel's frequency-domain S^(3) (PNOS p. 122): the four Liouville
    pathways plus their complex conjugates at negated frequencies,
    symmetrized over all 3! permutations of the input frequencies with
    the -1/3! prefactor."""
    import itertools
    if len(omega_in) != 3:
        raise ValueError("need exactly 3 incoming frequencies")
    chi = 0.0
    for (wa, wb, wc) in itertools.permutations(omega_in):
        w123, w12, w1 = wa + wb + wc, wa + wb, wa
        for kind in (1, 2, 3, 4):
            chi = chi + _resp_fd_core(en, dip, gamma,
                                      w123, w12, w1, kind)
            chi = chi + jnp.conj(_resp_fd_core(
                en, dip, gamma, -w123, -w12, -w1, kind))
    return -chi / 6.0
