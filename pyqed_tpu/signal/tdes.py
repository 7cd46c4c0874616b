"""Time-domain third-order response functions and 2DES spectra.

TPU-native counterpart of the reference time-domain 2DES module
(reference: pyqed/signal/2DES.py — ``ESA:102``, ``GSB:156``, ``SE:202``,
``response2_freq:71``; Liouville-space Green's function ``G:36``).

All pathways evaluate on full (t1, t2, t3) grids as separable outer
products of single-coherence propagators — one einsum each — and 2D FFT
along (t1, t3) gives the (w1, w3) correlation spectra. Batching over t2 is
free (it is just an axis).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _U(E, gamma, a_idx, b_idx, t):
    """Stack of coherence propagators U_{ab}(t) = -i e^{-i w_ab t - g_ab t}
    for all a in a_idx, b in b_idx over the time grid t: (A, B, T)
    (reference: pyqed/signal/2DES.py:36 ``G``)."""
    E = jnp.asarray(E)
    gamma = jnp.asarray(gamma)
    a = jnp.asarray(a_idx)
    b = jnp.asarray(b_idx)
    wab = E[a][:, None] - E[b][None, :]
    gab = (gamma[a][:, None] + gamma[b][None, :]) / 2.0
    t = jnp.asarray(t)
    return -1j * jnp.exp(-(1j * wab[..., None] + gab[..., None])
                         * t[None, None, :])


def ESA(evals, dip, g_idx, e_idx, f_idx, gamma, t1, t2, t3):
    """ESA pathway on the (t1, t2, t3) cube
    (reference: pyqed/signal/2DES.py:102). Returns (T1, T2, T3)."""
    dip = jnp.asarray(dip)
    e = jnp.asarray(e_idx)
    f = jnp.asarray(f_idx)
    a = 0
    U_ab = _U(evals, gamma, [a], e_idx, t1)[0]      # (B, T1)
    U_cb = _U(evals, gamma, e_idx, e_idx, t2)       # (C, B, T2)
    U_db = _U(evals, gamma, f_idx, e_idx, t3)       # (D, B, T3)
    d1 = dip[e, a]
    d2 = dip[e, a]
    d3 = dip[f[:, None], e[None, :]]
    d4 = dip[e[:, None], f[None, :]]
    return -jnp.einsum("b, c, dc, bd, bi, cbj, dbk -> ijk",
                       d1, d2, d3, d4, U_ab, U_cb, U_db)


def GSB(evals, dip, g_idx, e_idx, gamma, t1, t2, t3):
    """GSB pathway (reference: pyqed/signal/2DES.py:156)."""
    dip = jnp.asarray(dip)
    e = jnp.asarray(e_idx)
    g = jnp.asarray(g_idx)
    a = 0
    U_ab = _U(evals, gamma, [a], e_idx, t1)[0]      # (B, T1)
    U_ac = _U(evals, gamma, [a], g_idx, t2)[0]      # (C, T2)
    U_dc = _U(evals, gamma, e_idx, g_idx, t3)       # (D, C, T3)
    d1 = dip[a, e]
    d2 = dip[e[:, None], g[None, :]]                # mu_{b c}: (B, C)
    d3 = dip[g[:, None], e[None, :]]                # mu_{c d}: (C, D)
    d4 = dip[e, a]
    return jnp.einsum("b, bc, cd, d, bi, cj, dck -> ijk",
                      d1, d2, d3, d4, U_ab, U_ac, U_dc)


def SE(evals, dip, g_idx, e_idx, gamma, t1, t2, t3):
    """SE pathway (reference: pyqed/signal/2DES.py:202)."""
    dip = jnp.asarray(dip)
    e = jnp.asarray(e_idx)
    g = jnp.asarray(g_idx)
    a = 0
    U_ab = _U(evals, gamma, [a], e_idx, t1)[0]      # (B, T1)
    U_cb = _U(evals, gamma, e_idx, e_idx, t2)       # (C, B, T2)
    U_cd = _U(evals, gamma, e_idx, g_idx, t3)       # (C, D, T3)
    d1 = dip[a, e]
    d2 = dip[e, a]
    d3 = dip[g[:, None], e[None, :]]                # mu_{d c}: (D, C)
    d4 = dip[e[:, None], g[None, :]]                # mu_{b d}: (B, D)
    return jnp.einsum("b, c, dc, bd, bi, cbj, cdk -> ijk",
                      d1, d2, d3, d4, U_ab, U_cb, U_cd)


def twodes(mol, t1, t2, t3, g_idx=(0,), e_idx=None, f_idx=None):
    """Total rephasing signal R(t1, t2, t3) = GSB + SE + ESA and its 2D FFT
    S(w1, t2, w3)."""
    E = mol.eigvals()
    dip = mol.edip_rms
    gamma = mol.gamma
    N = mol.nstates
    if e_idx is None:
        e_idx = list(range(1, N))
    if f_idx is None:
        f_idx = list(range(1, N))
    g_idx = list(g_idx)
    R = (GSB(E, dip, g_idx, e_idx, gamma, t1, t2, t3)
         + SE(E, dip, g_idx, e_idx, gamma, t1, t2, t3)
         + ESA(E, dip, g_idx, e_idx, f_idx, gamma, t1, t2, t3))
    S, w1, w3 = response_to_spectrum(R, t1, t3)
    return R, S, w1, w3


def response_to_spectrum(R, t1, t3, rephasing=True):
    """FFT the (t1, ..., t3) response to (w1, ..., w3).

    Rephasing signals oscillate as e^{+i w_ab t1} with w_ab < 0; the
    conventional plot uses S(-w1, w3), handled by conjugating the t1
    transform direction.
    """
    t1 = np.asarray(t1)
    t3 = np.asarray(t3)
    dt1 = t1[1] - t1[0]
    dt3 = t3[1] - t3[0]
    n1, n3 = len(t1), len(t3)
    # FT: S(w1, w3) = int dt1 dt3 e^{-s sign i w1 t1} e^{i w3 t3} R
    ax1 = 0
    ax3 = R.ndim - 1
    F = jnp.fft.ifft(R, axis=ax3) * n3 * dt3        # e^{+i w3 t3}
    if rephasing:
        F = jnp.fft.ifft(F, axis=ax1) * n1 * dt1    # e^{+i w1 t1}
    else:
        F = jnp.fft.fft(F, axis=ax1) * dt1
    F = jnp.fft.fftshift(F, axes=(ax1, ax3))
    w1 = 2 * np.pi * np.fft.fftshift(np.fft.fftfreq(n1, dt1))
    w3 = 2 * np.pi * np.fft.fftshift(np.fft.fftfreq(n3, dt3))
    return F, w1, w3
