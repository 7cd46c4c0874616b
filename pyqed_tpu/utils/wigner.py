"""Wigner-Ville distributions and spectrograms.

TPU-native counterpart of the reference Wigner module
(reference: pyqed/wigner.py — ``spectrogram:152``, ``wigner:216``).

The reference's per-column Python loop + per-column FFT becomes one masked
gather + a single batched FFT over all time columns.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _wv_matrix(x):
    """Instantaneous autocorrelation K[tau_idx, t] = x(t+tau) x*(t-tau),
    zero outside the valid window — fully vectorized."""
    x = jnp.asarray(x)
    N = x.shape[0]
    tausec = N // 2
    winlength = tausec - 1
    j = jnp.arange(N)
    taumax = jnp.minimum(jnp.minimum(j, N - j - 1),
                         winlength * jnp.ones(N, dtype=j.dtype))
    tau = jnp.arange(-tausec, tausec)
    TT, JJ = jnp.meshgrid(tau, j, indexing="ij")
    valid = jnp.abs(TT) <= taumax[None, :]
    ip = jnp.clip(JJ + TT, 0, N - 1)
    im = jnp.clip(JJ - TT, 0, N - 1)
    K = jnp.where(valid, x[ip] * jnp.conj(x)[im], 0.0)
    return K, tau


def wigner(x, d=1.0):
    """Wigner-Ville distribution W(w, t) of a 1D signal
    (reference: pyqed/wigner.py:216 — NOTE the reference returns the
    transposed (t, w) layout; oracle-pinned via W_ref.T == W in
    tests/test_ref_oracle2.py). Returns (W, freqs)."""
    x = jnp.asarray(x)
    K, tau = _wv_matrix(x)
    N = x.shape[0]
    taus = tau * d
    # FT along tau with physicists' convention e^{+i w tau}: use ifft
    g = jnp.fft.ifft(K, axis=0)
    g = jnp.fft.fftshift(g, axes=(0,))
    g = g * d * N
    freq = 2.0 * np.pi * np.fft.fftshift(np.fft.fftfreq(N, d=d))
    phase = jnp.exp(1j * jnp.asarray(freq) * taus[0])
    g = g * phase[:, None]
    return g, freq / 2.0


def spectrogram(x, d=1.0):
    """Alias with the reference's (w, t) output (pyqed/wigner.py:152)."""
    return wigner(x, d)


def wvd(x, d=1.0):
    return wigner(x, d)


def wigner_sample_harmonic(key, n, omega, mass=1.0, beta=None,
                           x0=0.0, p0=0.0):
    """Sample (x, p) from the harmonic-oscillator Wigner distribution —
    the standard initial-condition generator for trajectory methods
    (FSSH/Ehrenfest/RPMD ensembles; no counterpart in the reference).

    Ground state (beta=None): sigma_x^2 = 1/(2 m omega),
    sigma_p^2 = m omega / 2.  Thermal: both scaled by
    coth(beta omega / 2) (the exact quantum thermal Wigner function).

    omega/mass/x0/p0 may be scalars or (ndim,) arrays; returns
    (x, p) each (n, ndim).
    """
    import jax
    if isinstance(key, (int, np.integer)):
        key = jax.random.PRNGKey(int(key))
    omega, mass = jnp.broadcast_arrays(
        jnp.atleast_1d(jnp.asarray(omega, dtype=float)),
        jnp.atleast_1d(jnp.asarray(mass, dtype=float)))
    ndim = omega.shape[0]
    scale = (1.0 if beta is None
             else 1.0 / jnp.tanh(jnp.asarray(beta) * omega / 2.0))
    sx = jnp.sqrt(scale / (2.0 * mass * omega))
    sp = jnp.sqrt(scale * mass * omega / 2.0)
    kx, kp = jax.random.split(key)
    x = x0 + sx[None, :] * jax.random.normal(kx, (n, ndim))
    p = p0 + sp[None, :] * jax.random.normal(kp, (n, ndim))
    return x, p
