"""FFT with physicists' continuous-Fourier-transform conventions, on XLA.

Forward transform (reference: pyqed/fft.py:11):

    g(w) = int dt f(t) e^{-i w t}    ->  fft(a) * dx * e^{-i w x0}, shifted

Inverse (reference: pyqed/fft.py:70):

    g(t) = int dw f(w) e^{+i w t}   ->  ifft(a) * dx * n * e^{+i w x0}, shifted

Both return (g, freq) with ``freq`` the angular-frequency grid. These run on
the TPU's XLA FFT; the phase/normalization factors fuse into the FFT output
elementwise op.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _freqs(nx, dx):
    return 2.0 * jnp.pi * jnp.fft.fftshift(jnp.fft.fftfreq(nx, d=dx))


def fft(a, x=None, axis=-1):
    """Continuous FT along ``axis``: g(w) = int dx f(x) e^{-iwx}.

    Returns (g, freq). Matches reference pyqed/fft.py:11-68.
    """
    a = jnp.asarray(a)
    axis = axis % a.ndim
    nx = a.shape[axis]
    if x is None:
        x = jnp.arange(nx)
    dx = x[1] - x[0]

    g = jnp.fft.fft(a, axis=axis)
    g = jnp.fft.fftshift(g, axes=(axis,))
    g = g * dx

    freq = _freqs(nx, dx)
    phase = jnp.exp(-1j * freq * x[0])
    shape = [1] * a.ndim
    shape[axis] = nx
    g = g * phase.reshape(shape)
    return g, freq


def ifft(a, x=None, axis=-1):
    """Inverse continuous FT: g(t) = int dw f(w) e^{+iwt} / (2 pi) * (2 pi)
    with the reference's dx*nx normalization (pyqed/fft.py:70-102)."""
    a = jnp.asarray(a)
    axis = axis % a.ndim
    nx = a.shape[axis]
    if x is None:
        x = jnp.arange(nx)
    dx = x[1] - x[0]

    g = jnp.fft.ifft(a, axis=axis)
    g = jnp.fft.fftshift(g, axes=(axis,))
    g = g * dx * nx

    freq = _freqs(nx, dx)
    phase = jnp.exp(1j * freq * x[0])
    shape = [1] * a.ndim
    shape[axis] = nx
    g = g * phase.reshape(shape)
    return g, freq


def fft2(f, dx=1.0, dy=1.0):
    """2D continuous FT (reference: pyqed/fft.py:104-126).

    Returns (freqx, freqy, g). NOTE the reference computes freqy with nx —
    a latent bug when nx != ny; here freqy correctly uses ny.
    """
    f = jnp.asarray(f)
    nx, ny = f.shape
    g = jnp.fft.fft2(f)
    g = jnp.fft.fftshift(g)
    g = g * dx * dy
    freqx = _freqs(nx, dx)
    freqy = _freqs(ny, dy)
    return freqx, freqy, g


def dft(x, f, k):
    """DFT at arbitrary momenta (reference: pyqed/fft.py:128), vectorized."""
    x = jnp.asarray(x)
    dx = (x[1] - x[0]).real
    return jnp.sum(f[None, :] * jnp.exp(-1j * jnp.outer(k, x)), axis=-1) * dx


def dft2(x, y, f, kx, ky):
    """2D DFT at arbitrary momenta (reference: pyqed/fft.py:146), as one
    contraction over the grid instead of the reference's double loop."""
    dx = x[1] - x[0]
    dy = y[1] - y[0]
    X, Y = jnp.meshgrid(x, y)
    px = jnp.exp(-1j * kx[:, None, None] * X[None])
    py = jnp.exp(-1j * ky[:, None, None] * Y[None])
    return jnp.einsum("axy, bxy, xy -> ab", px, py, f) * dx * dy
