"""Colored-noise generation.

TPU-native counterpart of the reference noise module
(reference: pyqed/noise.py — ``cnoise:65`` Ornstein-Uhlenbeck generator
after R. F. Fox et al., PRA 38, 5938 (1988); ``corr:30``).

The reference's double Python loop becomes one ``lax.scan`` over time with
all samples batched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cnoise(key, nstep, nsample, dt=0.001, tau=0.0025, ave=0.0, D=0.0025):
    """Exponentially correlated Gaussian noise:
    <eps(t) eps(s)> = D/tau exp(-|t-s|/tau).

    Returns eps of shape (nstep, nsample). ``key`` is a jax PRNG key
    (the reference uses global numpy RNG).
    """
    sigma = jnp.sqrt(D / tau)
    E = jnp.exp(-dt / tau)
    key, k0 = jax.random.split(key)
    eps0 = jax.random.normal(k0, (nsample,)) * sigma

    def step(carry, k):
        eps = carry
        a = jax.random.uniform(k, (2, nsample), minval=1e-12, maxval=1.0)
        h = jnp.sqrt(-2.0 * D / tau * (1.0 - E**2) * jnp.log(a[0])) \
            * jnp.cos(2.0 * jnp.pi * a[1])
        new = eps * E + h
        return new, new

    keys = jax.random.split(key, nstep - 1)
    _, path = jax.lax.scan(step, eps0, keys)
    return jnp.concatenate([eps0[None], path], axis=0) + ave


def autocorrelation(eps, nlag=None):
    """Sample autocorrelation over the ensemble (reference:
    pyqed/noise.py:30 ``corr``), vectorized."""
    eps = jnp.asarray(eps)
    nstep, nsample = eps.shape
    if nlag is None:
        nlag = nstep // 2
    out = []
    for lag in range(nlag):
        out.append(jnp.mean(eps[: nstep - lag] * eps[lag:nstep]))
    return jnp.stack(out)


def cross_correlation(a, b, nlag=None):
    """Sample cross-correlation <a(t) b(t+lag)> over the ensemble
    (reference: pyqed/noise.py ``cross_corr`` — which opens an unused
    file handle and normalizes by nstep*nsample regardless of lag;
    here the mean is over the actual (nstep-lag)*nsample products).

    a, b : (nstep, nsample). Returns (nlag,)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    nstep, _ = a.shape
    if nlag is None:
        nlag = nstep // 2
    out = []
    for lag in range(nlag):
        out.append(jnp.mean(a[: nstep - lag] * b[lag:nstep]))
    return jnp.stack(out)


cross_corr = cross_correlation
