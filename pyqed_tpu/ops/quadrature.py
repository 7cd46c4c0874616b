"""Quadrature rules and combinatorics utilities.

TPU-native counterpart of the reference's small L0 helpers
(reference: pyqed/quadrature.py:15,54 — Gauss-Hermite quadrature;
pyqed/comb.py:13,60,101 — Fock-space enumeration combinatorics;
pyqed/common.py:1,4 — ``dagger``/``delta``).
"""
from __future__ import annotations

import itertools
import math

import numpy as np
import jax.numpy as jnp


# -------------------------------------------------------------- quadrature

def gauss_hermite(n, x0=0.0, alpha=1.0):
    """Nodes/weights for ∫ f(x) e^{-alpha (x-x0)^2} dx
    (reference: pyqed/quadrature.py:15)."""
    x, w = np.polynomial.hermite.hermgauss(n)
    s = 1.0 / np.sqrt(alpha)
    return x0 + s * x, s * w


def gauss_hermite_normalized(n, x0=0.0, alpha=1.0):
    """Nodes/weights absorbing the Gaussian weight, for plain sums
    Σ w_i f(x_i) ≈ ∫ f(x) dx with f sharply peaked at x0
    (reference: pyqed/quadrature.py:54)."""
    x, w = gauss_hermite(n, x0, alpha)
    return x, w * np.exp(alpha * (x - x0) ** 2)


def gauss_legendre(n, a=-1.0, b=1.0):
    x, w = np.polynomial.legendre.leggauss(n)
    mid, half = 0.5 * (a + b), 0.5 * (b - a)
    return mid + half * x, half * w


# ------------------------------------------------------------ combinatorics

def multichoose(n, k):
    """Number of weak compositions of k into n parts
    (reference: pyqed/comb.py:13)."""
    return math.comb(n + k - 1, k)


def fock_enumerate(nmodes, nmax, truncation="total"):
    """Enumerate boson occupation vectors.

    truncation='total': all n with sum(n) <= nmax (graded by level —
    the HEOM/Fock hierarchy order, reference: pyqed/comb.py:60);
    truncation='local': the direct-product grid 0..nmax per mode.
    """
    if truncation == "local":
        return np.array(list(itertools.product(range(nmax + 1),
                                               repeat=nmodes)),
                        dtype=np.int32)
    keys = []
    for level in range(nmax + 1):
        for comb in itertools.combinations_with_replacement(
                range(nmodes), level):
            n = [0] * nmodes
            for c in comb:
                n[c] += 1
            keys.append(n)
    return np.array(keys, dtype=np.int32)


def fock_index(keys):
    """Occupation-vector -> linear index lookup dict."""
    return {tuple(k): i for i, k in enumerate(np.asarray(keys))}


# ------------------------------------------------------------------ common

def dagger(a):
    """(reference: pyqed/common.py:1)."""
    return jnp.conj(jnp.swapaxes(jnp.asarray(a), -1, -2))


def delta(i, j):
    """(reference: pyqed/common.py:4)."""
    return 1.0 if i == j else 0.0
