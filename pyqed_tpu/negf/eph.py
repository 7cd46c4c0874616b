"""Electron-phonon self-energies and spectral functions (Holstein).

TPU-native counterpart of the reference's lattice e-ph toolkit
(reference: pyqed/gw/eph.py — ``gf0:49`` free-electron GF,
``gf0_ph:72`` free-phonon GF, ``band:97``/``dispersion:102``,
``vertex:123``). Adds the lowest-order (Migdal/Fan) self-energy for a
1D tight-binding band coupled to an Einstein phonon, with the k- and
ω-grids as broadcast batch axes.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def band(k, t=1.0):
    """1D tight-binding dispersion (reference: eph.py:97)."""
    return -2.0 * t * jnp.cos(k)


def gf0(omega, ek, eta=1e-3):
    """Free-electron retarded GF (reference: eph.py:49), broadcast over
    (omega, k)."""
    return 1.0 / (jnp.asarray(omega)[..., None] - jnp.asarray(ek)[None, :]
                  + 1j * eta)


def gf0_ph(omega, w0, eta=1e-3):
    """Free-phonon retarded GF D0(ω) = 2ω0/(ω² − ω0² + iη)
    (reference: eph.py:72)."""
    w = jnp.asarray(omega)
    return 2.0 * w0 / (w ** 2 - w0 ** 2 + 2j * eta * w0)


def fan_migdal_sigma(omegas, ks, g, w0, t=1.0, nq=128, T=0.0,
                     mu=0.0, eta=1e-3):
    """Lowest-order Fan-Migdal self-energy of the Holstein model:

        Σ(k, ω) = (g²/N) Σ_q [ (n_B + 1 − f_{k−q}) / (ω − ε_{k−q} − ω0 + iη)
                             + (n_B + f_{k−q})     / (ω − ε_{k−q} + ω0 + iη) ]

    Vectorized over (ω, k, q) as one broadcast sum.
    """
    omegas = jnp.asarray(omegas)
    ks = jnp.atleast_1d(jnp.asarray(ks))
    qs = jnp.linspace(-np.pi, np.pi, nq, endpoint=False)
    ekq = band(ks[:, None] - qs[None, :], t)             # (k, q)
    if T > 0:
        f = 1.0 / (jnp.exp((ekq - mu) / T) + 1.0)
        nb = 1.0 / (jnp.exp(w0 / T) - 1.0)
    else:
        f = (ekq < mu).astype(float)
        nb = 0.0
    den_em = omegas[:, None, None] - ekq[None] - w0 + 1j * eta
    den_ab = omegas[:, None, None] - ekq[None] + w0 + 1j * eta
    sig = (g ** 2 / nq) * jnp.sum(
        (nb + 1.0 - f)[None] / den_em + (nb + f)[None] / den_ab, axis=-1)
    return sig                                            # (omega, k)


def spectral_function(omegas, ks, g, w0, t=1.0, mu=0.0, eta=5e-3,
                      **kw):
    """A(k, ω) = −Im G(k, ω)/π with the Migdal self-energy."""
    sig = fan_migdal_sigma(omegas, ks, g, w0, t=t, mu=mu, eta=eta, **kw)
    ek = band(jnp.atleast_1d(jnp.asarray(ks)), t)
    G = 1.0 / (jnp.asarray(omegas)[:, None] - ek[None, :] - sig
               + 1j * eta)
    return -jnp.imag(G) / np.pi
