"""Bethe-Salpeter equation on top of G0W0 quasiparticle energies.

TPU-native counterpart of the reference GW-BSE module
(reference: pyqed/gw/GW_BSE.py — ``bse_AB_matrices:362`` with GW QP
energies + RPA-screened static W, ``bse:407`` Casida solve,
``get_m_rpa:210`` intermediates). The reference's quadruple loops over
(i, a, j, b, L) collapse into einsums; spatial-orbital restricted
convention throughout.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .gw import rpa_modes, g0w0


class GWBSE:
    """One-shot G0W0 + statically screened BSE.

    Parameters
    ----------
    mf : converged qchem RHF mean field.
    eta : broadening in the GW self-energy denominators.
    """

    def __init__(self, mf, eta=1e-3):
        self.mf = mf
        self.eta = eta
        self.e_gw = None
        self._prep()

    def _prep(self):
        mf = self.mf
        hmo, eri_mo = mf.mo_ints()
        self.eri = np.asarray(eri_mo)
        self.e_mf = np.asarray(mf.mo_energy)
        self.nocc = mf.nocc
        self.nmo = self.eri.shape[0]
        self.Omega, self.XpY = rpa_modes(mf)

    def run_gw(self):
        self.e_gw, self.e_hf, self.sigma_c = g0w0(self.mf, self.eta)
        return self.e_gw

    # ------------------------------------------------------------- BSE
    def _m_rpa(self):
        """M_{pq,L} = Σ_ia (pq|ia) (X+Y)^L_{ia}
        (reference: GW_BSE.py:210 ``get_m_rpa``)."""
        nocc, nmo = self.nocc, self.nmo
        XpY = self.XpY.reshape(nocc, nmo - nocc, -1)
        return np.einsum("pqia, iaL -> pqL",
                         self.eri[:, :, :nocc, nocc:], XpY)

    def ab_matrices(self, use_gw=True, screened=True):
        """BSE A/B in the (ia) particle-hole basis
        (reference: GW_BSE.py:362):
        A[ia,jb] = δ δ (E_a − E_i) + 2(ai|ib)-style exchange − (ab|ij)
                   − 2 Σ_L M_ij,L M_ab,L / Ω_L   (static screening).
        With use_gw=False and screened=False this reduces EXACTLY to the
        TDHF A/B matrices (internal consistency check)."""
        nocc, nmo = self.nocc, self.nmo
        nvir = nmo - nocc
        if use_gw and self.e_gw is None:
            self.run_gw()
        e = self.e_gw if use_gw else self.e_mf
        eri = self.eri

        de = (e[nocc:, None] - e[None, :nocc]).T        # (i, a)
        A = np.zeros((nocc, nvir, nocc, nvir))
        A += np.einsum("ia, ij, ab -> iajb", de, np.eye(nocc),
                       np.eye(nvir))
        # (ai|bj) exchange-like + (ab|ij) direct (chemists' notation)
        A += 2.0 * np.einsum("aibj -> iajb",
                             eri[nocc:, :nocc, nocc:, :nocc])
        A -= np.einsum("abij -> iajb", eri[nocc:, nocc:, :nocc, :nocc])
        B = 2.0 * np.einsum("aijb -> iajb",
                            eri[nocc:, :nocc, :nocc, nocc:])
        B -= np.einsum("ajib -> iajb", eri[nocc:, :nocc, :nocc, nocc:])
        if screened:
            M = self._m_rpa()
            Moo = M[:nocc, :nocc]               # (i, j, L)
            Mvv = M[nocc:, nocc:]               # (a, b, L)
            Mov = M[:nocc, nocc:]               # (i, b, L)
            Mvo = M[nocc:, :nocc]               # (a, j, L)
            A -= 2.0 * np.einsum("ijL, abL, L -> iajb", Moo, Mvv,
                                 1.0 / self.Omega)
            B -= 2.0 * np.einsum("ibL, ajL, L -> iajb", Mov, Mvo,
                                 1.0 / self.Omega)
        d = nocc * nvir
        return A.reshape(d, d), B.reshape(d, d)

    def run(self, tda=False, use_gw=True, screened=True):
        """Excitation energies (Casida form; reference GW_BSE.py:407)."""
        A, B = self.ab_matrices(use_gw=use_gw, screened=screened)
        if tda:
            w, X = np.linalg.eigh(A)
            self.e_bse = w
            return w
        import scipy.linalg
        AmB = A - B
        sq = scipy.linalg.sqrtm(AmB)
        M = sq @ (A + B) @ sq
        w2 = np.linalg.eigvalsh(M)
        self.e_bse = np.sqrt(np.clip(w2, 0.0, None))
        return self.e_bse

    kernel = run
