"""Moller-Plesset perturbation theory (closed-shell MP2, SCS-MP2).

The reference mentions MP2 only in comments and pyscf wrappers
(reference: pyqed/qchem/mol.py:1597, qchem/gto/gw/pyscf_gw.py); here it
is a real implementation: one O(N^5) MO transform (already provided by
``RHF.mo_ints``) plus a single einsum over the amplitude denominator —
exactly the kind of dense batched contraction the MXU eats.

    E2 = sum_{ijab} (ia|jb) [ 2 (ia|jb) - (ib|ja) ] / (e_i+e_j-e_a-e_b)

with chemists'-notation MO integrals.  SCS-MP2 [Grimme, JCP 118, 9095
(2003)] rescales the opposite-spin (1.2) and same-spin (1/3) parts.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["MP2"]


class MP2:
    """Closed-shell MP2 on a converged RHF object (``qchem.scf.RHF``)."""

    def __init__(self, mf):
        assert mf.mo_coeff is not None, "run RHF first"
        self.mf = mf
        self.e_corr = None
        self.e_corr_os = None
        self.e_corr_ss = None
        self.e_tot = None
        self.e_scs = None

    def run(self):
        mf = self.mf
        nocc = mf.nocc
        _, eri_mo = mf.mo_ints()
        e = jnp.asarray(mf.mo_energy)
        o, v = slice(None, nocc), slice(nocc, None)
        ovov = jnp.asarray(eri_mo)[o, v, o, v]            # (ia|jb)
        denom = (e[o, None, None, None] - e[None, v, None, None]
                 + e[None, None, o, None] - e[None, None, None, v])
        t = ovov / denom                                   # amplitudes
        e_os = jnp.einsum("iajb, iajb ->", t, ovov)
        e_ss = e_os - jnp.einsum("iajb, ibja ->", t, ovov)
        self.e_corr_os = float(e_os)
        self.e_corr_ss = float(e_ss)
        self.e_corr = float(e_os + e_ss)
        self.e_tot = float(mf.e_tot) + self.e_corr
        self.e_scs = (float(mf.e_tot) + 1.2 * self.e_corr_os
                      + self.e_corr_ss / 3.0)
        return self
