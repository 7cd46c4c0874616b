"""One-electron spin-orbit coupling integrals over GTOs.

TPU-native counterpart of the reference SOC module (reference:
pyqed/qchem/soc.py:20 ``soc`` — a pyscf driver calling
``int1e_prinvxp``; here the integrals are built natively from the
McMurchie-Davidson nuclear-attraction kernel).

The Breit-Pauli one-electron (spin-same-orbit) operator is

    h_SO = (alpha^2 / 2) sum_A Z_A  p x (1/|r - R_A|) p . s

Its orbital part for real GTOs reduces to the real antisymmetric
arrays (x-component shown; cyclic for y, z)

    W^A_x(mu, nu) = <d_y mu | 1/r_A | d_z nu> - <d_z mu | 1/r_A | d_y nu>

with the physical matrix element i * W (the reference notes the same
"Eq (2) = h1 * (i Z_A)" bookkeeping).  A Cartesian-Gaussian derivative
is the two-term shift  d_y G(l,m,n) = m G(l,m-1,n) - 2 alpha G(l,m+1,n),
so everything lands on ordinary nuclear-attraction integrals.
"""
from __future__ import annotations

import numpy as np

from .basis import ContractedGaussian, _nuclear_prim

FINE_STRUCTURE = 1.0 / 137.035999084

_Z = {"H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7,
      "O": 8, "F": 9, "Ne": 10}


def _dpairs(lmn, alpha, axis):
    """(coef, lmn') expansion of d/dr_axis acting on the unnormalized
    primitive x^l y^m z^n exp(-alpha r^2)."""
    l = list(lmn)
    out = []
    if l[axis] > 0:
        lo = l.copy()
        lo[axis] -= 1
        out.append((float(l[axis]), tuple(lo)))
    hi = l.copy()
    hi[axis] += 1
    out.append((-2.0 * alpha, tuple(hi)))
    return out


def _dV_prim(a, lmn1, A, b, lmn2, B, C, ax1, ax2):
    """<d_{ax1} prim1 | 1/|r-C| | d_{ax2} prim2> for primitives."""
    val = 0.0
    for c1, l1 in _dpairs(lmn1, a, ax1):
        for c2, l2 in _dpairs(lmn2, b, ax2):
            val += c1 * c2 * _nuclear_prim(a, l1, A, b, l2, B, C)
    return val


def _contract_dV(g1: ContractedGaussian, g2: ContractedGaussian,
                 C, ax1, ax2):
    val = 0.0
    for a, ca, na in zip(g1.exps, g1.coefs, g1.norms):
        for b, cb, nb in zip(g2.exps, g2.coefs, g2.norms):
            val += ca * cb * na * nb * _dV_prim(
                a, g1.lmn, g1.center, b, g2.lmn, g2.center, C, ax1, ax2)
    return val


def soc_integrals(bfs, atoms, effective_charge=True):
    """W (3, n, n): real antisymmetric orbital SOC arrays summed over
    nuclei with charge weights; physical h_SO = i (alpha^2/2) W . s.

    atoms : list of (symbol, (x, y, z)) in bohr.
    """
    n = len(bfs)
    W = np.zeros((3, n, n))
    cyc = [(1, 2), (2, 0), (0, 1)]          # x: (y,z), y: (z,x), z: (x,y)
    for sym, xyz in atoms:
        Z = _Z[sym] if effective_charge else 1.0
        C = np.asarray(xyz, float)
        for k, (u, v) in enumerate(cyc):
            for i in range(n):
                for j in range(n):
                    if i == j:
                        continue
                    W[k, i, j] += Z * (
                        _contract_dV(bfs[i], bfs[j], C, u, v)
                        - _contract_dV(bfs[i], bfs[j], C, v, u))
    return W


def soc_mo(W, mo_coeff):
    """Transform the AO SOC arrays to the MO basis: (3, nmo, nmo)."""
    return np.einsum("xpq, pi, qj -> xij", W, mo_coeff, mo_coeff)


def soc_matrix(bfs, atoms, mo_coeff=None):
    """Full complex one-electron SOC operator i (alpha^2/2) W, optionally
    in the MO basis (reference pyqed/qchem/soc.py:74 h1 convention)."""
    W = soc_integrals(bfs, atoms)
    if mo_coeff is not None:
        W = soc_mo(W, mo_coeff)
    return 0.5j * FINE_STRUCTURE ** 2 * W
