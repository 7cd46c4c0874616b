"""Analytic excited-state (CIS/TDA) nuclear gradients.

The reference has no excited-state forces (its ground-state gradients
delegate to pyscf — pyqed/qchem/grad.py:9); this implements the
analytic d(E_SCF + ω_CIS)/dR for restricted closed-shell singlet TDA
with a design that removes the usual hand-derived Furche/Foresman
index algebra:

* the orbital Lagrangian L_pq = ∂ω/∂κ_pq and the explicit-integral
  weights (∂ω/∂h, ∂ω/∂ERI) come from **jax autodiff** of a 15-line
  definition of ω(C(κ); h, ERI);
* the CPHF operator (the Jacobian of the Brillouin block F_vo over
  orbital rotations) is ALSO an autodiff Jacobian;
* ONE Z-vector linear solve converts the 3N response sums into a
  single contraction (Handy-Schaefer).

The only hand-written pieces are the AO derivative-integral assemblies
(the same bra-kernel + position-map patterns as the trusted
``rhf_gradient``).  Why this is exact: ω is first-order invariant
under occ-occ and virt-virt rotations at an eigenvector of the CIS
matrix (X†[G, A]X = 0 when AX = ωX), so the redundant antisymmetric
blocks of U^ξ drop and the symmetric blocks are fixed by
orthonormality, U_sym = −S^ξ_MO/2.  Pinned against Richardson finite
differences of E_SCF + ω_TDA in tests/test_tdgrad.py.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .basis import ATOMIC_NUMBER

__all__ = ["cis_gradient", "tda_gradient"]


def _ao_derivative_mats(mol):
    """Per-(atom, x): full AO derivative matrices
    (dS, dh, dERI) assembled from the bra-derivative kernels exactly
    like ``rhf_gradient`` (grad.py:247); returns lists indexed
    [a][x]."""
    from .basis import (overlap_deriv_bra, kinetic_deriv_bra,
                        nuclear_deriv_bra)
    from .lo import cart_atom_indices
    try:
        from .engine import eri_deriv_native
        dE1 = eri_deriv_native(mol.bfs)
    except Exception:
        from .basis import eri_deriv_bra_py
        dE1 = eri_deriv_bra_py(mol.bfs)
    bfs = mol.bfs
    dS1 = overlap_deriv_bra(bfs)
    dT1 = kinetic_deriv_bra(bfs)
    n = len(bfs)
    dV_bf = np.zeros((3, n, n))
    dV_nuc = {}
    for a, (sym, xyz) in enumerate(mol.atoms):
        dVa = nuclear_deriv_bra(bfs, xyz)
        dV_nuc[a] = dVa
        dV_bf -= ATOMIC_NUMBER[sym] * dVa
    dh1 = dT1 + dV_bf
    ao_atoms = cart_atom_indices(mol)

    out = []
    for a in range(mol.natm):
        m = (ao_atoms == a).astype(float)
        Z = ATOMIC_NUMBER[mol.atoms[a][0]]
        row = []
        for x in range(3):
            dS = m[:, None] * dS1[x] + m[None, :] * dS1[x].T
            dh = (m[:, None] * dh1[x] + m[None, :] * dh1[x].T
                  + Z * (dV_nuc[a][x] + dV_nuc[a][x].T))
            dA = (np.einsum("p, pqkl -> pqkl", m, dE1[x])
                  + np.einsum("q, qpkl -> pqkl", m, dE1[x])
                  + np.einsum("k, klpq -> pqkl", m, dE1[x])
                  + np.einsum("l, lkpq -> pqkl", m, dE1[x]))
            row.append((dS, dh, dA))
        out.append(row)
    return out


def cis_gradient(td, state=1):
    """Analytic nuclear gradient (natm, 3) of E_SCF + ω_TDA for
    ``state`` (1-based).  Restricted closed-shell singlet TDA on the
    Cartesian-AO SCF (spherical bases: run the SCF with
    spherical=False)."""
    mf = td.mf
    mol = mf.mol
    if getattr(mol, "csph", None) is not None:
        raise NotImplementedError("cis_gradient needs the Cartesian-AO "
                                  "SCF (spherical=False)")
    no = mf.nocc
    C = np.asarray(mf.mo_coeff, float)
    nmo = C.shape[1]
    nv = nmo - no
    X = np.asarray(td.xy[:, state - 1], float).reshape(no, nv)
    # singlet: A = dd(e) + 2(ia|jb) − (ij|ab); triplet drops the
    # Coulomb coupling (tdscf.tda_matrix semantics)
    c2 = 2.0 if getattr(td, "singlet", True) else 0.0
    h = jnp.asarray(np.asarray(mf.hcore, float))
    ERI = jnp.asarray(np.asarray(mf.eri, float))
    Cj = jnp.asarray(C)
    Xj = jnp.asarray(X)

    # ---------------- ω(κ; h, ERI): the whole excited-state functional
    def omega(kappa, h_, eri_):
        Cr = Cj + Cj @ kappa               # first order is exact for grads
        Co, Cv = Cr[:, :no], Cr[:, no:]
        D = 2.0 * Co @ Co.T
        J = jnp.einsum("pqkl, kl -> pq", eri_, D)
        K = jnp.einsum("pkql, kl -> pq", eri_, D)
        F = h_ + J - 0.5 * K
        Foo = Co.T @ F @ Co
        Fvv = Cv.T @ F @ Cv
        R = Co @ Xj @ Cv.T
        w = (jnp.einsum("ab, ab ->", Xj.T @ Xj, Fvv)
             - jnp.einsum("ij, ij ->", Xj @ Xj.T, Foo)
             + c2 * jnp.einsum("pqkl, pq, kl ->", eri_, R, R)
             - jnp.einsum("pqkl, pk, ql ->", eri_, R, R))
        return w

    k0 = jnp.zeros((nmo, nmo))
    w0 = float(omega(k0, h, ERI))
    if abs(w0 - float(np.asarray(td.e)[state - 1])) > 1e-6:
        raise RuntimeError(
            f"omega functional ({w0}) != TDA eigenvalue "
            f"({float(np.asarray(td.e)[state - 1])}) — stale td/mf?")

    # AD: orbital Lagrangian and explicit integral weights
    L, Wh, Weri = [np.asarray(g) for g in
                   jax.grad(omega, argnums=(0, 1, 2))(k0, h, ERI)]
    # sanity of the oo/vv-invariance argument (eigenvector property)
    asym = max(np.max(np.abs(L[:no, :no] - L[:no, :no].T)),
               np.max(np.abs(L[no:, no:] - L[no:, no:].T)))
    if asym > 1e-6 * max(1.0, np.max(np.abs(L))):
        raise RuntimeError("oo/vv Lagrangian not symmetric: X is not "
                           "an eigenvector of the TDA matrix")

    # ---------------- CPHF operator: Jacobian of the Brillouin block
    def fock_vo(kappa):
        Cr = Cj + Cj @ kappa
        Co, Cv = Cr[:, :no], Cr[:, no:]
        D = 2.0 * Co @ Co.T
        J = jnp.einsum("pqkl, kl -> pq", ERI, D)
        K = jnp.einsum("pkql, kl -> pq", ERI, D)
        F = h + J - 0.5 * K
        return Cv.T @ F @ Co                       # (nv, no)

    J1 = np.asarray(jax.jacobian(fock_vo)(k0))     # (nv, no, nmo, nmo)

    # linear operator on the vo unknown U_ai (with U_ov = −Sξ_ov − U_voᵀ)
    Mlin = (J1[:, :, no:, :no].reshape(nv * no, nv * no)
            - J1[:, :, :no, no:].transpose(0, 1, 3, 2)
            .reshape(nv * no, nv * no))

    # Z-vector: Mᵀ Z = Λ,  Λ_ai = L_vo − L_ovᵀ
    Lam = (L[no:, :no] - L[:no, no:].T).reshape(-1)
    Z = np.linalg.solve(Mlin.T, Lam).reshape(nv, no)

    # ---------------- per-coordinate assembly
    from .grad import rhf_gradient
    g = np.asarray(rhf_gradient(mf), float).copy()
    derivs = _ao_derivative_mats(mol)
    D0 = np.asarray(mf.dm, float)
    for a in range(mol.natm):
        for x in range(3):
            dS, dh, dA = derivs[a][x]
            # explicit integral part of dω (AD weights)
            dw = float(np.einsum("pq, pq ->", Wh, dh)
                       + np.einsum("pqkl, pqkl ->", Weri, dA))
            # orthonormality (symmetric) parts of U^ξ
            Smo = C.T @ dS @ C
            U = np.zeros((nmo, nmo))
            U[:no, :no] = -0.5 * Smo[:no, :no]
            U[no:, no:] = -0.5 * Smo[no:, no:]
            U[:no, no:] = -Smo[:no, no:]           # U_ov = −Sξ_ov − U_voᵀ
            dw += float(np.einsum("pq, pq ->", L, U))
            # CPHF RHS at this ξ: 0 = F^expl_vo + J1:U_known + Mlin U_vo
            dJ = np.einsum("pqkl, kl -> pq", dA, D0)
            dK = np.einsum("pkql, kl -> pq", dA, D0)
            Fx = dh + dJ - 0.5 * dK
            Fexpl_vo = C[:, no:].T @ Fx @ C[:, :no]
            rhs = -(Fexpl_vo
                    + np.einsum("aipq, pq -> ai", J1, U))
            # response term through the Z vector
            dw += float(np.sum(Z * rhs))
            g[a, x] += dw
    return g


def tda_gradient(td, state=1):
    """Alias of :func:`cis_gradient`."""
    return cis_gradient(td, state)
