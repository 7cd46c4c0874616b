"""Analytic post-SCF nuclear gradients: a generic AD + Z-vector engine.

The reference has no excited-state or correlated forces (its
ground-state gradients delegate to pyscf — pyqed/qchem/grad.py:9).
This module implements analytic nuclear gradients for ANY
frozen-amplitude orbital functional ω(C; h, ERI) — CIS/TDA excitation
energies and the MP2 Hylleraas correlation energy ship here — with a
design that removes the usual hand-derived Furche/Foresman/Pople index
algebra:

* the orbital Lagrangian L_pq = ∂ω/∂κ_pq and the explicit-integral
  weights (∂ω/∂h, ∂ω/∂ERI) come from **jax autodiff** of the ω
  definition (15 lines for CIS, ~25 for MP2);
* the CPHF operator (the Jacobian of the Brillouin block F_vo over
  orbital rotations) is ALSO an autodiff Jacobian;
* ONE Z-vector linear solve converts the 3N response sums into a
  single contraction (Handy-Schaefer).

The only hand-written pieces are the AO derivative-integral
assemblies (the same bra-kernel + position-map patterns as the
trusted ``rhf_gradient``).

Why frozen amplitudes are exact: both functionals are STATIONARY in
their amplitudes (X is a CIS eigenvector; t minimizes the Hylleraas
functional), so amplitude response drops; stationarity also makes ω
first-order invariant under the redundant occ-occ/virt-virt rotations
(for CIS: X†[G, A]X = 0 when AX = ωX), so the antisymmetric U^ξ
blocks drop and the symmetric blocks are fixed by orthonormality,
U_sym = −S^ξ_MO/2.  Everything is pinned against Richardson finite
differences in tests/test_tdgrad.py.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .basis import ATOMIC_NUMBER

__all__ = ["cis_gradient", "tda_gradient", "cis_dipole",
           "mp2_gradient",
           "mp2_dipole", "ccsd_gradient", "tdhf_gradient",
           "tddft_tda_gradient", "tddft_tda_dipole", "ump2_gradient", "ump2_dipole",
           "ucis_gradient", "ucis_dipole", "tdhf_dipole",
           "ccsd_dipole",
           "response_gradient",
           "ResponseEngine"]


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


class ResponseEngine:
    """AD + Z-vector derivative engine for a frozen-amplitude orbital
    functional ω(κ; h, ERI): builds the Lagrangian, the CPHF Jacobian,
    and the Z vector ONCE; :meth:`domega` then evaluates dω for ANY
    perturbation given its AO derivative matrices (dS, dh, dA) —
    nuclear displacements, electric fields (dh = +μ_x in the
    h → h + F·μ_ao convention of dip_moment/polarizability, so
    μ_relaxed = μ_HF − dω/dF; dS = dA = None), or anything else."""

    def __init__(self, mf, omega_fn, check_value=None, check_tol=1e-6,
                 hfx=1.0, xc=None):
        """hfx: exact-exchange fraction in the CPHF Fock (1.0 = HF,
        hybrid fraction for KS, 0.0 pure functionals).
        xc: optional dict with differentiable XC blocks evaluated on
        the traceable Becke grid,
          'omega_xc'(kappa, coords) -> scalar   added to ω,
          'fock_vo_xc'(kappa, coords) -> (nv, no)  added to the
                                                 Brillouin block;
        their ∂/∂κ join the Lagrangian/CPHF operator and their
        ∂/∂coords the per-nuclear-coordinate explicit terms (grid
        points, Becke weights, and AO centers all move — same design
        as grad.xc_nuclear_gradient)."""
        mol = mf.mol
        if getattr(mol, "csph", None) is not None:
            raise NotImplementedError("ResponseEngine needs the "
                                      "Cartesian-AO SCF "
                                      "(spherical=False)")
        self.mf = mf
        no = mf.nocc
        C = np.asarray(mf.mo_coeff, float)
        nmo = C.shape[1]
        nv = nmo - no
        h = jnp.asarray(np.asarray(mf.hcore, float))
        ERI = jnp.asarray(np.asarray(mf.eri, float))
        Cj = jnp.asarray(C)
        self.hfx = hfx
        coords0 = jnp.asarray(np.array([np.asarray(x, float)
                                        for _, x in mol.atoms]))

        k0 = jnp.zeros((nmo, nmo))
        w0 = float(omega_fn(k0, h, ERI))
        if xc is not None:
            w0 += float(xc["omega_xc"](k0, coords0))
        if check_value is not None and abs(w0 - check_value) > check_tol:
            raise RuntimeError(f"omega functional ({w0}) != expected "
                               f"({check_value}) — stale mf/amplitudes?")
        self.w0 = w0

        # AD: orbital Lagrangian and explicit integral weights
        L, Wh, Weri = [np.asarray(g) for g in
                       jax.grad(omega_fn, argnums=(0, 1, 2))(k0, h, ERI)]
        self.gx_omega = None
        if xc is not None:
            Lx, gx = jax.grad(xc["omega_xc"], argnums=(0, 1))(k0, coords0)
            L = L + np.asarray(Lx)
            self.gx_omega = np.asarray(gx)          # (natm, 3)
        # the oo/vv-invariance (amplitude stationarity) check
        asym = max(np.max(np.abs(L[:no, :no] - L[:no, :no].T)),
                   np.max(np.abs(L[no:, no:] - L[no:, no:].T)))
        if asym > 1e-5 * max(1.0, np.max(np.abs(L))):
            raise RuntimeError("oo/vv Lagrangian not symmetric: the "
                               "functional is not stationary in its "
                               "amplitudes")

        # CPHF operator: Jacobian of the Brillouin block
        def fock_vo(kappa):
            Cr = Cj + Cj @ kappa
            Co, Cv = Cr[:, :no], Cr[:, no:]
            D = 2.0 * Co @ Co.T
            J = jnp.einsum("pqkl, kl -> pq", ERI, D)
            K = jnp.einsum("pkql, kl -> pq", ERI, D)
            F = h + J - 0.5 * hfx * K
            return Cv.T @ F @ Co                   # (nv, no)

        J1 = np.asarray(jax.jacobian(fock_vo)(k0))
        self.gx_fockvo = None
        if xc is not None:
            J1 = J1 + np.asarray(
                jax.jacobian(xc["fock_vo_xc"], argnums=0)(k0, coords0))
            self.gx_fockvo = np.asarray(
                jax.jacobian(xc["fock_vo_xc"], argnums=1)(k0, coords0))
        # linear operator on the vo unknown (U_ov = −Sξ_ov − U_voᵀ)
        Mlin = (J1[:, :, no:, :no].reshape(nv * no, nv * no)
                - J1[:, :, :no, no:].transpose(0, 1, 3, 2)
                .reshape(nv * no, nv * no))
        Lam = (L[no:, :no] - L[:no, no:].T).reshape(-1)
        self.Z = np.linalg.solve(Mlin.T, Lam).reshape(nv, no)
        self.L, self.Wh, self.Weri, self.J1 = L, Wh, Weri, J1
        self.C, self.no, self.nmo, self.nv = C, no, nmo, nv
        self.D0 = np.asarray(mf.dm, float)

    def domega(self, dS, dh, dA=None, atom_coord=None):
        """dω for one perturbation from its AO derivative matrices;
        ``atom_coord=(a, x)`` adds the XC grid-motion terms for that
        nuclear coordinate (None for field perturbations)."""
        C, no, nmo = self.C, self.no, self.nmo
        dw = float(np.einsum("pq, pq ->", self.Wh, dh))
        if dA is not None:
            dw += float(np.einsum("pqkl, pqkl ->", self.Weri, dA))
        # orthonormality (symmetric) parts of U^ξ
        Smo = C.T @ dS @ C
        U = np.zeros((nmo, nmo))
        U[:no, :no] = -0.5 * Smo[:no, :no]
        U[no:, no:] = -0.5 * Smo[no:, no:]
        U[:no, no:] = -Smo[:no, no:]               # U_ov = −Sξ_ov − U_voᵀ
        dw += float(np.einsum("pq, pq ->", self.L, U))
        # CPHF RHS: 0 = F^expl_vo + J1:U_known + Mlin U_vo
        Fx = dh.copy()
        if dA is not None:
            Fx = Fx + np.einsum("pqkl, kl -> pq", dA, self.D0) \
                - 0.5 * self.hfx * np.einsum("pkql, kl -> pq", dA,
                                             self.D0)
        Fexpl_vo = C[:, no:].T @ Fx @ C[:, :no]
        if atom_coord is not None and self.gx_fockvo is not None:
            a, x = atom_coord
            Fexpl_vo = Fexpl_vo + self.gx_fockvo[:, :, a, x]
        if atom_coord is not None and self.gx_omega is not None:
            dw += float(self.gx_omega[atom_coord])
        rhs = -(Fexpl_vo + np.einsum("aipq, pq -> ai", self.J1, U))
        return dw + float(np.sum(self.Z * rhs))

    def nuclear_gradient(self):
        """dω/dR (natm, 3) over all nuclear displacements."""
        mol = self.mf.mol
        g = np.zeros((mol.natm, 3))
        derivs = _ao_derivative_mats(mol)
        for a in range(mol.natm):
            for x in range(3):
                g[a, x] = self.domega(*derivs[a][x], atom_coord=(a, x))
        return g


def response_gradient(mf, omega_fn, check_value=None, check_tol=1e-6):
    """dω/dR (natm, 3) for a frozen-amplitude orbital functional.

    omega_fn(kappa, h, eri) -> scalar: ω expressed through rotated MO
    coefficients C(I + κ) and the AO integrals; MUST be stationary in
    its internal amplitudes and therefore first-order invariant under
    occ-occ/virt-virt rotations (validated at runtime through the
    symmetry of the oo/vv Lagrangian blocks).
    ``check_value``: if given, ω(0) must match it to ``check_tol``
    (guards against stale mf/amplitudes)."""
    return ResponseEngine(mf, omega_fn, check_value,
                          check_tol).nuclear_gradient()


# =====================================================================
# CIS / TDA
# =====================================================================

def _cis_engine(td, state=1):
    """ResponseEngine for the frozen-X CIS/TDA functional (shared by
    gradient and dipole clients).  Restricted closed-shell TDA
    (singlet or triplet) on the Cartesian-AO SCF."""
    mf = td.mf
    if hasattr(mf, "f_exc"):
        raise NotImplementedError("cis_gradient covers HF references; "
                                  "TDDFT gradients need the XC kernel "
                                  "in the functional")
    no = mf.nocc
    C = np.asarray(mf.mo_coeff, float)
    nmo = C.shape[1]
    nv = nmo - no
    X = np.asarray(td.xy[:, state - 1], float).reshape(no, nv)
    # singlet: A = dd(e) + 2(ia|jb) − (ij|ab); triplet drops the
    # Coulomb coupling (tdscf.tda_matrix semantics)
    c2 = 2.0 if getattr(td, "singlet", True) else 0.0
    Cj = jnp.asarray(C)
    Xj = jnp.asarray(X)

    def omega(kappa, h_, eri_):
        Cr = Cj + Cj @ kappa           # first order is exact for grads
        Co, Cv = Cr[:, :no], Cr[:, no:]
        D = 2.0 * Co @ Co.T
        J = jnp.einsum("pqkl, kl -> pq", eri_, D)
        K = jnp.einsum("pkql, kl -> pq", eri_, D)
        F = h_ + J - 0.5 * K
        Foo = Co.T @ F @ Co
        Fvv = Cv.T @ F @ Cv
        R = Co @ Xj @ Cv.T
        return (jnp.einsum("ab, ab ->", Xj.T @ Xj, Fvv)
                - jnp.einsum("ij, ij ->", Xj @ Xj.T, Foo)
                + c2 * jnp.einsum("pqkl, pq, kl ->", eri_, R, R)
                - jnp.einsum("pqkl, pk, ql ->", eri_, R, R))

    return ResponseEngine(mf, omega,
                          check_value=float(np.asarray(td.e)[state - 1]))


def cis_gradient(td, state=1):
    """Analytic nuclear gradient (natm, 3) of E_SCF + ω_TDA for
    ``state`` (1-based) — see :func:`_cis_engine`."""
    from .grad import rhf_gradient
    eng = _cis_engine(td, state)
    return np.asarray(rhf_gradient(td.mf), float) \
        + eng.nuclear_gradient()


def tda_gradient(td, state=1):
    """Alias of :func:`cis_gradient`."""
    return cis_gradient(td, state)


def cis_dipole(td, state=1, origin=(0.0, 0.0, 0.0)):
    """Orbital-relaxed EXCITED-STATE dipole moment (3,) in a.u. for
    CIS/TDA state ``state``: μ* = μ_HF − dω/dF through the same
    Z-vector engine with a field perturbation (solvatochromic shifts,
    excited-state charge transfer — the reference has no excited-state
    properties at all)."""
    from .basis import dipole_matrix
    mf = td.mf
    eng = _cis_engine(td, state)
    mu_ao = np.asarray(dipole_matrix(mf.mol.bfs, origin), float)
    zS = np.zeros_like(mu_ao[0])
    mu_hf = np.asarray(mf.dip_moment(origin=origin))
    corr = np.array([eng.domega(zS, mu_ao[x]) for x in range(3)])
    return mu_hf - corr


# =====================================================================
# MP2 (Hylleraas functional)
# =====================================================================

def _mp2_omega(mf):
    """(omega_fn, E2_ref): the frozen-t Hylleraas functional of ``mf``
    (see :func:`mp2_gradient`)."""
    no = mf.nocc
    C = np.asarray(mf.mo_coeff, float)
    nmo = C.shape[1]
    Cj = jnp.asarray(C)
    eps = np.asarray(mf.mo_energy, float)

    # spin-orbital index maps: p_s = 2p (+alpha) / 2p+1 (beta)
    nso, nos = 2 * nmo, 2 * no
    spat = np.repeat(np.arange(nmo), 2)
    spin = np.tile([0, 1], nmo)
    occ_s = np.arange(nos)
    vir_s = np.arange(nos, nso)

    # converged canonical amplitudes (frozen): t_ijab = <ij||ab>/D
    ERI0 = np.asarray(mf.eri, float)
    Cmo = C
    eri_mo = np.einsum("pi, qj, pqkl, kr, ls -> ijrs",
                       Cmo, Cmo, ERI0, Cmo, Cmo, optimize=True)
    # <pq||rs> = (pr|qs)d(sp,sr)d(sq,ss) − (ps|qr)d(sp,ss)d(sq,sr)
    sp_ = spat
    sn_ = spin
    g_so = (eri_mo[np.ix_(sp_, sp_, sp_, sp_)]
            .transpose(0, 2, 1, 3))            # (pr|qs) -> <pq|rs>
    d12 = (sn_[:, None] == sn_[None, :]).astype(float)
    g_aso = (g_so * d12[:, None, :, None] * d12[None, :, None, :]
             - g_so.transpose(0, 1, 3, 2)
             * (sn_[:, None, None, None] == sn_[None, None, None, :])
             * (sn_[None, :, None, None] == sn_[None, None, :, None]))
    eps_s = eps[spat]
    Dden = (eps_s[occ_s, None, None, None]
            + eps_s[None, occ_s, None, None]
            - eps_s[None, None, vir_s, None]
            - eps_s[None, None, None, vir_s])
    t0 = g_aso[np.ix_(occ_s, occ_s, vir_s, vir_s)] / Dden
    e2_ref = 0.25 * float(np.sum(
        t0 * g_aso[np.ix_(occ_s, occ_s, vir_s, vir_s)]))
    tj = jnp.asarray(t0)

    spat_j = jnp.asarray(spat)
    same = jnp.asarray((spin[:, None] == spin[None, :]).astype(float))

    def omega(kappa, h_, eri_):
        Cr = Cj + Cj @ kappa
        Co, Cv = Cr[:, :no], Cr[:, no:]
        D = 2.0 * Co @ Co.T
        J = jnp.einsum("pqkl, kl -> pq", eri_, D)
        K = jnp.einsum("pkql, kl -> pq", eri_, D)
        F = h_ + J - 0.5 * K
        Fmo = Cr.T @ F @ Cr
        emo = jnp.einsum("pi, qj, pqkl, kr, ls -> ijrs",
                         Cr, Cr, eri_, Cr, Cr)
        # spin-orbital antisymmetrized <pq||rs>
        gso = emo[spat_j][:, spat_j][:, :, spat_j][:, :, :, spat_j] \
            .transpose(0, 2, 1, 3)
        s1 = same[:, None, :, None] * same[None, :, None, :]
        s2 = (same[:, None, None, :] * same[None, :, :, None])
        gaso = gso * s1 - gso.transpose(0, 1, 3, 2) * s2
        goovv = gaso[jnp.ix_(jnp.asarray(occ_s), jnp.asarray(occ_s),
                             jnp.asarray(vir_s), jnp.asarray(vir_s))]
        Fso = Fmo[spat_j][:, spat_j] * same
        Foo_s = Fso[:nos, :nos]
        Fvv_s = Fso[nos:, nos:]
        # Hylleraas: J2 = 1/4 [ 2 t·g + t·(A t) ],
        # (A t) = P(ab) Fvv t − P(ij) Foo t
        At = (jnp.einsum("ca, ijcb -> ijab", Fvv_s, tj)
              + jnp.einsum("cb, ijac -> ijab", Fvv_s, tj)
              - jnp.einsum("ik, kjab -> ijab", Foo_s, tj)
              - jnp.einsum("jk, ikab -> ijab", Foo_s, tj))
        return 0.25 * (2.0 * jnp.einsum("ijab, ijab ->", tj, goovv)
                       + jnp.einsum("ijab, ijab ->", tj, At))

    return omega, e2_ref


def mp2_gradient(mf):
    """Analytic MP2 nuclear gradient d(E_SCF + E2)/dR (natm, 3).

    E2 enters as the HYLLERAAS functional with the converged canonical
    amplitudes FROZEN — stationarity in t makes the frozen-t J2[t]
    first-order invariant under the redundant rotations (the canonical
    closed-form E2 with diagonal-F denominators is NOT, and would give
    a wrong gradient).  Spin-orbital formulation inside the functional
    keeps the algebra to four lines; sizes are (2nmo)⁴ — fine for the
    minimal/Pople bases this qchem stack targets."""
    from .grad import rhf_gradient
    omega, e2_ref = _mp2_omega(mf)
    dw = response_gradient(mf, omega, check_value=e2_ref)
    return np.asarray(rhf_gradient(mf), float) + dw


def mp2_dipole(mf, origin=(0.0, 0.0, 0.0)):
    """Orbital-RELAXED MP2 dipole moment (3,) in a.u.: the HF dipole
    plus the correlation correction from the SAME Z-vector engine with
    an electric-field perturbation (dh = +μ_ao[x] per the extra_hcore
    convention h → h + F·μ_ao, dS = dA = 0) —
    μ_MP2 = −d(E_SCF + E2)/dF.  Matches finite-field MP2 energies
    (the unrelaxed density misses the orbital-response part)."""
    from .basis import dipole_matrix
    omega, e2_ref = _mp2_omega(mf)
    eng = ResponseEngine(mf, omega, check_value=e2_ref)
    mu_ao = np.asarray(dipole_matrix(mf.mol.bfs, origin), float)
    zS = np.zeros_like(mu_ao[0])
    mu_hf = np.asarray(mf.dip_moment(origin=origin))
    # field coupling h -> h + F·μ_ao (electron charge −1: E = −F·μ and
    # μ_el = −Tr[D r], matching dip_moment/polarizability's
    # extra_hcore convention);  μ_corr = −dE2/dF
    corr = np.array([eng.domega(zS, mu_ao[x]) for x in range(3)])
    return mu_hf - corr


# =====================================================================
# CCSD (Lagrangian with numerically-solved Λ multipliers)
# =====================================================================

def _spinorb_maps(nmo, no):
    """Interleaved spin-orbital index maps shared by the MP2/CCSD
    functionals (2p = spatial p alpha, 2p+1 = beta — the qchem.ci
    spinorb_ints convention)."""
    spat = np.repeat(np.arange(nmo), 2)
    spin = np.tile([0, 1], nmo)
    same = (spin[:, None] == spin[None, :]).astype(float)
    return jnp.asarray(spat), jnp.asarray(same)


def _so_ints(Cr, h_, eri_, spat_j, same, no):
    """Traceable spin-orbital (F_so full, <pq||rs>) from rotated MO
    coefficients: the Fock matrix is NOT diagonal under rotations —
    the residuals below carry the full non-canonical terms."""
    D = 2.0 * Cr[:, :no] @ Cr[:, :no].T
    J = jnp.einsum("pqkl, kl -> pq", eri_, D)
    K = jnp.einsum("pkql, kl -> pq", eri_, D)
    Fmo = Cr.T @ (h_ + J - 0.5 * K) @ Cr
    Fso = Fmo[spat_j][:, spat_j] * same
    emo = jnp.einsum("pi, qj, pqkl, kr, ls -> ijrs",
                     Cr, Cr, eri_, Cr, Cr)
    gso = emo[spat_j][:, spat_j][:, :, spat_j][:, :, :, spat_j] \
        .transpose(0, 2, 1, 3)
    s1 = same[:, None, :, None] * same[None, :, None, :]
    s2 = same[:, None, None, :] * same[None, :, :, None]
    gaso = gso * s1 - gso.transpose(0, 1, 3, 2) * s2
    return Fso, gaso


def _ccsd_engine(cc):
    """ResponseEngine for the CCSD Lagrangian (shared by
    :func:`ccsd_gradient` and :func:`ccsd_dipole`).

    CCSD is not variational in T, so the engine gets the LAGRANGIAN
    E(T) + Λ·R(T) with multipliers solved NUMERICALLY from the
    autodiff Jacobian of the amplitude residuals (∂R/∂T)ᵀ Λ = −∂E/∂T
    (least-squares over the redundant antisymmetric parametrization) —
    no hand-derived Λ equations.  The residual is the cc.py Stanton
    update times the canonical denominators PLUS the non-canonical
    f_oo/f_vv one-particle terms (the update folds them into D, but
    under orbital rotations F is no longer diagonal).  Pinned against
    Richardson FD of E_SCF + E_CCSD in tests/test_tdgrad.py."""
    mf = cc.mf
    if cc.t1 is None:
        raise ValueError("run CCSD first (cc.run())")
    f0, g0, o, v, d1, d2, no_s, nv_s = cc._setup()
    t1c, t2c = jnp.asarray(cc.t1), jnp.asarray(cc.t2)
    no = mf.nocc
    C = np.asarray(mf.mo_coeff, float)
    nmo = C.shape[1]
    Cj = jnp.asarray(C)
    spat_j, same = _spinorb_maps(nmo, no)

    def residual_full(t1_, t2_, f_, g_):
        r1, r2 = cc._update(t1_, t2_, f_, g_, o, v, 1.0, 1.0)
        R1 = (r1 + jnp.einsum("ie, ae -> ia", t1_, f_[v, v])
              - jnp.einsum("ma, mi -> ia", t1_, f_[o, o]))
        tmp = jnp.einsum("ijae, be -> ijab", t2_, f_[v, v])
        R2 = r2 + tmp - jnp.swapaxes(tmp, 2, 3)
        tmp = jnp.einsum("imab, mj -> ijab", t2_, f_[o, o])
        R2 = R2 - tmp + jnp.swapaxes(tmp, 0, 1)
        return R1, R2

    # consistency: at the converged amplitudes the residual vanishes
    R1c, R2c = residual_full(t1c, t2c, f0, g0)
    rmax = max(float(jnp.max(jnp.abs(R1c))), float(jnp.max(jnp.abs(R2c))))
    if rmax > 1e-6:
        raise RuntimeError(f"CCSD residual {rmax:.2e} at the converged "
                           "amplitudes — non-canonical extension "
                           "inconsistent with cc._update, or CCSD not "
                           "converged")

    n1 = t1c.size
    shape2 = t2c.shape

    def unpack(tvec):
        return (tvec[:n1].reshape(t1c.shape),
                tvec[n1:].reshape(shape2))

    def Rflat(tvec):
        R1, R2 = residual_full(*unpack(tvec), f0, g0)
        return jnp.concatenate([R1.ravel(), R2.ravel()])

    def Eflat(tvec):
        t1_, t2_ = unpack(tvec)
        return cc._energy_expr(t1_, t2_, f0, g0, o, v)

    tvec = jnp.concatenate([t1c.ravel(), t2c.ravel()])
    JR = np.asarray(jax.jacfwd(Rflat)(tvec))
    dE = np.asarray(jax.grad(Eflat)(tvec))
    # solve in the ANTISYMMETRIC t2 subspace: the flattened
    # parametrization is redundant (t_ijab = −t_jiab = −t_ijba), the
    # full-space system is inconsistent, and only the projected
    # stationarity matters (orbital-response directions are
    # antisymmetric) — projected, the system is exactly solvable
    # (residual at round-off)
    N = tvec.size

    def _proj(vec):
        a, b = vec[:n1], vec[n1:].reshape(shape2)
        b = 0.25 * (b - b.transpose(1, 0, 2, 3) - b.transpose(0, 1, 3, 2)
                    + b.transpose(1, 0, 3, 2))
        return np.concatenate([a, b.ravel()])

    P = np.zeros((N, N))
    for k in range(N):
        e = np.zeros(N)
        e[k] = 1.0
        P[:, k] = _proj(e)
    lam, *_ = np.linalg.lstsq(P @ JR.T, -(P @ dE), rcond=None)
    resid = float(np.max(np.abs(P @ (dE + JR.T @ lam))))
    if resid > 1e-8:
        raise RuntimeError(f"Lambda equations not solved ({resid:.2e})")
    l1 = jnp.asarray(lam[:n1].reshape(t1c.shape))
    l2 = jnp.asarray(lam[n1:].reshape(shape2))

    e_ref = float(cc.e_corr)

    def omega(kappa, h_, eri_):
        Cr = Cj + Cj @ kappa
        Fso, gaso = _so_ints(Cr, h_, eri_, spat_j, same, no)
        E = cc._energy_expr(t1c, t2c, Fso, gaso, o, v)
        R1, R2 = residual_full(t1c, t2c, Fso, gaso)
        return E + jnp.sum(l1 * R1) + jnp.sum(l2 * R2)

    return ResponseEngine(mf, omega, check_value=e_ref)


def ccsd_gradient(cc):
    """Analytic CCSD nuclear gradient d(E_SCF + E_CCSD)/dR (natm, 3):
    see :func:`_ccsd_engine` for the Lagrangian construction (numeric
    Λ from the autodiff residual Jacobian)."""
    from .grad import rhf_gradient
    eng = _ccsd_engine(cc)
    return np.asarray(rhf_gradient(cc.mf), float) \
        + eng.nuclear_gradient()


def ccsd_dipole(cc, origin=(0.0, 0.0, 0.0)):
    """Orbital-relaxed CCSD dipole moment (3,) in a.u. — the HF dipole
    plus the correlation correction from the SAME CCSD Lagrangian
    engine with a field perturbation (μ = −dE/dF; field coupling
    h -> h + F·μ_ao, the dip_moment/polarizability convention)."""
    from .basis import dipole_matrix
    mf = cc.mf
    eng = _ccsd_engine(cc)
    mu_ao = np.asarray(dipole_matrix(mf.mol.bfs, origin), float)
    zS = np.zeros_like(mu_ao[0])
    mu_hf = np.asarray(mf.dip_moment(origin=origin))
    corr = np.array([eng.domega(zS, mu_ao[x]) for x in range(3)])
    return mu_hf - corr


# =====================================================================
# TDHF / RPA excited states
# =====================================================================

def _tdhf_engine(td, state=1):
    """ResponseEngine for the frozen-(X, Y) RPA bilinear (shared by
    the gradient and dipole clients).  The ω bilinear

        ω = (X,Y)·[[A, B], [B, A]]·(X,Y)   with  X² − Y² = 1

    is stationary at the RPA eigenpair (δX: AX + BY = ωX; δY:
    BX + AY = −ωY), so the frozen-(X, Y) functional rides the same
    engine as CIS — the Y amplitudes just add their own pathway
    contractions."""
    mf = td.mf
    if hasattr(mf, "f_exc"):
        raise NotImplementedError("tdhf_gradient covers HF references; "
                                  "TDDFT gradients need the XC kernel "
                                  "in the functional")
    no = mf.nocc
    C = np.asarray(mf.mo_coeff, float)
    nmo = C.shape[1]
    nv = nmo - no
    X, Y = td.xy[state - 1]
    X = np.asarray(X, float).reshape(no, nv)
    Y = np.asarray(Y, float).reshape(no, nv)
    c2 = 2.0 if getattr(td, "singlet", True) else 0.0
    Cj = jnp.asarray(C)
    Xj = jnp.asarray(X)
    Yj = jnp.asarray(Y)

    def omega(kappa, h_, eri_):
        Cr = Cj + Cj @ kappa
        Co, Cv = Cr[:, :no], Cr[:, no:]
        D = 2.0 * Co @ Co.T
        J = jnp.einsum("pqkl, kl -> pq", eri_, D)
        K = jnp.einsum("pkql, kl -> pq", eri_, D)
        F = h_ + J - 0.5 * K
        Foo = Co.T @ F @ Co
        Fvv = Cv.T @ F @ Cv
        RX = Co @ Xj @ Cv.T
        RY = Co @ Yj @ Cv.T
        w = (jnp.einsum("ab, ab ->", Xj.T @ Xj + Yj.T @ Yj, Fvv)
             - jnp.einsum("ij, ij ->", Xj @ Xj.T + Yj @ Yj.T, Foo)
             + c2 * (jnp.einsum("pqkl, pq, kl ->", eri_, RX, RX)
                     + jnp.einsum("pqkl, pq, kl ->", eri_, RY, RY)
                     + 2.0 * jnp.einsum("pqkl, pq, kl ->", eri_, RX, RY))
             - jnp.einsum("pqkl, pk, ql ->", eri_, RX, RX)
             - jnp.einsum("pqkl, pk, ql ->", eri_, RY, RY)
             - 2.0 * jnp.einsum("pqkl, pl, kq ->", eri_, RX, RY))
        return w

    return ResponseEngine(mf, omega,
                          check_value=float(np.asarray(td.e)[state - 1]))


def tdhf_gradient(td, state=1):
    """Analytic TDHF/RPA excited-state nuclear gradient — see
    :func:`_tdhf_engine`."""
    from .grad import rhf_gradient
    eng = _tdhf_engine(td, state)
    return np.asarray(rhf_gradient(td.mf), float) \
        + eng.nuclear_gradient()


def tdhf_dipole(td, state=1, origin=(0.0, 0.0, 0.0)):
    """Relaxed TDHF/RPA EXCITED-STATE dipole moment (3,) in a.u."""
    from .basis import dipole_matrix
    mf = td.mf
    eng = _tdhf_engine(td, state)
    mu_ao = np.asarray(dipole_matrix(mf.mol.bfs, origin), float)
    zS = np.zeros_like(mu_ao[0])
    mu_hf = np.asarray(mf.dip_moment(origin=origin))
    corr = np.array([eng.domega(zS, mu_ao[x]) for x in range(3)])
    return mu_hf - corr


# =====================================================================
# TDDFT (TDA on an LDA Kohn-Sham reference)
# =====================================================================

def _tddft_tda_engine(td, state=1):
    """Build the TDDFT/TDA response engine used by
    :func:`tddft_tda_gradient` and :func:`tddft_tda_dipole`,
    for TDA on an RKS reference — LDA, GGA, and hybrid functionals
    (singlet or triplet) through ONE formulation: every XC response
    object is a DIRECTIONAL DERIVATIVE of the plain E_xc[D] evaluator
    on the traceable Becke grid (grad.traceable_xc_setup's exc_dm):

      one-particle Tr[T V_xc]    = d/dε E_xc[D + ε T]
      singlet kernel ⟨u|f_xc|u⟩  = 2 d²/dε² E_xc[ρ ± ε u/2 per spin]
      triplet (spin-flip)        = ½ d²/dε² E_xc[ρ_a + ε u, ρ_b − ε u]
      V_xc matrix                = ∂E_xc/∂D

    so the GGA σ-channel terms, the g_xc third derivatives (through
    ρ(κ)), and the grid/Becke/AO-center motion (through coords) all
    come from jax autodiff of ONE scalar function — zero hand-derived
    kernel algebra.  Hybrids: the exact-exchange fraction rides the
    non-XC part (hfx)."""
    mf = td.mf
    if not hasattr(mf, "f_exc"):
        raise TypeError("tddft_tda_gradient expects an RKS mean-field; "
                        "use cis_gradient for HF")
    if getattr(mf, "_needs_grad", True):
        raise NotImplementedError(
            "analytic TDDFT gradients cover LDA (xc='svwn'): for GGA/"
            "hybrids the shipped kernel (tdscf.xc_kernel_ov, FD-pinned "
            "to 2e-6) and the differentiable E_xc evaluator regularize "
            "the small-density tail differently (analytic-at-floor vs "
            "clamped derivatives; measured 1.9e-3 kernel offset on "
            "LiH), so the analytic derivative would not match FD of "
            "the shipped omega.  Use tda_gradient_fd(..., method='RKS',"
            " xc=...) for GGA excited-state forces.")
    from .grad import traceable_xc_setup, ks_gradient

    mol = mf.mol
    no = mf.nocc
    C = np.asarray(mf.mo_coeff, float)
    nmo = C.shape[1]
    nv = nmo - no
    X = np.asarray(td.xy[:, state - 1], float).reshape(no, nv)
    singlet = bool(getattr(td, "singlet", True))
    c2 = 2.0 if singlet else 0.0
    hfx = float(getattr(mf, "hfx", 0.0))
    Cj = jnp.asarray(C)
    Xj = jnp.asarray(X)

    tools = traceable_xc_setup(mol, mf)
    exc_dm = tools["exc_dm"]

    def omega_nonxc(kappa, h_, eri_):
        Cr = Cj + Cj @ kappa
        Co, Cv = Cr[:, :no], Cr[:, no:]
        D = 2.0 * Co @ Co.T
        J = jnp.einsum("pqkl, kl -> pq", eri_, D)
        K = jnp.einsum("pkql, kl -> pq", eri_, D)
        F = h_ + J - 0.5 * hfx * K
        Foo = Co.T @ F @ Co
        Fvv = Cv.T @ F @ Cv
        R = Co @ Xj @ Cv.T
        return (jnp.einsum("ab, ab ->", Xj.T @ Xj, Fvv)
                - jnp.einsum("ij, ij ->", Xj @ Xj.T, Foo)
                + c2 * jnp.einsum("pqkl, pq, kl ->", eri_, R, R)
                - hfx * jnp.einsum("pqkl, pk, ql ->", eri_, R, R))

    def omega_xc(kappa, coords):
        Cr = Cj + Cj @ kappa
        Co, Cv = Cr[:, :no], Cr[:, no:]
        Dh = Co @ Co.T                         # per-spin density
        T = Cv @ (Xj.T @ Xj) @ Cv.T - Co @ (Xj @ Xj.T) @ Co.T
        R = Co @ Xj @ Cv.T

        def e_one(eps):
            return exc_dm(coords, Dh + 0.5 * eps * T,
                          Dh + 0.5 * eps * T)

        one = jax.grad(e_one)(0.0)
        if singlet:
            def e_ker(eps):
                return exc_dm(coords, Dh + 0.5 * eps * R,
                              Dh + 0.5 * eps * R)
            ker = 2.0 * jax.grad(jax.grad(e_ker))(0.0)
        else:
            def e_ker(eps):
                return exc_dm(coords, Dh + eps * R, Dh - eps * R)
            ker = 0.5 * jax.grad(jax.grad(e_ker))(0.0)
        return one + ker

    def fock_vo_xc(kappa, coords):
        Cr = Cj + Cj @ kappa
        Co, Cv = Cr[:, :no], Cr[:, no:]
        D = 2.0 * Co @ Co.T
        Vxc = jax.grad(
            lambda Dt: exc_dm(coords, 0.5 * Dt, 0.5 * Dt))(D)
        return Cv.T @ Vxc @ Co

    return ResponseEngine(
        mf, omega_nonxc, hfx=hfx,
        xc=dict(omega_xc=omega_xc, fock_vo_xc=fock_vo_xc),
        check_value=float(np.asarray(td.e)[state - 1]),
        check_tol=5e-5)      # the TDA matrix and this functional build
    # the kernel with the same quadrature but different groupings; the
    # agreement floor is the grid resolution, not exactness


def tddft_tda_gradient(td, state=1):
    """Analytic TDDFT excited-state nuclear gradient d(E_KS + ω)/dR
    for TDA on an RKS reference — all XC response objects are
    directional derivatives of ONE differentiable E_xc[D] on the
    traceable Becke grid; see :func:`_tddft_tda_engine`.  LDA only
    (GGA raises with the documented kernel-tail offset)."""
    from .grad import ks_gradient
    eng = _tddft_tda_engine(td, state)
    return np.asarray(ks_gradient(td.mf), float) \
        + eng.nuclear_gradient()


def tddft_tda_dipole(td, state=1, origin=(0.0, 0.0, 0.0)):
    """Orbital-relaxed TDDFT/TDA (LDA) EXCITED-STATE dipole moment
    (3,): μ* = μ_KS − dω/dF on the same engine — the field enters h
    only, so no XC grid-motion terms (atom_coord stays None)."""
    from .basis import dipole_matrix
    mf = td.mf
    eng = _tddft_tda_engine(td, state)
    mu_ao = np.asarray(dipole_matrix(mf.mol.bfs, origin), float)
    zS = np.zeros_like(mu_ao[0])
    mu_ks = np.asarray(mf.dip_moment(origin=origin))
    corr = np.array([eng.domega(zS, mu_ao[x]) for x in range(3)])
    return mu_ks - corr


# =====================================================================
# open-shell (UHF) engine + UMP2
# =====================================================================

class ResponseEngineU:
    """Open-shell version of :class:`ResponseEngine`: per-spin orbital
    rotations κ = (κ_a, κ_b) stacked as one (2, nmo, nmo) array, two
    Brillouin blocks (F^a_vo, F^b_vo) in one CPHF operator (the cross-
    spin Coulomb coupling rides the autodiff Jacobian), one stacked
    Z-vector solve."""

    def __init__(self, mf, omega_fn, check_value=None, check_tol=1e-6):
        mol = mf.mol
        if getattr(mol, "csph", None) is not None:
            raise NotImplementedError("Cartesian-AO SCF only")
        self.mf = mf
        Ca, Cb = [np.asarray(c, float) for c in mf.mo_coeff]
        na, nb = mf.nocc
        nmo = Ca.shape[1]
        nva, nvb = nmo - na, nmo - nb
        h = jnp.asarray(np.asarray(mf.hcore, float))
        ERI = jnp.asarray(np.asarray(mf.eri, float))
        Caj, Cbj = jnp.asarray(Ca), jnp.asarray(Cb)

        k0 = jnp.zeros((2, nmo, nmo))
        w0 = float(omega_fn(k0, h, ERI))
        if check_value is not None and abs(w0 - check_value) > check_tol:
            raise RuntimeError(f"omega functional ({w0}) != expected "
                               f"({check_value})")
        self.w0 = w0

        L, Wh, Weri = [np.asarray(g) for g in
                       jax.grad(omega_fn, argnums=(0, 1, 2))(k0, h, ERI)]
        for s, n_o in ((0, na), (1, nb)):
            asym = max(
                np.max(np.abs(L[s, :n_o, :n_o] - L[s, :n_o, :n_o].T)),
                np.max(np.abs(L[s, n_o:, n_o:] - L[s, n_o:, n_o:].T)))
            if asym > 1e-5 * max(1.0, np.max(np.abs(L))):
                raise RuntimeError("oo/vv Lagrangian not symmetric "
                                   f"(spin {s}): functional not "
                                   "stationary in its amplitudes")

        def fock_vo(kappa):
            Car = Caj + Caj @ kappa[0]
            Cbr = Cbj + Cbj @ kappa[1]
            Da = Car[:, :na] @ Car[:, :na].T
            Db = Cbr[:, :nb] @ Cbr[:, :nb].T
            J = jnp.einsum("pqkl, kl -> pq", ERI, Da + Db)
            Ka = jnp.einsum("pkql, kl -> pq", ERI, Da)
            Kb = jnp.einsum("pkql, kl -> pq", ERI, Db)
            Fa = h + J - Ka
            Fb = h + J - Kb
            return jnp.concatenate(
                [(Car[:, na:].T @ Fa @ Car[:, :na]).ravel(),
                 (Cbr[:, nb:].T @ Fb @ Cbr[:, :nb]).ravel()])

        J1 = np.asarray(jax.jacobian(fock_vo)(k0))  # (N, 2, nmo, nmo)
        N = J1.shape[0]

        # unknowns: [U^a_vo.ravel(), U^b_vo.ravel()]; known symmetric
        # parts handled in domega.  Column map for the linear operator:
        cols = []
        for s, (n_o, n_v) in ((0, (na, nva)), (1, (nb, nvb))):
            blk = (J1[:, s, n_o:, :n_o]
                   - J1[:, s, :n_o, n_o:].transpose(0, 2, 1))
            cols.append(blk.reshape(N, n_v * n_o))
        Mlin = np.concatenate(cols, axis=1)         # (N, N)
        Lam = np.concatenate(
            [(L[0, na:, :na] - L[0, :na, na:].T).ravel(),
             (L[1, nb:, :nb] - L[1, :nb, nb:].T).ravel()])
        self.Z = np.linalg.solve(Mlin.T, Lam)
        self.L, self.Wh, self.Weri, self.J1 = L, Wh, Weri, J1
        self.Ca, self.Cb = Ca, Cb
        self.na, self.nb, self.nmo = na, nb, nmo
        self.Da = np.asarray(mf.dm[0], float)
        self.Db = np.asarray(mf.dm[1], float)

    def domega(self, dS, dh, dA=None):
        Ca, Cb, na, nb, nmo = self.Ca, self.Cb, self.na, self.nb, self.nmo
        dw = float(np.einsum("pq, pq ->", self.Wh, dh))
        if dA is not None:
            dw += float(np.einsum("pqkl, pqkl ->", self.Weri, dA))
        U = np.zeros((2, nmo, nmo))
        for s, (C, n_o) in ((0, (Ca, na)), (1, (Cb, nb))):
            Smo = C.T @ dS @ C
            U[s, :n_o, :n_o] = -0.5 * Smo[:n_o, :n_o]
            U[s, n_o:, n_o:] = -0.5 * Smo[n_o:, n_o:]
            U[s, :n_o, n_o:] = -Smo[:n_o, n_o:]
        dw += float(np.einsum("spq, spq ->", self.L, U))
        dJ = np.einsum("pqkl, kl -> pq", dA, self.Da + self.Db) \
            if dA is not None else 0.0
        rhs_parts = []
        for s, (C, n_o, Ds) in ((0, (Ca, na, self.Da)),
                                (1, (Cb, nb, self.Db))):
            Fx = dh.copy()
            if dA is not None:
                dK = np.einsum("pkql, kl -> pq", dA, Ds)
                Fx = Fx + dJ - dK
            rhs_parts.append((C[:, n_o:].T @ Fx @ C[:, :n_o]).ravel())
        Fexpl = np.concatenate(rhs_parts)
        rhs = -(Fexpl + np.einsum("nspq, spq -> n", self.J1, U))
        return dw + float(self.Z @ rhs)

    def nuclear_gradient(self):
        mol = self.mf.mol
        g = np.zeros((mol.natm, 3))
        derivs = _ao_derivative_mats(mol)
        for a in range(mol.natm):
            for x in range(3):
                g[a, x] = self.domega(*derivs[a][x])
        return g


def _ump2_engine(mf):
    """ResponseEngineU for the open-shell Hylleraas functional (shared
    by :func:`ump2_gradient` and :func:`ump2_dipole`): one (nao, 2nmo)
    spin-MO matrix Cso(κ) built from (C_a(κ_a), C_b(κ_b)) makes the
    construction IDENTICAL to the closed-shell :func:`mp2_gradient`."""
    Ca, Cb = [np.asarray(c, float) for c in mf.mo_coeff]
    na, nb = mf.nocc
    nmo = Ca.shape[1]
    ea, eb = [np.asarray(e, float) for e in mf.mo_energy]

    # interleaved spin-orbital order: 2p = (p, alpha), 2p+1 = (p, beta)
    nso = 2 * nmo
    spin = np.tile([0, 1], nmo)
    eps_s = np.empty(nso)
    eps_s[0::2] = ea
    eps_s[1::2] = eb
    # occupied spin-orbitals: energy-independent layout — take alpha
    # occ then beta occ via an index permutation
    occ_s = np.concatenate([2 * np.arange(na), 2 * np.arange(nb) + 1])
    vir_s = np.array([p for p in range(nso) if p not in set(occ_s)])
    same = (spin[:, None] == spin[None, :]).astype(float)

    Caj, Cbj = jnp.asarray(Ca), jnp.asarray(Cb)
    samej = jnp.asarray(same)
    occ_j, vir_j = jnp.asarray(occ_s), jnp.asarray(vir_s)

    def cso_of(kappa):
        Car = Caj + Caj @ kappa[0]
        Cbr = Cbj + Cbj @ kappa[1]
        Cso = jnp.zeros((Ca.shape[0], nso))
        Cso = Cso.at[:, 0::2].set(Car)
        Cso = Cso.at[:, 1::2].set(Cbr)
        return Cso

    def so_ints(kappa, h_, eri_):
        Cso = cso_of(kappa)
        Da = (Caj + Caj @ kappa[0])[:, :na] @ (Caj + Caj @ kappa[0])[:, :na].T
        Db = (Cbj + Cbj @ kappa[1])[:, :nb] @ (Cbj + Cbj @ kappa[1])[:, :nb].T
        J = jnp.einsum("pqkl, kl -> pq", eri_, Da + Db)
        Ka = jnp.einsum("pkql, kl -> pq", eri_, Da)
        Kb = jnp.einsum("pkql, kl -> pq", eri_, Db)
        Fa = h_ + J - Ka
        Fb = h_ + J - Kb
        Fso = jnp.zeros((nso, nso))
        Car = Caj + Caj @ kappa[0]
        Cbr = Cbj + Cbj @ kappa[1]
        Fso = Fso.at[0::2, 0::2].set(Car.T @ Fa @ Car)
        Fso = Fso.at[1::2, 1::2].set(Cbr.T @ Fb @ Cbr)
        emo = jnp.einsum("pi, qj, pqkl, kr, ls -> ijrs",
                         Cso, Cso, eri_, Cso, Cso)
        gso = emo.transpose(0, 2, 1, 3)          # <pq|rs>
        s1 = samej[:, None, :, None] * samej[None, :, None, :]
        s2 = samej[:, None, None, :] * samej[None, :, :, None]
        gaso = gso * s1 - gso.transpose(0, 1, 3, 2) * s2
        return Fso, gaso

    # frozen canonical amplitudes
    k0 = jnp.zeros((2, nmo, nmo))
    h0 = jnp.asarray(np.asarray(mf.hcore, float))
    E0 = jnp.asarray(np.asarray(mf.eri, float))
    F0, g0 = so_ints(k0, h0, E0)
    goovv = np.asarray(g0)[np.ix_(occ_s, occ_s, vir_s, vir_s)]
    Dden = (eps_s[occ_s][:, None, None, None]
            + eps_s[occ_s][None, :, None, None]
            - eps_s[vir_s][None, None, :, None]
            - eps_s[vir_s][None, None, None, :])
    t0 = goovv / Dden
    e2_ref = 0.25 * float(np.sum(t0 * goovv))
    tj = jnp.asarray(t0)

    def omega(kappa, h_, eri_):
        Fso, gaso = so_ints(kappa, h_, eri_)
        go = gaso[jnp.ix_(occ_j, occ_j, vir_j, vir_j)]
        Foo = Fso[jnp.ix_(occ_j, occ_j)]
        Fvv = Fso[jnp.ix_(vir_j, vir_j)]
        At = (jnp.einsum("ca, ijcb -> ijab", Fvv, tj)
              + jnp.einsum("cb, ijac -> ijab", Fvv, tj)
              - jnp.einsum("ik, kjab -> ijab", Foo, tj)
              - jnp.einsum("jk, ikab -> ijab", Foo, tj))
        return 0.25 * (2.0 * jnp.einsum("ijab, ijab ->", tj, go)
                       + jnp.einsum("ijab, ijab ->", tj, At))

    return ResponseEngineU(mf, omega, check_value=e2_ref)


def ump2_gradient(mf):
    """Analytic UMP2 nuclear gradient for open shells (UHF
    reference) — see :func:`_ump2_engine`."""
    from .grad import rhf_gradient
    eng = _ump2_engine(mf)
    return np.asarray(rhf_gradient(mf), float) + eng.nuclear_gradient()


def _ucis_engine(td, state=1):
    """ResponseEngineU for the frozen (X_a, X_b) UCIS functional
    (shared by gradient and dipole clients): Coulomb couples the total
    transition density, exchange stays within each spin."""
    mf = td.mf
    Ca, Cb = [np.asarray(c, float) for c in mf.mo_coeff]
    na, nb = mf.nocc
    Xa, Xb = td.xy[state - 1]
    Caj, Cbj = jnp.asarray(Ca), jnp.asarray(Cb)
    Xaj, Xbj = jnp.asarray(np.asarray(Xa, float)), \
        jnp.asarray(np.asarray(Xb, float))

    def omega(kappa, h_, eri_):
        Car = Caj + Caj @ kappa[0]
        Cbr = Cbj + Cbj @ kappa[1]
        Cao, Cav = Car[:, :na], Car[:, na:]
        Cbo, Cbv = Cbr[:, :nb], Cbr[:, nb:]
        Da = Cao @ Cao.T
        Db = Cbo @ Cbo.T
        J = jnp.einsum("pqkl, kl -> pq", eri_, Da + Db)
        Ka = jnp.einsum("pkql, kl -> pq", eri_, Da)
        Kb = jnp.einsum("pkql, kl -> pq", eri_, Db)
        Fa = h_ + J - Ka
        Fb = h_ + J - Kb
        Ra = Cao @ Xaj @ Cav.T
        Rb = Cbo @ Xbj @ Cbv.T
        Rt = Ra + Rb
        return (jnp.einsum("ab, ab ->", Xaj.T @ Xaj, Cav.T @ Fa @ Cav)
                - jnp.einsum("ij, ij ->", Xaj @ Xaj.T, Cao.T @ Fa @ Cao)
                + jnp.einsum("ab, ab ->", Xbj.T @ Xbj, Cbv.T @ Fb @ Cbv)
                - jnp.einsum("ij, ij ->", Xbj @ Xbj.T, Cbo.T @ Fb @ Cbo)
                + jnp.einsum("pqkl, pq, kl ->", eri_, Rt, Rt)
                - jnp.einsum("pqkl, pk, ql ->", eri_, Ra, Ra)
                - jnp.einsum("pqkl, pk, ql ->", eri_, Rb, Rb))

    return ResponseEngineU(mf, omega,
                           check_value=float(np.asarray(td.e)[state - 1]))


def ucis_gradient(td, state=1):
    """Analytic UCIS excited-state nuclear gradient — see
    :func:`_ucis_engine`."""
    from .grad import rhf_gradient
    eng = _ucis_engine(td, state)
    return np.asarray(rhf_gradient(td.mf), float) \
        + eng.nuclear_gradient()


def ucis_dipole(td, state=1, origin=(0.0, 0.0, 0.0)):
    """Relaxed UCIS EXCITED-STATE dipole moment for radicals (3,)."""
    from .basis import dipole_matrix
    mf = td.mf
    eng = _ucis_engine(td, state)
    mu_ao = np.asarray(dipole_matrix(mf.mol.bfs, origin), float)
    zS = np.zeros_like(mu_ao[0])
    Da, Db = [np.asarray(d) for d in mf.dm]
    el = -np.einsum("kpq, qp -> k", mu_ao, Da + Db)
    R = np.asarray(mf.mol.atom_coords()) - np.asarray(origin)
    Z = np.asarray(mf.mol.atom_charges(), float)
    mu_hf = Z @ R + el
    corr = np.array([eng.domega(zS, mu_ao[x]) for x in range(3)])
    return mu_hf - corr


def ump2_dipole(mf, origin=(0.0, 0.0, 0.0)):
    """Orbital-relaxed UMP2 dipole moment for open shells (3,) in
    a.u.: the UHF dipole plus the correlation correction from the
    open-shell Z-vector engine with a field perturbation."""
    from .basis import dipole_matrix
    eng = _ump2_engine(mf)
    mu_ao = np.asarray(dipole_matrix(mf.mol.bfs, origin), float)
    zS = np.zeros_like(mu_ao[0])
    Da, Db = [np.asarray(d) for d in mf.dm]
    el = -np.einsum("kpq, qp -> k", mu_ao, Da + Db)
    R = np.asarray(mf.mol.atom_coords()) - np.asarray(origin)
    Z = np.asarray(mf.mol.atom_charges(), float)
    mu_hf = Z @ R + el
    corr = np.array([eng.domega(zS, mu_ao[x]) for x in range(3)])
    return mu_hf - corr
