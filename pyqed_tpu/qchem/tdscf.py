"""Time-dependent SCF: TDA (CIS), TDHF (RPA), and TDDFT excitation
energies.

TPU-native counterpart of the reference TDSCF layer
(reference: pyqed/qchem/tdscf/, pyqed/qchem/core.py:444 — TDHF/TDA +
core-excitation RXS variants; the reference reaches TDDFT through
pyscf, pyqed/qchem/mol.py:817).

The A/B response matrices are built with einsums from the MO-basis ERIs
and diagonalized on the MXU. Kohn-Sham mean-fields get the adiabatic
LDA XC kernel f_xc = d^2 e_xc / d rho^2 by jax autodiff of the SAME
energy density used in the ground-state SCF (no hand-derived kernel);
the GGA/hybrid singlet kernel comes from the same autodiff applied to
the total-density channel F(rho, sigma) with grad-rho chain terms, and
the triplet kernel from the spin-resolved Hessian of
f(rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb) in the spin-flip
direction (cross-validated against finite differences of the UKS
potential in tests).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _mo_blocks(mf):
    hmo, eri_mo = mf.mo_ints()
    nocc = mf.nocc
    nmo = hmo.shape[0]
    nvir = nmo - nocc
    e = mf.mo_energy
    return np.asarray(eri_mo), np.asarray(e), nocc, nvir


def _is_ks(mf):
    return hasattr(mf, "f_exc")


def _hfx(mf):
    """Fraction of exact exchange in the response kernel: 1 for HF."""
    return float(mf.hfx) if _is_ks(mf) else 1.0


def xc_kernel_ov(mf, singlet=True):
    """Adiabatic LDA XC kernel in the occ-virt product basis:
    K_{ia,jb} = sum_g w_g [f_aa +- f_ab](rho_g) phi_i phi_a phi_j phi_b
    (+ singlet, - triplet) with f_ss' = d^2 e_xc / d rho_s d rho_s' at
    rho_a = rho_b = rho/2, autodiffed from the ground-state energy
    density."""
    import jax
    from .dft import _exc_density
    ao, w = np.asarray(mf.ao), np.asarray(mf.grid[1])
    D = np.asarray(mf.dm)
    rho = np.maximum(np.einsum("pi, ij, pj -> p", ao, D, ao), 1e-12)
    C = np.asarray(mf.mo_coeff)
    mo = ao @ C                               # (P, nmo)
    nocc = mf.nocc
    phi = np.einsum("pi, pa -> pia", mo[:, :nocc], mo[:, nocc:])
    nov = phi.shape[1] * phi.shape[2]
    if not mf._needs_grad:                    # ---- LDA
        faa = jax.vmap(jax.grad(jax.grad(_exc_density, 0), 0))
        fab = jax.vmap(jax.grad(jax.grad(_exc_density, 0), 1))
        sgn = 1.0 if singlet else -1.0
        k = np.asarray(faa(rho / 2, rho / 2) + sgn * fab(rho / 2, rho / 2))
        K = np.einsum("p, pia, pjb -> iajb", w * k, phi, phi)
        return K.reshape(nov, nov)
    # ---- GGA / hybrid-DFT part ----
    gao = np.asarray(mf.ao_grad)              # (P, nao, 3)
    grho = 2.0 * np.einsum("pid, ij, pj -> pd", gao, D, ao)
    sigma = np.maximum(np.sum(grho * grho, axis=1), 1e-24)
    # MO-product values and gradients on the grid
    gmo = np.einsum("pid, ij -> pjd", gao, C)          # (P, nmo, 3)
    gphi = (np.einsum("pid, pa -> piad", gmo[:, :nocc], mo[:, nocc:])
            + np.einsum("pi, pad -> piad", mo[:, :nocc],
                        gmo[:, nocc:]))                # (P, i, a, 3)
    if singlet:
        # singlet = total-density channel: E = int F(rho, sigma),
        # sigma = |grad rho|^2; perturbing rho -> rho + eps*u gives
        # K[u, u'] = int [F_rr u u' + F_rs (u s' + s u') + F_ss s s'
        #                 + 2 F_s grad u . grad u'],
        # s = 2 grad rho . grad u
        def F(r, s):
            return mf.f_exc(r / 2, r / 2, s / 4, s / 4, s / 4)

        Fs = jax.vmap(jax.grad(F, 1))
        Frr = jax.vmap(jax.grad(jax.grad(F, 0), 0))
        Frs = jax.vmap(jax.grad(jax.grad(F, 0), 1))
        Fss = jax.vmap(jax.grad(jax.grad(F, 1), 1))
        fs, frr, frs, fss = (np.asarray(f(rho, sigma))
                             for f in (Fs, Frr, Frs, Fss))
        s_ia = 2.0 * np.einsum("pd, piad -> pia", grho, gphi)
        K = (np.einsum("p, pia, pjb -> iajb", w * frr, phi, phi)
             + np.einsum("p, pia, pjb -> iajb", w * frs, phi, s_ia)
             + np.einsum("p, pia, pjb -> iajb", w * frs, s_ia, phi)
             + np.einsum("p, pia, pjb -> iajb", w * fss, s_ia, s_ia)
             + 2.0 * np.einsum("p, piad, pjbd -> iajb",
                               w * fs, gphi, gphi))
        # spin adaptation: the singlet matrix element is the
        # spin-resolved sum f_aa + f_ab = 2 x the total-density kernel
        # (same convention that pairs 2(ia|jb) Coulomb with the LDA
        # faa+fab above)
        return 2.0 * K.reshape(nov, nov)
    # triplet = spin-flip channel delta rho_a = -delta rho_b = u at the
    # closed-shell point. In the spin-resolved variables
    # v = (rho_a, rho_b, s_aa, s_ab, s_bb): d(s_aa) = grad rho . grad u
    # = s, d(s_bb) = -s, d(s_ab) = 0, and the second variations give
    # (2 f_saa - f_sab) grad u . grad u'. Half the bilinear form (the
    # same normalization that makes the LDA channel f_aa - f_ab):
    # K^T[u,u'] = int [(f_aa - f_ab) u u'
    #                  + (f_{ra,saa} - f_{ra,sbb})(u s' + s u')
    #                  + (f_{saa,saa} - f_{saa,sbb}) s s'
    #                  + (2 f_saa - f_sab) grad u . grad u']
    def f5(vec):
        return mf.f_exc(vec[0], vec[1], vec[2], vec[3], vec[4])

    pts = jnp.stack([rho / 2, rho / 2, sigma / 4, sigma / 4, sigma / 4],
                    axis=1)                                # (P, 5)
    # only two Hessian-vector products are needed (not the full 5x5
    # Hessian): H d1 with d1 = e_ra - e_rb gives c_uu, and H d2 with
    # d2 = e_saa - e_sbb gives c_us and c_ss; the jvp also returns the
    # primal gradient for c_gg
    d1 = jnp.array([1.0, -1.0, 0.0, 0.0, 0.0])
    d2 = jnp.array([0.0, 0.0, 1.0, 0.0, -1.0])

    def hvps(p):
        _, hd1 = jax.jvp(jax.grad(f5), (p,), (d1,))
        g, hd2 = jax.jvp(jax.grad(f5), (p,), (d2,))
        return g, hd1, hd2

    g1, Hd1, Hd2 = (np.asarray(a) for a in jax.vmap(hvps)(pts))
    c_uu = Hd1[:, 0]                      # f_aa - f_ab
    c_us = Hd2[:, 0]                      # f_{ra,saa} - f_{ra,sbb}
    c_ss = Hd2[:, 2]                      # f_{saa,saa} - f_{saa,sbb}
    c_gg = 2.0 * g1[:, 2] - g1[:, 3]
    s_ia = np.einsum("pd, piad -> pia", grho, gphi)        # (P, i, a)
    K = (np.einsum("p, pia, pjb -> iajb", w * c_uu, phi, phi)
         + np.einsum("p, pia, pjb -> iajb", w * c_us, phi, s_ia)
         + np.einsum("p, pia, pjb -> iajb", w * c_us, s_ia, phi)
         + np.einsum("p, pia, pjb -> iajb", w * c_ss, s_ia, s_ia)
         + np.einsum("p, piad, pjbd -> iajb", w * c_gg, gphi, gphi))
    return K.reshape(nov, nov)


def tda_matrix(mf, singlet=True):
    """A_{ia, jb} = delta (e_a - e_i) + 2(ia|jb) - c_x (ij|ab) [+ f_xc]
    (singlet) — c_x = 1 for HF, the hybrid fraction for KS; KS adds the
    adiabatic XC kernel (LDA/GGA/hybrid, both spin channels). Triplet:
    no Coulomb, same exchange, spin-flip f_xc."""
    eri, e, nocc, nvir = _mo_blocks(mf)
    o = slice(0, nocc)
    v = slice(nocc, nocc + nvir)
    ov = eri[o, v, o, v]          # (ia|jb)
    oo_vv = eri[o, o, v, v]       # (ij|ab)
    de = (e[None, nocc:] - e[:nocc, None])   # (i, a)
    A = np.einsum("ia, jb, ij, ab -> iajb", de, np.ones((nocc, nvir)),
                  np.eye(nocc), np.eye(nvir))
    cx = _hfx(mf)
    if singlet:
        A = A + 2.0 * ov - cx * oo_vv.transpose(0, 2, 1, 3)
    else:
        A = A - cx * oo_vv.transpose(0, 2, 1, 3)
    A = A.reshape(nocc * nvir, nocc * nvir)
    if _is_ks(mf):
        A = A + xc_kernel_ov(mf, singlet)
    return A


def b_matrix(mf, singlet=True):
    """B_{ia, jb} = 2(ia|jb) - c_x (ib|ja) [+ f_xc] (singlet)."""
    eri, e, nocc, nvir = _mo_blocks(mf)
    o = slice(0, nocc)
    v = slice(nocc, nocc + nvir)
    ov = eri[o, v, o, v]
    ov_swap = eri[o, v, o, v].transpose(0, 3, 2, 1)  # (ib|ja)
    cx = _hfx(mf)
    if singlet:
        B = 2.0 * ov - cx * ov_swap
    else:
        B = -cx * ov_swap
    B = B.reshape(ov.shape[0] * ov.shape[1], -1)
    if _is_ks(mf):
        B = B + xc_kernel_ov(mf, singlet)
    return B


class TDA:
    """CIS/TDA excitations (reference: pyqed/qchem/tdscf)."""

    def __init__(self, mf, singlet=True):
        self.mf = mf
        self.singlet = singlet
        self.e = None
        self.xy = None

    def run(self, nroots=5):
        A = tda_matrix(self.mf, self.singlet)
        w, X = jnp.linalg.eigh(jnp.asarray(A))
        self.e = np.asarray(w[:nroots])
        self.xy = X[:, :nroots]
        return self.e

    kernel = run

    def transition_dipole(self):
        """Transition dipoles <0|r|n> (nroots, 3) from the MO dipole
        occ->virt block (uses the AO dipole integrals that unblocked
        qchem/scf.py:122)."""
        mf = self.mf
        _, _, nocc, nvir = _mo_blocks(mf)
        Dmo = mf.transition_dipoles()                   # (3, nmo, nmo)
        dov = Dmo[:, :nocc, nocc:nocc + nvir]           # (3, no, nv)
        X = jnp.reshape(self.xy, (nocc, nvir, -1))
        # sqrt(2): spin-adapted singlet CIS normalization
        return np.asarray(jnp.einsum("kia, ian -> nk", dov, X)
                          * np.sqrt(2.0))

    def oscillator_strength(self):
        """f_n = (2/3) omega_n |<0|r|n>|^2."""
        mu = self.transition_dipole()
        return (2.0 / 3.0) * self.e * np.sum(np.abs(mu) ** 2, axis=1)


class TDHF:
    """Full RPA/TDHF: solve the (A, B) non-Hermitian problem via the
    Hermitian (A-B)^{1/2} (A+B) (A-B)^{1/2} form."""

    def __init__(self, mf, singlet=True):
        self.mf = mf
        self.singlet = singlet
        self.e = None

    def run(self, nroots=5):
        A = tda_matrix(self.mf, self.singlet)
        B = b_matrix(self.mf, self.singlet)
        ApB = jnp.asarray(A + B)
        AmB = jnp.asarray(A - B)
        w, U = jnp.linalg.eigh(AmB)
        sq = (U * jnp.sqrt(jnp.clip(w, 0, None))) @ U.T
        isq = (U * (1.0 / jnp.sqrt(jnp.clip(w, 1e-300, None)))) @ U.T
        M = sq @ ApB @ sq
        w2, T = jnp.linalg.eigh(M)
        om = jnp.sqrt(jnp.clip(w2, 0, None))
        if float(om[0]) < 1e-10:
            # a zero/imaginary RPA root (clipped w2 <= 0 -> om exactly
            # 0 up to noise) means the reference state is unstable
            # (e.g. triplet instability); dividing by sqrt(om) below
            # would emit inf/NaN amplitudes that silently poison
            # tdhf_gradient downstream.  Threshold at noise scale so
            # physically tiny-but-real gaps still return usable roots
            raise RuntimeError(
                f"TDHF/RPA instability: lowest excitation energy "
                f"{float(om[0]):.3e} au is zero/near-zero — the "
                f"reference determinant is unstable (use TDA, or fix "
                f"the SCF solution)")
        self.e = np.asarray(om[:nroots])
        # RPA eigenvectors with X^2 - Y^2 = 1:
        # (X+Y) = om^{-1/2} (A-B)^{1/2} T, (X-Y) = om^{1/2} (A-B)^{-1/2} T
        xpy = (sq @ T[:, :nroots]) / jnp.sqrt(om[:nroots])[None, :]
        xmy = (isq @ T[:, :nroots]) * jnp.sqrt(om[:nroots])[None, :]
        #: per-root (X, Y) occ-virt amplitude pair, X^2 - Y^2 = 1
        self.xy = [(np.asarray(0.5 * (xpy[:, n] + xmy[:, n])),
                    np.asarray(0.5 * (xpy[:, n] - xmy[:, n])))
                   for n in range(nroots)]
        return self.e

    kernel = run


CIS = TDA


def tda_density_matrix(td, state_id):
    """AO density matrix of TDA excited state ``state_id`` (0 = first
    excited state), taking the TDA amplitudes as CIS coefficients
    (reference: pyqed/qchem/core.py:840 ``tda_denisty_matrix`` [sic]):

        D = D_gs + 2 (-X X^T)_oo + 2 (X^T X)_vv   in the MO basis.
    """
    mf = td.mf
    nocc = mf.nocc
    nmo = np.asarray(mf.mo_coeff).shape[1]
    X = np.asarray(td.xy)[:, state_id].reshape(nocc, nmo - nocc)
    dm = np.zeros((nmo, nmo))
    dm[:nocc, :nocc] = 2.0 * np.eye(nocc)
    dm[:nocc, :nocc] += -2.0 * np.einsum("ia, ka -> ik", X.conj(), X)
    dm[nocc:, nocc:] += 2.0 * np.einsum("ia, ic -> ac", X, X.conj())
    mo = np.asarray(mf.mo_coeff)
    return np.einsum("pi, ij, qj -> pq", mo, dm, mo.conj())


class UCIS:
    """CIS/TDA on a UHF reference (spin-orbital ov space, both spin
    blocks coupled by the Coulomb term; exchange within each spin) —
    excited states of radicals.  At a closed-shell point the spectrum
    is the union of the RHF singlet and triplet TDA roots.

    NOTE on open shells: the spin-contaminated UHF reference puts the
    configuration that completes the doublet spin eigenstate (beta
    HOMO -> beta orbital matching the alpha SOMO) at ~zero excitation
    energy — the first PHYSICAL excitation of a radical is usually
    root 2.

    Beyond the reference (its excited states are pyscf-wrapped,
    closed-shell only)."""

    def __init__(self, mf):
        self.mf = mf
        self.e = None
        self.xy = None          # per root: (X_a (na, nva), X_b (nb, nvb))

    def run(self, nroots=5):
        mf = self.mf
        Ca, Cb = [np.asarray(c) for c in mf.mo_coeff]
        ea, eb = [np.asarray(e) for e in mf.mo_energy]
        na, nb = mf.nocc
        nmo = Ca.shape[1]
        nva, nvb = nmo - na, nmo - nb
        eri = np.asarray(mf.eri)

        def mo_ov(C1o, C1v, C2o, C2v):
            """(ia|jb) block: first pair spin-1, second spin-2."""
            return np.einsum("pi, qa, pqkl, kj, lb -> iajb",
                             C1o, C1v, eri, C2o, C2v, optimize=True)

        def mo_oo_vv(Co, Cv):
            """(ij|ab) same-spin block."""
            return np.einsum("pi, qj, pqkl, ka, lb -> ijab",
                             Co, Co, eri, Cv, Cv, optimize=True)

        Cao, Cav = Ca[:, :na], Ca[:, na:]
        Cbo, Cbv = Cb[:, :nb], Cb[:, nb:]
        Naa, Nbb = na * nva, nb * nvb
        A = np.zeros((Naa + Nbb, Naa + Nbb))
        # alpha-alpha
        de = ea[None, na:] - ea[:na, None]
        Aaa = (np.einsum("ia, ij, ab -> iajb", de, np.eye(na),
                         np.eye(nva))
               + mo_ov(Cao, Cav, Cao, Cav)
               - mo_oo_vv(Cao, Cav).transpose(0, 2, 1, 3))
        A[:Naa, :Naa] = Aaa.reshape(Naa, Naa)
        # beta-beta
        de = eb[None, nb:] - eb[:nb, None]
        Abb = (np.einsum("ia, ij, ab -> iajb", de, np.eye(nb),
                         np.eye(nvb))
               + mo_ov(Cbo, Cbv, Cbo, Cbv)
               - mo_oo_vv(Cbo, Cbv).transpose(0, 2, 1, 3))
        A[Naa:, Naa:] = Abb.reshape(Nbb, Nbb)
        # cross-spin Coulomb
        Aab = mo_ov(Cao, Cav, Cbo, Cbv).reshape(Naa, Nbb)
        A[:Naa, Naa:] = Aab
        A[Naa:, :Naa] = Aab.T
        w, V = np.linalg.eigh(A)
        self.e = w[:nroots]
        self.xy = [(V[:Naa, n].reshape(na, nva),
                    V[Naa:, n].reshape(nb, nvb)) for n in range(nroots)]
        return self.e

    kernel = run

    def transition_dipole(self):
        """<0|r|n> (nroots, 3) from the per-spin occ-virt dipole
        blocks (no sqrt(2): the spin sum is explicit here)."""
        mf = self.mf
        Ca, Cb = [np.asarray(c) for c in mf.mo_coeff]
        na, nb = mf.nocc
        from .basis import dipole_matrix
        mu_ao = np.asarray(dipole_matrix(mf.mol.bfs))
        csph = getattr(mf.mol, "csph", None)
        if csph is not None:
            B = np.asarray(csph)
            mu_ao = np.einsum("pi, kij, qj -> kpq", B, mu_ao, B)
        dova = np.einsum("kpq, pi, qa -> kia", mu_ao,
                         Ca[:, :na], Ca[:, na:])
        dovb = np.einsum("kpq, pi, qa -> kia", mu_ao,
                         Cb[:, :nb], Cb[:, nb:])
        out = []
        for Xa, Xb in self.xy:
            out.append(np.einsum("kia, ia -> k", dova, np.asarray(Xa))
                       + np.einsum("kia, ia -> k", dovb,
                                   np.asarray(Xb)))
        return np.asarray(out)

    def oscillator_strength(self):
        """f_n = (2/3) omega_n |<0|r|n>|^2."""
        mu = self.transition_dipole()
        return (2.0 / 3.0) * np.asarray(self.e) \
            * np.sum(np.abs(mu) ** 2, axis=1)
