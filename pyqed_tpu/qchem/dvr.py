"""Real-space (DVR-grid) electronic structure — pyscf-free SCF/DFT/CI on
sine-DVR grids with erf-screened (soft) Coulomb interactions.

TPU-native counterpart of the reference's qchem/dvr layer
(reference: pyqed/qchem/dvr/rhf.py:149 ``RHF1D``, :468 ``RHF2D``,
rks.py:45 ``RKS``, fci.py:312 ``fcisolver``, casci.py:28 ``CASCI``;
model molecules pyqed/models/ShinMetiu2e1d.py:765 ``AtomicChain``).

Key DVR fact exploited throughout: in a DVR basis the two-electron
integrals are DIAGONAL in each electron's index,
(ij|kl) = v(|x_i − x_k|) δ_ij δ_kl, so the Coulomb/exchange builds are
one matvec + one Hadamard product (reference get_veff,
pyqed/qchem/dvr/rhf.py:121-147) — batched, MXU-friendly, no 4-index
tensor until the (truncated) MO transformation for CI.

TPU design: the SCF iteration body (Fock build + eigh + density) is one
jitted function; the grid ERI matrix is built as a single vectorized
distance map; FCI/CASCI reuse qchem/ci.py by exposing ``mo_ints``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import erf

from ..grid.dvr import SineDVR
from .ci import CI, FCI, CISD


def soft_coulomb(r, R=1.0):
    """erf-screened Coulomb  erf(r/R)/r  with limit 2/(R sqrt(pi)) at r=0
    (reference: pyqed/qchem/dvr/rhf.py:36)."""
    r = jnp.asarray(r)
    small = r < 1e-12
    rsafe = jnp.where(small, 1.0, r)
    return jnp.where(small, 2.0 / (R * jnp.sqrt(jnp.pi)),
                     erf(rsafe / R) / rsafe)


def get_veff(eri, dm):
    """Hartree + exchange potential in the DVR basis
    (reference: pyqed/qchem/dvr/rhf.py:121):
    J = diag(v @ diag(dm)),  K = v ⊙ dm,  vHF = J − K/2."""
    J = jnp.diag(eri @ jnp.diagonal(dm))
    K = eri * dm
    return J - 0.5 * K


class MoleculeDVR:
    """Soft-Coulomb model molecule on a real-space grid: point charges
    Z_a at coordinates R_a in 1 or 2 dimensions (reference:
    pyqed/models/ShinMetiu2e1d.py:765 ``AtomicChain`` and
    pyqed/qchem/dvr/mol.py:489 ``Molecule``).

    atoms : list of (Z, coord) with coord scalar (1D) or array (2D).
    Rf    : screening length of the electron-nucleus/el-el interaction.
    """

    def __init__(self, atoms, charge=0, spin=0, Rf=1.5, Re=1.0):
        self.atoms = [(int(Z), np.atleast_1d(np.asarray(R, dtype=float)))
                      for Z, R in atoms]
        self.charge = charge
        self.spin = spin
        self.Rf = Rf     # e-n screening (reference Rf = 1.5 A in a.u.)
        self.Re = Re     # e-e screening (reference mol.Re)
        self.nelec = self.nelectron = (
            sum(Z for Z, _ in self.atoms) - charge)
        self.ndim = len(self.atoms[0][1])

    def v_en(self, r):
        """Electron-nucleus potential at electron coordinate(s) r:
        −Σ_a Z_a erf(|r−R_a|/Rf)/|r−R_a|
        (reference: ShinMetiu2e1d.py:783)."""
        r = jnp.atleast_2d(jnp.asarray(r, dtype=float))   # (npts, ndim)
        v = 0.0
        for Z, Ra in self.atoms:
            d = jnp.linalg.norm(r - jnp.asarray(Ra)[None, :], axis=-1)
            v = v - Z * soft_coulomb(d, self.Rf)
        return v

    def energy_nuc(self):
        """Screened nuclear repulsion (reference: ShinMetiu2e1d.py:865)."""
        e = 0.0
        for a in range(len(self.atoms)):
            Za, Ra = self.atoms[a]
            for b in range(a):
                Zb, Rb = self.atoms[b]
                d = float(np.linalg.norm(Ra - Rb))
                if d > 0:
                    e += Za * Zb * float(soft_coulomb(d, self.Rf))
        return e


class RHF1D:
    """Restricted HF on a 1D sine-DVR grid
    (reference: pyqed/qchem/dvr/rhf.py:149)."""

    def __init__(self, mol: MoleculeDVR, domain=None, nx=None,
                 dvr_type="sine", max_cycle=100, tol=1e-9):
        self.mol = mol
        self.domain = domain
        self.nx = nx
        if dvr_type != "sine":
            raise ValueError(f"DVR {dvr_type} is not supported yet; "
                             "use 'sine'.")
        self.dvr_type = dvr_type
        self.max_cycle = max_cycle
        self.tol = tol
        self.x = None
        self.hcore = None
        self.eri = None
        self.mo_coeff = None
        self.mo_energy = None
        self.mo_occ = None
        self.e_tot = None
        self.converged = False
        self.nmo_ci = None     # MO truncation handed to CI (None = all)

    # ------------------------------------------------------------- grid
    def _points(self):
        dvr = SineDVR(*self.domain, self.nx)
        self.dvr = dvr
        self.x = np.asarray(dvr.x)
        return self.x.reshape(-1, 1)

    def get_hcore(self):
        pts = self._points()
        T = jnp.asarray(self.dvr.t())
        V = jnp.diag(self.mol.v_en(pts))
        self.hcore = T + V
        return self.hcore

    def get_eri(self):
        """DVR two-electron matrix v_ij = sc(|x_i − x_j|, Re)
        (reference: pyqed/qchem/dvr/rhf.py:201)."""
        pts = jnp.asarray(self.x.reshape(self.nx, -1) if self.x.ndim == 1
                          else self.x)
        d = jnp.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
        self.eri = soft_coulomb(d, self.mol.Re)
        return self.eri

    # -------------------------------------------------------------- scf
    def run(self):
        hcore = self.get_hcore()
        eri = self.get_eri()
        n = hcore.shape[0]
        nocc = self.mol.nelec // 2
        if self.mol.nelec % 2:
            raise ValueError("RHF1D needs an even electron count")
        mo_occ = np.zeros(n)
        mo_occ[:nocc] = 2.0
        self.mo_occ = jnp.asarray(mo_occ)
        enuc = self.mol.energy_nuc()

        @jax.jit
        def scf_step(dm):
            vhf = get_veff(eri, dm)
            F = hcore + vhf
            e, C = jnp.linalg.eigh(F)
            Cocc = C[:, :nocc]
            dm_new = 2.0 * Cocc @ Cocc.T
            e_elec = (jnp.einsum("ij, ji ->", hcore, dm_new)
                      + 0.5 * jnp.einsum("ij, ji ->",
                                         get_veff(eri, dm_new), dm_new))
            return dm_new, e_elec, e, C

        # hcore initial guess (reference: rhf.py:336)
        e0, C0 = jnp.linalg.eigh(hcore)
        dm = 2.0 * C0[:, :nocc] @ C0[:, :nocc].T
        old = np.inf
        for it in range(self.max_cycle):
            dm, e_elec, mo_e, C = scf_step(dm)
            e_tot = float(e_elec) + enuc
            if abs(e_tot - old) < self.tol:
                self.converged = True
                break
            old = e_tot
        self.mo_energy = mo_e
        self.mo_coeff = C
        self.dm = dm
        self.e_tot = e_tot
        return e_tot

    kernel = run

    def make_rdm1(self):
        return self.dm

    # ------------------------------------------------------- CI plumbing
    def mo_ints(self):
        """(hcore_mo, chemists' (pq|rs)) in the nmo_ci lowest MOs —
        transformed from the diagonal DVR form
        (pq|rs) = Σ_ij C_ip C_iq v_ij C_jr C_js."""
        nmo = self.nmo_ci or min(self.hcore.shape[0], 8)
        C = self.mo_coeff[:, :nmo]
        h = C.T @ self.hcore @ C
        P = jnp.einsum("ip, iq -> ipq", C, C)      # (ngrid, nmo, nmo)
        M = jnp.einsum("ipq, ij, jrs -> pqrs", P, self.eri, P)
        return h, M

    def FCI(self):
        return FCI(self)

    def CISD(self):
        return CISD(self)

    def CASCI(self, ncas, nelecas=None):
        return CASCIDVR(self, ncas, nelecas)


class RHF2D(RHF1D):
    """Restricted HF on a 2D direct-product sine-DVR grid
    (reference: pyqed/qchem/dvr/rhf.py:468)."""

    def __init__(self, mol, domains=None, nxs=None, **kw):
        super().__init__(mol, domain=None, nx=None, **kw)
        self.domains = domains
        self.nxs = nxs

    def _points(self):
        dvrs = [SineDVR(*dom, n) for dom, n in zip(self.domains, self.nxs)]
        self.dvrs = dvrs
        X, Y = np.meshgrid(np.asarray(dvrs[0].x), np.asarray(dvrs[1].x),
                           indexing="ij")
        self.x = np.stack([X.ravel(), Y.ravel()], axis=-1)
        self.nx = self.x.shape[0]
        return self.x

    def get_hcore(self):
        pts = self._points()
        T1 = np.asarray(self.dvrs[0].t())
        T2 = np.asarray(self.dvrs[1].t())
        T = (np.kron(T1, np.eye(T2.shape[0]))
             + np.kron(np.eye(T1.shape[0]), T2))
        V = np.diag(np.asarray(self.mol.v_en(pts)))
        self.hcore = jnp.asarray(T + V)
        return self.hcore


class RKS1D(RHF1D):
    """Restricted Kohn-Sham (LDA, Slater exchange) on the 1D grid
    (reference: pyqed/qchem/dvr/rks.py:45).

    In DVR the density at grid point i is n_i = dm_ii / dx, and the
    LDA exchange potential enters as a diagonal matrix. The exchange
    uses the 1D-homogeneous-gas Slater form v_x = −(3/π n)^{1/3} c_x by
    default (c_x tunable via ``xalpha``)."""

    def __init__(self, mol, domain=None, nx=None, xalpha=1.0, **kw):
        super().__init__(mol, domain=domain, nx=nx, **kw)
        self.xalpha = xalpha

    def run(self):
        hcore = self.get_hcore()
        eri = self.get_eri()
        n = hcore.shape[0]
        nocc = self.mol.nelec // 2
        dx = float(self.x[1] - self.x[0])
        enuc = self.mol.energy_nuc()
        alpha = self.xalpha

        @jax.jit
        def scf_step(dm):
            dens = jnp.diagonal(dm) / dx
            # Slater LDA exchange (3D form, reference convention)
            vx = -alpha * (3.0 / jnp.pi * dens) ** (1.0 / 3.0)
            ex = 0.75 * jnp.sum(vx * dens) * dx
            J = jnp.diag(eri @ jnp.diagonal(dm))
            F = hcore + J + jnp.diag(vx)
            e, C = jnp.linalg.eigh(F)
            Cocc = C[:, :nocc]
            dm_new = 2.0 * Cocc @ Cocc.T
            dens_new = jnp.diagonal(dm_new) / dx
            vx_new = -alpha * (3.0 / jnp.pi * dens_new) ** (1.0 / 3.0)
            ex_new = 0.75 * jnp.sum(vx_new * dens_new) * dx
            e_elec = (jnp.einsum("ij, ji ->", hcore, dm_new)
                      + 0.5 * jnp.einsum(
                          "ij, ji ->",
                          jnp.diag(eri @ jnp.diagonal(dm_new)), dm_new)
                      + ex_new)
            return dm_new, e_elec, e, C

        e0, C0 = jnp.linalg.eigh(hcore)
        dm = 2.0 * C0[:, :nocc] @ C0[:, :nocc].T
        old = np.inf
        for it in range(self.max_cycle):
            dm, e_elec, mo_e, C = scf_step(dm)
            e_tot = float(e_elec) + enuc
            if abs(e_tot - old) < self.tol:
                self.converged = True
                break
            old = e_tot
        self.mo_energy = mo_e
        self.mo_coeff = C
        self.dm = dm
        self.e_tot = e_tot
        return e_tot


class CASCIDVR(CI):
    """CASCI on DVR mean-field MOs: FCI inside an (ncas, nelecas) active
    window on top of a frozen doubly-occupied core
    (reference: pyqed/qchem/dvr/casci.py:28)."""

    def __init__(self, mf, ncas, nelecas=None):
        super().__init__(mf, max_exc=None)
        self.ncas = ncas
        nocc = mf.mol.nelec // 2
        self.nelecas = nelecas if nelecas is not None else mf.mol.nelec
        self.ncore = (mf.mol.nelec - self.nelecas) // 2

    def run(self, nroots=1):
        import itertools
        from .ci import spinorb_ints, slater_condon, enumerate_dets
        mf = self.mf
        ncore, ncas = self.ncore, self.ncas
        saved = mf.nmo_ci
        mf.nmo_ci = ncore + ncas
        hmo, eri_mo = mf.mo_ints()
        mf.nmo_ci = saved
        hmo = np.asarray(hmo)
        eri = np.asarray(eri_mo)

        # fold the frozen core into an effective 1-body term + constant
        core = list(range(ncore))
        e_core = 0.0
        for i in core:
            e_core += 2 * hmo[i, i]
            for j in core:
                e_core += 2 * eri[i, i, j, j] - eri[i, j, j, i]
        heff = hmo[ncore:, ncore:].copy()
        for p in range(ncas):
            for q in range(ncas):
                for i in core:
                    heff[p, q] += (2 * eri[ncore + p, ncore + q, i, i]
                                   - eri[ncore + p, i, i, ncore + q])
        eri_act = eri[ncore:, ncore:, ncore:, ncore:]

        h, g = spinorb_ints(heff, eri_act)
        dets = enumerate_dets(2 * ncas, self.nelecas)
        nd = len(dets)
        H = np.zeros((nd, nd))
        for i in range(nd):
            for j in range(i + 1):
                H[i, j] = H[j, i] = slater_condon(dets[i], dets[j], h, g)
        w, v = jnp.linalg.eigh(jnp.asarray(H))
        self.e_tot = np.asarray(w[:nroots]) + e_core + mf.mol.energy_nuc()
        self.civec = v[:, :nroots]
        self.dets = dets
        return self.e_tot


def exact_2e(mf, nroots=1):
    """Exact two-electron (singlet) energies by direct diagonalization of
    h⊗I + I⊗h + diag(v(x1−x2)) on the product grid — the brute-force
    oracle for 2-electron DVR molecules (reference analogue: the 'exact'
    path of ShinMetiu2e1d.single_point)."""
    h = np.asarray(mf.hcore if mf.hcore is not None else mf.get_hcore())
    v = np.asarray(mf.eri if mf.eri is not None else mf.get_eri())
    n = h.shape[0]
    H2 = (np.kron(h, np.eye(n)) + np.kron(np.eye(n), h)
          + np.diag(v.ravel()))
    # project onto the symmetric (singlet spatial) sector
    w, U = np.linalg.eigh(H2)
    sym_energies = []
    for k in range(len(w)):
        psi = U[:, k].reshape(n, n)
        if np.allclose(psi, psi.T, atol=1e-6):
            sym_energies.append(w[k])
        if len(sym_energies) >= nroots:
            break
    return np.array(sym_energies) + mf.mol.energy_nuc()


class ElectronDVR3D:
    """One-electron 3D real-space molecular Schrödinger solver on a
    direct-product sinc-DVR grid.

    TPU-native counterpart of the reference's sparse-grid electronic
    structure solver (reference: pyqed/qchem/sg.py:40 ``DVRn`` — builds a
    scipy-sparse 3D Hamiltonian with nuclear attraction and Lanczos-solves
    it).  Here the Hamiltonian is NEVER materialized: ``DVRN.apply_H``
    applies the per-dimension kinetic contractions and the (soft-)Coulomb
    attraction diagonally, and the eigenpairs come from the matrix-free
    blocked Davidson (ops/davidson.py) — each iteration is a handful of
    MXU tensordots.

    atoms: [(Z, (x, y, z)), ...] in bohr; softening R avoids the Coulomb
    cusp on the uniform grid (R -> 0 recovers bare Coulomb).
    """

    def __init__(self, atoms, domains, nxs, soft=0.2):
        from ..grid.dvr import SincDVR, DVRN
        self.atoms = atoms
        # x_n = x0 - L/2 + n L/npts spans [x0-L/2, x0+L/2-dx]; shifting
        # x0 by dx/2 centers the grid on the domain midpoint so symmetric
        # molecules see a symmetric grid
        self.dvrs = [SincDVR(domains[d][1] - domains[d][0], nxs[d],
                             x0=0.5 * (domains[d][0] + domains[d][1])
                             + 0.5 * (domains[d][1] - domains[d][0])
                             / nxs[d],
                             mass=1.0)
                     for d in range(3)]
        self.grid = DVRN(self.dvrs)
        self.soft = soft
        X, Y, Z = np.meshgrid(*self.grid.x, indexing="ij")
        V = np.zeros_like(X)
        for (Zq, pos) in atoms:
            r2 = ((X - pos[0]) ** 2 + (Y - pos[1]) ** 2
                  + (Z - pos[2]) ** 2)
            V -= Zq / np.sqrt(r2 + soft ** 2)
        self.Vg = jnp.asarray(V)

    def energy_nuc(self):
        e = 0.0
        for i, (Zi, ri) in enumerate(self.atoms):
            for j, (Zj, rj) in enumerate(self.atoms[:i]):
                e += Zi * Zj / np.linalg.norm(np.asarray(ri)
                                              - np.asarray(rj))
        return e

    def apply_H(self, psi_flat):
        """Matvec on (n,) or blocked (n, k) vectors."""
        if psi_flat.ndim == 2:
            import jax
            return jax.vmap(self.apply_H, in_axes=1, out_axes=1)(psi_flat)
        psi = psi_flat.reshape(self.grid.nx)
        return self.grid.apply_H(psi, self.Vg).reshape(-1)

    def run(self, neig=1, tol=1e-8, max_iterations=120):
        """Lowest electronic eigenpairs, matrix-free Davidson."""
        from ..ops.davidson import block_davidson
        diag = jnp.asarray(self.Vg).reshape(-1)
        for d in range(3):
            t = np.diag(np.asarray(self.dvrs[d].t()))
            shape = [1, 1, 1]
            shape[d] = -1
            diag = diag + jnp.asarray(
                np.broadcast_to(t.reshape(shape), self.grid.nx)).reshape(-1)
        E, U = block_davidson(self.apply_H, neig=neig, diag=diag,
                              tol=tol, max_iterations=max_iterations)
        self.mo_energy, self.mo_coeff = E, U
        return E

    def total_energy(self, nelec=1, neig=None):
        """Independent-electron total energy (Aufbau, closed shell)."""
        need = max(1, (nelec + 1) // 2)
        if not hasattr(self, "mo_energy") or len(self.mo_energy) < need:
            self.run(neig=need)
        occ = self.mo_energy[:need]
        fill = np.minimum(2, nelec - 2 * np.arange(len(occ)))
        return float(np.sum(np.asarray(occ) * fill[:len(occ)])
                     + self.energy_nuc())

DVRn = ElectronDVR3D             # reference drop-in name (pyqed/qchem/sg.py:40)
