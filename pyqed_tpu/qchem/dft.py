"""Kohn-Sham DFT in the GTO layer: Becke molecular quadrature + LDA.

The reference's GTO-side RKS/UKS are unimplemented placeholders
(reference: pyqed/qchem/mol.py RKS/UKS; only the real-space
pyqed/qchem/dvr/rks.py:45 has a working DVR RKS) — this module makes
them real for the Gaussian basis:

* ``becke_grid`` — atom-centered Gauss-Chebyshev radial x spherical
  product-Gauss angular grids fused with Becke's smooth Voronoi
  partition (A.D. Becke, JCP 88, 2547 (1988)).
* Slater exchange + VWN5 correlation; the XC potential is
  ``jax.grad`` of the energy density (no hand algebra), vmapped over
  the grid.
* ``RKS`` / ``UKS`` — SCF loops reusing the Hartree machinery (J from
  the ERI tensor einsum; no exact exchange), DIIS-accelerated.

Everything on-grid is batched: AO values are one (P, nao) array, the
density and XC terms are einsums over it (MXU-shaped contractions).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Bragg-Slater radii (bohr) for the Becke size adjustment
_BRAGG = {"H": 0.661, "He": 0.566, "Li": 2.74, "Be": 1.98, "B": 1.60,
          "C": 1.32, "N": 1.23, "O": 1.13, "F": 0.95, "Ne": 0.85}


# -------------------------------------------------------------------
# molecular quadrature
# -------------------------------------------------------------------

def _radial_gc(n, R):
    """Gauss-Chebyshev (2nd kind) + Becke map r = R (1+x)/(1-x).

    Returns (r, w) with w including the r^2 volume factor."""
    i = np.arange(1, n + 1)
    x = np.cos(i * np.pi / (n + 1))
    wx = np.pi / (n + 1) * np.sin(i * np.pi / (n + 1)) ** 2
    # strip the Chebyshev weight sqrt(1-x^2)
    wx = wx / np.sqrt(1 - x ** 2)
    r = R * (1 + x) / (1 - x)
    dr = 2 * R / (1 - x) ** 2
    return r, wx * dr * r ** 2


def _angular(n_theta):
    """Product Gauss-Legendre(theta) x uniform(phi) spherical rule,
    exact for spherical harmonics to degree ~2 n_theta - 1."""
    ct, wt = np.polynomial.legendre.leggauss(n_theta)
    st = np.sqrt(1 - ct ** 2)
    n_phi = 2 * n_theta
    phi = 2 * np.pi * np.arange(n_phi) / n_phi
    wp = 2 * np.pi / n_phi
    pts = np.stack([
        np.outer(st, np.cos(phi)).ravel(),
        np.outer(st, np.sin(phi)).ravel(),
        np.outer(ct, np.ones(n_phi)).ravel()], axis=-1)
    w = (np.outer(wt, np.full(n_phi, wp))).ravel()
    return pts, w


def becke_grid(atoms, n_rad=60, n_theta=14):
    """Fused molecular grid: points (P, 3), weights (P,)."""
    coords = np.array([np.asarray(x, float) for _, x in atoms])
    syms = [s for s, _ in atoms]
    natm = len(atoms)
    all_pts, all_w = [], []
    for ia, (sym, xyz) in enumerate(atoms):
        R = _BRAGG.get(sym, 1.0)
        r, wr = _radial_gc(n_rad, R)
        ang, wa = _angular(n_theta)
        pts = (np.asarray(xyz)[None, None, :]
               + r[:, None, None] * ang[None, :, :]).reshape(-1, 3)
        w = (wr[:, None] * wa[None, :]).ravel()
        if natm > 1:
            # Becke partition: smoothed Voronoi cell weights
            d = np.linalg.norm(pts[:, None, :] - coords[None, :, :],
                               axis=-1)                    # (P, natm)
            P_cell = np.ones((len(pts), natm))
            for i in range(natm):
                for j in range(natm):
                    if i == j:
                        continue
                    Rij = np.linalg.norm(coords[i] - coords[j])
                    mu = (d[:, i] - d[:, j]) / Rij
                    # atomic size adjustment (Becke eq. A2)
                    chi = _BRAGG.get(syms[i], 1.0) / _BRAGG.get(
                        syms[j], 1.0)
                    uij = (chi - 1) / (chi + 1)
                    aij = np.clip(uij / (uij ** 2 - 1), -0.5, 0.5)
                    mu = mu + aij * (1 - mu ** 2)
                    f = mu
                    for _ in range(3):
                        f = 1.5 * f - 0.5 * f ** 3
                    P_cell[:, i] *= 0.5 * (1 - f)
            w = w * P_cell[:, ia] / P_cell.sum(axis=1)
        all_pts.append(pts)
        all_w.append(w)
    return (jnp.asarray(np.concatenate(all_pts)),
            jnp.asarray(np.concatenate(all_w)))


def ao_values(bfs, pts):
    """Contracted Cartesian GTO amplitudes on grid points -> (P, nao)."""
    pts = np.asarray(pts)
    out = np.zeros((len(pts), len(bfs)))
    for k, g in enumerate(bfs):
        d = pts - g.center[None, :]
        poly = (d[:, 0] ** g.lmn[0] * d[:, 1] ** g.lmn[1]
                * d[:, 2] ** g.lmn[2])
        r2 = np.sum(d ** 2, axis=1)
        rad = np.einsum("p, pe -> p",
                        np.ones(len(pts)),
                        np.exp(-np.outer(r2, g.exps))
                        * (g.coefs * g.norms)[None, :])
        out[:, k] = poly * rad
    return jnp.asarray(out)


# -------------------------------------------------------------------
# LDA functional: Slater exchange + VWN5 correlation
# -------------------------------------------------------------------

_CX = -0.75 * (3.0 / np.pi) ** (1.0 / 3.0)


def _eps_x(rho):
    return _CX * rho ** (1.0 / 3.0)


def _vwn_eps(rs, A, x0, b, c):
    x = jnp.sqrt(rs)
    X = x ** 2 + b * x + c
    X0 = x0 ** 2 + b * x0 + c
    Q = jnp.sqrt(4 * c - b ** 2)
    at = jnp.arctan(Q / (2 * x + b))
    return A * (jnp.log(x ** 2 / X) + 2 * b / Q * at
                - b * x0 / X0 * (jnp.log((x - x0) ** 2 / X)
                                 + 2 * (b + 2 * x0) / Q * at))


def _eps_c_para(rs):
    return _vwn_eps(rs, 0.0310907, -0.10498, 3.72744, 12.9352)


def _eps_c_ferro(rs):
    return _vwn_eps(rs, 0.01554535, -0.32500, 7.06042, 18.0578)


def _f_zeta(z):
    return (((1 + z) ** (4 / 3) + (1 - z) ** (4 / 3) - 2)
            / (2 ** (4 / 3) - 2))


def _exc_density(rho_a, rho_b):
    """rho * eps_xc for spin densities (LSDA: Slater + VWN)."""
    rho = rho_a + rho_b
    rho = jnp.maximum(rho, 1e-300)
    z = jnp.clip((rho_a - rho_b) / rho, -1 + 1e-15, 1 - 1e-15)
    # spin-scaled exchange
    ex = 0.5 * (_eps_x(jnp.maximum(2 * rho_a, 1e-300)) * 2 * rho_a
                + _eps_x(jnp.maximum(2 * rho_b, 1e-300)) * 2 * rho_b)
    rs = (3.0 / (4 * np.pi * rho)) ** (1.0 / 3.0)
    ec = (_eps_c_para(rs)
          + (_eps_c_ferro(rs) - _eps_c_para(rs)) * _f_zeta(z))
    return ex + rho * ec


_vxc_a = jax.vmap(jax.grad(_exc_density, argnums=0))
_vxc_b = jax.vmap(jax.grad(_exc_density, argnums=1))
_exc_v = jax.vmap(_exc_density)


def lda_exc_vxc(rho_a, rho_b, rho_min=1e-12):
    """(e_xc density on grid, v_xc_alpha, v_xc_beta).

    Densities below ``rho_min`` contribute exactly zero — the inputs
    are substituted BEFORE differentiation so no NaN can leak through
    ``jax.grad`` at the rho -> 0 boundary."""
    safe = (rho_a + rho_b) > rho_min
    ra = jnp.where(safe, rho_a, 1.0)
    rb = jnp.where(safe, rho_b, 1.0)
    return (jnp.where(safe, _exc_v(ra, rb), 0.0),
            jnp.where(safe, _vxc_a(ra, rb), 0.0),
            jnp.where(safe, _vxc_b(ra, rb), 0.0))


# -------------------------------------------------------------------
# SCF drivers
# -------------------------------------------------------------------

class RKS:
    """Restricted Kohn-Sham with the SVWN (LDA) functional."""

    def __init__(self, mol, n_rad=60, n_theta=14, max_cycle=100,
                 conv_tol=1e-9, diis_size=8):
        self.mol = mol
        self.max_cycle = max_cycle
        self.conv_tol = conv_tol
        self.diis_size = diis_size
        self.grid = becke_grid(mol.atoms, n_rad, n_theta)
        self.ao = ao_values(mol.bfs, self.grid[0])
        self.converged = False

    def _xc(self, D):
        """(E_xc, V_xc matrix) for a closed-shell density matrix."""
        ao, w = self.ao, self.grid[1]
        rho = jnp.einsum("pi, ij, pj -> p", ao, D, ao)
        rho = jnp.maximum(rho, 0.0)
        exc, va, _ = lda_exc_vxc(rho / 2, rho / 2)
        E = jnp.sum(w * exc)
        V = jnp.einsum("p, pi, pj -> ij", w * va, ao, ao)
        return E, 0.5 * (V + V.T)

    def run(self):
        mol = self.mol
        S, T, Vn, eri = mol.intor()
        hcore = T + Vn
        enuc = mol.energy_nuc()
        nocc = mol.nelec // 2
        s, U = jnp.linalg.eigh(S)
        X = (U * (1.0 / jnp.sqrt(s))) @ U.T

        def density(F):
            e, Cp = jnp.linalg.eigh(X.T @ F @ X)
            C = X @ Cp
            return 2.0 * C[:, :nocc] @ C[:, :nocc].T, C, e

        D, C, mo_e = density(hcore)
        E_old = 0.0
        diis_F, diis_err = [], []
        for it in range(self.max_cycle):
            J = jnp.einsum("pqrs, rs -> pq", eri, D)
            Exc, Vxc = self._xc(D)
            F = hcore + J + Vxc
            err = X.T @ (F @ D @ S - S @ D @ F) @ X
            diis_F.append(F)
            diis_err.append(err)
            if len(diis_F) > self.diis_size:
                diis_F.pop(0)
                diis_err.pop(0)
            if len(diis_F) > 1:
                m = len(diis_F)
                B = np.zeros((m + 1, m + 1))
                B[-1, :] = B[:, -1] = -1.0
                B[-1, -1] = 0.0
                for i in range(m):
                    for j in range(m):
                        B[i, j] = float(jnp.sum(
                            diis_err[i] * diis_err[j]).real)
                rhs = np.zeros(m + 1)
                rhs[-1] = -1.0
                try:
                    cvec = np.linalg.solve(B, rhs)[:m]
                    F = sum(ci * Fi for ci, Fi in zip(cvec, diis_F))
                except np.linalg.LinAlgError:
                    pass
            D, C, mo_e = density(F)
            J = jnp.einsum("pqrs, rs -> pq", eri, D)
            Exc, _ = self._xc(D)
            E = float(jnp.sum(D * hcore) + 0.5 * jnp.sum(D * J) + Exc)
            if abs(E - E_old) < self.conv_tol:
                self.converged = True
                break
            E_old = E

        self.e_tot = E + enuc
        self.e_xc = float(Exc)
        self.mo_coeff = C
        self.mo_energy = mo_e
        self.nocc = nocc
        self.dm = D
        return self

    kernel = run

    def nelec_on_grid(self):
        ao, w = self.ao, self.grid[1]
        rho = jnp.einsum("pi, ij, pj -> p", ao, self.dm, ao)
        return float(jnp.sum(w * rho))


class UKS:
    """Unrestricted Kohn-Sham (LSDA: spin-scaled Slater + VWN)."""

    def __init__(self, mol, n_rad=60, n_theta=14, max_cycle=150,
                 conv_tol=1e-9):
        self.mol = mol
        self.max_cycle = max_cycle
        self.conv_tol = conv_tol
        self.grid = becke_grid(mol.atoms, n_rad, n_theta)
        self.ao = ao_values(mol.bfs, self.grid[0])
        self.converged = False

    def run(self):
        mol = self.mol
        S, T, Vn, eri = mol.intor()
        hcore = T + Vn
        enuc = mol.energy_nuc()
        na = (mol.nelec + mol.spin) // 2
        nb = mol.nelec - na
        s, U = jnp.linalg.eigh(S)
        X = (U * (1.0 / jnp.sqrt(s))) @ U.T
        ao, w = self.ao, self.grid[1]

        def density(F, n):
            e, Cp = jnp.linalg.eigh(X.T @ F @ X)
            C = X @ Cp
            return C[:, :n] @ C[:, :n].T, C, e

        Da, Ca, ea = density(hcore, na)
        Db, Cb, eb = density(hcore, nb)
        E_old, damp = 0.0, 0.35
        for it in range(self.max_cycle):
            J = jnp.einsum("pqrs, rs -> pq", eri, Da + Db)
            ra = jnp.maximum(jnp.einsum("pi, ij, pj -> p", ao, Da, ao), 0)
            rb = jnp.maximum(jnp.einsum("pi, ij, pj -> p", ao, Db, ao), 0)
            exc, va, vb = lda_exc_vxc(ra, rb)
            Exc = jnp.sum(w * exc)
            Va = jnp.einsum("p, pi, pj -> ij", w * va, ao, ao)
            Vb = jnp.einsum("p, pi, pj -> ij", w * vb, ao, ao)
            Fa = hcore + J + 0.5 * (Va + Va.T)
            Fb = hcore + J + 0.5 * (Vb + Vb.T)
            Da_new, Ca, ea = density(Fa, na)
            Db_new, Cb, eb = density(Fb, nb)
            Da = (1 - damp) * Da_new + damp * Da
            Db = (1 - damp) * Db_new + damp * Db
            E = float(jnp.sum((Da + Db) * hcore)
                      + 0.5 * jnp.sum((Da + Db) * J) + Exc)
            if abs(E - E_old) < self.conv_tol and it > 3:
                self.converged = True
                break
            E_old = E

        self.e_tot = E + enuc
        self.e_xc = float(Exc)
        self.mo_coeff = (Ca, Cb)
        self.mo_energy = (ea, eb)
        self.dm = (Da, Db)
        return self

    kernel = run
