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
# GGA / hybrid functionals — closed-form spin-resolved energy densities
# f(rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb); every potential term
# (v_rho, v_sigma) is jax.grad of these, so no hand-derived functional
# derivatives anywhere. The reference dispatches RKS/UKS to pyscf
# (/root/reference/pyqed/qchem/mol.py:817); here the functionals are
# implemented natively from the published parameterizations.
# -------------------------------------------------------------------

def _pw92_G(rs, A, a1, b1, b2, b3, b4):
    s = jnp.sqrt(rs)
    den = 2 * A * (b1 * s + b2 * rs + b3 * rs * s + b4 * rs * rs)
    return -2 * A * (1 + a1 * rs) * jnp.log1p(1.0 / den)


def _pw92_eps_c(rs, zeta):
    """Perdew-Wang 1992 correlation energy per electron
    [PRB 45, 13244 (1992), Table I]."""
    ec0 = _pw92_G(rs, 0.031091, 0.21370, 7.5957, 3.5876, 1.6382, 0.49294)
    ec1 = _pw92_G(rs, 0.015545, 0.20548, 14.1189, 6.1977, 3.3662, 0.62517)
    mac = _pw92_G(rs, 0.016887, 0.11125, 10.357, 3.6231, 0.88026, 0.49671)
    f = _f_zeta(zeta)
    fdd0 = 8.0 / (9.0 * (2 ** (4.0 / 3.0) - 2.0))
    z4 = zeta ** 4
    return (ec0 - mac * f / fdd0 * (1 - z4) + (ec1 - ec0) * f * z4)


def _pbe_ex_unpol(rho, sigma):
    """PBE exchange energy density (per volume) of an unpolarized gas
    [Perdew, Burke, Ernzerhof, PRL 77, 3865 (1996)]."""
    kappa, mu = 0.804, 0.2195149727645171
    kf = (3 * np.pi ** 2 * rho) ** (1.0 / 3.0)
    s2 = sigma / (4.0 * kf ** 2 * rho ** 2)
    F = 1 + kappa - kappa / (1 + mu * s2 / kappa)
    return _eps_x(rho) * rho * F


def pbe_exc(rho_a, rho_b, s_aa, s_ab, s_bb):
    """PBE exchange-correlation energy density (per volume)."""
    # exchange: exact spin scaling Ex[ra, rb] = (Ex[2ra] + Ex[2rb]) / 2
    ex = 0.5 * (_pbe_ex_unpol(2 * rho_a, 4 * s_aa)
                + _pbe_ex_unpol(2 * rho_b, 4 * s_bb))
    # correlation: PW92 + H gradient term
    rho = rho_a + rho_b
    zeta = jnp.clip((rho_a - rho_b) / rho, -1 + 1e-12, 1 - 1e-12)
    rs = (3.0 / (4 * np.pi * rho)) ** (1.0 / 3.0)
    eps_c = _pw92_eps_c(rs, zeta)
    gamma = (1 - np.log(2.0)) / np.pi ** 2
    beta = 0.06672455060314922
    phi = 0.5 * ((1 + zeta) ** (2.0 / 3.0) + (1 - zeta) ** (2.0 / 3.0))
    sigma = s_aa + 2 * s_ab + s_bb
    kf = (3 * np.pi ** 2 * rho) ** (1.0 / 3.0)
    ks = jnp.sqrt(4 * kf / np.pi)
    t2 = sigma / (4.0 * phi ** 2 * ks ** 2 * rho ** 2)
    A = beta / gamma / jnp.expm1(-eps_c / (gamma * phi ** 3))
    H = gamma * phi ** 3 * jnp.log1p(
        beta / gamma * t2 * (1 + A * t2) / (1 + A * t2 + (A * t2) ** 2))
    return ex + rho * (eps_c + H)


def _b88_ex_spin(rho_s, sigma_s):
    """Becke 1988 exchange for one spin channel (energy per volume)
    [Becke, PRA 38, 3098 (1988)], beta = 0.0042."""
    beta = 0.0042
    r43 = rho_s ** (4.0 / 3.0)
    x = jnp.sqrt(sigma_s) / r43
    lda = _CX * 2.0 ** (1.0 / 3.0) * r43      # spin-scaled Slater
    return lda - beta * r43 * x ** 2 / (1 + 6 * beta * x * jnp.arcsinh(x))


def b88_ex(rho_a, rho_b, s_aa, s_ab, s_bb):
    return _b88_ex_spin(rho_a, s_aa) + _b88_ex_spin(rho_b, s_bb)


def lyp_ec(rho_a, rho_b, s_aa, s_ab, s_bb):
    """Lee-Yang-Parr correlation (per volume) in the Miehlich-Savin-
    Stoll-Preuss closed form [Chem. Phys. Lett. 157, 200 (1989)]."""
    a, b, c, d = 0.04918, 0.132, 0.2533, 0.349
    cf = 0.3 * (3 * np.pi ** 2) ** (2.0 / 3.0)
    rho = rho_a + rho_b
    rm3 = rho ** (-1.0 / 3.0)
    w = jnp.exp(-c * rm3) / (1 + d * rm3) * rho ** (-11.0 / 3.0)
    delta = c * rm3 + d * rm3 / (1 + d * rm3)
    sigma = s_aa + 2 * s_ab + s_bb
    t1 = -a * 4.0 / (1 + d * rm3) * rho_a * rho_b / rho
    t2 = 2.0 ** (11.0 / 3.0) * cf * (rho_a ** (8.0 / 3.0)
                                     + rho_b ** (8.0 / 3.0))
    t3 = (47.0 / 18.0 - 7.0 * delta / 18.0) * sigma
    t4 = -(2.5 - delta / 18.0) * (s_aa + s_bb)
    t5 = -(delta - 11.0) / 9.0 * (rho_a * s_aa + rho_b * s_bb) / rho
    t6 = (-2.0 / 3.0 * rho ** 2 * sigma
          + (2.0 / 3.0 * rho ** 2 - rho_a ** 2) * s_bb
          + (2.0 / 3.0 * rho ** 2 - rho_b ** 2) * s_aa)
    return t1 - a * b * w * (rho_a * rho_b * (t2 + t3 + t4 + t5) + t6)


def _slater_ex(rho_a, rho_b, s_aa, s_ab, s_bb):
    return 0.5 * (_eps_x(2 * rho_a) * 2 * rho_a
                  + _eps_x(2 * rho_b) * 2 * rho_b)


def _vwn5_ec(rho_a, rho_b, s_aa, s_ab, s_bb):
    rho = rho_a + rho_b
    z = jnp.clip((rho_a - rho_b) / rho, -1 + 1e-15, 1 - 1e-15)
    rs = (3.0 / (4 * np.pi * rho)) ** (1.0 / 3.0)
    ec = (_eps_c_para(rs)
          + (_eps_c_ferro(rs) - _eps_c_para(rs)) * _f_zeta(z))
    return rho * ec


def _vwn3_ec(rho_a, rho_b, s_aa, s_ab, s_bb):
    """VWN functional III (the RPA parameterization) — the correlation
    Gaussian's canonical B3LYP mixes in [VWN, Can. J. Phys. 58, 1200
    (1980), Table 5 RPA fits]."""
    rho = rho_a + rho_b
    z = jnp.clip((rho_a - rho_b) / rho, -1 + 1e-15, 1 - 1e-15)
    rs = (3.0 / (4 * np.pi * rho)) ** (1.0 / 3.0)
    ep = _vwn_eps(rs, 0.0310907, -0.409286, 13.0720, 42.7198)
    ef = _vwn_eps(rs, 0.01554535, -0.743294, 20.1231, 101.578)
    return rho * (ep + (ef - ep) * _f_zeta(z))


def svwn_exc(rho_a, rho_b, s_aa, s_ab, s_bb):
    return (_slater_ex(rho_a, rho_b, s_aa, s_ab, s_bb)
            + _vwn5_ec(rho_a, rho_b, s_aa, s_ab, s_bb))


def blyp_exc(rho_a, rho_b, s_aa, s_ab, s_bb):
    return (b88_ex(rho_a, rho_b, s_aa, s_ab, s_bb)
            + lyp_ec(rho_a, rho_b, s_aa, s_ab, s_bb))


def b3lyp_exc(rho_a, rho_b, s_aa, s_ab, s_bb):
    """Canonical B3LYP (the Gaussian definition, VWN3/RPA correlation):
    0.08 Slater + 0.72 B88 + 0.20 HF-x (added by the SCF driver),
    0.19 VWN3 + 0.81 LYP [Stephens et al., JPC 98, 11623 (1994)]."""
    return (0.08 * _slater_ex(rho_a, rho_b, s_aa, s_ab, s_bb)
            + 0.72 * b88_ex(rho_a, rho_b, s_aa, s_ab, s_bb)
            + 0.19 * _vwn3_ec(rho_a, rho_b, s_aa, s_ab, s_bb)
            + 0.81 * lyp_ec(rho_a, rho_b, s_aa, s_ab, s_bb))


def b3lyp5_exc(rho_a, rho_b, s_aa, s_ab, s_bb):
    """B3LYP with VWN5 correlation (the Turbomole/ORCA 'B3LYP' variant,
    ~0.03 Eh above the VWN3 form for water)."""
    return (0.08 * _slater_ex(rho_a, rho_b, s_aa, s_ab, s_bb)
            + 0.72 * b88_ex(rho_a, rho_b, s_aa, s_ab, s_bb)
            + 0.19 * _vwn5_ec(rho_a, rho_b, s_aa, s_ab, s_bb)
            + 0.81 * lyp_ec(rho_a, rho_b, s_aa, s_ab, s_bb))


def pbe0_exc(rho_a, rho_b, s_aa, s_ab, s_bb):
    """PBE0: 0.75 PBE-x + 0.25 HF-x + full PBE-c
    [Adamo & Barone, JCP 110, 6158 (1999)]."""
    ex = 0.5 * (_pbe_ex_unpol(2 * rho_a, 4 * s_aa)
                + _pbe_ex_unpol(2 * rho_b, 4 * s_bb))
    full = pbe_exc(rho_a, rho_b, s_aa, s_ab, s_bb)
    return full - 0.25 * ex


#: functional registry: name -> (exc_density fn, HF-exchange fraction,
#: needs_gradient)
FUNCTIONALS = {
    "svwn": (svwn_exc, 0.0, False),
    "lda": (svwn_exc, 0.0, False),
    "pbe": (pbe_exc, 0.0, True),
    "blyp": (blyp_exc, 0.0, True),
    "b3lyp": (b3lyp_exc, 0.20, True),
    "b3lyp5": (b3lyp5_exc, 0.20, True),
    "pbe0": (pbe0_exc, 0.25, True),
}


def ao_values_grad(bfs, pts):
    """AO amplitudes and Cartesian gradients on grid points:
    (vals (P, nao), grads (P, nao, 3))."""
    pts = np.asarray(pts)
    P = len(pts)
    nao = len(bfs)
    vals = np.zeros((P, nao))
    grads = np.zeros((P, nao, 3))
    for k, g in enumerate(bfs):
        d = pts - g.center[None, :]
        r2 = np.sum(d ** 2, axis=1)
        expo = np.exp(-np.outer(r2, g.exps)) * (g.coefs * g.norms)[None, :]
        rad = expo.sum(axis=1)                       # (P,)
        drad = -2.0 * (expo * g.exps[None, :]).sum(axis=1)   # d/d(r2) * 2
        mono = [d[:, i] ** g.lmn[i] for i in range(3)]
        poly = mono[0] * mono[1] * mono[2]
        vals[:, k] = poly * rad
        for i in range(3):
            l = g.lmn[i]
            # d/dx_i [poly * rad] = l x^{l-1} (other monomials) rad
            #                       + poly * drad * x_i
            if l > 0:
                po = [mono[j] for j in range(3) if j != i]
                grads[:, k, i] = (l * d[:, i] ** (l - 1) * po[0] * po[1]
                                  * rad + poly * drad * d[:, i])
            else:
                grads[:, k, i] = poly * drad * d[:, i]
    return jnp.asarray(vals), jnp.asarray(grads)


_gga_args = (0, 1, 2, 3, 4)


def gga_exc_vxc(f_exc, rho_a, rho_b, s_aa, s_ab, s_bb, rho_min=1e-10):
    """(exc, v_rho_a, v_rho_b, v_saa, v_sab, v_sbb) on the grid, all by
    autodiff of the closed-form energy density; densities below rho_min
    are substituted before differentiation (no NaN leakage)."""
    safe = (rho_a + rho_b) > rho_min
    # per-spin floors: a fully spin-polarized point has rho_b == 0
    # exactly, where B88/LYP beta-channel terms (x_b = sqrt(s_bb) /
    # rho_b^{4/3}, rho_b^{-1/3} chains) are 0/0 — floor each channel
    # so the dead channel contributes ~1e-20 instead of NaN
    ra = jnp.where(safe, jnp.maximum(rho_a, 1e-15), 1.0)
    rb = jnp.where(safe, jnp.maximum(rho_b, 1e-15), 1.0)
    sa = jnp.where(safe, jnp.maximum(s_aa, 1e-24), 1e-6)
    sab = jnp.where(safe, s_ab, 1e-6)
    sb = jnp.where(safe, jnp.maximum(s_bb, 1e-24), 1e-6)
    val, grads = jax.vmap(jax.value_and_grad(
        f_exc, argnums=_gga_args))(ra, rb, sa, sab, sb)
    return ([jnp.where(safe, val, 0.0)]
            + [jnp.where(safe, g, 0.0) for g in grads])


# -------------------------------------------------------------------
# SCF drivers
# -------------------------------------------------------------------

class RKS:
    """Restricted Kohn-Sham: LDA (SVWN), GGA (PBE, BLYP), and hybrid
    (B3LYP, PBE0) functionals — see :data:`FUNCTIONALS`. GGA/hybrid XC
    potentials come from autodiff of the closed-form energy densities
    (v_rho and v_sigma via ``jax.grad``; the V_xc matrix assembles the
    standard grad-rho chain-rule term)."""

    def __init__(self, mol, xc="svwn", n_rad=60, n_theta=14,
                 max_cycle=100, conv_tol=1e-9, diis_size=8,
                 extra_hcore=None):
        self.mol = mol
        #: optional (nao, nao) one-electron AO perturbation (finite-field
        #: properties; same contract as RHF's extra_hcore)
        self.extra_hcore = extra_hcore
        self.xc = xc.lower()
        if self.xc not in FUNCTIONALS:
            raise NotImplementedError(
                f"functional {xc!r} (available: {sorted(FUNCTIONALS)})")
        self.f_exc, self.hfx, self._needs_grad = FUNCTIONALS[self.xc]
        self.max_cycle = max_cycle
        self.conv_tol = conv_tol
        self.diis_size = diis_size
        self.n_rad, self.n_theta = n_rad, n_theta
        self.grid = becke_grid(mol.atoms, n_rad, n_theta)
        if self._needs_grad:
            self.ao, self.ao_grad = ao_values_grad(mol.bfs, self.grid[0])
        else:
            self.ao = ao_values(mol.bfs, self.grid[0])
            self.ao_grad = None
        if getattr(mol, "csph", None) is not None:
            # pure-spherical AOs: contract the Cartesian grid values so
            # the density einsums run in the same basis as mol.intor()
            self.ao = np.asarray(self.ao) @ mol.csph.T
            if self.ao_grad is not None:
                self.ao_grad = np.einsum(
                    "pid, qi -> pqd", np.asarray(self.ao_grad), mol.csph)
        self.converged = False

    def _xc(self, D):
        """(E_xc, V_xc matrix) for a closed-shell density matrix."""
        ao, w = self.ao, self.grid[1]
        rho = jnp.maximum(jnp.einsum("pi, ij, pj -> p", ao, D, ao), 0.0)
        if not self._needs_grad:
            exc, va, _ = lda_exc_vxc(rho / 2, rho / 2)
            E = jnp.sum(w * exc)
            V = jnp.einsum("p, pi, pj -> ij", w * va, ao, ao)
            return E, 0.5 * (V + V.T)
        gao = self.ao_grad
        grho = 2.0 * jnp.einsum("pid, ij, pj -> pd", gao, D, ao)
        s = jnp.sum(grho * grho, axis=1)
        exc, vra, vrb, vsaa, vsab, vsbb = gga_exc_vxc(
            self.f_exc, rho / 2, rho / 2, s / 4, s / 4, s / 4)
        E = jnp.sum(w * exc)
        # u = d exc / d grad(rho_a) = 2 v_saa grad(rho_a)
        #     + v_sab grad(rho_b) = (v_saa + v_sab/2) grad(rho)  (CS);
        # V_grad = A + A^T with A_ij = sum_p w u . grad(phi_i) phi_j
        u = (vsaa + 0.5 * vsab)[:, None] * grho              # (P, 3)
        Vr = jnp.einsum("p, pi, pj -> ij", w * vra, ao, ao)
        A = jnp.einsum("pd, pid, pj -> ij", w[:, None] * u, gao, ao)
        return E, 0.5 * (Vr + Vr.T) + A + A.T

    def run(self):
        mol = self.mol
        S, T, Vn, eri = mol.intor()
        hcore = T + Vn
        if self.extra_hcore is not None:
            hcore = hcore + jnp.asarray(self.extra_hcore)
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
            if self.hfx:
                K = jnp.einsum("prqs, rs -> pq", eri, D)
                F = F - 0.25 * self.hfx * (K + K.T)
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
            if self.hfx:
                K = jnp.einsum("prqs, rs -> pq", eri, D)
                E -= float(0.25 * self.hfx * jnp.sum(D * K))
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
        self.S = S
        self.hcore = hcore
        self.eri = eri
        return self

    kernel = run

    def polarizability(self, eps=1e-3):
        """Static finite-field dipole polarizability (3, 3) — the
        KS analogue of RHF.polarizability; cross-checks the TDDFT
        response kernel (tests/test_tddft.py)."""
        mu_ao = np.asarray(self.dipole_integrals())
        alpha = np.zeros((3, 3))
        for j in range(3):
            mus = []
            for s in (+1.0, -1.0):
                mf = RKS(self.mol, xc=self.xc, max_cycle=self.max_cycle,
                         conv_tol=self.conv_tol,
                         n_rad=self.n_rad, n_theta=self.n_theta,
                         diis_size=self.diis_size,
                         extra_hcore=s * eps * mu_ao[j]).run()
                mus.append(mf.dip_moment())
            alpha[:, j] = (mus[0] - mus[1]) / (2.0 * eps)
        return 0.5 * (alpha + alpha.T)

    def nelec_on_grid(self):
        ao, w = self.ao, self.grid[1]
        rho = jnp.einsum("pi, ij, pj -> p", ao, self.dm, ao)
        return float(jnp.sum(w * rho))


class UKS:
    """Unrestricted Kohn-Sham: LSDA, GGA, and hybrid functionals (same
    registry as :class:`RKS`)."""

    def __init__(self, mol, xc="svwn", n_rad=60, n_theta=14,
                 max_cycle=150, conv_tol=1e-9):
        self.mol = mol
        self.xc = xc.lower()
        if self.xc not in FUNCTIONALS:
            raise NotImplementedError(
                f"functional {xc!r} (available: {sorted(FUNCTIONALS)})")
        self.f_exc, self.hfx, self._needs_grad = FUNCTIONALS[self.xc]
        self.max_cycle = max_cycle
        self.conv_tol = conv_tol
        self.n_rad, self.n_theta = n_rad, n_theta
        self.grid = becke_grid(mol.atoms, n_rad, n_theta)
        if self._needs_grad:
            self.ao, self.ao_grad = ao_values_grad(mol.bfs, self.grid[0])
        else:
            self.ao = ao_values(mol.bfs, self.grid[0])
            self.ao_grad = None
        if getattr(mol, "csph", None) is not None:
            # pure-spherical AOs: contract the Cartesian grid values so
            # the density einsums run in the same basis as mol.intor()
            self.ao = np.asarray(self.ao) @ mol.csph.T
            if self.ao_grad is not None:
                self.ao_grad = np.einsum(
                    "pid, qi -> pqd", np.asarray(self.ao_grad), mol.csph)
        self.converged = False

    def _xc_uks(self, Da, Db):
        """(E_xc, Va, Vb) for spin density matrices."""
        ao, w = self.ao, self.grid[1]
        ra = jnp.maximum(jnp.einsum("pi, ij, pj -> p", ao, Da, ao), 0)
        rb = jnp.maximum(jnp.einsum("pi, ij, pj -> p", ao, Db, ao), 0)
        if not self._needs_grad:
            exc, va, vb = lda_exc_vxc(ra, rb)
            Va = jnp.einsum("p, pi, pj -> ij", w * va, ao, ao)
            Vb = jnp.einsum("p, pi, pj -> ij", w * vb, ao, ao)
            return (jnp.sum(w * exc), 0.5 * (Va + Va.T),
                    0.5 * (Vb + Vb.T))
        gao = self.ao_grad
        ga = 2.0 * jnp.einsum("pid, ij, pj -> pd", gao, Da, ao)
        gb = 2.0 * jnp.einsum("pid, ij, pj -> pd", gao, Db, ao)
        saa = jnp.sum(ga * ga, axis=1)
        sab = jnp.sum(ga * gb, axis=1)
        sbb = jnp.sum(gb * gb, axis=1)
        exc, vra, vrb, vsaa, vsab, vsbb = gga_exc_vxc(
            self.f_exc, ra, rb, saa, sab, sbb)
        ua = 2.0 * vsaa[:, None] * ga + vsab[:, None] * gb
        ub = 2.0 * vsbb[:, None] * gb + vsab[:, None] * ga
        Va = jnp.einsum("p, pi, pj -> ij", w * vra, ao, ao)
        Vb = jnp.einsum("p, pi, pj -> ij", w * vrb, ao, ao)
        Aa = jnp.einsum("pd, pid, pj -> ij", w[:, None] * ua, gao, ao)
        Ab = jnp.einsum("pd, pid, pj -> ij", w[:, None] * ub, gao, ao)
        return (jnp.sum(w * exc),
                0.5 * (Va + Va.T) + Aa + Aa.T,
                0.5 * (Vb + Vb.T) + Ab + Ab.T)

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
            Exc, VxcA, VxcB = self._xc_uks(Da, Db)
            Fa = hcore + J + VxcA
            Fb = hcore + J + VxcB
            if self.hfx:
                Ka = jnp.einsum("prqs, rs -> pq", eri, Da)
                Kb = jnp.einsum("prqs, rs -> pq", eri, Db)
                Fa = Fa - 0.5 * self.hfx * (Ka + Ka.T)
                Fb = Fb - 0.5 * self.hfx * (Kb + Kb.T)
            Da_new, Ca, ea = density(Fa, na)
            Db_new, Cb, eb = density(Fb, nb)
            Da = (1 - damp) * Da_new + damp * Da
            Db = (1 - damp) * Db_new + damp * Db
            E = float(jnp.sum((Da + Db) * hcore)
                      + 0.5 * jnp.sum((Da + Db) * J) + Exc)
            if self.hfx:
                E -= float(0.5 * self.hfx * (jnp.sum(Da * Ka)
                                             + jnp.sum(Db * Kb)))
            if abs(E - E_old) < self.conv_tol and it > 3:
                self.converged = True
                break
            E_old = E

        self.e_tot = E + enuc
        self.e_xc = float(Exc)
        self.mo_coeff = (Ca, Cb)
        self.mo_energy = (ea, eb)
        self.nocc = (na, nb)
        self.dm = (Da, Db)
        return self

    kernel = run


# RKS borrows the mean-field property surface from RHF (same attribute
# contract: mol/dm/mo_coeff/hcore/eri/S/nocc)
from .scf import RHF as _RHF                                  # noqa: E402
RKS.mo_ints = _RHF.mo_ints
RKS.dipole_integrals = _RHF.dipole_integrals
RKS.dip_moment = _RHF.dip_moment
RKS.transition_dipoles = _RHF.transition_dipoles
