"""Molecular geometry utilities: Z-matrix construction and the Eckart
frame.

TPU-native counterpart of the reference geometry layer (reference:
pyqed/qchem/mol.py — the Z-matrix plumbing at :231-293/:389 is
commented out and ``build_zmatrix``/``print_zmat`` are dead; the
inertia helper is :713 ``inertia_moment``).  Both directions are made
real here: internal -> Cartesian construction and the mass-weighted
Eckart (Kabsch) rotation used for vibrational analysis.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from ..units import atomic_mass, au2amu


def zmatrix_to_cartesian(zmat: Sequence) -> np.ndarray:
    """Build Cartesian coordinates (bohr) from Z-matrix entries.

    zmat : list of tuples
        (sym,), (sym, i, r), (sym, i, r, j, theta),
        (sym, i, r, j, theta, k, phi) with 0-based references,
        theta/phi in radians.
    Returns coords (natm, 3).
    """
    coords = []
    for entry in zmat:
        n = len(coords)
        if n == 0:
            coords.append(np.zeros(3))
        elif n == 1:
            _, i, r = entry[:3]
            coords.append(coords[i] + np.array([0.0, 0.0, float(r)]))
        elif n == 2:
            _, i, r, j, th = entry[:5]
            b = coords[j] - coords[i]
            b /= np.linalg.norm(b)
            # any perpendicular
            perp = np.cross(b, [1.0, 0.0, 0.0])
            if np.linalg.norm(perp) < 1e-8:
                perp = np.cross(b, [0.0, 1.0, 0.0])
            perp /= np.linalg.norm(perp)
            coords.append(coords[i] + r * (np.cos(th) * b
                                           + np.sin(th) * perp))
        else:
            _, i, r, j, th, k, phi = entry[:7]
            b1 = coords[i] - coords[j]
            b2 = coords[j] - coords[k]
            e1 = b1 / np.linalg.norm(b1)
            n1 = np.cross(b2, b1)
            n1 /= np.linalg.norm(n1)
            m = np.cross(n1, e1)
            # NeRF: place along -e1 rotated by theta about n1, then phi
            d = (-np.cos(th) * e1
                 + np.sin(th) * (np.cos(phi) * m - np.sin(phi) * n1))
            coords.append(coords[i] + r * d)
    return np.asarray(coords)


def bond_length(coords, i, j):
    return float(np.linalg.norm(coords[i] - coords[j]))


def bond_angle(coords, i, j, k):
    """Angle at j (radians)."""
    a = coords[i] - coords[j]
    b = coords[k] - coords[j]
    c = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    return float(np.arccos(np.clip(c, -1.0, 1.0)))


def dihedral(coords, i, j, k, l):
    """Signed dihedral i-j-k-l (radians)."""
    b1 = coords[j] - coords[i]
    b2 = coords[k] - coords[j]
    b3 = coords[l] - coords[k]
    n1 = np.cross(b1, b2)
    n2 = np.cross(b2, b3)
    m = np.cross(n1, b2 / np.linalg.norm(b2))
    return float(np.arctan2(np.dot(m, n2), np.dot(n1, n2)))


def eckart_frame(ref_coords, coords, masses):
    """Rotate/translate ``coords`` into the Eckart frame of
    ``ref_coords``: both Eckart conditions hold after the transform
    (sum_a m_a d_a = 0 and sum_a m_a ref_a x d_a = 0).

    Implemented as mass-weighted Kabsch alignment.  Returns
    (aligned_coords, rotation R, rmsd)."""
    m = np.asarray(masses, float)
    ref = np.asarray(ref_coords, float)
    cur = np.asarray(coords, float)
    ref_c = ref - np.average(ref, axis=0, weights=m)
    cur_c = cur - np.average(cur, axis=0, weights=m)
    H = (cur_c * m[:, None]).T @ ref_c
    U, S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    R = Vt.T @ np.diag([1.0, 1.0, d]) @ U.T
    aligned = cur_c @ R.T
    rmsd = float(np.sqrt(np.average(
        np.sum((aligned - ref_c) ** 2, axis=1), weights=m)))
    return aligned, R, rmsd


def eckart_conditions(ref_coords, coords, masses, tol=1e-8):
    """True if both Eckart conditions are satisfied."""
    m = np.asarray(masses, float)
    ref = np.asarray(ref_coords, float)
    ref = ref - np.average(ref, axis=0, weights=m)
    d = np.asarray(coords, float) - ref
    c1 = np.linalg.norm(np.sum(m[:, None] * d, axis=0))
    c2 = np.linalg.norm(np.sum(m[:, None] * np.cross(ref, d), axis=0))
    return bool(c1 < tol and c2 < tol)


def masses_of(atoms) -> np.ndarray:
    """Atomic masses (a.u.) from a list of (symbol, xyz)."""
    return np.array([atomic_mass[s] / au2amu for s, _ in atoms])


# ---------------------------------------------------------------------------
# G-matrix for reduced curvilinear coordinates
# (reference: pyqed/namd/gmat.py — buildGmat_linear / buildG_curvilinear are
# untranslated MATLAB pseudocode with eval(sprintf(...)) and undefined
# variables; the capability is made real here)
# ---------------------------------------------------------------------------

def gmatrix(geom_fn, q, masses, dq=1e-4, jac=None):
    """Wilson G-matrix of reduced coordinates q at a single point.

    The kinetic metric of curvilinear nuclear coordinates q_i is

        (G^{-1})_ij = sum_A m_A  (dx_A/dq_i) . (dx_A/dq_j),
        KEO = -1/2 sum_ij d/dq_i G_ij d/dq_j  (+ extrapotential terms)

    Parameters
    ----------
    geom_fn : callable q (ndim,) -> Cartesian geometry (natm, 3) in bohr.
        If jax-differentiable, the Jacobian comes from ``jax.jacfwd``
        (exact); otherwise set ``jac=False`` for central differences.
    q : (ndim,) coordinate values.
    masses : (natm,) in atomic units (electron masses).

    Returns (G, Ginv), each (ndim, ndim).
    """
    import jax
    import jax.numpy as jnp
    q = jnp.asarray(q, dtype=float)
    m = jnp.asarray(masses, dtype=float)
    use_ad = jac if jac is not None else True
    if use_ad:
        try:
            J = jax.jacfwd(lambda qq: jnp.asarray(geom_fn(qq)))(q)
            # J: (natm, 3, ndim)
        except Exception:
            use_ad = False
    if not use_ad:
        ndim = q.shape[0]
        cols = []
        for i in range(ndim):
            e = np.zeros(ndim)
            e[i] = dq
            cols.append((np.asarray(geom_fn(np.asarray(q) + e))
                         - np.asarray(geom_fn(np.asarray(q) - e)))
                        / (2 * dq))
        J = jnp.stack([jnp.asarray(c) for c in cols], axis=-1)
    Ginv = jnp.einsum("a, axi, axj -> ij", m, J, J)
    return jnp.linalg.inv(Ginv), Ginv


def gmatrix_grid(geom_fn, qgrid, masses, **kwargs):
    """Vmapped G-matrix over a grid of coordinate points.

    qgrid: (npts, ndim) -> returns (G (npts, ndim, ndim), Ginv same).
    """
    import jax
    import jax.numpy as jnp
    qgrid = jnp.asarray(qgrid, dtype=float)
    m = jnp.asarray(masses, dtype=float)

    def one(q):
        J = jax.jacfwd(lambda qq: jnp.asarray(geom_fn(qq)))(q)
        Ginv = jnp.einsum("a, axi, axj -> ij", m, J, J)
        return jnp.linalg.inv(Ginv), Ginv

    return jax.vmap(one)(qgrid)


def save_to_xyz(mol, fname):
    """Write the geometry as a standard .xyz file in Angstrom
    (reference: pyqed/qchem/hessian.py:441 ``save_to_xyz``, which writes
    bohr; the .xyz convention is Angstrom, so we convert)."""
    from ..units import au2angstrom
    with open(fname, "w") as f:
        f.write(f"{mol.natm}\n\n")
        for s, x in mol.atoms:
            x = np.asarray(x, dtype=float) * au2angstrom
            f.write(f"{s} {x[0]:.10f} {x[1]:.10f} {x[2]:.10f}\n")


def read_xyz(fname):
    """Read a standard .xyz file (Angstrom) -> list of (symbol, xyz_bohr)
    ready for :class:`~pyqed_tpu.qchem.Molecule`
    (reference: pyqed/qchem/mol.py:1174 ``readxyz``)."""
    from ..units import au2angstrom
    with open(fname) as f:
        lines = f.read().split("\n")
    natm = int(lines[0].split()[0])
    atoms = []
    for line in lines[2:2 + natm]:
        parts = line.split()
        xyz = np.array(parts[1:4], dtype=float) / au2angstrom
        atoms.append((parts[0], xyz))
    return atoms


def quasi_angular_momentum(masses, reference, changed):
    """l = sum_k m_k (r_ref,k x r_k) — the rotational Eckart-condition
    residual (reference: pyqed/qchem/mol.py:1209; vanishes in the
    Eckart frame). reference/changed: (natm, 3)."""
    ref = np.asarray(reference, dtype=float)
    chg = np.asarray(changed, dtype=float)
    m = np.asarray(masses, dtype=float)
    return np.einsum("a, ax -> x", m, np.cross(ref, chg))


def grad_nuc(mol, atmlst=None):
    """Analytic nuclear-repulsion gradient dE_nn/dR_A (natm, 3)
    (reference: pyqed/qchem/mol.py:1156)."""
    z = np.asarray(mol.atom_charges(), dtype=float)
    r = np.asarray(mol.atom_coords(), dtype=float)
    dr = r[:, None, :] - r[None, :, :]
    dist = np.linalg.norm(dr, axis=2)
    np.fill_diagonal(dist, np.inf)
    gs = np.einsum("i, j, ijx, ij -> ix", -z, z, dr, dist**-3)
    return gs if atmlst is None else gs[np.asarray(atmlst)]
