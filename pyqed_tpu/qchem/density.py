"""Real-space (transition) charge and current densities on grids.

TPU-native counterpart of the reference's current-density module
(reference: pyqed/qchem/current_density.py — ``eval_rho_tcurdens:81``,
``eval_rho_tchgdens:88``, ``eval_nabla_ao:72``, ``CreateCube:62``,
``WriteCube:67``; there the AO values come from pyscf ``eval_gto``; here
they are evaluated from our own contracted-Cartesian-GTO basis, batched
over grid points).

Given a (possibly complex) AO transition density matrix gamma:

    rho_T(r)  = sum_pq gamma_pq phi_p(r) phi_q(r)
    j_T(r)    = (1/2i) sum_pq gamma_pq [phi_p grad phi_q - (grad phi_p) phi_q]

(real gamma -> purely real rho_T and j_T = Im-part contraction).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .dft import ao_values


def ao_gradients(bfs, pts):
    """Analytic gradient of contracted Cartesian GTOs on points:
    returns (P, nao, 3). d/dx [x^l e^{-a r^2}] =
    l x^{l-1} e^{-a r^2} - 2 a x^{l+1} e^{-a r^2} (per primitive)."""
    pts = np.asarray(pts)
    P = len(pts)
    out = np.zeros((P, len(bfs), 3))
    for k, g in enumerate(bfs):
        d = pts - g.center[None, :]
        r2 = np.sum(d ** 2, axis=1)
        # per-primitive radial parts with coefficient*norm folded in
        rad = np.exp(-np.outer(r2, g.exps)) * (g.coefs * g.norms)[None, :]
        mono = [d[:, ax] ** g.lmn[ax] for ax in range(3)]
        for ax in range(3):
            l = g.lmn[ax]
            others = np.ones(P)
            for bx in range(3):
                if bx != ax:
                    others = others * mono[bx]
            # polynomial-derivative term: l x^{l-1}
            if l > 0:
                t1 = l * d[:, ax] ** (l - 1) * others
                term1 = t1[:, None] * rad
            else:
                term1 = 0.0
            # exponent term: -2 a x^{l+1}
            t2 = d[:, ax] ** (l + 1) * others
            term2 = -2.0 * t2[:, None] * rad * g.exps[None, :]
            out[:, k, ax] = np.sum(term1 + term2, axis=1)
    return jnp.asarray(out)


def charge_density(bfs, dm, pts):
    """rho(r) = sum_pq D_pq phi_p(r) phi_q(r) on points -> (P,)."""
    ao = ao_values(bfs, pts)
    return jnp.einsum("pq, ip, iq -> i", jnp.asarray(dm), ao, ao)


transition_charge_density = charge_density


def transition_current_density(bfs, tdm, pts):
    """j_T(r) = (1/2i) sum_pq gamma_pq [phi_p grad phi_q
    - (grad phi_p) phi_q] -> (P, 3)
    (reference: pyqed/qchem/current_density.py:81)."""
    ao = ao_values(bfs, pts)                      # (P, nao)
    grad = ao_gradients(bfs, pts)                 # (P, nao, 3)
    g = jnp.asarray(tdm)
    t1 = jnp.einsum("pq, ip, iqx -> ix", g, ao, grad)
    t2 = jnp.einsum("pq, ipx, iq -> ix", g, grad, ao)
    return (t1 - t2) / 2j


def current_density_wavefunction(bfs, coeff, pts):
    """Probability current of a (complex) one-electron orbital
    psi = sum_p c_p phi_p:  j = Im[psi* grad psi]."""
    ao = ao_values(bfs, pts)
    grad = ao_gradients(bfs, pts)
    c = jnp.asarray(coeff)
    psi = ao @ c
    dpsi = jnp.einsum("ipx, p -> ix", grad, c)
    return jnp.imag(jnp.conj(psi)[:, None] * dpsi)


def cube_grid(atoms, nx=40, ny=40, nz=40, margin=4.0):
    """Uniform cube-file grid box around the molecule
    (reference: pyqed/qchem/current_density.py:62 ``CreateCube``).
    Returns (pts (P,3), origin, axes (3,3), shape)."""
    coords = np.asarray([np.asarray(a[1], dtype=float) for a in atoms])
    lo = coords.min(axis=0) - margin
    hi = coords.max(axis=0) + margin
    xs = [np.linspace(lo[k], hi[k], n) for k, n in
          zip(range(3), (nx, ny, nz))]
    X, Y, Z = np.meshgrid(*xs, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
    axes = np.diag([(hi[k] - lo[k]) / (n - 1)
                    for k, n in zip(range(3), (nx, ny, nz))])
    return pts, lo, axes, (nx, ny, nz)


def write_density_cube(fname, atoms, bfs, dm, nx=40, ny=40, nz=40,
                       margin=4.0):
    """Evaluate rho on a cube grid and write a Gaussian cube file
    (reference: pyqed/qchem/current_density.py:67 ``WriteCube``)."""
    from ..utils.io import write_cube
    from ..units import au2angstrom
    pts, origin, axes, shape = cube_grid(atoms, nx, ny, nz, margin)
    rho = np.asarray(charge_density(bfs, dm, pts)).reshape(shape)
    cell = axes * (np.asarray(shape) - 1)[:, None]
    # qchem coordinates are bohr; write_cube takes angstrom
    atoms_ang = [(a[0], np.asarray(a[1], dtype=float) * au2angstrom)
                 for a in atoms]
    with open(fname, "w") as f:
        write_cube(f, atoms_ang, cell * au2angstrom, data=rho,
                   origin=origin * au2angstrom)
    return rho


def ao_on_grid(mol, pts):
    """AO values (P, nao) on arbitrary points, in the SAME basis as
    ``mol.intor()`` (contracts through the pure-spherical transform when
    ``mol.spherical``)."""
    from .dft import ao_values
    ao = np.asarray(ao_values(mol.bfs, pts))
    C = getattr(mol, "csph", None)
    return ao if C is None else ao @ C.T


def write_mo_cube(fname, mol, mo, nx=40, ny=40, nz=40, margin=4.0):
    """Write one molecular orbital phi(r) = sum_p mo[p] chi_p(r) as a
    Gaussian cube file (reference: pyqed/qchem/mol.py:1544 ``view_mo``,
    a pyscf-cubegen wrapper; here evaluated with the native AO engine).

    mo: (nao,) MO coefficient column (e.g. ``mf.mo_coeff[:, i]``).
    """
    from ..utils.io import write_cube
    from ..units import au2angstrom
    atoms = mol.atoms
    pts, origin, axes, shape = cube_grid(atoms, nx, ny, nz, margin)
    phi = (ao_on_grid(mol, pts) @ np.asarray(mo)).reshape(shape)
    cell = axes * (np.asarray(shape) - 1)[:, None]
    atoms_ang = [(a[0], np.asarray(a[1], dtype=float) * au2angstrom)
                 for a in atoms]
    with open(fname, "w") as f:
        write_cube(f, atoms_ang, cell * au2angstrom, data=phi,
                   origin=origin * au2angstrom)
    return phi
