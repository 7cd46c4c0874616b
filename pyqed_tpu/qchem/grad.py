"""Nuclear gradients and geometry optimization.

TPU-native counterpart of the reference gradient layer (reference:
pyqed/qchem/grad.py:9 ``Grad`` — there a 21-line skeleton whose
``get_hcore``/``get_overlap``/``run`` bodies are empty; made real here).

Gradients are central finite differences of the total energy of any of
the in-house mean-field methods (RHF/UHF/RKS/UKS).  The GTO integrals
are built in NumPy (recursion-heavy, host-side), so autodiff cannot flow
through them; FD over the 3N Cartesian displacements is embarrassingly
parallel and each displaced SCF runs its dense linear algebra (Fock
builds, eigh, DIIS) on device.  Geometry optimization is BFGS over the
flattened coordinates with the FD gradient as the Jacobian.
"""
from __future__ import annotations

import numpy as np

from .mol import Molecule

__all__ = ["Grad", "optimize_geometry", "GeometryOptimizer",
           "scan_pes", "rhf_gradient", "scf_gradient"]


def _method_energy(atoms, basis, method, charge=0, spin=0, xc=None,
                   spherical=False, **method_kw):
    """Total energy of ``method`` at geometry ``atoms`` (bohr)."""
    mol = Molecule(atoms, charge=charge, spin=spin, basis=basis,
                   spherical=spherical)
    method = method.upper()
    if method == "RHF":
        mf = mol.RHF(**method_kw)
    elif method == "UHF":
        mf = mol.UHF(**method_kw)
    elif method == "RKS":
        mf = mol.RKS(xc=xc or "svwn", **method_kw)
    elif method == "UKS":
        mf = mol.UKS(xc=xc or "svwn", **method_kw)
    else:
        raise ValueError(f"unknown method {method!r}")
    mf.run()
    if not mf.converged:
        raise RuntimeError(f"{method} SCF failed to converge during "
                           "gradient evaluation")
    return float(mf.e_tot)


class Grad:
    """Central-difference nuclear gradient dE/dR, shape (natm, 3).

    Accepts either a converged (or not-yet-run) mean-field object from
    :mod:`pyqed_tpu.qchem.scf`/:mod:`~pyqed_tpu.qchem.dft` — the
    reference calling convention ``Grad(mf)``
    (pyqed/qchem/grad.py:10) — or an explicit geometry:

    >>> g = Grad(mol.RHF()).run()          # pyscf-style
    >>> g = Grad(atoms=[...], method="RKS", xc="pbe").run()

    After ``run()``, ``self.de`` holds the gradient (Eh/bohr).
    """

    def __init__(self, mf=None, atoms=None, basis="sto-3g", method="RHF",
                 step=5e-3, charge=0, spin=0, xc=None, **method_kw):
        if mf is not None:
            mol = mf.mol
            atoms = mol.atoms
            basis = mol.basis_name
            charge = mol.charge
            spin = mol.spin
            method = type(mf).__name__
            xc = getattr(mf, "xc", xc)
            self.spherical = bool(getattr(mol, "csph", None) is not None)
        else:
            self.spherical = bool(method_kw.pop("spherical", False))
        if atoms is None:
            raise ValueError("pass a mean-field object or atoms=")
        self.atoms = [(s, np.asarray(x, dtype=float)) for s, x in atoms]
        self.basis = basis
        self.method = method
        self.charge = charge
        self.spin = spin
        self.xc = xc
        self.step = step
        self.method_kw = method_kw
        self.natm = len(self.atoms)
        self.de = None
        self.e_tot = None

    def _energy(self, coords_flat):
        coords = np.asarray(coords_flat, dtype=float).reshape(self.natm, 3)
        atoms = [(s, c) for (s, _), c in zip(self.atoms, coords)]
        return _method_energy(atoms, self.basis, self.method,
                              charge=self.charge, spin=self.spin,
                              xc=self.xc, spherical=self.spherical,
                              **self.method_kw)

    def _grad_flat(self, x):
        """Central-difference gradient at flat coordinates x (3N,)."""
        h = self.step
        g = np.zeros_like(x)
        for i in range(x.size):
            dp = x.copy(); dp[i] += h
            dm = x.copy(); dm[i] -= h
            g[i] = (self._energy(dp) - self._energy(dm)) / (2 * h)
        return g

    def run(self):
        """Compute the (natm, 3) gradient; returns ``self``."""
        x0 = np.concatenate([x for _, x in self.atoms])
        g = self._grad_flat(x0)
        self.e_tot = self._energy(x0)
        self.de = g.reshape(self.natm, 3)
        return self

    def kernel(self):
        """pyscf-style alias: run and return the gradient array."""
        return self.run().de


class GeometryOptimizer:
    """BFGS geometry optimization on the FD-gradient surface.

    The reference exposes no working optimizer (its Grad.run is empty);
    this drives :class:`scipy.optimize.minimize` with the central-
    difference Jacobian, stopping on ``gtol`` (max |dE/dR| component).
    """

    def __init__(self, atoms, basis="sto-3g", method="RHF", charge=0,
                 spin=0, xc=None, step=5e-3, gtol=3e-4, maxiter=60,
                 analytic=None, **method_kw):
        self.grad = Grad(atoms=atoms, basis=basis, method=method,
                         charge=charge, spin=spin, xc=xc, step=step,
                         **method_kw)
        #: analytic gradients (RHF/UHF): default on there, FD for DFT
        self.analytic = (method.upper() in ("RHF", "UHF")
                         if analytic is None else bool(analytic))
        if self.analytic and method.upper() not in ("RHF", "UHF"):
            raise ValueError("analytic gradients are RHF/UHF-only; use "
                             "analytic=False")
        self.gtol = gtol
        self.maxiter = maxiter
        self.atoms_opt = None
        self.e_tot = None
        self.converged = False

    def _eg_analytic_flat(self, x):
        """(energy, flat analytic gradient) from ONE converged SCF —
        scipy BFGS evaluates fun and jac at the same point, so a
        combined callable halves the SCF work per step."""
        g = self.grad
        coords = np.asarray(x, float).reshape(g.natm, 3)
        atoms = [(s, c) for (s, _), c in zip(g.atoms, coords)]
        from .scf import RHF, UHF
        cls = UHF if g.method.upper() == "UHF" else RHF
        mf = cls(Molecule(atoms, charge=g.charge, spin=g.spin,
                          basis=g.basis, spherical=g.spherical),
                 **g.method_kw).run()
        # rhf_gradient raises on non-convergence (Brillouin condition)
        return float(mf.e_tot), rhf_gradient(mf).reshape(-1)

    def _grad_analytic_flat(self, x):
        return self._eg_analytic_flat(x)[1]

    def run(self):
        from scipy.optimize import minimize
        g = self.grad
        x0 = np.concatenate([x for _, x in g.atoms])
        fun, jac = ((self._eg_analytic_flat, True) if self.analytic
                    else (g._energy, g._grad_flat))

        res = minimize(fun, x0, jac=jac, method="BFGS",
                       options=dict(gtol=self.gtol, maxiter=self.maxiter))
        coords = res.x.reshape(g.natm, 3)
        self.atoms_opt = [(s, c) for (s, _), c in zip(g.atoms, coords)]
        self.e_tot = float(res.fun)
        self.grad_final = res.jac.reshape(g.natm, 3)
        # honest convergence: scipy's own verdict, or the gradient
        # actually meeting the requested tolerance (BFGS can stop on
        # "precision loss" after having converged)
        self.converged = bool(res.success
                              or np.max(np.abs(res.jac)) < self.gtol)
        self.niter = int(res.nit)
        return self


def optimize_geometry(atoms, basis="sto-3g", method="RHF", **kw):
    """Convenience wrapper: optimized ``(atoms, e_tot)``."""
    opt = GeometryOptimizer(atoms, basis=basis, method=method, **kw).run()
    return opt.atoms_opt, opt.e_tot


def scan_pes(atoms_fn, grid, method="RHF", basis="sto-3g", charge=0,
             spin=0, xc=None, **method_kw):
    """Potential-energy-surface scan: total energy at every point of a
    1D parameter grid (reference: pyqed/qchem/mol.py:1374 ``scan_pes``
    — a pyscf-scanner demo hard-wired to HF; generic here).

    atoms_fn : callable s -> atoms list (bohr) for scan parameter s
    grid : 1D array of scan-parameter values
    Returns energies (len(grid),).
    """
    return np.array([_method_energy(atoms_fn(s), basis, method,
                                    charge=charge, spin=spin, xc=xc,
                                    **method_kw)
                     for s in np.asarray(grid)])


def rhf_gradient(mf):
    """ANALYTIC RHF/UHF nuclear gradient (natm, 3) in Eh/bohr.

    dE/dR_A = sum D dh/dR_A + Gamma . dERI/dR_A - W dS/dR_A + dE_nn/dR_A
    with W the energy-weighted density. Derivative integrals come from
    the per-primitive raising/lowering rule (basis.py::_contract2_dbra)
    and the C++ engine's ``eri_deriv_native``; the Hellmann-Feynman
    nuclear-operator term uses translational invariance
    (dV/dC = -(bra + ket derivatives)).

    (reference: pyqed/qchem/grad.py:9 — an empty skeleton; pyqed reaches
    gradients through pyscf. Analytic here; the FD :class:`Grad` remains
    as the cross-check and the DFT path.) UHF mean-fields are detected
    by their (Ca, Cb) coefficient pair; alias :func:`scf_gradient`.
    """
    from .basis import (overlap_deriv_bra, kinetic_deriv_bra,
                        nuclear_deriv_bra, ATOMIC_NUMBER)
    from .geometry import grad_nuc
    from .lo import cart_atom_indices

    if hasattr(mf, "f_exc"):
        raise TypeError(
            "rhf_gradient/scf_gradient handles RHF/UHF only; a KS "
            "mean-field (RKS/UKS) needs the exchange-correlation "
            "derivative this formula omits — use the finite-difference "
            "Grad path (GeometryOptimizer(..., analytic=False))")
    if not getattr(mf, "converged", True):
        raise RuntimeError(
            "SCF not converged: the analytic gradient assumes a "
            "converged mean-field (Brillouin condition)")
    mol = mf.mol
    bfs = mol.bfs
    n = len(bfs)
    unrestricted = isinstance(mf.mo_coeff, (tuple, list))
    if unrestricted:
        Da, Db = (np.asarray(d) for d in mf.dm)
        D = Da + Db
        Dspin = (Da, Db)
        W = np.zeros_like(D)
        for s in range(2):
            ns = mf.nocc[s]
            C = np.asarray(mf.mo_coeff[s])[:, :ns]
            e_occ = np.asarray(mf.mo_energy[s])[:ns]
            W += (C * e_occ) @ C.T
    else:
        D = np.asarray(mf.dm)
        Dspin = (D / 2.0, D / 2.0)
        C = np.asarray(mf.mo_coeff)[:, : mf.nocc]
        e_occ = np.asarray(mf.mo_energy)[: mf.nocc]
        W = 2.0 * (C * e_occ) @ C.T
    if getattr(mol, "csph", None) is not None:
        # SCF ran in the pure-spherical AO basis; pull D, W back to the
        # Cartesian integral basis (M_sph = csph M_cart csph^T)
        B = np.asarray(mol.csph)
        D = B.T @ D @ B
        W = B.T @ W @ B
        Dspin = tuple(B.T @ d @ B for d in Dspin)

    dS = overlap_deriv_bra(bfs)                     # (3, n, n)
    dT = kinetic_deriv_bra(bfs)
    dV_bf = np.zeros((3, n, n))                     # basis-center part
    dV_nuc = {}                                     # per-nucleus kernels
    for a, (sym, xyz) in enumerate(mol.atoms):
        dVa = nuclear_deriv_bra(bfs, xyz)
        dV_nuc[a] = dVa
        dV_bf -= ATOMIC_NUMBER[sym] * dVa

    try:
        from .engine import eri_deriv_native
        dE1 = eri_deriv_native(bfs)                 # (3, n, n, n, n)
    except Exception:
        from .basis import eri_deriv_bra_py
        dE1 = eri_deriv_bra_py(bfs)

    # D/W were pulled back to the Cartesian integral basis above, so the
    # per-AO atom map is always the Cartesian one
    ao_atoms = cart_atom_indices(mol)

    g = grad_nuc(mol)
    dh_bf = dT + dV_bf
    for a in range(mol.natm):
        m = (ao_atoms == a).astype(float)
        Z = ATOMIC_NUMBER[mol.atoms[a][0]]
        for x in range(3):
            # one-electron basis-center terms (bra + ket by symmetry)
            g[a, x] += 2.0 * np.einsum("p, pq, pq ->", m, dh_bf[x], D)
            # Hellmann-Feynman nuclear-operator term:
            # d(-Z_A/|r-R_A|)/dR_A = +Z_A (bra + ket derivative kernels)
            g[a, x] += 2.0 * Z * np.einsum("pq, pq ->", dV_nuc[a][x], D)
            # Pulay overlap term
            g[a, x] -= 2.0 * np.einsum("p, pq, pq ->", m, dS[x], W)
            # two-electron term: exact dERI/dR_A from the 4 positions
            dA = (np.einsum("p, pqkl -> pqkl", m, dE1[x])
                  + np.einsum("q, qpkl -> pqkl", m, dE1[x])
                  + np.einsum("k, klpq -> pqkl", m, dE1[x])
                  + np.einsum("l, lkpq -> pqkl", m, dE1[x]))
            g[a, x] += 0.5 * np.einsum("pqkl, pq, kl ->", dA, D, D)
            for Ds in Dspin:           # exchange, per spin channel
                g[a, x] -= 0.5 * np.einsum("pqkl, pk, ql ->", dA, Ds, Ds)
    return g


scf_gradient = rhf_gradient
