"""Smolyak sparse grids (piecewise-linear hierarchical basis).

TPU-native counterpart of the reference sparse-grid layer
(reference: pyqed/smolyak/sg.py — ``SparseGrid:260`` with hierarchical
surpluses and the combination technique ``combination_technique:323``;
pyqed/smolyak/test.py asserts 17 points for (d=2, level=3) and 31 for
(d=3, level=3) — reproduced here; pyqed/smolyak/interp.py numba kernels
become one vectorized basis evaluation).

Interior (no-boundary) grid on [0,1]^d: level-l 1D points x_{l,i} = i/2^l,
i odd; multi-indices with |l|_1 <= level + d - 1. Batched evaluation of the
hierarchical interpolant over many query points is a single jnp
product/gather expression.
"""
from __future__ import annotations

import itertools
import math
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


def _level_indices(d, level):
    """Multi-indices l (each >= 1) with sum(l) <= level + d - 1."""
    out = []
    for l in itertools.product(range(1, level + 1), repeat=d):
        if sum(l) <= level + d - 1:
            out.append(l)
    return out


def _points_1d(l):
    """Odd-indexed interior points of level l."""
    return [(l, i) for i in range(1, 2**l, 2)]


class SparseGrid:
    """(reference: pyqed/smolyak/sg.py:260)."""

    def __init__(self, ndim=1, level=1, domain=None):
        self.ndim = self.dim = ndim
        self.level = level
        if domain is None:
            domain = ((0.0, 1.0),) * ndim
        self.domain = domain
        self.indices = []        # [(l1, i1, l2, i2, ...)]
        self.points = None       # (npts, d) coordinates on [0,1]^d
        self.fv = None           # nodal values
        self.surplus = None      # hierarchical surpluses

    # ------------------------------------------------------------ build
    def generate_points(self):
        idx = []
        for lvl in _level_indices(self.dim, self.level):
            per_dim = [_points_1d(l) for l in lvl]
            for combo in itertools.product(*per_dim):
                flat = tuple(x for li in combo for x in li)
                idx.append(flat)
        self.indices = idx
        pts = np.array([[flat[2 * k + 1] / 2 ** flat[2 * k]
                         for k in range(self.dim)] for flat in idx])
        self.points = pts
        return pts

    generatePoints = generate_points

    def physical_points(self):
        lo = np.array([d[0] for d in self.domain])
        hi = np.array([d[1] for d in self.domain])
        return lo[None, :] + self.points * (hi - lo)[None, :]

    @property
    def npts(self):
        return len(self.indices)

    # ---------------------------------------------------------- surplus
    @staticmethod
    def _hat(l, i, x):
        """1D hierarchical hat basis phi_{l,i}(x) on [0,1]."""
        return np.maximum(0.0, 1.0 - np.abs(2.0**l * x - i))

    def nodal2hier(self):
        """Hierarchical surpluses by solving the (lower-triangular in level
        order) interpolation system (reference: pyqed/smolyak/sg.py
        ``nodal2Hier``)."""
        assert self.fv is not None
        Phi = self._design_matrix(self.points)
        self.surplus = np.linalg.solve(Phi, self.fv)
        return self.surplus

    nodal2Hier = nodal2hier

    def _design_matrix(self, x):
        """Phi[a, b] = prod_k phi_{l_b, i_b}(x_a)."""
        npts = len(self.indices)
        x = np.atleast_2d(x)
        Phi = np.ones((x.shape[0], npts))
        for b, flat in enumerate(self.indices):
            for k in range(self.dim):
                l, i = flat[2 * k], flat[2 * k + 1]
                Phi[:, b] *= self._hat(l, i, x[:, k])
        return Phi

    # ------------------------------------------------------------- eval
    def fit(self, f: Callable):
        if self.points is None:
            self.generate_points()
        phys = self.physical_points()
        self.fv = np.asarray(f(*[phys[:, k] for k in range(self.dim)]))
        self.nodal2hier()
        return self

    def eval(self, x):
        """Evaluate the sparse-grid interpolant at unit-cube points x
        ((nq, d) or (d,)) — one batched design-matrix product."""
        x = np.atleast_2d(np.asarray(x, dtype=float))
        Phi = self._design_matrix(x)
        return jnp.asarray(Phi) @ jnp.asarray(self.surplus)

    evalFunct = eval

    def eval_physical(self, x):
        lo = np.array([d[0] for d in self.domain])
        hi = np.array([d[1] for d in self.domain])
        u = (np.atleast_2d(x) - lo[None, :]) / (hi - lo)[None, :]
        return self.eval(u)

    # ---------------------------------------------- combination technique
    def combination_technique(self):
        """(levels, coefficients) of the sparse-grid combination technique
        (reference: pyqed/smolyak/sg.py:323):
        u_sg = sum_{q=0}^{d-1} (-1)^q C(d-1, q) sum_{|l| = level + d - 1 - q} u_l
        """
        d = self.dim
        levels, coeffs = [], []
        for q in range(d):
            target = self.level + d - 1 - q
            for l in itertools.product(range(1, target + 1), repeat=d):
                if sum(l) == target:
                    levels.append(l)
                    coeffs.append((-1) ** q * math.comb(d - 1, q))
        return levels, coeffs


class AdaptiveSparseGrid(SparseGrid):
    """Dimension-adaptive refinement: add children of the points with the
    largest surpluses (reference: pyqed/smolyak/sg.py:634
    ``AdapativeSparseGrid``)."""

    def refine(self, f, tol=1e-3, max_new=64):
        assert self.surplus is not None
        order = np.argsort(-np.abs(self.surplus))
        existing = set(self.indices)
        new = []
        for a in order:
            if abs(self.surplus[a]) < tol or len(new) >= max_new:
                break
            flat = self.indices[a]
            for k in range(self.dim):
                l, i = flat[2 * k], flat[2 * k + 1]
                for child_i in (2 * i - 1, 2 * i + 1):
                    child = list(flat)
                    child[2 * k] = l + 1
                    child[2 * k + 1] = child_i
                    child = tuple(child)
                    if child not in existing:
                        existing.add(child)
                        new.append(child)
        if new:
            self.indices = self.indices + new
            pts = np.array([[fl[2 * k + 1] / 2 ** fl[2 * k]
                             for k in range(self.dim)]
                            for fl in self.indices])
            self.points = pts
            self.fit_values(f)
        return len(new)

    def fit_values(self, f):
        phys = self.physical_points()
        self.fv = np.asarray(f(*[phys[:, k] for k in range(self.dim)]))
        self.nodal2hier()


# Reference-compatible aliases
sparseGrid = SparseGrid
AdapativeSparseGrid = AdaptiveSparseGrid


def combination_technique(ndim, q):
    """Classical sparse-grid combination-technique index sets and
    coefficients: u_SG = Σ_{k=0}^{d-1} (-1)^k C(d-1, k) Σ_{|l|_1 = q-k} u_l
    (reference: pyqed/smolyak/sg.py:670 ``SGCT_LDR.combination_technique``
    — the reference class body is non-functional sketch code)."""
    import itertools
    import math
    index_set, coeffs = [], []
    for k in range(ndim):
        c = (-1) ** k * math.comb(ndim - 1, k)
        target = q - k
        for l in itertools.product(range(1, target + 1), repeat=ndim):
            if sum(l) == target:
                index_set.append(l)
                coeffs.append(c)
    return index_set, coeffs


class SGCT_LDR:
    """Sparse-grid combination technique wrapped around the grid
    propagators: the full-tensor solve on every anisotropic level grid
    is combined with CT coefficients, beating the curse of
    dimensionality for smooth wavepackets (reference intent:
    pyqed/smolyak/sg.py:670).

    Parameters
    ----------
    domains : [(xmin, xmax)] * ndim.
    q : combination level (per-dimension levels l, |l|_1 <= q).
    dpes_fn : (grids) -> diabatic V of shape grid_shape + (ns, ns).
    psi0_fn : (grids) -> initial psi of shape grid_shape + (ns,).
    masses, nstates : forwarded to the SPO propagator.
    """

    def __init__(self, domains, q, dpes_fn, psi0_fn, masses=None,
                 nstates=1):
        self.domains = domains
        self.ndim = len(domains)
        self.q = q
        self.dpes_fn = dpes_fn
        self.psi0_fn = psi0_fn
        self.masses = masses
        self.nstates = nstates

    def run(self, dt, nt, nout=1, observable="x"):
        """Propagate on every level grid and combine the observable
        series; returns (times, combined, per_level dict)."""
        from .spo import SPON
        index_set, coeffs = combination_technique(self.ndim, self.q)
        combined = None
        per_level = {}
        for l, c in zip(index_set, coeffs):
            grids = [np.linspace(*self.domains[d], 2 ** l[d] + 1)[:-1]
                     for d in range(self.ndim)]
            spo = SPON(grids, masses=self.masses, nstates=self.nstates,
                       kernel="xla")
            spo.set_dpes(self.dpes_fn(grids))
            psi0 = np.asarray(self.psi0_fn(grids), dtype=complex)
            nrm = np.sqrt(np.sum(np.abs(psi0) ** 2) * spo.dvol)
            psi0 = psi0 / nrm
            r = spo.run(psi0, dt=dt, nt=nt, nout=nout)
            if observable == "x":
                X = np.meshgrid(*grids, indexing="ij")[0]
                series = np.array(
                    [np.sum(X[..., None] * np.abs(np.asarray(s)) ** 2)
                     * spo.dvol for s in np.asarray(r.states)])
            elif observable == "population":
                series = np.asarray(r.population)
            else:
                series = observable(r, grids, spo)
            per_level[tuple(l)] = series
            combined = (c * series if combined is None
                        else combined + c * series)
        times = np.arange(len(combined)) * dt * nout
        return times, combined, per_level


# ----------------------------------------------------------------------
# spinterp-style hierarchical sparse-grid interpolation (CC / Chebyshev)
# ----------------------------------------------------------------------

def _m_nodes(level):
    """Nodes per 1-D level: m_0 = 1, m_l = 2^l + 1 (spinterp counting;
    reference: pyqed/smolyak/interpolator.py:97 ``_initialize_nodes``)."""
    return 1 if level == 0 else 2 ** level + 1


def _nodes_1d(level, kind):
    """1-D node coordinates on [0, 1]: midpoint at level 0; then
    equispaced (CC, piecewise linear) or Chebyshev-Gauss-Lobatto (CH)."""
    m = _m_nodes(level)
    if m == 1:
        return np.array([0.5])
    j = np.arange(m)
    if kind == "ch":
        return 0.5 * (1.0 - np.cos(np.pi * j / (m - 1)))
    return j / (m - 1.0)


class SparseInterpolator:
    """Hierarchical sparse-grid interpolation with piecewise-linear
    Clenshaw-Curtis ('CC') or barycentric Chebyshev polynomial ('CH')
    bases and early stopping (Klimke & Wohlmuth, ACM TOMS 31, 561
    (2005) ``spinterp``; reference:
    pyqed/smolyak/interpolator.py:278 ``SparseInterpolator`` — per-node
    Python triple loops and a 1e-3 self-node tolerance there; here each
    level is one vectorized (nout, nnodes) weight-matrix product and
    the Lagrange self-node is excluded exactly by index).

    Level-k node set: union of full tensor subgrids with multi-index
    |i|_1 = k (dims at 1-D level i_d), deduplicated within the level;
    hierarchical surpluses are the function values minus the
    interpolant of all previous levels; ``fit`` stops early when the
    maximum surplus falls below ``tol``.
    """

    def __init__(self, maximum_level, n_dimensions,
                 interpolation_type="CC", interpolation_interval=None,
                 tol=1e-3):
        self.maximum_level = maximum_level
        self.d = n_dimensions
        self.kind = interpolation_type.lower()
        if self.kind not in ("cc", "ch"):
            raise ValueError(f"interpolation_type {interpolation_type!r}")
        if interpolation_interval is None:
            interpolation_interval = np.stack(
                [np.zeros(n_dimensions), np.ones(n_dimensions)])
        self.interval = np.asarray(interpolation_interval, float)
        self.tol = tol
        self.levels = []          # per level: dict(X, idx, surplus)

    # ------------------------------------------------------------ grids
    def _denormalize(self, X01):
        lo = self.interval[0]
        return lo + X01 * (self.interval[1] - self.interval[0])

    def _normalize(self, X):
        lo = self.interval[0]
        return (X - lo) / (self.interval[1] - self.interval[0])

    def sparse_sample(self, level):
        """Unit-cube nodes and per-node multi-indices of sparse level
        ``level``: full subgrids with |i|_1 = level, dedup within the
        level (first occurrence keeps its multi-index, like the
        reference's hash walk)."""
        pts, idxs = [], []
        for comb in itertools.product(range(level + 1), repeat=self.d):
            if sum(comb) != level:
                continue
            axes = [_nodes_1d(l, self.kind) for l in comb]
            for p in itertools.product(*axes):
                pts.append(p)
                idxs.append(comb)
        pts = np.asarray(pts)
        idxs = np.asarray(idxs)
        _, keep = np.unique(np.round(pts, 12), axis=0, return_index=True)
        keep = np.sort(keep)
        return pts[keep], idxs[keep]

    # ------------------------------------------------------------ basis
    def _weights(self, Xn_out, Xn_in, idx):
        """(nout, nnodes) product-basis weight matrix on the unit cube."""
        nout, nn = len(Xn_out), len(Xn_in)
        W = np.ones((nout, nn))
        for d in range(self.d):
            xo = Xn_out[:, d][:, None]          # (nout, 1)
            c = Xn_in[:, d][None, :]            # (1, nn)
            ld = idx[:, d]
            if self.kind == "cc":
                m = np.array([_m_nodes(l) for l in ld])[None, :]
                B = np.where(m == 1, 1.0,
                             np.maximum(0.0, 1.0 - (m - 1)
                                        * np.abs(xo - c)))
            else:
                B = np.ones((nout, nn))
                for lv in np.unique(ld):
                    if _m_nodes(lv) == 1:
                        continue
                    P = _nodes_1d(lv, "ch")
                    sel = ld == lv
                    cs = Xn_in[sel, d]
                    # exact Lagrange: exclude the node's own point by
                    # index, not by a distance tolerance
                    own = np.argmin(np.abs(cs[:, None] - P[None, :]),
                                    axis=1)
                    num = xo[:, :, None] - P[None, None, :]  # (nout, 1, m)
                    den = cs[:, None] - P[None, :]    # (nsel, m)
                    den[np.arange(len(cs)), own] = 1.0
                    num = np.broadcast_to(
                        num, (nout, len(cs), len(P))).copy()
                    num[:, np.arange(len(cs)), own] = 1.0
                    B[:, sel] = np.prod(num / den[None], axis=2)
            W *= B
        return W

    # ------------------------------------------------------------- fit
    def fit(self, func, grid_out):
        """Build surpluses level by level, early-stopping on max
        surplus; returns the interpolant at ``grid_out``."""
        grid_out = np.asarray(grid_out, float)
        Xn_out = self._normalize(grid_out)
        interpol = np.zeros(len(grid_out))
        self.levels = []
        for level in range(self.maximum_level + 1):
            Xn, idx = self.sparse_sample(level)
            X = self._denormalize(Xn)
            fx = np.asarray(func(X), float)
            resid = fx.copy()
            for prev in self.levels:
                resid -= self._weights(Xn, prev["Xn"], prev["idx"]) \
                    @ prev["surplus"]
            self.levels.append(dict(Xn=Xn, idx=idx, surplus=resid,
                                    max_error=np.max(np.abs(resid)),
                                    mean_error=np.mean(np.abs(resid))))
            interpol += self._weights(Xn_out, Xn, idx) @ resid
            if level > 0 and self.levels[-1]["max_error"] < self.tol:
                break
        return interpol

    @property
    def depth(self):
        return len(self.levels) - 1

    def evaluate(self, grid_out):
        """Interpolant of the fitted surpluses at new points."""
        Xn_out = self._normalize(np.asarray(grid_out, float))
        out = np.zeros(len(Xn_out))
        for lv in self.levels:
            out += self._weights(Xn_out, lv["Xn"], lv["idx"]) \
                @ lv["surplus"]
        return out
