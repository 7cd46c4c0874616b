"""spinterp-style hierarchical sparse-grid interpolation tests
(reference: pyqed/smolyak/interpolator.py:278 ``SparseInterpolator``)."""
import numpy as np
import pytest

from pyqed_tpu.grid import SparseInterpolator

IV = np.array([[-1.0, -1.0], [1.0, 1.0]])
RNG = np.random.default_rng(7)
PTS = RNG.uniform(-1, 1, size=(60, 2))


def _f(X):
    return np.exp(-X[:, 0] ** 2 - 0.5 * X[:, 1] ** 2) \
        + 0.3 * X[:, 0] * X[:, 1]


def test_cc_converges_with_level():
    errs = []
    for lev in (3, 5, 7):
        si = SparseInterpolator(lev, 2, "CC", IV, tol=1e-14)
        got = si.fit(_f, PTS)
        errs.append(np.max(np.abs(got - _f(PTS))))
    assert errs[0] < 0.05
    assert errs[1] < errs[0] / 3
    assert errs[2] < errs[1] / 5


def test_ch_spectral_convergence():
    si = SparseInterpolator(7, 2, "CH", IV, tol=1e-14)
    got = si.fit(_f, PTS)
    # Chebyshev basis: near machine precision for a smooth function
    assert np.max(np.abs(got - _f(PTS))) < 1e-9


def test_ch_polynomial_exactness():
    """The Chebyshev sparse interpolant reproduces low-degree
    polynomials exactly (the reference's 1e-3 self-node tolerance
    cannot — the exact index-based Lagrange exclusion can)."""
    g = lambda X: 2 * X[:, 0] ** 2 - X[:, 0] * X[:, 1] + X[:, 1]
    si = SparseInterpolator(3, 2, "CH", IV, tol=1e-14)
    got = si.fit(g, PTS)
    assert np.max(np.abs(got - g(PTS))) < 1e-12


def test_nodes_exact_and_early_stopping():
    si = SparseInterpolator(10, 2, "CH", IV, tol=1e-8)
    si.fit(_f, PTS)
    assert si.depth < 10                    # stopped early
    assert si.levels[si.depth]["max_error"] < 1e-8
    # interpolant is exact on its own nodes (hierarchical property)
    for lv in si.levels:
        lo, hi = IV
        X = lo + lv["Xn"] * (hi - lo)
        assert np.max(np.abs(si.evaluate(X) - _f(X))) < 1e-8


def test_evaluate_matches_fit_and_new_points():
    si = SparseInterpolator(6, 2, "CC", IV, tol=1e-14)
    got = si.fit(_f, PTS)
    assert np.max(np.abs(si.evaluate(PTS) - got)) < 1e-14
    new = RNG.uniform(-1, 1, size=(40, 2))
    assert np.max(np.abs(si.evaluate(new) - _f(new))) < 5e-3


def test_level0_midpoint_and_counts():
    si = SparseInterpolator(3, 2, "CC", IV)
    X0, idx0 = si.sparse_sample(0)
    assert X0.shape == (1, 2) and np.allclose(X0, 0.5)
    X1, idx1 = si.sparse_sample(1)
    # level 1: two subgrids (1,0)/(0,1), 3 nodes each, midpoint shared
    # between them -> 5 unique
    assert len(X1) == 5
