"""True-oracle parity pins, batch 4: Davidson, two-qubit concurrence,
and Gauss-Hermite quadrature — the repo implementation against the
reference module exec'd from /root/reference at test time (never
copied; see ref_oracle.py)."""
import numpy as np
import pytest

from ref_oracle import load_reference_module


def test_davidson_vs_reference_and_eigh():
    """ops.davidson == reference pyqed/davidson.py:70 ``davidson`` ==
    dense eigh on the reference's own diagonally-dominant test matrix
    (its generator at :18, seeded)."""
    ref = load_reference_module("davidson")
    np.random.seed(7)
    A = ref.digaonal_dominant(400, sparsity=1e-3)

    e_ref, v_ref = ref.davidson(A, 4, tol=1e-9)
    from pyqed_tpu.ops.davidson import davidson
    e_tpu, v_tpu = davidson(A, 4, tol=1e-10)
    e_ex = np.linalg.eigvalsh(A)[:4]

    assert np.max(np.abs(np.asarray(e_tpu) - e_ex)) < 1e-8
    assert np.max(np.abs(np.asarray(e_ref) - e_ex)) < 1e-5
    assert np.max(np.abs(np.asarray(e_tpu) - np.asarray(e_ref))) < 1e-5
    # eigenvectors: subspace agreement with the dense solver
    _, v_ex = np.linalg.eigh(A)
    ov = np.abs(np.asarray(v_tpu).T @ v_ex[:, :4])
    assert np.max(np.abs(np.max(ov, axis=1) - 1.0)) < 1e-6


class _Qobj:
    """Minimal QuTiP-Qobj shim: the reference concurrence
    (pyqed/entanglement.py:11) was written against Qobj semantics
    (``.isket``/``.isoper``, ``*`` = matrix product, ``.conj()``
    elementwise, ``.eigenenergies()``) but pyqed's own sigmay()/tensor()
    return plain ndarrays — so as shipped it raises AttributeError on
    every input the package can produce (latent bug).  This shim drives
    the function with the operator algebra it assumes."""

    isket = isbra = False
    isoper = True
    dims = [[2, 2], [2, 2]]

    def __init__(self, m):
        self.m = np.asarray(m, complex)

    def __mul__(self, other):
        o = (other.m if isinstance(other, _Qobj)
             else other.toarray() if hasattr(other, "toarray")
             else np.asarray(other))
        return _Qobj(self.m @ o)

    def __rmul__(self, other):
        return _Qobj(np.asarray(other) @ self.m)

    def conj(self):
        return _Qobj(self.m.conj())

    def eigenenergies(self):
        return np.linalg.eigvals(self.m)


def test_concurrence_vs_reference():
    """utils.concurrence == reference pyqed/entanglement.py:11 on Bell
    (C=1), product (C=0), Werner (C=max(0,(3p-1)/2)), and random
    two-qubit mixed states.  The reference is driven through the Qobj
    shim above (its numpy inputs crash as shipped)."""
    ref = load_reference_module("entanglement")
    from pyqed_tpu.utils.qip import concurrence

    def ref_c(rho):
        return float(ref.concurrence(_Qobj(rho)))

    bell = np.array([1, 0, 0, 1]) / np.sqrt(2.0)
    rho_bell = np.outer(bell, bell.conj())
    assert abs(float(concurrence(rho_bell)) - 1.0) < 1e-10
    assert abs(ref_c(rho_bell) - 1.0) < 1e-10

    prod = np.kron([1, 0], [0.6, 0.8])
    rho_p = np.outer(prod, prod)
    assert abs(float(concurrence(rho_p))) < 1e-7
    assert abs(ref_c(rho_p)) < 1e-7

    rng = np.random.default_rng(3)
    for p in (0.2, 0.5, 0.9):
        rho_w = p * rho_bell + (1 - p) * np.eye(4) / 4.0
        cw = max(0.0, (3 * p - 1) / 2.0)
        assert abs(float(concurrence(rho_w)) - cw) < 1e-10
        assert abs(ref_c(rho_w) - cw) < 1e-10
    for _ in range(5):
        M = (rng.standard_normal((4, 4))
             + 1j * rng.standard_normal((4, 4)))
        rho = M @ M.conj().T
        rho /= np.trace(rho).real
        assert abs(float(concurrence(rho)) - ref_c(rho)) < 1e-9


def test_gauss_hermite_vs_reference():
    """ops.quadrature.gauss_hermite == reference pyqed/quadrature.py:54
    ``gauss_hermite_quadrature`` under the (mu, sigma) <-> (x0, alpha)
    convention map alpha = 1/(2 sigma^2); both integrate a Gaussian
    moment exactly."""
    # the module's trailing demo block needs proplot and runs plots at
    # import time — exec only the definitions (reference source is read
    # from /root/reference at test time, never copied)
    import os, types
    src = open(os.path.join(os.environ.get("PYQED_REFERENCE",
                                           "/root/reference"),
                            "pyqed", "quadrature.py")).read()
    cut = src.index("x, w = gauss_hermite_quadrature(20")
    ref = types.ModuleType("_ref_quadrature")
    exec(compile(src[:cut], "ref_quadrature_defs", "exec"), ref.__dict__)
    from pyqed_tpu.ops.quadrature import gauss_hermite

    n, mu, sigma = 24, 0.7, 1.3
    y_ref, w_ref = ref.gauss_hermite_quadrature(n, mu=mu, sigma=sigma)
    alpha = 1.0 / (2.0 * sigma ** 2)
    y, w = gauss_hermite(n, x0=mu, alpha=alpha)
    assert np.allclose(y, y_ref, atol=1e-12)
    # reference leaves the raw Hermite weights; the repo scales by the
    # substitution Jacobian 1/sqrt(alpha)
    assert np.allclose(w * np.sqrt(alpha), w_ref, atol=1e-12)

    # <x^2> of N(mu, sigma^2) with both rule conventions
    m2_ref = np.sum(w_ref * y_ref ** 2) / np.sqrt(np.pi)
    m2 = np.sum(w * y ** 2) * np.sqrt(alpha / np.pi)
    exact = mu ** 2 + sigma ** 2
    assert abs(m2_ref - exact) < 1e-12
    assert abs(m2 - exact) < 1e-12


def test_lippmann_schwinger_vs_reference():
    """grid.scattering.LippmannSchwingerSolver == reference
    pyqed/LippmanSchwinger.py:43 on the reference's own square-well
    scan.  The reference run() draws instead of returning, so a
    recording pyplot stub captures its (k, transmission) curve; its
    2D class below the cut is non-executable as shipped (undefined
    module-level names).  Source is read from /root/reference at test
    time, never copied."""
    import os
    import types

    src = open(os.path.join(os.environ.get("PYQED_REFERENCE",
                                           "/root/reference"),
                            "pyqed", "LippmanSchwinger.py")).read()
    cut = src.index("class LippmannSchwinger2DSolver")
    src = src[:cut]

    plots = []

    class _Ax:
        def plot(self, *a, **k):
            plots.append(a)

    class _Plt(types.ModuleType):
        def subplots(self, *a, **k):
            return object(), _Ax()

    plt_stub = _Plt("proplot")
    import sys as _sys
    _sys.modules.setdefault("proplot", plt_stub)
    load_reference_module("fft")      # ensure the pyqed stub pkg exists
    import numpy as _np
    ns = {"np": _np}
    # the module does `from pyqed import interval` and
    # `import proplot as plt` — both resolve via sys.modules
    try:
        exec(compile(src, "ref_lippmann_schwinger", "exec"), ns)
    finally:
        if _sys.modules.get("proplot") is plt_stub:
            del _sys.modules["proplot"]

    # last recorded curve is ax.plot(k_vec, transmission, '-o')
    k_vec, trans_ref = plots[-1][0], np.asarray(plots[-1][1])
    assert len(k_vec) == 20 and trans_ref.shape == (20,)

    from pyqed_tpu.grid.scattering import LippmannSchwingerSolver

    def V(x):
        z = np.zeros(np.shape(x))
        z[np.abs(x) <= 1.0] = -4.0
        return z

    sol = LippmannSchwingerSolver(-1.5, 1.5, 160, V)
    _, trans = sol.run(np.asarray(k_vec))
    assert np.max(np.abs(np.asarray(trans) - trans_ref)) < 1e-6
