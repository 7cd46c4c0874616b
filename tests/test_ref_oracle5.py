"""True-oracle batch 5: NRG Wilson chain and the TCL2 Lambda generator
pinned against the reference's own code exec'd from /root/reference.

* NRG: ``pyqed/nrg.py:224 NRG.discretize`` (logarithmic discretization +
  Lanczos tridiagonalization to the Wilson chain, PRB 71, 045122) vs
  ``pyqed_tpu.open.nrg.NRG.discretize`` — deterministic arithmetic, so
  the pin is at 1e-12.

* TCL2: ``pyqed/oqs.py:990 make_lambda``.  As shipped this function is
  DEAD CODE: it calls a module-global ``corr(t, T, cutfreq, reorg)``
  that is neither defined nor imported anywhere in oqs.py (the
  ``Env.corr`` method at oqs.py:816 is ``pass``), so any call raises
  NameError.  The pin injects a correlation function into the exec'd
  module namespace and maps the reference's discretization conventions:

    - left-Riemann time sum  ->  ours is trapezoid: the difference is
      the boundary term (dt/2) * C(0) * S  (+O(dt^2)), which we add to
      our Lambda before comparing;
    - frozen-commutator interaction picture:  the reference propagates
      Sint += i*dt*[S, h0]  with the ORIGINAL S in the commutator, i.e.
      S(-t) ~= S + i*t*[S, h0] (first-order Taylor for all t), while we
      use the exact e^{-iHt} S e^{iHt}.  With h0 = 0 both agree exactly
      and the pin is tight (1e-10 after the boundary-term map); with a
      small h0 the residual is O((tc*|h0|)^2) of the Lambda scale and
      the pin holds at 1e-3 relative.
"""
import sys

import numpy as np

from ref_oracle import load_reference_module


# ------------------------------------------------------------------ NRG
def _load_ref_nrg():
    """pyqed/nrg.py does `from pyqed import Cavity, Mol, Composite, dag,
    SineDVR, pauli`; Cavity/Composite/SineDVR are not part of the
    harness's default re-exports, so graft them onto the stub first."""
    ref_cav = load_reference_module("polariton.cavity")
    ref_dvr = load_reference_module("dvr.dvr_1d")
    pkg = sys.modules["pyqed"]
    for name in ("Cavity", "Composite"):
        setattr(pkg, name, getattr(ref_cav, name))
    pkg.SineDVR = ref_dvr.SineDVR
    return load_reference_module("nrg")


def test_nrg_wilson_chain_vs_reference():
    """Wilson-chain onsite energies and hoppings == the reference's
    NRG.discretize (pyqed/nrg.py:224) at 1e-12, across Lambda / s /
    omegac / alpha.  The reference never fills epsilon[N-1] (its Lanczos
    loop stops at N-2), so the last onsite entry is excluded there and
    checked for self-consistency on ours instead."""
    ref_nrg = _load_ref_nrg()
    from pyqed_tpu.open.nrg import NRG

    Himp = np.zeros((2, 2))
    for L, s, omegac, alpha, N in [(2.0, 1.0, 1.0, 0.5, 24),
                                   (3.0, 1.0, 1.0, 0.1, 16),
                                   (2.0, 0.5, 0.8, 1.0, 20)]:
        r = ref_nrg.NRG(Himp, L=L)
        eps_ref, t_ref = r.discretize(N, s=s, omegac=omegac, alpha=alpha)

        m = NRG(Himp, L=L)
        eps, t = (np.asarray(a) for a in
                  m.discretize(N, s=s, omegac=omegac, alpha=alpha))

        assert np.max(np.abs(eps[:-1] - eps_ref[:-1])) < 1e-12
        assert np.max(np.abs(t - t_ref)) < 1e-12
        assert eps_ref[-1] == 0.0          # the reference's gap
        # ours fills it with the Lanczos diagonal: xi-weighted norm of
        # the last chain vector, positive and below the largest mode
        assert 0.0 < eps[-1] < (s + 1) / (s + 2) * omegac / (
            1.0 - L ** (-s - 1)) * (1.0 - L ** (-s - 2))

        # eta0 = integral of J = sum g^2 agrees too
        assert abs(m.eta0 - r.eta0) < 1e-12 * abs(r.eta0)


# ----------------------------------------------------------------- TCL2
def _ref_make_lambda(h0, S, T, cutfreq, reorg, corr):
    """Exec the reference make_lambda with ``corr`` injected (see module
    docstring: as shipped the global is undefined -> NameError)."""
    ref_oqs = load_reference_module("oqs")
    assert not hasattr(ref_oqs, "corr"), \
        "reference oqs.py gained a corr definition; re-examine this pin"
    try:
        ref_oqs.corr = corr
        return ref_oqs.make_lambda(h0.shape[0], h0, S, T, cutfreq, reorg)
    finally:
        del ref_oqs.corr


def test_tcl2_lambda_vs_reference_make_lambda():
    """Our exact-interaction-picture Lambda(t) == the reference
    make_lambda (pyqed/oqs.py:990) after mapping its two discretization
    conventions (left-Riemann sum, frozen-commutator Taylor S(-t)).

    The reference hard-codes tmax=1000, 10000 points; its corr call
    signature is corr(t, T, cutfreq, reorg)."""
    # a smooth, fast-decaying model correlation function (complex, as a
    # physical C(t) is); decays on tc = 1/cutfreq << tmax
    def corr(t, T=None, cutfreq=0.25, reorg=0.02):
        t = np.asarray(t, float)
        return (2 * reorg * T / cutfreq + 0j - 1j * reorg) \
            * np.exp(-cutfreq * t)

    T, cutfreq, reorg = 0.5, 0.25, 0.02
    # complex dtype required: the reference's in-place `Sint += -1j*...`
    # (oqs.py:1016) UFuncTypeErrors on a float64 S
    sz = np.diag([1.0, -1.0]).astype(complex)
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])

    tmax, npts = 1000.0, 10000           # the reference's fixed grid
    tgrid = np.linspace(0, tmax, npts)
    dt = tgrid[1] - tgrid[0]

    from pyqed_tpu.open.tcl import TCL2Solver

    # --- h0 = 0: exact agreement up to the Riemann boundary term ------
    h0 = np.zeros((2, 2))
    lam_ref = _ref_make_lambda(h0, sz, T, cutfreq, reorg, corr)
    ours = TCL2Solver(h0, sz, corr=lambda t: corr(t, T, cutfreq, reorg))
    lam = np.asarray(ours.lambda_op(tgrid))[-1]
    # left-Riemann = trapezoid + (dt/2) * (f(0) - f(tmax)), f = C(t)S(-t)
    boundary = dt / 2 * (corr(0.0, T, cutfreq, reorg) * sz
                         - corr(tmax, T, cutfreq, reorg) * sz)
    scale = np.max(np.abs(lam_ref))
    assert np.max(np.abs(lam + boundary - lam_ref)) < 1e-10 * scale

    # --- small h0: the frozen-commutator Taylor residual scales as
    #     (tc*|h0|)^2 times moment factors of C (measured 6.3e-3 rel
    #     here, halving h0 quarters it); ours is the exact picture -----
    h0 = 0.01 * sx
    lam_ref = _ref_make_lambda(h0, sz, T, cutfreq, reorg, corr)
    ours = TCL2Solver(h0, sz, corr=lambda t: corr(t, T, cutfreq, reorg))
    lam = np.asarray(ours.lambda_op(tgrid))[-1]
    scale = np.max(np.abs(lam_ref))
    assert np.max(np.abs(lam + boundary - lam_ref)) < 1e-2 * scale
    # the residual is the reference's 2nd-order Taylor truncation, so it
    # must shrink ~4x when h0 is halved
    lam_ref_h = _ref_make_lambda(h0 / 2, sz, T, cutfreq, reorg, corr)
    ours_h = TCL2Solver(h0 / 2, sz,
                        corr=lambda t: corr(t, T, cutfreq, reorg))
    lam_h = np.asarray(ours_h.lambda_op(tgrid))[-1]
    err_full = np.max(np.abs(lam + boundary - lam_ref))
    err_half = np.max(np.abs(lam_h + boundary - lam_ref_h))
    assert err_half < 0.35 * err_full
    # and the two must NOT be trivially identical (h0 engages the
    # interaction picture: off-diagonals appear)
    assert np.max(np.abs(lam - np.diag(np.diag(lam)))) > 1e-8 * scale


# ------------------------------------------------- beam utils_math pins
def _load_ref_utils_math():
    """pyqed/beam/utils_math.py does `from . import mm`, where mm is a
    unit scalar defined by the heavy beam/__init__.py (matplotlib,
    multiprocessing).  Provide a light package stub carrying mm."""
    import os
    import types
    from ref_oracle import REF
    load_reference_module("fft")          # ensure the pyqed stub pkg
    if "pyqed.beam" not in sys.modules:
        bm = types.ModuleType("pyqed.beam")
        bm.__path__ = [os.path.join(REF, "pyqed", "beam")]
        bm.__package__ = "pyqed.beam"
        sys.modules["pyqed.beam"] = bm
        sys.modules["pyqed"].beam = bm
    sys.modules["pyqed.beam"].mm = 1000.0
    return load_reference_module("beam.utils_math")


def test_filter_edge_vs_reference():
    """filter_edge_1D/2D == the reference (pyqed/beam/utils_math.py:
    1057/1074) at 1e-15 for even exponents.  Orientation: the reference
    2D filter meshgrids (y, x); ours is indexed (x, y) -> transpose.
    For ODD exponents the reference formula base**|p| AMPLIFIES the
    left half (signed base to an odd power flips the sign of the
    exponential's argument); ours |base|**p stays a window <= 1."""
    ref = _load_ref_utils_math()
    from pyqed_tpu.beam.fieldutils import filter_edge_1D, filter_edge_2D

    x = np.linspace(-3.0, 3.0, 121)
    z = np.linspace(-2.0, 2.0, 81)
    w_ref = ref.filter_edge_1D(x, size=0.9, exponent=16)
    w = np.asarray(filter_edge_1D(x, size=0.9, exponent=16))
    assert np.max(np.abs(w - w_ref)) < 1e-15

    W_ref = ref.filter_edge_2D(x, z, size=0.9, exponent=16)
    W = np.asarray(filter_edge_2D(x, z, size=0.9, exponent=16))
    assert W.shape == (121, 81) and W_ref.shape == (81, 121)
    assert np.max(np.abs(W.T - W_ref)) < 1e-15

    # the reference's odd-exponent sign bug, pinned as-is
    assert ref.filter_edge_1D(x, size=0.9, exponent=3)[0] > 1.0
    w3 = np.asarray(filter_edge_1D(x, size=0.9, exponent=3))
    assert np.all(w3 <= 1.0) and w3[0] < 0.5


def test_rotate_image_vs_reference():
    """rotate_image vs the reference (pyqed/beam/utils_math.py:865).
    Same rotation direction and pivot semantics; the numeric daylight
    is interpolation order (reference: pad + cubic-spline
    ndimage.rotate + crop; ours: exact bilinear inverse map), so the
    pin is at the interpolation level (3e-2 of the unit peak for a
    smooth Gaussian) with a direction discriminator: rotating the
    OTHER way disagrees at O(1)."""
    ref = _load_ref_utils_math()
    from pyqed_tpu.beam.fieldutils import rotate_image

    x = np.linspace(-3.0, 3.0, 121)
    z = np.linspace(-2.0, 2.0, 81)
    X, Z = np.meshgrid(x, z, indexing="xy")
    img = np.exp(-((X - 0.3) ** 2 + (Z + 0.2) ** 2) / 0.5)

    r_ref = ref.rotate_image(x, z, img, 30.0, (0.25, -0.3))
    r_our = np.asarray(rotate_image(x, z, img, 30.0, (0.25, -0.3)))
    assert r_ref.shape == r_our.shape == img.shape
    assert np.max(np.abs(r_our - r_ref)) < 3e-2
    # direction discriminator: the mirror rotation must NOT match
    r_mirror = ref.rotate_image(x, z, img, -30.0, (0.25, -0.3))
    assert np.max(np.abs(r_our - r_mirror)) > 0.3


def _load_ref_utils_optics():
    """utils_optics additionally needs degrees/np/plt on the package
    stub (`from . import degrees, np, plt`) and pandas at top level."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    _load_ref_utils_math()                 # installs the pyqed.beam stub
    bm = sys.modules["pyqed.beam"]
    bm.degrees = np.pi / 180
    bm.np = np
    bm.plt = plt
    return load_reference_module("beam.utils_optics")


def test_utils_optics_vs_reference():
    """beam_width_1D (D4sigma on the reference's |u|^4 convention),
    FWHM1D (slope-interpolated), MTF_ideal and both Fresnel coefficient
    sets == the reference (pyqed/beam/utils_optics.py:104/298/531/825/
    883) to machine precision — same deterministic arithmetic."""
    ref = _load_ref_utils_optics()
    import pyqed_tpu.beam.optics as bo

    x = np.linspace(-12.0, 12.0, 481)
    u = np.exp(-x ** 2 / (2 * 2.1 ** 2)) * np.exp(1j * 0.3 * x)
    w_r, xm_r = ref.beam_width_1D(u, x)
    w_o, xm_o = bo.beam_width_1D(u, x)
    assert abs(w_r - w_o) < 1e-12 and abs(xm_r - xm_o) < 1e-12

    inten = np.abs(u) ** 2
    f_r = np.asarray(ref.FWHM1D(x, inten.copy()))
    f_o = np.asarray(bo.FWHM1D(x, inten.copy()))
    assert np.max(np.abs(f_o - f_r)) < 1e-12

    freqs = np.linspace(0, 400, 200)
    m_r = ref.MTF_ideal(freqs, wavelength=0.5, diameter=10.0,
                        focal=100.0, kind="1D", has_draw=False)
    if isinstance(m_r, tuple):
        m_r = m_r[0]
    m_o, _ = bo.MTF_ideal(freqs, wavelength=0.5, diameter=10.0,
                          focal=100.0, kind="1D")
    assert np.max(np.abs(np.asarray(m_o) - np.asarray(m_r))) < 1e-12

    th = np.linspace(0.01, 1.5, 37)
    for rr, ro in zip(ref.fresnel_coefficients_dielectric(th, 1.0, 1.5),
                      bo.fresnel_coefficients_dielectric(th, 1.0, 1.5)):
        assert np.max(np.abs(np.asarray(ro) - np.asarray(rr))) < 1e-12
    for rr, ro in zip(
            ref.fresnel_coefficients_complex(th, 1.0, 1.5 + 0.3j),
            bo.fresnel_coefficients_complex(th, 1.0, 1.5 + 0.3j)):
        assert np.max(np.abs(np.asarray(ro) - np.asarray(rr))) < 1e-12


# --------------------------------------------- chain-builder convention pins
def test_multisite_builders_vs_reference():
    """multispin / multiboson / multimode vs the reference's builders
    (pyqed/phys.py:1681/1805/1878), with each documented convention
    delta mapped exactly:

    * multispin — identical XX hopping and site lowering operators; the
      reference's onsite term is (onsite/2)*n_i (phys.py:1697
      ``0.5 * onsite[0] * sz`` with sz mapped to the number operator),
      ours is onsite*n_i per our docstring.
    * multiboson — identical onsite ladder (boson(w,N) without ZPE ==
      our ham_ho); the reference couples positions J*(a+a^+)(b+b^+)
      (counter-rotating terms INCLUDED), ours J*(a^+b + ab^+).
    * multimode — same, but with x = (a+a^+)/sqrt(2) (phys.py:1237), so
      the reference's rotating part carries J/2.
    """
    phys = load_reference_module("phys")
    import pyqed_tpu.ops.operators as ops

    def dense(m):
        return np.asarray(m.toarray() if hasattr(m, "toarray") else m)

    # ---- multispin --------------------------------------------------
    onsite, J = 0.9, 0.2
    nloc = np.diag([0.0, 1.0])
    for ns in (1, 2, 3):
        ref = phys.multispin(onsite, J, ns)
        H_o, low_o = ops.multispin(onsite, J, ns)
        if ns == 1:
            H_r, low_r = ref[0], [ref[1]]
            low_o = [low_o] if not isinstance(low_o, (list, tuple)) \
                else low_o
        else:
            H_r, low_r = ref
        nsum = sum(np.kron(np.kron(np.eye(2 ** i), nloc),
                           np.eye(2 ** (ns - 1 - i))) for i in range(ns))
        assert np.max(np.abs(dense(H_o) - 0.5 * onsite * nsum
                             - dense(H_r))) < 1e-12
        for a, b in zip(low_o, low_r):
            assert np.max(np.abs(dense(a) - dense(b))) < 1e-12

    # ---- multiboson / multimode -------------------------------------
    N = 3
    a1 = np.diag(np.sqrt(np.arange(1, N)), 1)
    idm = np.eye(N)

    def embed(op, i, nm):
        out = np.array([[1.0]])
        for j in range(nm):
            out = np.kron(out, op if j == i else idm)
        return out

    w, Jb = 1.1, 0.15
    for nm in (1, 2, 3):
        ref = phys.multiboson(w, nm, J=Jb, truncate=N)
        H_r = dense(ref[0] if isinstance(ref, tuple) else ref)
        H_o = dense(ops.multiboson(w, nm, J=Jb, truncate=N)[0])
        counter = sum(
            Jb * (embed(a1, i, nm) @ embed(a1, i + 1, nm)
                  + embed(a1.T, i, nm) @ embed(a1.T, i + 1, nm))
            for i in range(nm - 1)) if nm > 1 else 0.0
        assert np.max(np.abs(H_o + counter - H_r)) < 1e-12

    ws, Jm = [1.0, 1.2, 0.8], 0.1
    for nm in (2, 3):
        H_r = dense(phys.multimode(omegas=ws[:nm], nmodes=nm, J=Jm,
                                   truncate=N)[0])
        H_o = dense(ops.multimode(ws[:nm], nm, J=Jm, truncate=N)[0])
        x = (a1 + a1.T) / np.sqrt(2)
        rot = sum(Jm * (embed(a1.T, i, nm) @ embed(a1, i + 1, nm)
                        + embed(a1, i, nm) @ embed(a1.T, i + 1, nm))
                  for i in range(nm - 1))
        xx = sum(Jm * embed(x, i, nm) @ embed(x, i + 1, nm)
                 for i in range(nm - 1))
        assert np.max(np.abs(H_o - rot + xx - H_r)) < 1e-12
