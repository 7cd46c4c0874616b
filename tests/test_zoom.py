"""Chirp-z / Bluestein zoom DFT (reference: pyqed/beam/utils_math.py:128
vendored Bluestein helpers; rebuilt from the Bluestein identity).
"""
import numpy as np
import jax
import jax.numpy as jnp

from pyqed_tpu.beam.zoom import czt, zoom_dft, zoom_dft2, fraunhofer_zoom


def test_czt_reduces_to_fft():
    rng = np.random.default_rng(0)
    for n in (16, 33, 128):
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        w = np.exp(-2j * np.pi / n)
        X = np.asarray(czt(x, n, w))
        assert np.allclose(X, np.fft.fft(x), atol=1e-9), n


def test_czt_batched_axis():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, 64)) + 1j * rng.standard_normal((5, 64))
    w = np.exp(-2j * np.pi / 64)
    X = np.asarray(czt(x, 64, w, axis=-1))
    assert np.allclose(X, np.fft.fft(x, axis=-1), atol=1e-9)
    X0 = np.asarray(czt(x.T, 64, w, axis=0))
    assert np.allclose(X0, np.fft.fft(x.T, axis=0), atol=1e-9)


def test_zoom_dft_gaussian_analytic():
    """FT of exp(-pi x^2) is exp(-pi f^2); sample it on a zoomed window
    no fftfreq grid contains."""
    x = np.linspace(-8, 8, 1024, endpoint=False)
    u = np.exp(-np.pi * x**2)
    f = np.linspace(-0.43317, 0.52971, 97)      # arbitrary window
    U = np.asarray(zoom_dft(u, x, f))
    assert np.max(np.abs(U - np.exp(-np.pi * f**2))) < 1e-8


def test_fraunhofer_zoom_slit_sinc():
    """Far field of a slit: I ~ sinc^2(a x' / (lambda z)), evaluated on
    a window 20x finer than the FFT grid spacing."""
    n, L, wl, z, a = 512, 4.0, 0.5e-3, 2000.0, 0.4
    x = np.linspace(-L / 2, L / 2, n, endpoint=False)
    X, Y = np.meshgrid(x, x, indexing="ij")
    u = ((np.abs(X) < a / 2) & (np.abs(Y) < a / 2)).astype(complex)
    # FFT-grid far-field spacing: lambda z / L = 0.25; zoom to dx' = 0.0125
    xo = np.linspace(-3.0, 3.0, 481)
    yo = np.array([0.0])
    U = np.asarray(fraunhofer_zoom(u, x, x, wl, z, xo, yo))[:, 0]
    I = np.abs(U)**2
    I /= I.max()
    arg = a * xo / (wl * z)
    exact = np.sinc(arg)**2
    # pixelized slit edges limit agreement to ~dx/a = 2%
    assert np.max(np.abs(I - exact)) < 5e-3
    # first zero at x' = lambda z / a = 2.5 within the zoom resolution
    zero_idx = np.argmin(I[np.abs(xo - 2.5) < 0.2])
    assert abs(xo[np.abs(xo - 2.5) < 0.2][zero_idx] - 2.5) < 0.02


def test_zoom_dft_vs_reference_bluestein():
    """TRUE-ORACLE parity: the reference's vendored Bluestein_dft_xy
    (pyqed/beam/utils_math.py:128) exec'd from /root/reference equals
    our czt-based zoom_dft on the same frequency window (the reference
    references samples to the grid center, n - m/2 + 1/2)."""
    import sys, types, importlib.util, os
    ref_path = os.environ.get("PYQED_REFERENCE", "/root/reference")
    src = os.path.join(ref_path, "pyqed/beam/utils_math.py")
    if not os.path.exists(src):
        import pytest
        pytest.skip("reference tree not available")
    pkg = types.ModuleType("refbeam")
    pkg.__path__ = [os.path.dirname(src)]
    pkg.mm = 1e-3
    sys.modules.setdefault("refbeam", pkg)
    spec = importlib.util.spec_from_file_location("refbeam.utils_math",
                                                  src)
    m_ref = importlib.util.module_from_spec(spec)
    sys.modules["refbeam.utils_math"] = m_ref
    spec.loader.exec_module(m_ref)

    rng = np.random.default_rng(3)
    m, ncols, mout = 64, 3, 50
    f1, f2, fs = -2.0, 2.0, 10.0
    u = rng.standard_normal((m, ncols)) + 1j * rng.standard_normal(
        (m, ncols))
    ref = np.asarray(m_ref.Bluestein_dft_xy(u, f1, f2, fs, mout))

    # the reference's nominal output grid l — but its convolution takes
    # index m + k instead of m - 1 + k (utils_math.py:157), so what it
    # actually evaluates is the DFT at l + df with samples referenced
    # to n - m/2 - 3/2 (pinned empirically to 5e-14 by brute-force DFT)
    f11 = f1 + (mout * fs + f2 - f1) / (2 * mout)
    f22 = f2 + (mout * fs + f2 - f1) / (2 * mout)
    df = (f22 - f11) / mout
    l_actual = np.arange(mout) * df + f11 + df
    xn = (np.arange(m) - m / 2 - 1.5) / fs
    ours = np.asarray(zoom_dft(u.T, xn, l_actual, axis=-1)) / (xn[1] - xn[0])
    assert np.max(np.abs(np.abs(ours) - np.abs(ref))) \
        < 1e-10 * np.max(np.abs(ref))
    # phase agreement up to the reference's Mshift convention: the
    # ratio must be a pure per-frequency phase (|ratio| = 1)
    ratio = ours / ref
    assert np.max(np.abs(np.abs(ratio) - 1.0)) < 1e-10
