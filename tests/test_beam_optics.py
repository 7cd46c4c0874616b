"""Analytic pins for the beam optics analysis layer
(pyqed_tpu/beam/optics.py vs reference pyqed/beam/utils_optics.py
semantics)."""
import numpy as np
import pytest

from pyqed_tpu.beam import optics as bo


def test_beam_width_1d_gaussian():
    # u = exp(-x^2/w^2): the reference weights by |u|^4 = exp(-4x^2/w^2)
    # -> sigma^2 = w^2/8, width = 4 sigma = w*sqrt(2)
    x = np.linspace(-40, 40, 4001)
    w = 3.7
    u = np.exp(-(x - 1.2) ** 2 / w ** 2)
    width, x_mean = bo.beam_width_1D(u, x)
    assert abs(width - w * np.sqrt(2)) < 1e-3
    assert abs(x_mean - 1.2) < 1e-6


def test_beam_width_2d_elliptic_gaussian():
    # I = exp(-2 x^2/wx^2 - 2 y^2/wy^2): ISO second moments give
    # dx = 2 wx, dy = 2 wy for an axis-aligned beam
    x = np.linspace(-30, 30, 601)
    y = np.linspace(-30, 30, 601)
    X, Y = np.meshgrid(x, y, indexing="ij")
    wx, wy = 4.0, 2.0
    I = np.exp(-2 * X ** 2 / wx ** 2 - 2 * Y ** 2 / wy ** 2)
    dx, dy, angle, moments = bo.beam_width_2D(x, y, I)
    assert abs(dx - 2 * wx) < 1e-2
    assert abs(dy - 2 * wy) < 1e-2
    assert abs(angle) < 1e-6


def test_beam_width_2d_rotated():
    x = np.linspace(-30, 30, 501)
    y = np.linspace(-30, 30, 501)
    X, Y = np.meshgrid(x, y, indexing="ij")
    th = 0.4
    Xr = np.cos(th) * X + np.sin(th) * Y
    Yr = -np.sin(th) * X + np.cos(th) * Y
    I = np.exp(-2 * Xr ** 2 / 16.0 - 2 * Yr ** 2 / 4.0)
    dx, dy, angle, _ = bo.beam_width_2D(x, y, I)
    assert abs(dx - 8.0) < 0.05
    assert abs(dy - 4.0) < 0.05
    assert abs(angle - th) < 1e-3


def test_fwhm1d_gaussian():
    # I = exp(-x^2/(2 s^2)): FWHM = 2 sqrt(2 ln 2) s
    x = np.linspace(-20, 20, 2001)
    s = 2.5
    I = np.exp(-x ** 2 / (2 * s ** 2))
    fw = bo.FWHM1D(x, I)
    assert abs(fw - 2 * np.sqrt(2 * np.log(2)) * s) < 2e-2


def test_fwhm2d():
    x = np.linspace(-20, 20, 1201)
    y = np.linspace(-20, 20, 1201)
    X, Y = np.meshgrid(x, y, indexing="ij")
    sx, sy = 2.0, 3.0
    I = np.exp(-X ** 2 / (2 * sx ** 2) - Y ** 2 / (2 * sy ** 2))
    fx, fy = bo.FWHM2D(x, y, I)
    assert abs(fx - 2 * np.sqrt(2 * np.log(2)) * sx) < 5e-2
    assert abs(fy - 2 * np.sqrt(2 * np.log(2)) * sy) < 5e-2


def test_width_percentage_gaussian():
    x = np.linspace(-20, 20, 4001)
    s = 3.0
    y = np.exp(-x ** 2 / s ** 2)
    width, xs, idx = bo.width_percentage(x, y, percentage=np.exp(-1))
    assert abs(width - 2 * s) < 2e-2


def test_dof_gaussian_beam():
    # w(z) = w0 sqrt(1+(z/zR)^2): w = sqrt(2) w0 at |z| = zR ->
    # DOF = 2 zR
    zR, w0 = 5.0, 1.0
    z = np.linspace(-30, 30, 6001)
    w = w0 * np.sqrt(1 + (z / zR) ** 2)
    dof, waist, (zl, z0, zr) = bo.DOF(z, w)
    assert abs(dof - 2 * zR) < 5e-2
    assert abs(waist - w0) < 1e-6
    assert abs(z0) < 1e-2


def test_detect_intensity_range():
    x = np.linspace(-20, 20, 8001)
    s = 2.0
    I = np.exp(-x ** 2 / (2 * s ** 2))
    xmin, xmax = bo.detect_intensity_range(x, I, percentage=0.954)
    # 95.4% of a Gaussian lies within 2 sigma
    assert abs(xmax - 2 * s) < 5e-2
    assert abs(xmin + 2 * s) < 5e-2


def test_mtf_ideal_1d_2d():
    f = np.linspace(0, 2000, 501)
    mtf1, fmax = bo.MTF_ideal(f, wavelength=0.5, diameter=10.0,
                              focal=10.0, kind="1D")
    assert abs(fmax - 2000.0) < 1e-9       # 1000/(0.5*1)
    assert mtf1[0] == 1.0 and mtf1[-1] == 0.0
    mtf2, _ = bo.MTF_ideal(f, wavelength=0.5, diameter=10.0,
                           focal=10.0, kind="2D")
    assert abs(mtf2[0] - 1.0) < 1e-12
    assert np.all(mtf2 >= -1e-12) and np.all(mtf2 <= 1 + 1e-12)
    # 2D autocorrelation MTF is below the 1D triangle in the interior
    assert np.all(mtf2[1:-1] <= mtf1[1:-1] + 1e-12)


def test_mtf_parameters_self_is_unity():
    f = np.linspace(0, 2000, 501)
    mtf, _ = bo.MTF_ideal(f, 0.5, 10.0, 10.0, kind="2D")
    strehl, ratio, vr, vi = bo.MTF_parameters((f, mtf), (f, mtf),
                                              lines_mm=500)
    assert abs(strehl - 1) < 1e-12 and abs(ratio - 1) < 1e-12


def test_spectra_normalized():
    wl = np.linspace(0.4, 0.8, 101)
    for fn in (lambda: bo.gauss_spectrum(wl, 0.6, 0.05),
               lambda: bo.lorentz_spectrum(wl, 0.6, 0.05),
               lambda: bo.uniform_spectrum(wl)):
        w = fn()
        assert abs(w.sum() - 1) < 1e-12
    w = bo.gauss_spectrum(wl, 0.6, 0.05, normalize=False)
    assert abs(w.max() - 1) < 1e-12


def test_field_parameters_and_normalize():
    u = 2.0 * np.exp(1j * 0.7) * np.ones(5)
    amp, inten, phase = bo.field_parameters(u)
    assert np.allclose(amp, 2.0) and np.allclose(inten, 4.0)
    assert np.allclose(phase, 0.7)
    v = bo.normalize_field(u)
    assert abs(np.abs(v).max() - 1) < 1e-12


def test_height_conversions_roundtrip():
    wl, n, nb = 0.633, 1.5, 1.0
    h = np.linspace(0.0, 2.0, 11)
    phase = 2 * np.pi / wl * (n - nb) * h
    assert np.allclose(bo.convert_phase2heights(phase, wl, n, nb), h)
    kappa = 0.05
    amp = np.exp(-2 * np.pi * kappa * h / wl)
    assert np.allclose(bo.convert_amplitude2heights(amp, wl, kappa), h,
                       atol=1e-10)


def test_fresnel_normal_incidence():
    r_perp, r_par, t_perp, t_par = bo.fresnel_coefficients_dielectric(
        0.0, 1.0, 1.5)
    assert abs(r_perp + 0.2) < 1e-12      # (n1-n2)/(n1+n2)
    assert abs(r_par - 0.2) < 1e-12       # sign convention for p
    assert abs(t_perp - 0.8) < 1e-12


def test_fresnel_brewster_and_energy():
    n1, n2 = 1.0, 1.5
    thB = np.arctan(n2 / n1)
    _, r_par, _, _ = bo.fresnel_coefficients_dielectric(thB, n1, n2)
    assert abs(r_par) < 1e-12
    th = np.linspace(0.0, 1.4, 50)
    R_perp, R_par, T_perp, T_par = \
        bo.reflectance_transmitance_dielectric(th, n1, n2)
    assert np.allclose(R_perp + T_perp, 1.0, atol=1e-12)
    assert np.allclose(R_par + T_par, 1.0, atol=1e-12)


def test_fresnel_complex_reduces_to_dielectric():
    th = np.linspace(0.0, 1.3, 40)
    rs, rp, ts, tp = bo.fresnel_coefficients_complex(th, 1.0, 1.5 + 0j)
    rs0, rp0, ts0, tp0 = bo.fresnel_coefficients_dielectric(th, 1.0, 1.5)
    assert np.allclose(rs, rs0, atol=1e-12)
    assert np.allclose(np.abs(rp), np.abs(rp0), atol=1e-12)
    R_perp, R_par, T_perp, T_par = \
        bo.reflectance_transmitance_complex(th, 1.0, 1.5 + 0j)
    assert np.allclose(R_perp + T_perp, 1.0, atol=1e-10)
    assert np.allclose(R_par + T_par, 1.0, atol=1e-10)


def test_fresnel_complex_absorbing_energy_deficit():
    # an absorbing medium: R < 1 and the transmitted flux enters lossy
    # material; at least R in [0,1] and R_perp >= dielectric R at
    # grazing limit th->pi/2 R->1
    R_perp, R_par, _, _ = bo.reflectance_transmitance_complex(
        np.array([0.0, 1.5]), 1.0, 2.0 - 0.5j)
    assert np.all(R_perp >= 0) and np.all(R_perp <= 1)
    assert np.all(R_par >= 0) and np.all(R_par <= 1)
