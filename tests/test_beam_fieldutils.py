"""Field post-processing / PWD / vector-focusing tests (round 4).

Covers the last physics functions of the reference beam layer:
binarize/discretize/get_edges/search_focus/profile/rotate/insert_mask
(pyqed/beam/scalar_fields_XY.py), PWD propagation
(pyqed/beam/scalar_fields_XZ.py:922), XZ scene analysis
(scalar_fields_XZ.py:1290/1384), and the vector VRS/VFFT/IVFFT
propagators (pyqed/beam/vector_fields_XY.py).
"""
import numpy as np
import pytest

from pyqed_tpu.beam import (ScalarFieldX, ScalarFieldXY, ScalarFieldXZ,
                            ScalarFieldXYZ, VectorFieldXY, scenes)
from pyqed_tpu.beam.beam import gauss_beam


WL = 0.6328  # um


def _xy(n=128, L=100.0):
    x = np.linspace(-L / 2, L / 2, n)
    return x, x.copy()


# ------------------------------------------------------------------
# binarize / discretize / edges
# ------------------------------------------------------------------

def test_binarize_amplitude():
    x, y = _xy()
    f = ScalarFieldXY(x, y, WL)
    X, Y = np.meshgrid(x, y, indexing="ij")
    f.u = np.exp(-(X ** 2 + Y ** 2) / 300.0) + 0j
    f.binarize(level0=0.0, level1=1.0)
    u = np.asarray(f.u)
    assert set(np.round(np.unique(np.abs(u)), 12)) <= {0.0, 1.0}
    # center (above mean) is 1, corner is 0
    assert abs(u[64, 64]) == 1.0 and abs(u[0, 0]) == 0.0


def test_discretize_phase_levels():
    x, y = _xy(64)
    f = ScalarFieldXY(x, y, WL)
    X, _ = np.meshgrid(x, y, indexing="ij")
    f.u = np.exp(1j * 2 * np.pi * X / 100.0)
    f.discretize(kind="phase", num_levels=4)
    ph = np.unique(np.round(np.angle(np.asarray(f.u)), 10))
    assert len(ph) <= 4
    # level spacing pi/2
    d = np.diff(np.sort(ph))
    assert np.allclose(d, np.pi / 2, atol=1e-9)


def test_get_edges_binary_grating():
    n = 1024
    x = np.linspace(-50, 50, n)
    period = 20.0
    u = (np.mod(x, period) < period / 2).astype(float)
    f = ScalarFieldX(x, WL, u=u)
    pos, typ, up, dn = f.get_edges()
    # transitions every half period
    assert len(pos) >= 8
    d = np.diff(np.sort(pos))
    assert np.allclose(d, period / 2, atol=2 * (x[1] - x[0]))
    assert np.all(np.isin(typ, [-1.0, 1.0]))


# ------------------------------------------------------------------
# search_focus / profile / rotate / insert_mask
# ------------------------------------------------------------------

def test_search_focus_maximum_and_moments():
    x, y = _xy()
    f = ScalarFieldXY(x, y, WL)
    gauss_beam(f, w0=8.0, x0=10.0, y0=-5.0)
    xm, ym = f.search_focus("maximum")
    xc, yc = f.search_focus("moments")
    dx = x[1] - x[0]
    assert abs(float(xm) - 10.0) < dx and abs(float(ym) + 5.0) < dx
    assert abs(float(xc) - 10.0) < 0.2 and abs(float(yc) + 5.0) < 0.2


def test_profile_matches_axis_slice():
    x, y = _xy()
    f = ScalarFieldXY(x, y, WL)
    gauss_beam(f, w0=12.0)
    s, I = f.profile((x[0], 0.0), (x[-1], 0.0), npixels=len(x))
    iy = np.argmin(np.abs(y))
    ref = np.abs(np.asarray(f.u)[:, iy]) ** 2
    assert np.allclose(np.asarray(I), ref, atol=1e-8)


def test_rotate_quarter_turn_swaps_axes():
    x, y = _xy()
    f = ScalarFieldXY(x, y, WL)
    X, Y = np.meshgrid(x, y, indexing="ij")
    f.u = np.exp(-(X ** 2 / 400.0 + Y ** 2 / 25.0)) + 0j
    f.rotate(np.pi / 2)
    u = np.asarray(f.u)
    ref = np.exp(-(X ** 2 / 25.0 + Y ** 2 / 400.0))
    # interior agreement (border pixels zeroed by the inverse map)
    assert np.max(np.abs(np.abs(u[2:-2, 2:-2]) - ref[2:-2, 2:-2])) < 5e-3


def test_insert_mask_pastes_subfield():
    x, y = _xy()
    f = ScalarFieldXY(x, y, WL)
    f.u = np.zeros((len(x), len(y)), complex)
    xs = np.linspace(-5, 5, 13)
    small = ScalarFieldXY(xs, xs, WL)
    small.u = np.ones((13, 13), complex)
    f.insert_mask(small, r0=(20.0, 0.0))
    u = np.asarray(f.u)
    ix = np.argmin(np.abs(x - 20.0))
    iy = np.argmin(np.abs(y))
    assert abs(u[ix, iy]) == 1.0
    assert abs(u[0, 0]) == 0.0
    # pasted area matches the small grid footprint
    assert 13 ** 2 * 0.5 < np.sum(np.abs(u)) <= 13 ** 2 * 2.5


# ------------------------------------------------------------------
# PWD
# ------------------------------------------------------------------

def test_pwd_xz_matches_asm_homogeneous():
    n = 256
    x = np.linspace(-60, 60, n)
    z = np.linspace(2.0, 60.0, 16)
    f = ScalarFieldXZ(x, z, WL)
    f0 = ScalarFieldX(x, WL)
    gauss_beam(f0, w0=10.0)
    f.incident_field(f0.u)
    u_pwd = np.asarray(f.pwd())
    u_asm = np.asarray(f.propagate())
    assert np.max(np.abs(u_pwd - u_asm)) < 1e-10


def test_pwd_xz_background_index():
    n = 256
    x = np.linspace(-60, 60, n)
    z = np.linspace(2.0, 40.0, 8)
    f = ScalarFieldXZ(x, z, WL, n_background=1.5)
    f0 = ScalarFieldX(x, WL)
    gauss_beam(f0, w0=10.0)
    f.incident_field(f0.u)
    u_pwd = np.asarray(f.pwd(n=1.5))
    f2 = ScalarFieldX(x, WL, u=f0.u, n_background=1.5)
    f2.angular_spectrum(float(z[-1]))
    assert np.max(np.abs(u_pwd[-1] - np.asarray(f2.u))) < 1e-10


def test_pwd_xyz_matches_asm():
    x = np.linspace(-40, 40, 64)
    z = np.linspace(5.0, 30.0, 5)
    f = ScalarFieldXYZ(x, x, z, WL)
    f0 = ScalarFieldXY(x, x, WL)
    gauss_beam(f0, w0=8.0)
    f.incident_field(f0.u)
    u_pwd = np.asarray(f.pwd())
    u_ref = np.asarray(f0.propagate_many(z))
    assert np.max(np.abs(u_pwd - u_ref)) < 1e-10


# ------------------------------------------------------------------
# XZ scene analysis
# ------------------------------------------------------------------

def test_detect_index_variations_rectangle():
    x = np.linspace(-50, 50, 128)
    z = np.linspace(0, 100, 256)
    n0 = np.full((len(z), len(x)), 1.0 + 0j)
    sheet = scenes.rectangle(n0, x, z, r0=(0.0, 50.0), size=(40.0, 30.0),
                             refraction_index=1.5)
    f = ScalarFieldXZ(x, z, WL)
    xl, hl, xr, hr = f.detect_index_variations(sheet, n_edge=1.2)
    # left interfaces at z ~ 35, right at z ~ 65, confined to |x|<20
    assert np.all(np.abs(hl - 35.0) < 1.0)
    assert np.all(np.abs(hr - 65.0) < 1.0)
    assert np.max(np.abs(xl)) < 21.0


def test_surface_detection_rectangle():
    x = np.linspace(-50, 50, 128)
    z = np.linspace(0, 100, 128)
    n0 = np.full((len(z), len(x)), 1.0 + 0j)
    sheet = scenes.rectangle(n0, x, z, r0=(0.0, 50.0), size=(40.0, 30.0),
                             refraction_index=1.5)
    f = ScalarFieldXZ(x, z, WL)
    xs, zs = f.surface_detection(sheet, mode=2, min_incr=0.1)
    assert len(xs) > 0
    # all detected points lie on (near) the rectangle boundary
    on_x_edge = np.abs(np.abs(xs) - 20.0) < 1.5
    on_z_edge = (np.abs(zs - 35.0) < 1.5) | (np.abs(zs - 65.0) < 1.5)
    assert np.all(on_x_edge | on_z_edge)


# ------------------------------------------------------------------
# vector propagation: VRS / VFFT / IVFFT
# ------------------------------------------------------------------

def test_vrs_matches_scalar_rs_components():
    x, y = _xy(96, 80.0)
    v = VectorFieldXY(x, y, WL)
    g = ScalarFieldXY(x, y, WL)
    gauss_beam(g, w0=10.0)
    v.incident_field(g.u, 0.3 * np.asarray(g.u))
    Ex0, Ey0 = np.asarray(v.Ex).copy(), np.asarray(v.Ey).copy()
    z = 120.0
    v.vrs(z)
    gx = ScalarFieldXY(x, y, WL, u=Ex0)
    gx.RS(z)
    gy = ScalarFieldXY(x, y, WL, u=Ey0)
    gy.RS(z)
    assert np.max(np.abs(np.asarray(v.Ex) - np.asarray(gx.u))) < 1e-12
    assert np.max(np.abs(np.asarray(v.Ey) - np.asarray(gy.u))) < 1e-12
    # pure x-polarization: Ez = RS_0[X Ex / r] is odd in x (the grid is
    # endpoint-symmetric, so x[::-1] = -x exactly)
    vx = VectorFieldXY(x, y, WL)
    vx.incident_field(Ex0, np.zeros_like(Ex0))
    vx.vrs(z)
    scale = np.max(np.abs(np.asarray(vx.Ex)))
    Ez = np.asarray(vx.Ez)
    assert np.max(np.abs(Ez)) > 1e-6 * scale
    assert np.max(np.abs(Ez + Ez[::-1, :])) < 1e-10 * scale


def test_vfft_radial_polarization_gives_axial_field():
    """Radially polarized input focused by a high-NA lens produces a
    strong ON-AXIS longitudinal Ez (the classic Richards-Wolf result),
    while linear x-polarization gives Ez = 0 on axis."""
    x, y = _xy(128, 4000.0)
    radius, focal = 1500.0, 3000.0
    # radial polarization
    X, Y = np.meshgrid(x, y, indexing="ij")
    r = np.hypot(X, Y) + 1e-12
    vr = VectorFieldXY(x, y, WL)
    vr.incident_field(X / r, Y / r)
    vr.vfft(radius, focal)
    n2 = len(x) // 2
    Iz_axis = np.abs(np.asarray(vr.Ez)[n2, n2]) ** 2
    Iz_peak = np.max(np.abs(np.asarray(vr.Ez)) ** 2)
    assert Iz_axis > 0.5 * Iz_peak      # on-axis Ez is the global peak
    # linear polarization (remove0=False keeps the DC bin = the axis
    # point): Ez vanishes on axis, the transverse spot peaks there
    vl = VectorFieldXY(x, y, WL)
    vl.incident_field(np.ones_like(X), np.zeros_like(X))
    vl.vfft(radius, focal, remove0=False)
    Ez_l = np.asarray(vl.Ez)
    assert (np.abs(Ez_l[n2, n2]) ** 2) < 1e-4 * np.max(np.abs(Ez_l) ** 2)
    Ix = np.abs(np.asarray(vl.Ex)) ** 2
    assert Ix[n2, n2] == pytest.approx(np.max(Ix), rel=1e-6)


def test_vfft_ivfft_round_trip():
    """ivfft(vfft(E)) = sqrt(cos θ) E inside the pupil (the reference
    does not undo the apodization; checked against that exact factor)."""
    x, y = _xy(64, 2000.0)
    radius, focal = 600.0, 2000.0
    X, Y = np.meshgrid(x, y, indexing="ij")
    E0 = np.exp(-(X ** 2 + Y ** 2) / (2 * 300.0 ** 2))
    v = VectorFieldXY(x, y, WL)
    v.incident_field(E0, 0.5j * E0)
    v.vfft(radius, focal, remove0=False)
    v.ivfft(radius, focal)
    theta = np.hypot(X, Y) / focal
    apod = np.sqrt(np.abs(np.cos(theta)))
    pupil = np.hypot(X, Y) <= radius
    expect = apod * E0 * pupil
    got = np.asarray(v.Ex)
    err = np.max(np.abs(got - expect)) / np.max(np.abs(expect))
    assert err < 1e-8
    erry = np.max(np.abs(np.asarray(v.Ey) - 0.5j * expect)) \
        / np.max(np.abs(expect))
    assert erry < 1e-8


def test_roughness_surfaces():
    """Ogilvy correlated rough surfaces: shape, reproducibility,
    height statistics, and correlation length scaling with t."""
    from pyqed_tpu.beam.optics import roughness_1D, roughness_2D

    x = np.linspace(-200.0, 200.0, 1024)
    h = roughness_1D(x, t=10.0, s=1.0, seed=7)
    assert h.shape == x.shape
    assert np.allclose(h, roughness_1D(x, 10.0, 1.0, seed=7))
    assert 0.5 < h.std() < 1.5

    def half_width(sig):
        ac = np.correlate(sig - sig.mean(), sig - sig.mean(),
                          "full")[len(sig) - 1:]
        ac = ac / ac[0]
        return np.argmax(ac < 0.5) * (x[1] - x[0])

    assert half_width(roughness_1D(x, 20.0, 1.0, seed=1)) \
        > 1.5 * half_width(roughness_1D(x, 5.0, 1.0, seed=1))

    hu = roughness_1D(x, 10.0, 1.0, kind="uniform", seed=0)
    assert abs(hu.std() - 1.0 / np.sqrt(12.0)) < 0.05

    h2 = roughness_2D(x[:128], x[:160], (10.0, 5.0), 0.5, seed=2)
    assert h2.shape == (128, 160)
    assert 0.2 < h2.std() < 0.8
