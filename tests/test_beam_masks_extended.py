"""Extended mask zoo + XZ/XYZ scene builders.

Pins: analytic geometry (areas, symmetries, set identities), phase
structure, determinism of stochastic masks, and one real-physics BPM
check (plano-convex XZ lens focuses a plane wave at its focal length).

Reference: pyqed/beam/scalar_masks_XY.py, scalar_masks_XZ.py,
scalar_masks_XYZ.py, scalar_sources_XY.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqed_tpu.beam import masks as mk
from pyqed_tpu.beam import scenes as sc
from pyqed_tpu.beam.beam import ScalarFieldXZ


@pytest.fixture(scope="module")
def grid():
    x = np.linspace(-100.0, 100.0, 256)
    y = np.linspace(-100.0, 100.0, 256)
    X, Y = jnp.meshgrid(jnp.asarray(x), jnp.asarray(y), indexing="ij")
    dx = x[1] - x[0]
    return x, y, X, Y, dx


def frac(u):
    return float(jnp.mean(jnp.abs(u) ** 2))


# ------------------------------------------------------------------
# XY masks: set identities and analytic areas
# ------------------------------------------------------------------

def test_super_ellipse_limits(grid):
    x, y, X, Y, dx = grid
    # n=2 is the ellipse == circle mask for equal radii
    se = mk.super_ellipse(X, Y, (0, 0), 50.0, n=(2, 2))
    ci = mk.circle(X, Y, (0, 0), 50.0)
    assert float(jnp.mean(jnp.abs(se - ci))) < 1e-12
    # n -> large approaches the square: area -> (2r)^2
    sq = mk.super_ellipse(X, Y, (0, 0), 50.0, n=(40, 40))
    area = float(jnp.sum(jnp.real(sq))) * dx * dx
    assert abs(area - 100.0 ** 2) / 100.0 ** 2 < 0.05


def test_square_circle_interpolates(grid):
    x, y, X, Y, dx = grid
    s0 = mk.square_circle(X, Y, (0, 0), 50.0, 50.0, s=0.0)
    ci = mk.circle(X, Y, (0, 0), 50.0)
    assert float(jnp.mean(jnp.abs(s0 - ci))) < 1e-12
    # s=1 area must exceed the circle area (bulges toward the square)
    s1 = mk.square_circle(X, Y, (0, 0), 50.0, 50.0, s=1.0)
    assert float(jnp.sum(jnp.real(s1))) > float(jnp.sum(jnp.real(ci)))


def test_triangle_area(grid):
    x, y, X, Y, dx = grid
    # apex (0, h/2), base at y = -h/2; width at base = 2*(h/slope)
    h, slope = 80.0, 2.0
    t = mk.triangle(X, Y, None, slope, h)
    area = float(jnp.sum(jnp.real(t))) * dx * dx
    exact = h * (h / slope)   # 1/2 * base * height = 1/2*(2h/slope)*h
    assert abs(area - exact) / exact < 0.03


def test_rings_union_of_annuli(grid):
    x, y, X, Y, dx = grid
    u = mk.rings(X, Y, (0, 0), [10.0, 40.0], [20.0, 60.0])
    r1 = mk.ring(X, Y, (0, 0), 10.0, 20.0)
    r2 = mk.ring(X, Y, (0, 0), 40.0, 60.0)
    both = jnp.clip(jnp.real(r1) + jnp.real(r2), 0, 1)
    assert float(jnp.mean(jnp.abs(jnp.real(u) - both))) < 1e-12


def test_two_levels_split(grid):
    x, y, X, Y, dx = grid
    u = mk.two_levels(X, Y, 0.25, 0.75, x_edge=10.0)
    left = jnp.real(u)[X < 10.0 - dx]
    right = jnp.real(u)[X > 10.0 + dx]
    assert float(jnp.max(jnp.abs(left - 0.25))) < 1e-12
    assert float(jnp.max(jnp.abs(right - 0.75))) < 1e-12


def test_grating_2d_chess_is_xor(grid):
    x, y, X, Y, dx = grid
    period = 25.0
    gx = jnp.real(mk.binary_grating(X, Y, period, 0.0, 0.5, 0.0)) > 0.5
    gy = jnp.real(mk.binary_grating(X, Y, period, 0.0, 0.5,
                                    np.pi / 2)) > 0.5
    chess = mk.grating_2D_chess(X, Y, period)
    assert bool(jnp.all((jnp.real(chess) > 0.5)
                        == jnp.logical_xor(gx, gy)))


def test_angular_aperture_circle_limit(grid):
    x, y, X, Y, dx = grid
    # a single 0th-order cosine coefficient = constant radius = circle
    u = mk.angular_aperture(X, Y, np.array([[0], [50.0]]))
    ci = mk.circle(X, Y, (0, 0), 50.0)
    assert float(jnp.mean(jnp.abs(u - ci))) < 5e-3


def test_axicon_binary_fill(grid):
    x, y, X, Y, dx = grid
    u = mk.axicon_binary(X, Y, (0, 0), 90.0, 20.0)
    r = jnp.hypot(X, Y)
    inside = jnp.real(u)[r < 85.0]
    # cos > 0 half the time: fill ~ 0.5 inside the mask radius (the
    # always-on central zone r < T/4 biases it slightly above)
    assert abs(float(jnp.mean(inside)) - 0.5) < 0.08


def test_hermite_gauss_binary_phase_structure(grid):
    x, y, X, Y, dx = grid
    u = mk.hermite_gauss_binary(X, Y, (0, 0), (40.0, 40.0), 1, 0)
    # |t| = 1 everywhere; phase flips across x = 0 like H1(x) = 2x
    assert float(jnp.max(jnp.abs(jnp.abs(u) - 1))) < 1e-12
    assert abs(float(jnp.angle(u[200, 128]))
               - np.pi) < 1e-9          # x > 0: H1 > 0 -> phase pi
    assert abs(float(jnp.angle(u[50, 128]))) < 1e-9   # x < 0: phase 0


def test_lens_spherical_paraxial_limit(grid):
    x, y, X, Y, dx = grid
    wl, f = 0.6, 5e4   # very long focal: non-paraxial == paraxial
    u_sph = mk.lens_spherical(X, Y, wl, (0, 0), 80.0, f, 1.5)
    u_par = mk.lens(X, Y, wl, f, (0.0, 0.0), 80.0)
    r = jnp.hypot(X, Y)
    sel = r < 40.0
    dphi = jnp.angle(u_sph * jnp.conj(u_par))[sel]
    assert float(jnp.max(jnp.abs(dphi))) < 0.02


def test_aspheric_sphere_limit(grid):
    x, y, X, Y, dx = grid
    # k=0, no higher orders: sag = c r^2/(1+sqrt(1-c^2 r^2)) =
    # R - sqrt(R^2-r^2) with R=1/c -> reproduce lens_spherical phase
    wl, R = 0.6, 500.0
    u_asp = mk.aspheric(X, Y, wl, (0, 0), 1.0 / R, 0.0, None, 1.5, 1.0,
                        80.0)
    # lens_spherical has h = sqrt(R'^2-r^2)-R' with R' = (n-1) f;
    # aspheric with n0=1.5, n1=1 gives phase exp(-i 2pi 0.5 sag / wl)
    r2 = (X ** 2 + Y ** 2)
    sag = R - jnp.sqrt(jnp.maximum(R ** 2 - r2, 0.0))
    expect = jnp.exp(-2j * np.pi * 0.5 * sag / wl) * mk.circle(
        X, Y, (0, 0), 80.0)
    sel = jnp.hypot(X, Y) < 80.0
    dphi = jnp.angle(u_asp * jnp.conj(expect))[sel]
    assert float(jnp.max(jnp.abs(dphi))) < 1e-9


def test_sinusoidal_slit_reduces_to_slit(grid):
    x, y, X, Y, dx = grid
    u0 = mk.sinusoidal_slit(X, Y, 30.0, 0.0, 1e-9, 0.0, 50.0)
    sl = mk.slit(X, Y, 0.0, 30.0)
    assert float(jnp.mean(jnp.abs(u0 - sl))) < 1e-6


def test_crossed_slits_bowtie(grid):
    x, y, X, Y, dx = grid
    u = mk.crossed_slits(X, Y, (0, 0), (2.0, 2.0))
    # opens along +-y: on-axis y points pass, on-axis x points blocked
    assert float(jnp.real(u[128, 250])) == 1.0   # (x~0, y large)
    assert float(jnp.real(u[250, 128])) == 0.0   # (x large, y~0)


def test_inverse_amplitude_phase(grid):
    x, y, X, Y, dx = grid
    u = 0.5 * jnp.exp(1j * 0.3) * mk.circle(X, Y, (0, 0), 50.0)
    inv_a = mk.inverse_amplitude(u)
    # inside: 1-0.5 = 0.5 with same phase; outside: amplitude 1
    assert abs(float(jnp.abs(inv_a[128, 128])) - 0.5) < 1e-12
    assert abs(float(jnp.angle(inv_a[128, 128])) - 0.3) < 1e-12
    assert abs(float(jnp.abs(inv_a[0, 0])) - 1.0) < 1e-12
    inv_p = mk.inverse_phase(u)
    assert abs(float(jnp.angle(inv_p[128, 128])) + 0.3) < 1e-12


def test_area_of_circle(grid):
    x, y, X, Y, dx = grid
    u = mk.circle(X, Y, (0, 0), 60.0)
    a = mk.area(u, dx, dx)
    assert abs(a - np.pi * 60.0 ** 2) / (np.pi * 60.0 ** 2) < 0.01


def test_dots_and_masks_to_positions(grid):
    x, y, X, Y, dx = grid
    u = mk.dots(x, y, ([-50.0, 0.0, 50.0], [0.0, 0.0, 0.0]))
    assert float(jnp.sum(jnp.real(u))) == 3.0
    # stamping a small circle at 3 positions = union of 3 circles
    t = mk.circle(X, Y, (0, 0), 10.0)
    stamped = mk.masks_to_positions(x, y, t,
                                    ([-50.0, 0.0, 50.0], [0., 0., 0.]),
                                    binarize=0.5)
    union = jnp.clip(sum(jnp.real(mk.circle(X, Y, (cx, 0.0), 10.0))
                         for cx in (-50.0, 0.0, 50.0)), 0, 1)
    mismatch = float(jnp.mean(jnp.abs(jnp.real(stamped) - union)))
    assert mismatch < 2e-3   # FFT-stamp == direct union up to edge pixels


def test_widen_grows_circle(grid):
    x, y, X, Y, dx = grid
    u = mk.circle(X, Y, (0, 0), 30.0)
    w = mk.widen(x, y, u, 15.0)
    a0 = float(jnp.sum(jnp.real(u)))
    a1 = float(jnp.sum(jnp.real(w)))
    exact = (45.0 / 30.0) ** 2
    assert abs(a1 / a0 - exact) / exact < 0.05


def test_extrude_and_repeat(grid):
    x, y, X, Y, dx = grid
    u1d = (jnp.abs(jnp.asarray(x)) < 20.0).astype(complex)
    u = mk.extrude_mask_x(x, y, u1d, -50.0, 50.0)
    assert float(jnp.real(u[128, 128])) == 1.0       # inside band
    assert float(jnp.real(u[128, 10])) == 0.0        # outside y band
    x2, y2, u2 = mk.repeat_structure(x, y, u, (2, 2))
    assert u2.shape == (512, 512)
    assert len(x2) == 512 and abs(x2[0] + x2[-1]) < 1e-9


def test_rough_circle_deterministic(grid):
    x, y, X, Y, dx = grid
    key = jax.random.PRNGKey(7)
    u1 = mk.circle_rough(X, Y, (0, 0), 50.0, 2.0, key)
    u2 = mk.circle_rough(X, Y, (0, 0), 50.0, 2.0, key)
    assert bool(jnp.all(u1 == u2))
    # sigma -> 0 limit is the sharp circle
    u0 = mk.circle_rough(X, Y, (0, 0), 50.0, 1e-12, key)
    ci = mk.circle(X, Y, (0, 0), 50.0)
    assert float(jnp.mean(jnp.abs(u0 - ci))) < 1e-12


def test_roughness_surface_stats(grid):
    x, y, X, Y, dx = grid
    h = mk.roughness_surface(x, y, (20.0, 20.0), 3.0,
                             jax.random.PRNGKey(0))
    assert abs(float(jnp.std(h)) - 3.0) < 1e-6
    assert abs(float(jnp.mean(h))) < 1e-8


def test_sources_several(grid):
    x, y, X, Y, dx = grid
    wl = 0.6
    u = mk.gauss_beams_several_parallel(
        X, Y, wl, (0.0, 0.0), 1.0, (2, 1), 10.0, (80.0, 80.0))
    direct = (mk.gauss_beam(X, Y, wl, 10.0, (-20.0, 0.0))
              + mk.gauss_beam(X, Y, wl, 10.0, (20.0, 0.0)))
    assert float(jnp.max(jnp.abs(u - direct))) < 1e-10
    pw = mk.plane_waves_dict(X, Y, wl, [dict(A=1.0, theta=0.0, phi=0.0,
                                             z0=0.0)])
    assert float(jnp.max(jnp.abs(pw - 1.0))) < 1e-12


def test_mask_from_function_flat_gives_unity(grid):
    x, y, X, Y, dx = grid
    u = mk.mask_from_function(X, Y, 0.6, (0, 0), 1.5,
                              lambda X, Y: 0.0 * X,
                              lambda X, Y: 0.0 * X, 60.0)
    ci = mk.circle(X, Y, (0, 0), 60.0)
    assert float(jnp.mean(jnp.abs(u - ci))) < 1e-12


# ------------------------------------------------------------------
# XZ scenes
# ------------------------------------------------------------------

def test_xz_geometry_counts():
    x = np.linspace(-60.0, 60.0, 200)
    z = np.linspace(0.0, 120.0, 240)
    dx, dz = x[1] - x[0], z[1] - z[0]
    n0 = jnp.ones((len(z), len(x)))
    n1 = sc.rectangle(n0, x, z, (0.0, 60.0), (40.0, 30.0), 1.5)
    area = float(jnp.sum(jnp.real(n1) > 1.25)) * dx * dz
    assert abs(area - 40.0 * 30.0) / (40 * 30) < 0.03
    n2 = sc.sphere(n0, x, z, (0.0, 60.0), 25.0, 1.5)
    area = float(jnp.sum(jnp.real(n2) > 1.25)) * dx * dz
    assert abs(area - np.pi * 25 ** 2) / (np.pi * 25 ** 2) < 0.02
    # semi_sphere = half the sphere
    n3 = sc.semi_sphere(n0, x, z, (0.0, 60.0), 25.0, 1.5)
    a3 = float(jnp.sum(jnp.real(n3) > 1.25)) * dx * dz
    assert abs(a3 - np.pi * 25 ** 2 / 2) / (np.pi * 25 ** 2 / 2) < 0.03
    # layer: depth * full width
    n4 = sc.layer(n0, x, z, (0.0, 40.0), 20.0, 1.5, 0.0)
    a4 = float(jnp.sum(jnp.real(n4) > 1.25)) * dx * dz
    assert abs(a4 - 20.0 * 120.0) / (20.0 * 120.0) < 0.02


def test_xz_slit_keeps_background():
    x = np.linspace(-60.0, 60.0, 200)
    z = np.linspace(0.0, 120.0, 240)
    n0 = jnp.ones((len(z), len(x)))
    n1 = sc.slit(n0, x, z, (0.0, 50.0), 30.0, 10.0, 2.0 + 0.5j)
    iz = np.argmin(np.abs(z - 55.0))
    ix_c = np.argmin(np.abs(x - 0.0))
    ix_s = np.argmin(np.abs(x - 40.0))
    assert abs(complex(n1[iz, ix_c]) - 1.0) < 1e-12       # aperture open
    assert abs(complex(n1[iz, ix_s]) - (2.0 + 0.5j)) < 1e-12   # screen


def test_xz_wedge_biprism_geometry():
    x = np.linspace(-60.0, 60.0, 240)
    z = np.linspace(0.0, 120.0, 240)
    n0 = jnp.ones((len(z), len(x)))
    nb = sc.biprism(n0, x, z, (0.0, 20.0), 80.0, 30.0, 1.5)
    iz_apex = np.argmin(np.abs(z - 45.0))   # near apex z0+height-eps
    ix0 = np.argmin(np.abs(x - 0.0))
    assert float(jnp.real(nb[iz_apex, ix0])) > 1.25   # apex filled
    iz_base = np.argmin(np.abs(z - 21.0))
    ix_edge = np.argmin(np.abs(x - 35.0))
    assert float(jnp.real(nb[iz_base, ix_edge])) > 1.25  # base wide
    ix_out = np.argmin(np.abs(x - 45.0))
    assert float(jnp.real(nb[iz_base, ix_out])) < 1.25   # beyond base
    # triangle cross-section area = base * height / 2 = 80*30/2
    dxz = (x[1] - x[0]) * (z[1] - z[0])
    area = float(jnp.sum(jnp.real(nb) > 1.25)) * dxz
    assert abs(area - 1200.0) / 1200.0 < 0.05


def test_mask_from_array_matches_function():
    x = np.linspace(-60.0, 60.0, 200)
    z = np.linspace(0.0, 120.0, 240)
    n0 = jnp.ones((len(z), len(x)))
    f1 = lambda X: 30.0 + 0.01 * X ** 2
    f2 = lambda X: 80.0 - 0.005 * X ** 2
    na = sc.mask_from_function_xz(n0, x, z, f1, f2, 1.5)
    pts = np.linspace(-60, 60, 400)
    nb = sc.mask_from_array_xz(
        n0, x, z, np.stack([pts, 30.0 + 0.01 * pts ** 2], 1),
        np.stack([pts, 80.0 - 0.005 * pts ** 2], 1), 1.5)
    assert float(jnp.mean(jnp.abs(na - nb))) < 5e-3


def test_discretize_refraction_index():
    n = jnp.asarray([[1.0, 1.2, 1.4], [1.45, 1.9, 1.05]])
    out = sc.discretize_refraction_index(n, [1.0, 1.5, 2.0])
    expect = np.array([[1.0, 1.0, 1.5], [1.5, 2.0, 1.0]])
    assert np.allclose(np.real(np.asarray(out)), expect)


def test_rough_sheet_deterministic_and_thinner():
    x = np.linspace(-60.0, 60.0, 200)
    z = np.linspace(0.0, 120.0, 240)
    n0 = jnp.ones((len(z), len(x)))
    key = jax.random.PRNGKey(3)
    n1 = sc.rough_sheet(n0, x, z, (0.0, 30.0), (80.0, 40.0), 10.0, 2.0,
                        1.5, key)
    n2 = sc.rough_sheet(n0, x, z, (0.0, 30.0), (80.0, 40.0), 10.0, 2.0,
                        1.5, key)
    assert bool(jnp.all(n1 == n2))
    # the rough exit face stays within ~4 sigma of the nominal face
    filled = jnp.real(n1) > 1.25
    z_exit = np.array([z[np.asarray(filled[:, i]).nonzero()[0].max()]
                       if np.asarray(filled[:, i]).any() else np.nan
                       for i in range(len(x))])
    sel = ~np.isnan(z_exit) & (np.abs(x) < 35.0)
    assert np.nanmax(np.abs(z_exit[sel] - 70.0)) < 10.0


# ------------------------------------------------------------------
# XZ BPM physics: plano-convex lens focuses at f = R/(n-1)
# ------------------------------------------------------------------

def test_xz_lens_plane_convergent_focus():
    wl = 0.6
    x = np.linspace(-80.0, 80.0, 512)
    z = np.linspace(1.0, 260.0, 520)
    n0 = jnp.ones((len(z), len(x)))
    R, thick, n_lens = 60.0, 18.0, 1.5
    n_sheet, f = sc.lens_plane_convergent(
        n0, x, z, (0.0, 4.0), 110.0, R, thick, n_lens)
    assert abs(f - R / (n_lens - 1)) < 1e-12    # f = 120
    fld = ScalarFieldXZ(x, z, wl)
    fld.incident_field(jnp.ones(len(x), dtype=complex))
    u = fld.bpm(n_xz=n_sheet)
    inten = np.asarray(jnp.abs(u) ** 2)
    ix0 = np.argmin(np.abs(x))
    z_peak = z[np.argmax(inten[:, ix0])]
    # peak on axis near z0 + thickness + f (principal plane at exit
    # face for a plano-convex lens, curved side toward the focus);
    # BPM paraxial + thick-lens shift tolerance
    z_expect = 4.0 + thick + f
    assert abs(z_peak - z_expect) < 0.15 * f
    # and it is a genuine focus: peak intensity >> input
    assert inten[:, ix0].max() > 10.0


# ------------------------------------------------------------------
# XYZ volume builders
# ------------------------------------------------------------------

def test_xyz_sphere_cylinder_volumes():
    x = np.linspace(-30.0, 30.0, 96)
    y = np.linspace(-30.0, 30.0, 96)
    z = np.linspace(0.0, 60.0, 96)
    dv = (x[1] - x[0]) * (y[1] - y[0]) * (z[1] - z[0])
    n0 = jnp.ones((len(z), len(x), len(y)))
    ns = sc.sphere_xyz(n0, x, y, z, (0.0, 0.0, 30.0), 15.0, 1.5)
    vol = float(jnp.sum(jnp.real(ns) > 1.25)) * dv
    exact = 4 / 3 * np.pi * 15.0 ** 3
    assert abs(vol - exact) / exact < 0.03
    nc = sc.cylinder_xyz(n0, x, y, z, (0.0, 0.0, 30.0), 12.0, 30.0, 1.5)
    vol = float(jnp.sum(jnp.real(nc) > 1.25)) * dv
    exact = np.pi * 12.0 ** 2 * 30.0
    assert abs(vol - exact) / exact < 0.03
    nb = sc.square_xyz(n0, x, y, z, (0.0, 0.0, 30.0),
                       (20.0, 24.0, 30.0), 1.5)
    vol = float(jnp.sum(jnp.real(nb) > 1.25)) * dv
    exact = 20.0 * 24.0 * 30.0
    assert abs(vol - exact) / exact < 0.05
