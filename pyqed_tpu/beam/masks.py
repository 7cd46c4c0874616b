"""Diffractive mask and source zoo for the scalar XY beam fields.

TPU-native counterpart of the reference's diffractio-style mask/source
classes (reference: pyqed/beam/scalar_masks_XY.py — ``slit:691``,
``double_slit:752``, ``square:771``, ``circle:831``, ``ring:961``,
``cross:1015``, ``super_gauss:857``, ``lens:1059``,
``fresnel_lens:1189``, ``axicon:1238``, ``sine_grating:1605``,
``radial_grating:1339``, ``angular_grating:1367``,
``forked_grating:1572``, ``laguerre_gauss_spiral:1529``;
pyqed/beam/scalar_sources_XY.py — ``plane_wave:70``, ``gauss_beam:84``,
``spherical_wave:157``, ``vortex_beam:185``,
``hermite_gauss_beam:208``, ``laguerre_beam:272``, ``bessel_beam:350``,
``zernike_beam:318``).

Design: every mask/source is a PURE function of meshgrids ``(X, Y)``
returning a complex transmission/field array — composable by
multiplication, jit/vmap-friendly, no object mutation.  Attach to a
``ScalarFieldXY`` with ``field.u = field.u * mask(...)`` or the
``apply_mask`` helper.
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
from scipy.special import jv


def _grids(field):
    return jnp.meshgrid(jnp.asarray(field.x), jnp.asarray(field.y),
                        indexing="ij")


def apply_mask(field, mask_fn, *args, **kwargs):
    """field.u *= mask_fn(X, Y, ...); returns the field for chaining."""
    X, Y = _grids(field)
    field.u = field.u * mask_fn(X, Y, *args, **kwargs)
    return field


def _rot(X, Y, angle, r0=(0.0, 0.0)):
    Xr = (X - r0[0]) * np.cos(angle) + (Y - r0[1]) * np.sin(angle)
    Yr = -(X - r0[0]) * np.sin(angle) + (Y - r0[1]) * np.cos(angle)
    return Xr, Yr


# -------------------------------------------------------------------
# amplitude masks
# -------------------------------------------------------------------

def slit(X, Y, x0, size, angle=0.0):
    Xr, _ = _rot(X, Y, angle, (x0, 0.0))
    return (jnp.abs(Xr) < size / 2).astype(jnp.complex128)


def double_slit(X, Y, x0, size, separation, angle=0.0):
    return (slit(X, Y, x0 - separation / 2, size, angle)
            + slit(X, Y, x0 + separation / 2, size, angle))


def square(X, Y, r0, size, angle=0.0):
    sx, sy = (size, size) if np.isscalar(size) else size
    Xr, Yr = _rot(X, Y, angle, r0)
    return ((jnp.abs(Xr) < sx / 2) & (jnp.abs(Yr) < sy / 2)
            ).astype(jnp.complex128)


def circle(X, Y, r0, radius):
    rx, ry = (radius, radius) if np.isscalar(radius) else radius
    return ((((X - r0[0]) / rx) ** 2 + ((Y - r0[1]) / ry) ** 2) <= 1.0
            ).astype(jnp.complex128)


def ring(X, Y, r0, radius1, radius2):
    return circle(X, Y, r0, radius2) - circle(X, Y, r0, radius1)


def cross(X, Y, r0, size, angle=0.0):
    sx, sy = (size, size) if np.isscalar(size) else size
    Xr, Yr = _rot(X, Y, angle, r0)
    arm1 = (jnp.abs(Xr) < sx / 2) & (jnp.abs(Yr) < sy / 8)
    arm2 = (jnp.abs(Yr) < sx / 2) & (jnp.abs(Xr) < sy / 8)
    return (arm1 | arm2).astype(jnp.complex128)


def super_gauss(X, Y, r0, radius, power=2):
    R2 = (X - r0[0]) ** 2 + (Y - r0[1]) ** 2
    return jnp.exp(-(R2 / radius ** 2) ** power).astype(jnp.complex128)


def gray_scale(X, Y, num_levels, x_min=None, x_max=None):
    lo = X.min() if x_min is None else x_min
    hi = X.max() if x_max is None else x_max
    t = jnp.clip((X - lo) / (hi - lo), 0, 1 - 1e-12)
    return (jnp.floor(t * num_levels) / (num_levels - 1)
            ).astype(jnp.complex128)


# -------------------------------------------------------------------
# phase masks (lenses, axicons, gratings)
# -------------------------------------------------------------------

def lens(X, Y, wavelength, focal, r0=(0.0, 0.0), radius=None):
    """Thin-lens quadratic phase, optionally aperture-bounded."""
    fx, fy = (focal, focal) if np.isscalar(focal) else focal
    k = 2 * np.pi / wavelength
    ph = jnp.exp(-1j * k * ((X - r0[0]) ** 2 / (2 * fx)
                            + (Y - r0[1]) ** 2 / (2 * fy)))
    if radius is not None:
        ph = ph * circle(X, Y, r0, radius)
    return ph


def fresnel_lens(X, Y, wavelength, focal, r0=(0.0, 0.0), radius=None,
                 kind="phase", phase=np.pi):
    """Binary Fresnel zone plate: zones from the exact spherical delay."""
    k = 2 * np.pi / wavelength
    R2 = (X - r0[0]) ** 2 + (Y - r0[1]) ** 2
    delay = k * (jnp.sqrt(R2 + focal ** 2) - focal)
    zone = (jnp.mod(delay, 2 * np.pi) < np.pi)
    if kind == "amplitude":
        t = zone.astype(jnp.complex128)
    else:
        t = jnp.exp(1j * phase * zone)
    if radius is not None:
        t = t * circle(X, Y, r0, radius)
    return t


def axicon(X, Y, wavelength, angle, refraction_index=1.5,
           r0=(0.0, 0.0), radius=None):
    """Conical phase t = exp(-i k (n-1) r tan(angle))."""
    k = 2 * np.pi / wavelength
    r = jnp.hypot(X - r0[0], Y - r0[1])
    t = jnp.exp(-1j * k * (refraction_index - 1) * r * np.tan(angle))
    if radius is not None:
        t = t * circle(X, Y, r0, radius)
    return t


def sine_grating(X, Y, period, x0=0.0, amp_min=0.0, amp_max=1.0,
                 angle=0.0):
    Xr, _ = _rot(X, Y, angle, (x0, 0.0))
    amp = amp_min + (amp_max - amp_min) * (
        1 + jnp.sin(2 * np.pi * Xr / period)) / 2
    return amp.astype(jnp.complex128)


def binary_grating(X, Y, period, x0=0.0, fill_factor=0.5, angle=0.0,
                   kind="amplitude", phase=np.pi):
    Xr, _ = _rot(X, Y, angle, (x0, 0.0))
    on = jnp.mod(Xr / period, 1.0) < fill_factor
    if kind == "amplitude":
        return on.astype(jnp.complex128)
    return jnp.exp(1j * phase * on)


def blazed_grating(X, Y, period, wavelength, angle=0.0):
    """Sawtooth phase ramp diffracting into the +1 order."""
    Xr, _ = _rot(X, Y, angle)
    return jnp.exp(2j * np.pi * jnp.mod(Xr / period, 1.0))


def radial_grating(X, Y, period, r0=(0.0, 0.0), binary=True):
    r = jnp.hypot(X - r0[0], Y - r0[1])
    t = 0.5 * (1 + jnp.sin(2 * np.pi * r / period))
    if binary:
        t = (t > 0.5)
    return t.astype(jnp.complex128)


def angular_grating(X, Y, num_spokes, r0=(0.0, 0.0), binary=True):
    th = jnp.arctan2(Y - r0[1], X - r0[0])
    t = 0.5 * (1 + jnp.sin(num_spokes * th))
    if binary:
        t = (t > 0.5)
    return t.astype(jnp.complex128)


def forked_grating(X, Y, period, l, r0=(0.0, 0.0), kind="amplitude",
                   angle=0.0):
    """Fork hologram: carrier grating with an l-charge dislocation —
    diffracts a plane wave into +/- l vortices."""
    Xr, Yr = _rot(X, Y, angle, r0)
    th = jnp.arctan2(Yr, Xr)
    arg = 2 * np.pi * Xr / period - l * th
    if kind == "amplitude":
        return (jnp.cos(arg) > 0).astype(jnp.complex128)
    return jnp.exp(1j * jnp.mod(arg, 2 * np.pi))


def spiral_phase_plate(X, Y, l, r0=(0.0, 0.0)):
    th = jnp.arctan2(Y - r0[1], X - r0[0])
    return jnp.exp(1j * l * th)


def laguerre_gauss_spiral(X, Y, wavelength, w0, l, z, r0=(0.0, 0.0),
                          kind="amplitude"):
    """Binarized LG-beam interference spiral (reference :1529)."""
    u = laguerre_beam(X, Y, wavelength, w0, 0, l, z, r0=r0)
    t = jnp.angle(u) + 2 * np.pi * jnp.hypot(X - r0[0], Y - r0[1]) ** 2 \
        / (wavelength * max(z, 1e-12) * 2)
    on = jnp.cos(t) > 0
    if kind == "amplitude":
        return on.astype(jnp.complex128)
    return jnp.exp(1j * np.pi * on)


# -------------------------------------------------------------------
# sources
# -------------------------------------------------------------------

def plane_wave(X, Y, wavelength, theta=0.0, phi=0.0, A=1.0, z0=0.0):
    k = 2 * np.pi / wavelength
    kx = k * np.sin(theta) * np.cos(phi)
    ky = k * np.sin(theta) * np.sin(phi)
    kz = k * np.cos(theta)
    return A * jnp.exp(1j * (kx * X + ky * Y + kz * z0))


def gauss_beam(X, Y, wavelength, w0, r0=(0.0, 0.0), z0=0.0, A=1.0,
               theta=0.0, phi=0.0):
    """Gaussian beam evaluated a distance z0 from its waist."""
    wx, wy = (w0, w0) if np.isscalar(w0) else w0
    k = 2 * np.pi / wavelength
    zRx, zRy = np.pi * wx ** 2 / wavelength, np.pi * wy ** 2 / wavelength
    wxz = wx * np.sqrt(1 + (z0 / zRx) ** 2)
    wyz = wy * np.sqrt(1 + (z0 / zRy) ** 2)
    Rinv_x = z0 / (z0 ** 2 + zRx ** 2) if z0 != 0 else 0.0
    Rinv_y = z0 / (z0 ** 2 + zRy ** 2) if z0 != 0 else 0.0
    gouy = 0.5 * (np.arctan2(z0, zRx) + np.arctan2(z0, zRy))
    dx, dy = X - r0[0], Y - r0[1]
    u = (A * np.sqrt(wx * wy / (wxz * wyz))
         * jnp.exp(-dx ** 2 / wxz ** 2 - dy ** 2 / wyz ** 2)
         * jnp.exp(1j * (k * z0 - gouy
                         + k * (dx ** 2 * Rinv_x + dy ** 2 * Rinv_y) / 2)))
    if theta != 0.0:
        u = u * plane_wave(X, Y, wavelength, theta, phi)
    return u


def spherical_wave(X, Y, wavelength, r0=(0.0, 0.0), z0=-1.0, A=1.0,
                   radius=None, normalize=False):
    """Paraxial spherical wave from a point at (r0, z0)."""
    k = 2 * np.pi / wavelength
    R2 = (X - r0[0]) ** 2 + (Y - r0[1]) ** 2
    u = A / z0 * jnp.exp(-1j * jnp.sign(z0) * k * R2 / (2 * z0))
    if radius is not None:
        u = u * circle(X, Y, r0, radius)
    if normalize:
        u = u / jnp.max(jnp.abs(u))
    return u


def vortex_beam(X, Y, wavelength, w0, m, r0=(0.0, 0.0), A=1.0):
    dx, dy = X - r0[0], Y - r0[1]
    r = jnp.hypot(dx, dy)
    th = jnp.arctan2(dy, dx)
    return (A * (r / w0) ** abs(m) * jnp.exp(-r ** 2 / w0 ** 2)
            * jnp.exp(1j * m * th))


def _hermite(n, x):
    return jnp.asarray(np.polynomial.hermite.hermval(
        np.asarray(x), [0.0] * n + [1.0]))


def hermite_gauss_beam(X, Y, wavelength, w0, n, m, r0=(0.0, 0.0), A=1.0):
    """HG_nm mode at its waist."""
    dx, dy = (X - r0[0]) / w0, (Y - r0[1]) / w0
    return (A * _hermite(n, np.sqrt(2) * dx) * _hermite(m, np.sqrt(2) * dy)
            * jnp.exp(-dx ** 2 - dy ** 2)).astype(jnp.complex128)


def _laguerre(n, alpha, x):
    from scipy.special import genlaguerre
    c = genlaguerre(n, alpha)
    return jnp.asarray(np.polyval(c.coefficients, np.asarray(x)))


def laguerre_beam(X, Y, wavelength, w0, n, l, z=0.0, r0=(0.0, 0.0),
                  A=1.0):
    """LG_{n,l} mode (waist form; z only adds carrier phase here)."""
    dx, dy = X - r0[0], Y - r0[1]
    r2 = (dx ** 2 + dy ** 2) / w0 ** 2
    th = jnp.arctan2(dy, dx)
    return (A * (2 * r2) ** (abs(l) / 2) * _laguerre(n, abs(l), 2 * r2)
            * jnp.exp(-r2) * jnp.exp(1j * l * th)
            * np.exp(1j * 2 * np.pi / wavelength * z))


def bessel_beam(X, Y, wavelength, alpha, n=0, r0=(0.0, 0.0), A=1.0):
    """J_n Bessel beam with cone half-angle alpha."""
    k = 2 * np.pi / wavelength
    kr = k * np.sin(alpha)
    dx, dy = X - r0[0], Y - r0[1]
    r = np.hypot(np.asarray(dx), np.asarray(dy))
    th = jnp.arctan2(dy, dx)
    return A * jnp.asarray(jv(n, kr * r)) * jnp.exp(1j * n * th)


def _zernike_R(n, m, rho):
    m = abs(m)
    out = np.zeros_like(rho)
    for k in range((n - m) // 2 + 1):
        c = ((-1) ** k * math.factorial(n - k)
             / (math.factorial(k) * math.factorial((n + m) // 2 - k)
                * math.factorial((n - m) // 2 - k)))
        out = out + c * rho ** (n - 2 * k)
    return out


def zernike_beam(X, Y, radius, coeffs, r0=(0.0, 0.0), A=1.0):
    """Phase aberration exp(i sum_j c_j Z_{n_j}^{m_j}).

    coeffs : list of (n, m, c_nm)."""
    dx = np.asarray(X - r0[0]) / radius
    dy = np.asarray(Y - r0[1]) / radius
    rho = np.hypot(dx, dy)
    th = np.arctan2(dy, dx)
    W = np.zeros_like(rho)
    for (n, m, c) in coeffs:
        R = _zernike_R(n, m, rho)
        ang = np.cos(m * th) if m >= 0 else np.sin(-m * th)
        W = W + c * R * ang
    return A * jnp.exp(2j * np.pi * jnp.asarray(W)) * (rho <= 1.0)


# -------------------------------------------------------------------
# extended mask zoo (reference: pyqed/beam/scalar_masks_XY.py —
# ``triangle:446``, ``photon_sieve:474``, ``insert_array_masks:512``,
# ``dots:562``, ``dots_regular:586``, ``one_level:614``,
# ``two_levels:622``, ``edge_series:635``, ``slit_series:712``,
# ``square_circle:886``, ``angular_aperture:915``, ``rings:978``,
# ``lens_spherical:1099``, ``aspheric:1140``, ``axicon_binary:1275``,
# ``biprism_fresnel:1303``, ``hyperbolic_grating:1401``,
# ``archimedes_spiral:1493``, ``sine_edge_grating:1626``,
# ``grating_2D:1760``, ``grating_2D_chess:1792``, ``roughness:1825``,
# ``circle_rough:1842``, ``ring_rough:1862``,
# ``fresnel_lens_rough:1881``, ``super_ellipse:1908``,
# ``elliptical_phase:1956``, ``sinusoidal_slit:1974``,
# ``crossed_slits:2012``, ``hermite_gauss_binary:2054``,
# ``laguerre_gauss_binary:2078``; utilities ``area:115``,
# ``inverse_amplitude:137``, ``inverse_phase:144``, ``filter:152``,
# ``widen:178``, ``mask_from_function:241``, ``repeat_structure:349``,
# ``masks_to_positions:411``, ``extrude_mask_x:213``).
#
# Same design contract as above: pure functions of the meshgrids,
# returning complex transmissions. Stochastic masks take an explicit
# ``jax.random`` key (deterministic, reproducible — the reference uses
# global np.random state).
# -------------------------------------------------------------------

def triangle(X, Y, r0=None, slope=2.0, height=50.0, angle=0.0):
    """Isoceles triangle below y = -slope |x - x0| + y0, depth ``height``."""
    if r0 is None:
        r0 = (0.0, height / 2)
    x0, y0 = (r0, r0) if np.isscalar(r0) else r0
    Xr, Yr = _rot(X, Y, angle)
    top = -slope * jnp.abs(Xr - x0) + y0
    return ((Yr < top) & (Yr > y0 - height)).astype(jnp.complex128)


def super_ellipse(X, Y, r0, radius, n=(2, 2), angle=0.0):
    """|x/rx|^nx + |y/ry|^ny < 1 (n=2 circle, n=1 diamond, n>>1 square)."""
    nx, ny = (n, n) if np.isscalar(n) else n
    rx, ry = (radius, radius) if np.isscalar(radius) else radius
    Xr, Yr = _rot(X, Y, angle, r0)
    inside = jnp.abs(Xr / rx) ** nx + jnp.abs(Yr / ry) ** ny < 1
    return inside.astype(jnp.complex128)


def square_circle(X, Y, r0, R1, R2, s, angle=0.0):
    """Guasti circle/square interpolant: s=0 ellipse, s=1 square
    (J. Mod. Opt. 40, 1073 (1993))."""
    Xr, Yr = _rot(X, Y, angle, r0)
    F = jnp.sqrt(Xr ** 2 / R1 ** 2 + Yr ** 2 / R2 ** 2
                 - s ** 2 * Xr ** 2 * Yr ** 2 / (R1 ** 2 * R2 ** 2))
    box = (jnp.abs(Xr) < R1) & (jnp.abs(Yr) < R2)
    return ((F < 1) & box).astype(jnp.complex128)


def angular_aperture(X, Y, a_coef, b_coef=None, angle=0.0):
    """Radial aperture r < |sum_i a_i cos(n_i phi) + b_i sin(m_i phi)|."""
    Xr, Yr = _rot(X, Y, angle)
    r = jnp.hypot(Xr, Yr)
    phi = jnp.arctan2(Yr, Xr)
    a_coef = np.asarray(a_coef, dtype=float)
    sol = sum(a_coef[1][i] * jnp.cos(a_coef[0][i] * phi)
              for i in range(a_coef.shape[1]))
    if b_coef is not None:
        b_coef = np.asarray(b_coef, dtype=float)
        sol = sol + sum(b_coef[1][i] * jnp.sin(b_coef[0][i] * phi)
                        for i in range(b_coef.shape[1]))
    return (r < jnp.abs(sol)).astype(jnp.complex128)


def rings(X, Y, r0, inner_radius, outer_radius):
    """Union of concentric annuli inner_i < r < outer_i."""
    r = jnp.hypot(X - r0[0], Y - r0[1])
    u = jnp.zeros_like(r, dtype=bool)
    for ri, ro in zip(np.atleast_1d(inner_radius),
                      np.atleast_1d(outer_radius)):
        u = u | ((r >= ri) & (r < ro))
    return u.astype(jnp.complex128)


def edge_series(X, Y, r0, period, a_coef, b_coef=None, angle=0.0,
                invert=True):
    """Half-plane aperture bounded by the Fourier-series edge
    x < x0 + sum_i a_i cos(2 pi n_i y / T) + b_i sin(...)."""
    x0, y0 = r0
    Xr, Yr = _rot(X, Y, angle)
    a_coef = np.asarray(a_coef, dtype=float)
    edge = sum(a_coef[1][i] * jnp.cos(2 * np.pi * a_coef[0][i]
                                      * (Yr - y0) / period)
               for i in range(a_coef.shape[1]))
    if b_coef is not None:
        b_coef = np.asarray(b_coef, dtype=float)
        edge = edge + sum(b_coef[1][i] * jnp.sin(2 * np.pi * b_coef[0][i]
                                                 * (Yr - y0) / period)
                          for i in range(b_coef.shape[1]))
    on = Xr < x0 + edge
    if invert:
        on = ~on
    return on.astype(jnp.complex128)


def slit_series(X, Y, x0, width, period1, period2, Dy, a_coef1, a_coef2,
                b_coef1=None, b_coef2=None, angle=0.0):
    """Slit whose two borders are independent Fourier-series edges a
    distance ``width`` + Dy apart."""
    dy1, dy2 = (Dy, Dy) if np.isscalar(Dy) else Dy
    left = edge_series(X, Y, (x0 - width / 2, dy1), period1, a_coef1,
                       b_coef1, angle, invert=False)
    right = edge_series(X, Y, (x0 + width / 2, dy2), period2, a_coef2,
                        b_coef2, angle, invert=True)
    return ((jnp.abs(left) < 0.5) & (jnp.abs(right) < 0.5)
            ).astype(jnp.complex128)


def sinusoidal_slit(X, Y, size, x0, amplitude, phase, period, angle=0.0):
    """Slit with sinusoidally wavy borders."""
    a1, a2 = (amplitude, amplitude) if np.isscalar(amplitude) else amplitude
    p1, p2 = (period, period) if np.isscalar(period) else period
    Xr, Yr = _rot(X, Y, angle, (x0, 0.0))
    hi = +size / 2 + a1 * jnp.sin(2 * np.pi * Yr / p1)
    lo = -size / 2 + a2 * jnp.sin(2 * np.pi * Yr / p2 + phase)
    return ((Xr < hi) & (Xr > lo)).astype(jnp.complex128)


def crossed_slits(X, Y, r0, slope, angle=0.0):
    """Bow-tie aperture |y| > slope |x| (two crossed wedge slits)."""
    sx, sy = (slope, slope) if np.isscalar(slope) else slope
    x0, y0 = (r0, r0) if np.isscalar(r0) else r0
    Xr, Yr = _rot(X, Y, angle, (x0, y0))
    Y1 = sx * jnp.abs(Xr)
    Y2 = sy * jnp.abs(Xr)
    if sx > 0 and sy < 0:
        on = (Yr > Y1) | (Yr < Y2)
    elif sx < 0 and sy > 0:
        on = (Yr < Y1) | (Yr > Y2)
    elif sx < 0 and sy < 0:
        on = (Yr < Y1) | (Yr > -Y2)
    else:
        on = (Yr > Y1) | (Yr < -Y2)
    return on.astype(jnp.complex128)


def one_level(X, Y, level=0.0):
    return jnp.full(X.shape, level, dtype=jnp.complex128)


def two_levels(X, Y, level1=0.0, level2=1.0, x_edge=0.0, angle=0.0):
    """level1 for x < x_edge, level2 beyond (rotated by ``angle``)."""
    Xr, _ = _rot(X, Y, angle, (x_edge, 0.0))
    return jnp.where(Xr > 0, level2, level1).astype(jnp.complex128)


def grating_2D(X, Y, period, fill_factor=0.5, r0=(0.0, 0.0), amin=0.0,
               amax=1.0, phase=0.0, angle=0.0):
    """Product of two perpendicular binary gratings (2D array of
    openings); amplitude amin/amax plus optional phase modulation."""
    px, py = (period, period) if np.isscalar(period) else period
    tx = binary_grating(X, Y, px, r0[0], fill_factor, angle)
    ty = binary_grating(X, Y, py, r0[1], fill_factor,
                        angle + np.pi / 2)
    on = jnp.real(tx * ty)
    return (amin + (amax - amin) * on) * jnp.exp(1j * phase * on)


def grating_2D_chess(X, Y, period, fill_factor=0.5, r0=(0.0, 0.0),
                     amin=0.0, amax=1.0, phase=0.0, angle=0.0):
    """Checkerboard: XOR of the two perpendicular binary gratings."""
    px, py = (period, period) if np.isscalar(period) else period
    tx = jnp.real(binary_grating(X, Y, px, r0[0], fill_factor, angle)) > 0.5
    ty = jnp.real(binary_grating(X, Y, py, r0[1], fill_factor,
                                 angle + np.pi / 2)) > 0.5
    on = jnp.logical_xor(tx, ty).astype(jnp.float64)
    return (amin + (amax - amin) * on) * jnp.exp(1j * phase * on)


def lens_spherical(X, Y, wavelength, r0, radius, focal,
                   refraction_index=1.5, mask=True):
    """Exact (non-paraxial) spherical plano-convex lens phase:
    h = sqrt(R^2 - r^2) - R with R = (n - 1) f."""
    k = 2 * np.pi / wavelength
    R = (refraction_index - 1) * focal
    r2 = (X - r0[0]) ** 2 + (Y - r0[1]) ** 2
    h = jnp.where(R ** 2 > r2, jnp.sqrt(jnp.maximum(R ** 2 - r2, 0.0)) - R,
                  0.0)
    t = circle(X, Y, r0, radius) if mask else jnp.ones_like(X)
    return t * jnp.exp(1j * k * (refraction_index - 1) * h)


def aspheric(X, Y, wavelength, r0, c, k_conic, a, n0, n1, radius,
             mask=True):
    """Even-asphere sag phase plate:
    z(r) = c r^2 / (1 + sqrt(1 - (1+k) c^2 r^2)) + sum_i a_i r^(2i+4)."""
    s2 = (X - r0[0]) ** 2 + (Y - r0[1]) ** 2
    disc = jnp.maximum(1 - (1 + k_conic) * c ** 2 * s2, 0.0)
    sag = c * s2 / (1 + jnp.sqrt(disc))
    if a is not None:
        for i, ai in enumerate(np.atleast_1d(a)):
            sag = sag + ai * s2 ** (2 + i)
    t = circle(X, Y, r0, radius) if mask else jnp.ones_like(X)
    return t * jnp.exp(2j * np.pi * (n1 - n0) * sag / wavelength)


def elliptical_phase(X, Y, wavelength, f1, f2, angle=0.0):
    """Astigmatic (elliptical) lens phase with focals f1 (x) and f2 (y)."""
    k = 2 * np.pi / wavelength
    Xr, Yr = _rot(X, Y, angle)
    return jnp.exp(1j * k * (Xr ** 2 / (2 * f1) + Yr ** 2 / (2 * f2)))


def axicon_binary(X, Y, r0, radius, period):
    """Binary axicon: equally spaced rings cos(2 pi r / T) > 0."""
    r = jnp.hypot(X - r0[0], Y - r0[1])
    on = (jnp.cos(2 * np.pi * r / period) > 0) & (r < radius)
    return on.astype(jnp.complex128)


def biprism_fresnel(X, Y, wavelength, r0, width, height, n=1.5):
    """Fresnel biprism: tent-shaped glass profile of half-width
    ``width`` and apex height 2*``height``."""
    k = 2 * np.pi / wavelength
    h = jnp.maximum(2 * height - 2 * height / width
                    * jnp.abs(X - r0[0]), 0.0)
    t = (jnp.abs(X - r0[0]) < width).astype(jnp.complex128)
    return t * jnp.exp(1j * k * (n - 1) * h)


def hyperbolic_grating(X, Y, r0, period, radius, binary=True, angle=0.0):
    """Grating with hyperbolic iso-phase lines sqrt(|x^2 - y^2|)."""
    Xr, Yr = _rot(X, Y, angle, r0)
    r = jnp.hypot(X - r0[0], Y - r0[1])
    xh = jnp.sqrt(jnp.abs(Xr ** 2 - Yr ** 2))
    t = (1 + jnp.sin(2 * np.pi * xh / period)) / 2
    if binary:
        t = (t > 0.5).astype(jnp.float64)
    return (t * (r < radius)).astype(jnp.complex128)


def archimedes_spiral(X, Y, r0, period, phase, p, radius, binary=True):
    """Archimedean spiral zone structure of power ``p``."""
    r = jnp.hypot(X - r0[0], Y - r0[1])
    theta = jnp.arctan2(Y - r0[1], X - r0[0])
    t = 0.5 * (1 + jnp.sin(2 * np.pi * jnp.sign(X)
                           * ((r / period) ** p
                              + (theta - phase) / (2 * np.pi))))
    if binary:
        t = (t > 0.5).astype(jnp.float64)
    return (t * (r < radius)).astype(jnp.complex128)


def sine_edge_grating(X, Y, r0, period, lp, ap, phase, radius,
                      binary=True):
    """Linear grating whose groove edges wiggle sinusoidally along y
    (edge period lp, edge amplitude ap)."""
    r = jnp.hypot(X - r0[0], Y - r0[1])
    shift = phase + ap * jnp.sin(2 * np.pi * Y / lp)
    t = (1 + jnp.sin(2 * np.pi * (X - shift) / period)) / 2
    if binary:
        t = (t > 0.5).astype(jnp.float64)
    return (t * (r < radius)).astype(jnp.complex128)


def hermite_gauss_binary(X, Y, r0, w0, n, m):
    """Binary (0/pi) phase mask with the sign structure of HG_nm."""
    wx, wy = (w0, w0) if np.isscalar(w0) else w0
    E = (_hermite(n, np.sqrt(2) * (X - r0[0]) / wx)
         * _hermite(m, np.sqrt(2) * (Y - r0[1]) / wy))
    return jnp.exp(1j * np.pi * (E > 0))


def laguerre_gauss_binary(X, Y, r0, w0, n, l):
    """Binary phase mask with the sign structure of LG_nl plus the
    l-charge azimuthal phase."""
    rho2 = (X - r0[0]) ** 2 + (Y - r0[1]) ** 2
    th = jnp.arctan2(Y - r0[1], X - r0[0])
    E = _laguerre(n, abs(l), 2 * rho2 / w0 ** 2)
    return jnp.exp(1j * (np.pi * (E > 0) + l * th))


# -------------------------------------------------------------------
# stochastic (rough) masks — explicit PRNG keys
# -------------------------------------------------------------------

def roughness_surface(x, y, t, s, key):
    """Gaussian-correlated random height map h(x, y) (Ogilvy p.224):
    white noise filtered by exp(-x^2/tx^2 - y^2/ty^2), rescaled to
    std ``s``. Returns a REAL (nx, ny) array."""
    import jax
    tx, ty = (t, t) if np.isscalar(t) else t
    x = np.asarray(x); y = np.asarray(y)
    noise = jax.random.normal(key, (len(x), len(y)))
    xc = x - x[(len(x)) // 2]
    yc = y - y[(len(y)) // 2]
    kern = (np.exp(-xc ** 2 / tx ** 2)[:, None]
            * np.exp(-yc ** 2 / ty ** 2)[None, :])
    kern_f = jnp.fft.fft2(jnp.fft.ifftshift(jnp.asarray(kern)))
    h = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(noise) * kern_f))
    h = h - jnp.mean(h)
    return h * (s / jnp.std(h))


def circle_rough(X, Y, r0, radius, sigma, key):
    """Circle whose edge radius fluctuates by N(0, sigma) per pixel."""
    import jax
    dr = sigma * jax.random.normal(key, X.shape)
    inside = (X - r0[0]) ** 2 + (Y - r0[1]) ** 2 < (radius + dr) ** 2
    return inside.astype(jnp.complex128)


def ring_rough(X, Y, r0, radius1, radius2, sigma, key):
    """Annulus with rough inner and outer edges."""
    import jax
    k1, k2 = jax.random.split(key)
    inner = circle_rough(X, Y, r0, radius1, sigma, k1)
    outer = circle_rough(X, Y, r0, radius2, sigma, k2)
    return jnp.clip(jnp.real(outer) - jnp.real(inner), 0, 1
                    ).astype(jnp.complex128)


def fresnel_lens_rough(X, Y, wavelength, r0, radius, focal, sigma, key):
    """Fresnel zone plate assembled from rough-edged odd zones."""
    import jax
    num_rings = int(round((radius ** 2) / (wavelength * focal)))
    keys = jax.random.split(key, num_rings + 2)
    u = jnp.real(circle_rough(X, Y, r0, np.sqrt(wavelength * focal),
                              sigma, keys[0]))
    for j, m in enumerate(range(3, num_rings + 2, 2)):
        ri = np.sqrt((m - 1) * wavelength * focal)
        ro = np.sqrt(m * wavelength * focal)
        u = u + jnp.real(ring_rough(X, Y, r0, ri, ro, sigma, keys[j + 1]))
    return jnp.clip(u, 0, 1).astype(jnp.complex128)


# -------------------------------------------------------------------
# placement / composition utilities
# -------------------------------------------------------------------

def _nearest_idx(grid, vals):
    grid = np.asarray(grid)
    vals = np.atleast_1d(np.asarray(vals, dtype=float))
    return np.clip(np.round((vals - grid[0]) / (grid[1] - grid[0])
                            ).astype(int), 0, len(grid) - 1)


def dots(x, y, r0):
    """Delta masks: 1 at the grid pixels nearest each (x0_i, y0_i)."""
    ix = _nearest_idx(x, r0[0])
    iy = _nearest_idx(y, r0[1])
    u = np.zeros((len(x), len(y)), dtype=complex)
    u[ix, iy] = 1.0
    return jnp.asarray(u)


def dots_regular(x, y, xlim, ylim, num_data):
    """Regular nx x ny lattice of delta pixels."""
    nx, ny = num_data
    xs = np.linspace(xlim[0], xlim[1], nx)
    ys = np.linspace(ylim[0], ylim[1], ny)
    iX, iY = np.meshgrid(_nearest_idx(x, xs), _nearest_idx(y, ys),
                         indexing="ij")
    u = np.zeros((len(x), len(y)), dtype=complex)
    u[iX, iY] = 1.0
    return jnp.asarray(u)


def prism(X, Y, wavelength, r0, angle_wedge, angle=0.0):
    """Wedge phase ramp deflecting by angle_wedge
    (reference: scalar_masks_XY.py:1043)."""
    k = 2 * np.pi / wavelength
    Xr, _ = _rot(X, Y, angle, r0)
    return jnp.exp(1j * k * Xr * jnp.sin(angle_wedge))


def ronchi_grating(X, Y, period, x0=0.0, fill_factor=0.5, angle=0.0):
    """Binary amplitude grating thresholded from a sinusoid, so the
    fill factor is exact: on where sin phase > cos(pi*fill)
    (reference: scalar_masks_XY.py:1654)."""
    y0 = np.cos(np.pi * fill_factor)
    s = sine_grating(X, Y, period, x0=x0, amp_min=-1.0, amp_max=1.0,
                     angle=angle)
    return (jnp.real(s) > y0).astype(jnp.complex128)


def hammer(X, Y, r0, size, hammer_width, angle=0.0):
    """Rectangle with hammer-head squares on its four corners
    (lithography proximity-correction motif;
    reference: scalar_masks_XY.py:1437)."""
    sx, sy = (size, size) if np.isscalar(size) else size
    x0, y0 = r0
    u = square(X, Y, r0, size, angle)
    c, s = np.cos(angle), np.sin(angle)
    for ex, ey in ((-sx / 2, -sy / 2), (-sx / 2, sy / 2),
                   (sx / 2, -sy / 2), (sx / 2, sy / 2)):
        cx = x0 + ex * c - ey * s        # rotate corner offsets with
        cy = y0 + ex * s + ey * c        # the rectangle
        u = u + square(X, Y, (cx, cy),
                       (hammer_width, hammer_width), angle)
    return (jnp.real(u) > 0).astype(jnp.complex128)


def photon_sieve(x, y, t_u, pos):
    """Photon sieve: stamp the pinhole shape ``t_u`` at every (x, y)
    position in ``pos``, clipping the summed overlaps to 1
    (reference: scalar_masks_XY.py:474 — fftconvolve of a delta comb
    with the pinhole; same FFT stamping here). Returns
    (mask, num_points_inside)."""
    x = np.asarray(x)
    y = np.asarray(y)
    comb = np.zeros((len(x), len(y)))
    npts = 0
    for (px, py) in np.atleast_2d(np.asarray(pos, dtype=float)):
        if x[0] < px < x[-1] and y[0] < py < y[-1]:
            comb[_nearest_idx(x, px), _nearest_idx(y, py)] = 1.0
            npts += 1
    u = jnp.real(_fft_convolve2d(comb, t_u))
    return jnp.clip(u, 0.0, 1.0).astype(jnp.complex128), npts


def _fft_convolve2d(a, b):
    """Cyclic 'same'-centered FFT convolution (both arrays same shape)."""
    fa = jnp.fft.fft2(jnp.asarray(a))
    fb = jnp.fft.fft2(jnp.fft.ifftshift(jnp.asarray(b)))
    return jnp.fft.ifft2(fa * fb)


def masks_to_positions(x, y, t_u, pos, binarize=False, normalize=False):
    """Stamp the mask ``t_u`` at every position in ``pos`` via FFT
    convolution with a delta comb (reference ``masks_to_positions:411``,
    ``photon_sieve:474`` — both are this convolution)."""
    comb = dots(x, y, pos)
    f1 = jnp.asarray(t_u)
    if normalize:
        f1 = f1 / jnp.sum(f1)
    out = jnp.real(_fft_convolve2d(comb, f1))
    if binarize is not False:
        out = (out > binarize).astype(jnp.float64)
    else:
        out = jnp.clip(out, 0, 1)
    return out.astype(jnp.complex128)




def insert_array_masks(x, y, t_u, space, margin=0.0):
    """Tile copies of ``t_u`` on a rectangular lattice of pitch
    ``space`` covering the aperture (minus ``margin``)."""
    sx, sy = (space, space) if np.isscalar(space) else space
    mx, my = (margin, margin) if np.isscalar(margin) else margin
    x = np.asarray(x); y = np.asarray(y)
    xs = np.arange(x[0] + mx + sx / 2, x[-1] - mx, sx)
    ys = np.arange(y[0] + my + sy / 2, y[-1] - my, sy)
    XX, YY = np.meshgrid(xs, ys, indexing="ij")
    return masks_to_positions(x, y, t_u, (XX.ravel(), YY.ravel()),
                              binarize=0.5)


def widen(x, y, u, radius, binarize=True):
    """Morphological widening: convolve |u| with a disc of ``radius``
    centered at the grid pixel nearest the domain center (so the
    stamped structure does not shift)."""
    X, Y = jnp.meshgrid(jnp.asarray(x), jnp.asarray(y), indexing="ij")
    xc = np.asarray(x)[_nearest_idx(x, (x[0] + x[-1]) / 2)[0]]
    yc = np.asarray(y)[_nearest_idx(y, (y[0] + y[-1]) / 2)[0]]
    disc = jnp.real(circle(X, Y, (xc, yc), radius))
    disc = disc / jnp.sum(disc)
    out = jnp.real(_fft_convolve2d(jnp.abs(jnp.asarray(u)), disc))
    if binarize:
        out = (out > 0.01 * jnp.max(out)).astype(jnp.float64)
    else:
        out = out / jnp.max(out)
    return out.astype(jnp.complex128)


def filter_mask(x, y, u, kernel_u, binarize=False, normalize=False):
    """Convolve |u| with |kernel_u| (the reference's ``filter:152``)."""
    f1 = jnp.abs(jnp.asarray(kernel_u))
    if normalize:
        f1 = f1 / jnp.sum(f1)
    out = jnp.real(_fft_convolve2d(jnp.abs(jnp.asarray(u)), f1))
    if binarize is not False:
        out = (out > binarize).astype(jnp.float64)
    return out.astype(jnp.complex128)


def area(u, dx, dy, percentage=0.001):
    """Area (grid units^2) where intensity exceeds ``percentage`` of max."""
    inten = jnp.abs(jnp.asarray(u)) ** 2
    return float(jnp.sum(inten > percentage * jnp.max(inten)) * dx * dy)


def inverse_amplitude(u):
    """amplitude -> 1 - amplitude, phase kept."""
    u = jnp.asarray(u)
    return (1 - jnp.abs(u)) * jnp.exp(1j * jnp.angle(u))


def inverse_phase(u):
    """phase -> -phase, amplitude kept."""
    u = jnp.asarray(u)
    return jnp.abs(u) * jnp.exp(-1j * jnp.angle(u))


def mask_from_function(X, Y, wavelength, r0, index, f1, f2, radius,
                       mask=True):
    """Phase mask between two surfaces h = f2(X, Y) - f1(X, Y)
    (reference ``mask_from_function:241`` evaluates f1/f2 with eval();
    here they are plain callables — jit/vmap-friendly and safe)."""
    k = 2 * np.pi / wavelength
    h = f2(X, Y) - f1(X, Y)
    t = circle(X, Y, r0, radius) if mask else jnp.ones_like(X)
    return t * jnp.exp(1j * k * (index - 1) * h)


def extrude_mask_x(x, y, u_1d, y0=None, y1=None):
    """Extrude a 1D mask u(x) along y between y0 and y1."""
    y = np.asarray(y)
    y0 = y[0] if y0 is None else y0
    y1 = y[-1] if y1 is None else y1
    band = ((y >= y0) & (y <= y1)).astype(float)
    return jnp.asarray(u_1d)[:, None] * jnp.asarray(band)[None, :]


def repeat_structure(x, y, u, num_repetitions, position="center"):
    """Tile the mask nrep times; returns (x_new, y_new, u_new)."""
    nx_rep, ny_rep = num_repetitions
    u_new = jnp.tile(jnp.asarray(u), (nx_rep, ny_rep))
    x = np.asarray(x); y = np.asarray(y)
    x_new = np.linspace(nx_rep * x[0], nx_rep * x[-1], nx_rep * len(x))
    y_new = np.linspace(ny_rep * y[0], ny_rep * y[-1], ny_rep * len(y))
    if position == "center":
        x_new = x_new - (x_new[0] + x_new[-1]) / 2
        y_new = y_new - (y_new[0] + y_new[-1]) / 2
    elif position == "previous":
        x_new = x_new - x_new[0] + x[0]
        y_new = y_new - y_new[0] + y[0]
    return x_new, y_new, u_new


def image_mask(x, y, filename, invert=False):
    """Grey-level amplitude mask from an image file (reference
    ``image:~269``); resampled to the (x, y) grid."""
    import matplotlib.image as mpimg
    img = mpimg.imread(filename)
    if img.ndim == 3:
        img = img[..., :3].mean(axis=-1)
    img = np.asarray(img, dtype=float)
    img = img / (img.max() if img.max() > 0 else 1.0)
    if invert:
        img = 1 - img
    # resample rows->y, cols->x onto the target grid
    from scipy.ndimage import zoom
    zx = len(x) / img.shape[1]
    zy = len(y) / img.shape[0]
    img = zoom(img, (zy, zx), order=1)[:len(y), :len(x)]
    return jnp.asarray(img.T, dtype=complex)


# -------------------------------------------------------------------
# multi-beam sources (reference: pyqed/beam/scalar_sources_XY.py —
# ``plane_waves_dict:385``, ``plane_waves_several_inclined:405``,
# ``gauss_beams_several_parallel:428``,
# ``gauss_beams_several_inclined:469``)
# -------------------------------------------------------------------

def plane_waves_dict(X, Y, wavelength, params):
    """Sum of plane waves, each a dict with A/theta/phi/z0."""
    u = jnp.zeros_like(X, dtype=jnp.complex128)
    for p in params:
        u = u + plane_wave(X, Y, wavelength, p.get("theta", 0.0),
                           p.get("phi", 0.0), p.get("A", 1.0),
                           p.get("z0", 0.0))
    return u


def plane_waves_several_inclined(X, Y, wavelength, A, num_beams,
                                 max_angle, z0=0.0):
    """Fan of equally spaced inclined plane waves."""
    nbx, nby = num_beams
    max_x, max_y = max_angle
    u = jnp.zeros_like(X, dtype=jnp.complex128)
    for i in range(nbx):
        for j in range(nby):
            th = -max_x / 2 + max_x / nbx * (i + 0.5)
            ph = -max_y / 2 + max_y / nby * (j + 0.5)
            u = u + plane_wave(X, Y, wavelength, th, ph, A, z0)
    return u


def gauss_beams_several_parallel(X, Y, wavelength, r0, A, num_beams, w0,
                                 r_range, z0=0.0, theta=0.0, phi=0.0):
    """Rectangular array of parallel Gaussian beams."""
    nbx, nby = num_beams
    xr, yr = r_range
    xc, yc = r0
    u = jnp.zeros_like(X, dtype=jnp.complex128)
    for i in range(nbx):
        xi = xc - xr / 2 + xr / nbx * (i + 0.5)
        for j in range(nby):
            yj = yc - yr / 2 + yr / nby * (j + 0.5)
            u = u + gauss_beam(X, Y, wavelength, w0, (xi, yj), z0, A,
                               theta, phi)
    return u


def gauss_beams_several_inclined(X, Y, wavelength, A, num_beams, w0, r0,
                                 max_angle, z0=0.0):
    """Fan of inclined Gaussian beams sharing one origin."""
    nbx, nby = num_beams
    max_x, max_y = max_angle
    u = jnp.zeros_like(X, dtype=jnp.complex128)
    for i in range(nbx):
        for j in range(nby):
            th = -max_x / 2 + max_x / nbx * (i + 0.5)
            ph = -max_y / 2 + max_y / nby * (j + 0.5)
            u = u + gauss_beam(X, Y, wavelength, w0, r0, z0, A, th, ph)
    return u


def set_amplitude(u, amplitude):
    """Replace |u| keeping the phase (reference:
    pyqed/beam/scalar_masks_XY.py ``set_amplitude``)."""
    u = jnp.asarray(u)
    ph = jnp.where(jnp.abs(u) > 0, u / jnp.maximum(jnp.abs(u), 1e-300),
                   1.0)
    return jnp.asarray(amplitude) * ph


def set_phase(u, phase):
    """Replace the phase keeping |u| (reference: scalar_masks_XY.py
    ``set_phase``)."""
    return jnp.abs(jnp.asarray(u)) * jnp.exp(1j * jnp.asarray(phase))
