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
