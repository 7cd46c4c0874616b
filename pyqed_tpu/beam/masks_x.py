"""1D (line) masks and sources for ``ScalarFieldX``.

TPU-native counterpart of the reference's ``Scalar_mask_X`` /
``Scalar_source_X`` (reference: pyqed/beam/scalar_masks_X.py —
``slit:146``, ``double_slit``, ``two_levels``, ``gray_scale:240``,
``prism:260``, ``biprism_fresnel:280``, ``biprism_fresnel_nh:314``,
``lens``, ``lens_spherical``, ``aspheric``, ``fresnel_lens``,
``roughness``, ``dust:~420``, ``dust_different_sizes``,
``sine_grating``, ``ronchi_grating``, ``binary_grating``,
``blazed_grating``, ``chirped_grating_p``, ``chirped_grating_q``,
``chirped_grating``, ``binary_code_positions``, ``binary_code``;
pyqed/beam/scalar_sources_X.py).

Same contract as :mod:`pyqed_tpu.beam.masks`: every mask/source is a
PURE function of the coordinate array ``x`` returning a complex
transmission/field vector.  2D masks that are separable along x are
reused through :func:`from_xy` rather than re-implemented.  Stochastic
masks take an explicit ``jax.random`` key.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import masks as _mk2


# ------------------------------------------------------------------
# adapter: evaluate any (X, Y) mask on the y = 0 line
# ------------------------------------------------------------------

def from_xy(mask_fn, x, *args, **kwargs):
    """Evaluate a 2D mask from :mod:`pyqed_tpu.beam.masks` on the
    y = 0 line -> (nx,) profile."""
    X = jnp.asarray(x)[:, None]
    Y = jnp.zeros_like(X)
    return mask_fn(X, Y, *args, **kwargs)[:, 0]


# thin separable reuses (all pinned through the 2D implementations)
def slit(x, x0, size):
    return from_xy(_mk2.slit, x, x0, size)


def double_slit(x, x0, size, separation):
    return from_xy(_mk2.double_slit, x, x0, size, separation)


def two_levels(x, level1=0.0, level2=1.0, x_edge=0.0):
    return jnp.where(jnp.asarray(x) > x_edge, level2, level1
                     ).astype(jnp.complex128)


def sine_grating(x, period, x0=0.0, amp_min=0.0, amp_max=1.0):
    return from_xy(_mk2.sine_grating, x, period, x0, amp_min, amp_max)


def binary_grating(x, period, x0=0.0, fill_factor=0.5, kind="amplitude",
                   phase=np.pi):
    return from_xy(_mk2.binary_grating, x, period, x0, fill_factor, 0.0,
                   kind, phase)


ronchi_grating = binary_grating     # fill_factor = 0.5 default


def blazed_grating(x, period, wavelength):
    return from_xy(_mk2.blazed_grating, x, period, wavelength)


def lens(x, wavelength, focal, x0=0.0, radius=None):
    k = 2 * np.pi / wavelength
    ph = jnp.exp(-1j * k * (jnp.asarray(x) - x0) ** 2 / (2 * focal))
    if radius is not None:
        ph = ph * (jnp.abs(jnp.asarray(x) - x0) < radius)
    return ph


def lens_spherical(x, wavelength, x0, radius, focal,
                   refraction_index=1.5):
    return from_xy(_mk2.lens_spherical, x, wavelength, (x0, 0.0), radius,
                   focal, refraction_index)


def aspheric(x, wavelength, x0, c, k_conic, a, n0, n1, radius):
    return from_xy(_mk2.aspheric, x, wavelength, (x0, 0.0), c, k_conic,
                   a, n0, n1, radius)


def fresnel_lens(x, wavelength, focal, x0=0.0, radius=None,
                 kind="phase", phase=np.pi):
    return from_xy(_mk2.fresnel_lens, x, wavelength, focal, (x0, 0.0),
                   radius, kind, phase)


def gray_scale(x, num_levels, level_min=0.0, level_max=1.0):
    """Staircase of ``num_levels`` equal-width amplitude levels."""
    x = jnp.asarray(x)
    frac = (x - x[0]) / (x[-1] - x[0]) * (1 - 1e-12)
    idx = jnp.floor(frac * num_levels)
    levels = jnp.linspace(level_min, level_max, num_levels)
    return levels[idx.astype(int)].astype(jnp.complex128)


def prism(x, wavelength, x0, n, anglex):
    """Linear phase ramp of a thin prism h = (x - x0) sin(anglex)."""
    k = 2 * np.pi / wavelength
    return jnp.exp(1j * k * (n - 1) * (jnp.asarray(x) - x0)
                   * np.sin(anglex))


def biprism_fresnel(x, wavelength, x0, width, height, n=1.5):
    """Tent-profile Fresnel biprism (reference
    ``biprism_fresnel_nh:314``)."""
    return from_xy(_mk2.biprism_fresnel, x, wavelength, (x0, 0.0), width,
                   height, n)


# ------------------------------------------------------------------
# chirped gratings (reference ``chirped_grating_p/q``)
# ------------------------------------------------------------------

def _grating_kinds(t, kind, amp_min, amp_max, phase_max):
    t = amp_min + (amp_max - amp_min) * t
    if kind.endswith("binary"):
        t = (t > (amp_min + amp_max) / 2).astype(jnp.float64)
    if kind.startswith("phase"):
        return jnp.exp(1j * phase_max * t)
    return t.astype(jnp.complex128)


def chirped_grating_p(x, kind, p0, p1, amp_min=0.0, amp_max=1.0,
                      phase_max=np.pi, x0=None):
    """Grating with LINEAR period variation p(x) = p0 + pa (x - x0):
    accumulated phase = 2 pi ln(p(x)) / pa (the exact integral of
    2 pi / p(x))."""
    x = jnp.asarray(x)
    x0 = float(np.asarray(x)[0]) if x0 is None else x0
    size = float(x[-1] - x[0])
    pa = (p1 - p0) / size
    if abs(pa) < 1e-15:
        phi = 2 * np.pi * (x - x0) / p0
    else:
        phi = 2 * np.pi * jnp.log(p0 + pa * (x - x0)) / pa
    t = (1 + jnp.cos(phi)) / 2
    return _grating_kinds(t, kind, amp_min, amp_max, phase_max)


def chirped_grating_q(x, kind, p0, p1, amp_min=0.0, amp_max=1.0,
                      phase_max=np.pi, x0=None):
    """Grating with LINEAR spatial-frequency variation
    q(x) = q0 + qa (x - x0), q = 2 pi / p: phase =
    (q0 + qa (x - x0)/2)(x - x0) — instantaneous frequency q(x)."""
    x = jnp.asarray(x)
    x0 = float(np.asarray(x)[0]) if x0 is None else x0
    size = float(x[-1] - x[0])
    q0, q1 = 2 * np.pi / p0, 2 * np.pi / p1
    qa = (q1 - q0) / size
    phi = (q0 + 0.5 * qa * (x - x0)) * (x - x0)
    t = (1 + jnp.cos(phi)) / 2
    return _grating_kinds(t, kind, amp_min, amp_max, phase_max)


def chirped_grating(x, kind, p_fn, amp_min=0.0, amp_max=1.0,
                    phase_max=np.pi, x0=None):
    """Grating with an ARBITRARY local period p(x) given as a callable
    (reference ``chirped_grating`` takes an eval string): the phase is
    the cumulative integral of 2 pi / p(x) on the grid."""
    x = jnp.asarray(x)
    x0 = float(np.asarray(x)[0]) if x0 is None else x0
    dx = x[1] - x[0]
    q = 2 * np.pi / p_fn(x)
    phi = jnp.cumsum(q) * dx
    phi = phi - phi[0]
    t = (1 + jnp.cos(phi)) / 2
    return _grating_kinds(t, kind, amp_min, amp_max, phase_max)


# ------------------------------------------------------------------
# stochastic masks
# ------------------------------------------------------------------

def roughness(x, t, s, key):
    """Gaussian-correlated rough phase edge heights (1D Ogilvy)."""
    import jax
    x = np.asarray(x)
    noise = jax.random.normal(key, (len(x),))
    xc = x - x[len(x) // 2]
    kern = jnp.asarray(np.exp(-xc ** 2 / t ** 2))
    kf = jnp.fft.fft(jnp.fft.ifftshift(kern))
    h = jnp.real(jnp.fft.ifft(jnp.fft.fft(noise) * kf))
    h = h - jnp.mean(h)
    return h * (s / jnp.std(h))


def dust(x, percentage, size, key, std=0.0):
    """Opaque dust particles of mean ``size`` blocking ``percentage``
    of the line; returns (mask, positions, sizes). Deterministic under
    ``key`` (reference uses global np.random)."""
    import jax
    x = np.asarray(x)
    total = x[-1] - x[0]
    num = int(percentage * total / size)
    if percentage > 0.5:
        num = int(num * (1 + np.sqrt(percentage)))
    kp, ks = jax.random.split(key)
    positions = x[0] + total * np.asarray(
        jax.random.uniform(kp, (num,)))
    sizes = size + std * np.asarray(jax.random.normal(ks, (num,)))
    sizes[sizes < 0] = size
    xg = jnp.asarray(x)
    block = jnp.zeros(len(x), dtype=bool)
    for p, s in zip(positions, sizes):
        block = block | (jnp.abs(xg - p) < s / 2)
    return (~block).astype(jnp.complex128), positions, sizes


def dust_different_sizes(x, percentage, size, key, std=None):
    """Alias with the reference's name; std defaults to size/4."""
    return dust(x, percentage, size, key,
                std=(size / 4 if std is None else std))


# ------------------------------------------------------------------
# binary codes
# ------------------------------------------------------------------

def binary_code_positions(x, x_transitions, start="down"):
    """Binary code flipping at each transition position."""
    x = jnp.asarray(x)
    xt = np.unique(np.asarray(x_transitions, dtype=float))
    t = jnp.zeros(len(x))
    for x0 in xt:
        t = t + (x >= x0)
    t = jnp.mod(t, 2)
    if start == "up":
        t = 1 - t
    return t.astype(jnp.complex128)


def binary_code(x, code, bit_width, x0=0.0, kind="standard"):
    """Bar code: bit j occupies [x0 + j w, x0 + (j+1) w).
    kind='abs_fag' interleaves each bit as (0, 1, bit, 1) quarter-width
    cells (absolute-encoder pattern, reference ``binary_code``)."""
    code = np.asarray(code, dtype=float)
    if kind == "abs_fag":
        zeros = np.zeros_like(code)
        ones = np.ones_like(code)
        code = np.stack([zeros, ones, code, ones], 1).reshape(-1)
        bit_width = bit_width / 4
    x = jnp.asarray(x)
    j = jnp.floor((x - x0) / bit_width).astype(int)
    inside = (j >= 0) & (j < len(code))
    vals = jnp.asarray(np.concatenate([code, [0.0]]))
    return (jnp.where(inside, vals[jnp.clip(j, 0, len(code))], 0.0)
            ).astype(jnp.complex128)


# ------------------------------------------------------------------
# sources (reference: pyqed/beam/scalar_sources_X.py)
# ------------------------------------------------------------------

def plane_wave(x, wavelength, theta=0.0, A=1.0, z0=0.0):
    k = 2 * np.pi / wavelength
    return A * jnp.exp(1j * k * (jnp.asarray(x) * np.sin(theta)
                                 + z0 * np.cos(theta)))


def gauss_beam(x, wavelength, w0, x0=0.0, z0=0.0, A=1.0, theta=0.0):
    return from_xy(_mk2.gauss_beam, x, wavelength, w0, (x0, 0.0), z0, A,
                   theta, 0.0)


def spherical_wave(x, wavelength, x0=0.0, z0=-1000.0, A=1.0):
    """Cylindrical (line-source) wave observed at z = 0 from (x0, z0)."""
    k = 2 * np.pi / wavelength
    R = jnp.sqrt((jnp.asarray(x) - x0) ** 2 + z0 ** 2)
    return A * jnp.exp(1j * jnp.sign(-z0) * k * R) / jnp.sqrt(R)


def plane_waves_dict(x, wavelength, params):
    u = jnp.zeros(len(np.asarray(x)), dtype=jnp.complex128)
    for p in params:
        u = u + plane_wave(x, wavelength, p.get("theta", 0.0),
                           p.get("A", 1.0), p.get("z0", 0.0))
    return u


def plane_waves_several_inclined(x, wavelength, A, num_beams, max_angle,
                                 z0=0.0):
    u = jnp.zeros(len(np.asarray(x)), dtype=jnp.complex128)
    for i in range(num_beams):
        th = -max_angle / 2 + max_angle / num_beams * (i + 0.5)
        u = u + plane_wave(x, wavelength, th, A, z0)
    return u


def gauss_beams_several_parallel(x, wavelength, A, num_beams, w0,
                                 x_central, x_range, z0=0.0):
    u = jnp.zeros(len(np.asarray(x)), dtype=jnp.complex128)
    for i in range(num_beams):
        xi = x_central - x_range / 2 + x_range / num_beams * (i + 0.5)
        u = u + gauss_beam(x, wavelength, w0, xi, z0, A)
    return u


def gauss_beams_several_inclined(x, wavelength, A, num_beams, w0, x0,
                                 max_angle, z0=0.0):
    u = jnp.zeros(len(np.asarray(x)), dtype=jnp.complex128)
    for i in range(num_beams):
        th = -max_angle / 2 + max_angle / num_beams * (i + 0.5)
        u = u + gauss_beam(x, wavelength, w0, x0, z0, A, th)
    return u


def dots(x, positions):
    """Delta-like transparent dots at the given positions (reference:
    pyqed/beam/scalar_masks_X.py ``dots``)."""
    x = np.asarray(x)
    u = np.zeros(len(x))
    for xi in np.atleast_1d(positions):
        u[int(np.argmin(np.abs(x - xi)))] = 1.0
    return jnp.asarray(u, dtype=complex)


def mask_from_function(x, f):
    """Amplitude mask from a callable t(x) (reference:
    scalar_masks_X.py ``mask_from_function`` — eval strings there)."""
    return jnp.asarray(f(jnp.asarray(x)), dtype=complex)


def mask_from_array(x, x_data, t_data):
    """Amplitude mask interpolated from sampled data (reference:
    scalar_masks_X.py ``mask_from_array``)."""
    return jnp.asarray(np.interp(np.asarray(x), np.asarray(x_data),
                                 np.asarray(t_data)), dtype=complex)


def filter_mask(x, u, kernel_width):
    """Low-pass the mask with a normalized Gaussian kernel (reference:
    scalar_masks_X.py ``filter``)."""
    x = np.asarray(x)
    dx = x[1] - x[0]
    k = np.exp(-((x - x.mean()) ** 2) / (2 * kernel_width ** 2))
    k /= k.sum()
    u = jnp.asarray(u)
    return jnp.asarray(np.convolve(np.asarray(u), k, mode="same"))
