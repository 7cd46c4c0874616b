"""Field post-processing and analysis utilities for the beam layer.

TPU-native counterparts of the vendored-diffractio field utilities the
round-3 inventory left open (reference: pyqed/beam/scalar_fields_XY.py
``binarize``/``discretize``/``get_edges``/``search_focus``/``profile``/
``rotate``/``insert_mask``; pyqed/beam/scalar_fields_XZ.py
``surface_detection``/``detect_index_variations``).  All array math is
jnp; the only host work is coordinate bookkeeping.

Every function is pure (field arrays in, arrays out); the
``ScalarFieldXY``/``ScalarFieldXZ`` classes in :mod:`.beam` expose them
as thin methods.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


# ------------------------------------------------------------------
# amplitude / phase decomposition (reference: scalar_fields_XY.py
# ``get_amplitude``/``get_phase``/``remove_phase``)
# ------------------------------------------------------------------

def get_amplitude(u):
    """|u| as a real array."""
    return jnp.abs(u)


def get_phase(u, keep_amplitude=False):
    """arg(u); with ``keep_amplitude`` returns |u|·e^{i arg u} (the
    reference's get_phase(matrix=False) field form)."""
    ph = jnp.angle(u)
    return jnp.abs(u) * jnp.exp(1j * ph) if keep_amplitude else ph


def remove_phase(u, sign=False):
    """Strip the phase, keeping amplitude; with ``sign`` the amplitude
    keeps the cos-sign of the phase (reference ``remove_phase``)."""
    a = jnp.abs(u)
    if sign:
        a = a * jnp.sign(jnp.cos(jnp.angle(u)))
    return a.astype(complex)


# ------------------------------------------------------------------
# binarize / discretize (reference: scalar_fields_XY.py:binarize,
# :discretize — litography post-processing of masks)
# ------------------------------------------------------------------

def binarize(u, kind="amplitude", bin_level=None, level0=None,
             level1=None):
    """Two-level quantization.

    kind='amplitude': |u| <= bin_level -> level0 else level1 (phase
    kept).  kind='phase': phase <= bin_level -> level0 else level1
    (amplitude kept).  Defaults: bin_level = mean, levels = min/max.
    """
    amp = jnp.abs(u)
    ph = jnp.angle(u)
    t = amp if kind == "amplitude" else ph
    if bin_level is None:
        bin_level = jnp.mean(t)
    lo = jnp.min(t) if level0 is None else level0
    hi = jnp.max(t) if level1 is None else level1
    q = jnp.where(t <= bin_level, lo, hi)
    if kind == "amplitude":
        return q * jnp.exp(1j * ph)
    return amp * jnp.exp(1j * q)


def discretize(u, kind="amplitude", num_levels=2, phase0=-np.pi):
    """N-level quantization (nearest level).

    kind='amplitude': |u| snapped to ``num_levels`` uniform levels on
    [min, max].  kind='phase': phase snapped to ``num_levels`` uniform
    levels on [phase0, phase0 + 2*pi) (reference: scalar_fields_XY.py
    ``discretize`` with factor=1).
    """
    amp = jnp.abs(u)
    ph = jnp.angle(u)
    if kind == "amplitude":
        lo, hi = jnp.min(amp), jnp.max(amp)
        span = jnp.where(hi > lo, hi - lo, 1.0)
        idx = jnp.round((amp - lo) / span * (num_levels - 1))
        q = lo + idx * span / (num_levels - 1)
        return q * jnp.exp(1j * ph)
    # phase: wrap into [phase0, phase0 + 2 pi), snap to level centers
    w = jnp.mod(ph - phase0, 2 * np.pi)
    step = 2 * np.pi / num_levels
    q = phase0 + (jnp.floor(w / step) + 0.5) * step
    return amp * jnp.exp(1j * q)


# ------------------------------------------------------------------
# edges of binary masks (reference: scalar_fields_X.py/XY ``get_edges``
# — litography engraving of gratings)
# ------------------------------------------------------------------

def get_edges(x, u, kind_transition="amplitude", min_step=0.0):
    """Edge locations of a (quasi-)binary 1D transmission.

    Returns ``(pos_transitions, type_transitions, raising, falling)``:
    x positions of every |step| > min_step, the sign of each step, and
    the raising/falling subsets (reference: utils_optics.get_edges).
    """
    x = np.asarray(x)
    t = np.abs(np.asarray(u)) if kind_transition == "amplitude" \
        else np.angle(np.asarray(u))
    d = np.diff(t)
    if min_step <= 0:
        min_step = 0.5 * (np.max(np.abs(d)) if np.any(d) else 1.0)
    idx = np.nonzero(np.abs(d) > min_step)[0]
    pos = 0.5 * (x[idx] + x[idx + 1])
    typ = np.sign(d[idx])
    return pos, typ, pos[typ > 0], pos[typ < 0]


# ------------------------------------------------------------------
# focus search (reference: scalar_fields_XY.py:search_focus)
# ------------------------------------------------------------------

def search_focus(x, y, u, kind="maximum"):
    """(x0, y0) of the intensity maximum ('maximum') or intensity
    centroid ('moments')."""
    I = jnp.abs(jnp.asarray(u)) ** 2
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if kind == "maximum":
        ix, iy = jnp.unravel_index(jnp.argmax(I), I.shape)
        return x[ix], y[iy]
    W = jnp.sum(I)
    return (jnp.sum(I * x[:, None]) / W, jnp.sum(I * y[None, :]) / W)


# ------------------------------------------------------------------
# line profile (reference: scalar_fields_XY.py:profile — interpolated
# cut between two points)
# ------------------------------------------------------------------

def profile(x, y, u, point1, point2, npixels=None, kind="intensity"):
    """Interpolated 1D cut of the field between ``point1`` and
    ``point2`` (each (x, y)).  Returns (s, values) with ``s`` the
    arclength coordinate.  kind: 'intensity' | 'amplitude' | 'phase' |
    'field'.  Linear interpolation (TPU map_coordinates)."""
    x = np.asarray(x)
    y = np.asarray(y)
    if npixels is None:
        npixels = len(x)
    x1, y1 = point1
    x2, y2 = point2
    xs = np.linspace(x1, x2, npixels)
    ys = np.linspace(y1, y2, npixels)
    # index coordinates (u is (nx, ny) with ij indexing)
    ci = (xs - x[0]) / (x[1] - x[0])
    cj = (ys - y[0]) / (y[1] - y[0])
    coords = [jnp.asarray(ci), jnp.asarray(cj)]
    uj = jnp.asarray(u)
    re = map_coordinates(jnp.real(uj), coords, order=1)
    im = map_coordinates(jnp.imag(uj), coords, order=1)
    val = re + 1j * im
    s = np.hypot(xs - x1, ys - y1)
    if kind == "intensity":
        return s, jnp.abs(val) ** 2
    if kind == "amplitude":
        return s, jnp.abs(val)
    if kind == "phase":
        return s, jnp.angle(val)
    return s, val


# ------------------------------------------------------------------
# rotation / paste (reference: scalar_fields_XY.py:rotate,
# :insert_mask)
# ------------------------------------------------------------------

def rotate_field(x, y, u, angle, position=None):
    """Rotate u(x, y) by ``angle`` about ``position`` (default: grid
    center) by inverse-mapping with bilinear interpolation; points
    mapped from outside the grid are zero."""
    x = np.asarray(x)
    y = np.asarray(y)
    if position is None:
        position = (0.5 * (x[0] + x[-1]), 0.5 * (y[0] + y[-1]))
    x0, y0 = position
    X, Y = np.meshgrid(x, y, indexing="ij")
    c, s = np.cos(angle), np.sin(angle)
    # source point for each target point (inverse rotation)
    Xs = c * (X - x0) + s * (Y - y0) + x0
    Ys = -s * (X - x0) + c * (Y - y0) + y0
    ci = (Xs - x[0]) / (x[1] - x[0])
    cj = (Ys - y[0]) / (y[1] - y[0])
    inside = ((ci >= 0) & (ci <= len(x) - 1)
              & (cj >= 0) & (cj <= len(y) - 1))
    coords = [jnp.asarray(ci), jnp.asarray(cj)]
    uj = jnp.asarray(u)
    re = map_coordinates(jnp.real(uj), coords, order=1)
    im = map_coordinates(jnp.imag(uj), coords, order=1)
    return jnp.where(jnp.asarray(inside), re + 1j * im, 0.0)


def insert_array(x, y, u_base, u_small, xs, ys, r0=(0.0, 0.0)):
    """Paste a smaller field sampled on (xs, ys) into u_base centered
    at ``r0`` (nearest-node alignment, clipped at the borders)
    (reference: scalar_fields_XY.py:insert_mask)."""
    x = np.asarray(x)
    y = np.asarray(y)
    u_base = np.array(u_base, dtype=complex)
    u_small = np.asarray(u_small)
    dx = x[1] - x[0]
    dy = y[1] - y[0]
    i0 = int(round((r0[0] + np.asarray(xs)[0] - x[0]) / dx))
    j0 = int(round((r0[1] + np.asarray(ys)[0] - y[0]) / dy))
    ns, ms = u_small.shape
    ia, ja = max(i0, 0), max(j0, 0)
    ib, jb = min(i0 + ns, len(x)), min(j0 + ms, len(y))
    if ib <= ia or jb <= ja:
        return jnp.asarray(u_base)
    u_base[ia:ib, ja:jb] = u_small[ia - i0:ib - i0, ja - j0:jb - j0]
    return jnp.asarray(u_base)


# ------------------------------------------------------------------
# XZ scene analysis (reference: scalar_fields_XZ.py:surface_detection,
# :detect_index_variations)
# ------------------------------------------------------------------

def detect_index_variations(x, z, n, n_edge, incr_n=0.1):
    """Left/right interface curves of an index scene n(x, z).

    For each x row, marks the first-crossing (left) and last-crossing
    (right) z of the indicator Re(n) > n_edge along z (reference:
    scalar_fields_XZ.py:1290).  Returns
    ``(x_left, h_left, x_right, h_right)``.
    """
    x = np.asarray(x)
    z = np.asarray(z)
    ind = (np.real(np.asarray(n)) > n_edge).astype(float)
    d = np.diff(ind, axis=1)
    ix_l, iz_l = np.nonzero(d > incr_n)
    ix_r, iz_r = np.nonzero(d < -incr_n)
    return x[ix_l], z[iz_l], x[ix_r], z[iz_r]


def surface_detection(x, z, n, mode=1, min_incr=0.1):
    """All edge points of an index scene: |∇n| (mode 1) or |Δn| along
    both axes (mode 2) above ``min_incr`` (reference:
    scalar_fields_XZ.py:1384).  Returns ``(xs, zs)`` point clouds."""
    x = np.asarray(x)
    z = np.asarray(z)
    nr = np.real(np.asarray(n))
    if mode == 1:
        gx, gz = np.gradient(nr, x, z)
        mag = np.hypot(gx, gz)
        # normalize to index units per grid step
        mag = mag * min(x[1] - x[0], z[1] - z[0])
    else:
        mag = np.zeros_like(nr)
        mag[:-1, :] = np.maximum(mag[:-1, :], np.abs(np.diff(nr, axis=0)))
        mag[:, :-1] = np.maximum(mag[:, :-1], np.abs(np.diff(nr, axis=1)))
    ix, iz = np.nonzero(mag > min_incr)
    return x[ix], z[iz]


def rotate_image(x, z, img, angle, pivot_point):
    """Rotate a real (nz, nx) image by ``angle`` DEGREES about the
    physical pivot ``(z0, x0)`` (reference:
    pyqed/beam/utils_math.py:865 ``rotate_image`` — pad + scipy
    ndimage.rotate + crop there; here a direct inverse-map with
    bilinear interpolation about the pivot, same result without the
    padded intermediate).  Points mapped from outside keep 0."""
    x = np.asarray(x)
    z = np.asarray(z)
    img = jnp.asarray(img)
    z0, x0 = pivot_point
    th = np.deg2rad(angle)
    Z, X = np.meshgrid(z, x, indexing="ij")
    c, s = np.cos(th), np.sin(th)
    Zs = c * (Z - z0) + s * (X - x0) + z0
    Xs = -s * (Z - z0) + c * (X - x0) + x0
    ci = (Zs - z[0]) / (z[1] - z[0])
    cj = (Xs - x[0]) / (x[1] - x[0])
    inside = ((ci >= 0) & (ci <= len(z) - 1)
              & (cj >= 0) & (cj <= len(x) - 1))
    out = map_coordinates(img, [jnp.asarray(ci), jnp.asarray(cj)],
                          order=1)
    return jnp.where(jnp.asarray(inside), out, 0.0)


def filter_edge_1D(x, size=1.1, exponent=32):
    """Super-Gaussian window, 1 at the center falling at the borders —
    the absorbing edge filter for propagation algorithms (reference:
    pyqed/beam/utils_math.py:1057)."""
    x = np.asarray(x)
    x_center = (x[-1] + x[0]) / 2
    Dx = size * (x[-1] - x[0])
    # |base|**p, not base**|p|: a signed base with an odd/non-integer
    # exponent would AMPLIFY (or NaN) the left half — the reference has
    # exactly this bug (utils_math.py:1071); even exponents agree
    return np.exp(-np.abs(2 * (x - x_center) / Dx) ** np.abs(exponent))


def filter_edge_2D(x, y, size=1.1, exponent=32):
    """Separable 2D super-Gaussian edge filter, indexed (len(x),
    len(y)) (reference: pyqed/beam/utils_math.py:1074 — note that
    version meshgrids in (y, x) order; this one matches the package's
    [x, y] field layout)."""
    return np.outer(filter_edge_1D(x, size, exponent),
                    filter_edge_1D(y, size, exponent))
