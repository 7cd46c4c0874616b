"""Scalar optical diffraction: 1D/2D fields, sources, masks, propagation.

TPU-native counterpart of the reference beam layer
(reference: pyqed/beam/ — a vendored diffractio fork, ~19.5k LoC:
``Scalar_field_X`` (scalar_fields_X.py:79) with Rayleigh-Sommerfeld ``RS``
propagation :622, ``Scalar_field_XY`` with ``fft``/``RS``
(scalar_fields_XY.py:608, 928), sources and masks modules; the
``multiprocessing.Pool`` z-plane loops (scalar_fields_XYZ.py:560) map to
``vmap`` over planes — SURVEY.md §2.9).

Compact, physics-complete core: band-limited angular-spectrum propagation
(exact scalar diffraction for uniform grids), Fraunhofer far field, source
and mask factories. Propagation to many z planes is a single vmapped
kernel (the XYZ volume of the reference).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


class ScalarFieldX:
    """1D scalar field u(x) at fixed wavelength
    (reference: pyqed/beam/scalar_fields_X.py:79)."""

    def __init__(self, x, wavelength, u=None, n_background=1.0):
        self.x = np.asarray(x)
        self.wavelength = wavelength
        self.n = n_background
        self.k = 2 * np.pi * n_background / wavelength
        self.u = (jnp.zeros(len(self.x), dtype=complex)
                  if u is None else jnp.asarray(u, dtype=complex))

    # ------------------------------------------------------------- algebra
    def __add__(self, other):
        return ScalarFieldX(self.x, self.wavelength, self.u + other.u, self.n)

    def __mul__(self, other):
        ou = other.u if isinstance(other, ScalarFieldX) else other
        return ScalarFieldX(self.x, self.wavelength, self.u * ou, self.n)

    def duplicate(self):
        return ScalarFieldX(self.x, self.wavelength, self.u, self.n)

    def intensity(self):
        return jnp.abs(self.u) ** 2

    def normalize(self):
        dx = self.x[1] - self.x[0]
        self.u = self.u / jnp.sqrt(jnp.sum(jnp.abs(self.u) ** 2) * dx)
        return self

    # --------------------------------------------------------- propagation
    def angular_spectrum(self, z):
        """Band-limited angular-spectrum propagation by distance z — the
        exact scalar solution the reference's RS integral approximates
        (reference: pyqed/beam/scalar_fields_X.py:622)."""
        self.u = _asm_1d(self.u, self.x, self.wavelength, z, self.n)
        return self

    def RS(self, z, fast=False, kind="z"):
        """True quadrature Rayleigh-Sommerfeld propagation (Shen & Wang
        FFT convolution — reference: pyqed/beam/scalar_fields_X.py:622
        ``RS``/``_RS_`` with its quality factor at :646; the exact-Hankel
        kernel at :1089, the ``fast`` asymptotic at :1114).

        Unlike the angular spectrum (periodic in x), this is a LINEAR
        convolution against the free-space RS-I kernel, so near-field
        edge behavior matches the open-boundary integral. Sets
        ``self.quality`` (>1 means the grid resolves the kernel's
        fastest fringe; the reference prints a warning below 1)."""
        self.u, self.quality = _rs_1d(self.u, self.x, self.wavelength, z,
                                      self.n, fast=fast, kind=kind)
        return self

    def propagate_many(self, zs):
        """Field at many z planes: (nz, nx) — one vmap (replaces the
        reference's multiprocessing over planes)."""
        return jax.vmap(lambda z: _asm_1d(self.u, self.x, self.wavelength,
                                          z, self.n))(jnp.asarray(zs))

    def fft(self, remove_phase=True):
        """Far-field (Fraunhofer) amplitude
        (reference: pyqed/beam/scalar_fields_X.py:400)."""
        dx = self.x[1] - self.x[0]
        U = jnp.fft.fftshift(jnp.fft.fft(self.u)) * dx
        fx = np.fft.fftshift(np.fft.fftfreq(len(self.x), dx))
        return fx, U

    # ----------------------------------------------------- post-processing
    def binarize(self, kind="amplitude", bin_level=None, level0=None,
                 level1=None):
        """(reference: pyqed/beam/scalar_fields_X.py ``binarize``)."""
        from .fieldutils import binarize
        self.u = binarize(self.u, kind, bin_level, level0, level1)
        return self

    def discretize(self, kind="amplitude", num_levels=2, phase0=-np.pi):
        """(reference: pyqed/beam/scalar_fields_X.py ``discretize``)."""
        from .fieldutils import discretize
        self.u = discretize(self.u, kind, num_levels, phase0)
        return self

    def get_edges(self, kind_transition="amplitude", min_step=0.0):
        """Edge positions/types of a binary mask (reference:
        pyqed/beam/scalar_fields_X.py ``get_edges``)."""
        from .fieldutils import get_edges
        return get_edges(self.x, self.u, kind_transition, min_step)


def _asm_1d(u, x, wavelength, z, n=1.0):
    nx = len(x)
    dx = x[1] - x[0]
    fx = jnp.asarray(np.fft.fftfreq(nx, dx))
    k = 2 * jnp.pi * n / wavelength
    kz2 = k**2 - (2 * jnp.pi * fx) ** 2
    kz = jnp.sqrt(jnp.abs(kz2))
    # propagating vs evanescent
    H = jnp.where(kz2 >= 0, jnp.exp(1j * kz * z), jnp.exp(-kz * jnp.abs(z)))
    return jnp.fft.ifft(jnp.fft.fft(u) * H)


class ScalarFieldXY:
    """2D scalar field u(x, y)
    (reference: pyqed/beam/scalar_fields_XY.py)."""

    def __init__(self, x, y, wavelength, u=None, n_background=1.0):
        self.x = np.asarray(x)
        self.y = np.asarray(y)
        self.wavelength = wavelength
        self.n = n_background
        self.k = 2 * np.pi * n_background / wavelength
        shape = (len(self.x), len(self.y))
        self.u = (jnp.zeros(shape, dtype=complex) if u is None
                  else jnp.asarray(u, dtype=complex))

    def __mul__(self, other):
        ou = other.u if isinstance(other, ScalarFieldXY) else other
        return ScalarFieldXY(self.x, self.y, self.wavelength, self.u * ou,
                             self.n)

    def intensity(self):
        return jnp.abs(self.u) ** 2

    def angular_spectrum(self, z):
        self.u = _asm_2d(self.u, self.x, self.y, self.wavelength, z, self.n)
        return self

    def RS(self, z, kind="z"):
        """Quadrature Rayleigh-Sommerfeld propagation, 2D (reference:
        pyqed/beam/scalar_fields_XY.py:928 with the closed-form RS-I
        kernel at :2266). Sets ``self.quality``."""
        self.u, self.quality = _rs_2d(self.u, self.x, self.y,
                                      self.wavelength, z, self.n,
                                      kind=kind)
        return self

    def propagate_many(self, zs):
        """(nz, nx, ny) volume — the reference's Scalar_field_XYZ by vmap
        (reference: pyqed/beam/scalar_fields_XYZ.py:560 uses a
        multiprocessing.Pool over z planes)."""
        return jax.vmap(lambda z: _asm_2d(self.u, self.x, self.y,
                                          self.wavelength, z, self.n))(
            jnp.asarray(zs))

    # ----------------------------------------------------- post-processing
    def get_amplitude(self):
        """(reference: pyqed/beam/scalar_fields_XY.py ``get_amplitude``)."""
        return jnp.abs(self.u)

    def get_phase(self):
        """(reference: pyqed/beam/scalar_fields_XY.py ``get_phase``)."""
        return jnp.angle(self.u)

    def remove_phase(self, sign=False):
        """(reference: pyqed/beam/scalar_fields_XY.py ``remove_phase``)."""
        from .fieldutils import remove_phase
        self.u = remove_phase(self.u, sign)
        return self

    def binarize(self, kind="amplitude", bin_level=None, level0=None,
                 level1=None):
        """(reference: pyqed/beam/scalar_fields_XY.py ``binarize``)."""
        from .fieldutils import binarize
        self.u = binarize(self.u, kind, bin_level, level0, level1)
        return self

    def discretize(self, kind="amplitude", num_levels=2, phase0=-np.pi):
        """(reference: pyqed/beam/scalar_fields_XY.py ``discretize``)."""
        from .fieldutils import discretize
        self.u = discretize(self.u, kind, num_levels, phase0)
        return self

    def search_focus(self, kind="maximum"):
        """(x0, y0) of the intensity maximum or centroid (reference:
        pyqed/beam/scalar_fields_XY.py ``search_focus``)."""
        from .fieldutils import search_focus
        return search_focus(self.x, self.y, self.u, kind)

    def profile(self, point1, point2, npixels=None, kind="intensity"):
        """Interpolated line cut between two (x, y) points (reference:
        pyqed/beam/scalar_fields_XY.py ``profile``)."""
        from .fieldutils import profile
        return profile(self.x, self.y, self.u, point1, point2, npixels,
                       kind)

    def rotate(self, angle, position=None):
        """Rotate the field about ``position`` (reference:
        pyqed/beam/scalar_fields_XY.py ``rotate``)."""
        from .fieldutils import rotate_field
        self.u = rotate_field(self.x, self.y, self.u, angle, position)
        return self

    def insert_mask(self, other, r0=(0.0, 0.0)):
        """Paste ``other`` (a smaller ScalarFieldXY) into this field at
        ``r0`` (reference: pyqed/beam/scalar_fields_XY.py
        ``insert_mask``)."""
        from .fieldutils import insert_array
        self.u = insert_array(self.x, self.y, self.u, other.u,
                              other.x, other.y, r0)
        return self


def _asm_2d(u, x, y, wavelength, z, n=1.0):
    dx = x[1] - x[0]
    dy = y[1] - y[0]
    fx = jnp.asarray(np.fft.fftfreq(len(x), dx))
    fy = jnp.asarray(np.fft.fftfreq(len(y), dy))
    k = 2 * jnp.pi * n / wavelength
    kz2 = k**2 - (2 * jnp.pi * fx[:, None]) ** 2 - (2 * jnp.pi * fy[None, :]) ** 2
    kz = jnp.sqrt(jnp.abs(kz2))
    H = jnp.where(kz2 >= 0, jnp.exp(1j * kz * z), jnp.exp(-kz * jnp.abs(z)))
    return jnp.fft.ifft2(jnp.fft.fft2(u) * H)


def _rs_quality(rmax, dr, wavelength, z, n):
    """Sampling quality factor for quadrature RS (reference:
    pyqed/beam/scalar_fields_X.py:646): the ratio of the kernel's
    slowest fringe spacing at the grid edge to the actual grid step;
    > 1 means the discrete sum resolves the integrand."""
    lam = wavelength / n
    dr_ideal = np.sqrt(lam ** 2 + rmax ** 2
                       + 2 * lam * np.sqrt(rmax ** 2 + z ** 2)) - rmax
    return float(dr_ideal / dr / np.sqrt(2))


def _kernel_rs_1d(x, wavelength, z, n=1.0, kind="z", fast=False):
    """RS-I kernel, 1D (cylindrical-wave Green function; reference:
    pyqed/beam/scalar_fields_X.py:1089 ``kernelRS`` /
    :1125 ``kernelRSinverse`` — z < 0 selects the inverse kernel).
    Exact form uses the Hankel function H1^(1) (host-side scipy at
    setup: the kernel is a one-time precompute); ``fast`` uses the
    large-argument asymptotic (DLMF 10.2.5)."""
    x = np.asarray(x, float)
    k = 2 * np.pi * n / wavelength
    R = np.sqrt(x ** 2 + z ** 2)
    sgn = 1.0 if z > 0 else -1.0
    if fast:
        hk1 = np.sqrt(2 / (np.pi * k * R)) * np.exp(
            sgn * 1j * (k * R - 3 * np.pi / 4))
    else:
        from scipy.special import hankel1
        hk1 = hankel1(1, k * R)
        if z < 0:
            # incoming-wave (conjugate) kernel; the signed num below
            # carries the prefactor sign, so RS(z) then RS(-z) is the
            # exact adjoint (the reference's kernelRSinverse at :1125
            # keeps H1 unconjugated and does NOT round-trip)
            hk1 = np.conj(hk1)
    num = {"z": z, "x": x, "0": sgn}[kind]
    return (0.5j * k * num / R) * hk1


def _kernel_rs_2d(X, Y, wavelength, z, n=1.0, kind="z"):
    """RS-I kernel, 2D closed form (reference:
    pyqed/beam/scalar_fields_XY.py:2266/:2294)."""
    k = 2 * jnp.pi * n / wavelength
    R = jnp.sqrt(X ** 2 + Y ** 2 + z ** 2)
    num = {"z": abs(z), "x": X, "y": Y, "0": 1.0}[kind]
    if z > 0:
        return jnp.exp(1j * k * R) * num / R ** 2 * (1 / R - 1j * k) \
            / (2 * jnp.pi)
    # inverse propagation = conj(forward(|z|)): exact adjoint (the
    # reference's kernelRSinverse at scalar_fields_XY.py:2294 differs
    # by an R power and does not round-trip)
    return jnp.exp(-1j * k * R) * num / R ** 2 * (1 / R + 1j * k) \
        / (2 * jnp.pi)


def _rs_1d(u, x, wavelength, z, n=1.0, fast=False, kind="z"):
    """Linear-convolution quadrature RS (Shen & Wang, Appl. Opt. 45,
    1102 (2006); reference: pyqed/beam/scalar_fields_X.py:622 ``_RS_``):
    zero-pad to 2nx-1, multiply FFTs of field and kernel, keep the
    causal half. Returns (u_out, quality)."""
    x = np.asarray(x, float)
    nx = len(x)
    dx = x[1] - x[0]
    quality = _rs_quality(np.abs(x).max(), dx, wavelength, z, n)
    # symmetric source-to-observation offsets, length 2nx-1
    xext = np.concatenate([(x[0] - x[::-1])[:-1], x - x[0]])
    H = jnp.asarray(_kernel_rs_1d(xext, wavelength, z, n, kind, fast))
    U = jnp.concatenate([jnp.asarray(u),
                         jnp.zeros(nx - 1, dtype=complex)])
    S = jnp.fft.ifft(jnp.fft.fft(U) * jnp.fft.fft(H)) * dx
    return S[nx - 1:], quality


def _rs_2d(u, x, y, wavelength, z, n=1.0, kind="z"):
    """2D quadrature RS by zero-padded FFT convolution (reference:
    pyqed/beam/scalar_fields_XY.py:928). Returns (u_out, quality)."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    nx, ny = len(x), len(y)
    dx = x[1] - x[0]
    dy = y[1] - y[0]
    rmax = np.sqrt(np.abs(x).max() ** 2 + np.abs(y).max() ** 2)
    quality = _rs_quality(rmax, max(dx, dy), wavelength, z, n)
    xext = np.concatenate([(x[0] - x[::-1])[:-1], x - x[0]])
    yext = np.concatenate([(y[0] - y[::-1])[:-1], y - y[0]])
    H = _kernel_rs_2d(jnp.asarray(xext)[:, None], jnp.asarray(yext)[None, :],
                      wavelength, z, n, kind)
    U = jnp.zeros((2 * nx - 1, 2 * ny - 1), dtype=complex)
    U = U.at[:nx, :ny].set(jnp.asarray(u))
    S = jnp.fft.ifft2(jnp.fft.fft2(U) * jnp.fft.fft2(H)) * dx * dy
    return S[nx - 1:, ny - 1:], quality


# ------------------------------------------------------------------ sources

def plane_wave(field, theta=0.0, amplitude=1.0):
    """(reference: pyqed/beam/scalar_sources_X.py)."""
    kx = field.k * np.sin(theta)
    if isinstance(field, ScalarFieldX):
        field.u = amplitude * jnp.exp(1j * kx * jnp.asarray(field.x))
    else:
        field.u = amplitude * jnp.exp(
            1j * kx * jnp.asarray(field.x))[:, None] * jnp.ones(len(field.y))
    return field


def gauss_beam(field, w0, x0=0.0, y0=0.0, amplitude=1.0):
    if isinstance(field, ScalarFieldX):
        field.u = amplitude * jnp.exp(-((jnp.asarray(field.x) - x0) / w0) ** 2)
    else:
        X, Y = np.meshgrid(field.x, field.y, indexing="ij")
        field.u = amplitude * jnp.exp(-(((X - x0) ** 2 + (Y - y0) ** 2)
                                        / w0**2))
    return field


# -------------------------------------------------------------------- masks

def slit(field, width, x0=0.0):
    """(reference: pyqed/beam/scalar_masks_X.py)."""
    t = (np.abs(field.x - x0) <= width / 2).astype(float)
    if isinstance(field, ScalarFieldX):
        field.u = field.u * jnp.asarray(t)
    else:
        field.u = field.u * jnp.asarray(t)[:, None]
    return field


def double_slit(field, width, separation, x0=0.0):
    t = (((np.abs(field.x - x0 - separation / 2) <= width / 2)
          | (np.abs(field.x - x0 + separation / 2) <= width / 2))
         .astype(float))
    if isinstance(field, ScalarFieldX):
        field.u = field.u * jnp.asarray(t)
    else:
        field.u = field.u * jnp.asarray(t)[:, None]
    return field


def circular_aperture(field: ScalarFieldXY, radius, x0=0.0, y0=0.0):
    X, Y = np.meshgrid(field.x, field.y, indexing="ij")
    t = (((X - x0) ** 2 + (Y - y0) ** 2) <= radius**2).astype(float)
    field.u = field.u * jnp.asarray(t)
    return field


def lens(field: ScalarFieldXY, focal):
    """Thin-lens quadratic phase."""
    X, Y = np.meshgrid(field.x, field.y, indexing="ij")
    phase = jnp.exp(-1j * field.k * (X**2 + Y**2) / (2 * focal))
    field.u = field.u * phase
    return field


# reference-compatible aliases
Scalar_field_X = ScalarFieldX
Scalar_field_XY = ScalarFieldXY


class ScalarFieldXZ:
    """Scalar field on an (x, z) sheet: a 1D transverse field propagated
    and STORED over a z-stack (reference: pyqed/beam/scalar_fields_XZ.py
    — vendored diffractio; there a Python loop over z planes, here one
    vmapped angular-spectrum batch over all planes at once).
    """

    def __init__(self, x, z, wavelength, n_background=1.0):
        self.x = np.asarray(x)
        self.z = np.asarray(z)
        self.wavelength = wavelength
        self.n = n_background
        self.u = None           # (nz, nx) after propagation

    def incident_field(self, u0):
        self.u0 = jnp.asarray(u0, dtype=complex)
        return self

    def propagate(self):
        """Fill the whole (z, x) sheet with one batched ASM."""
        u0, x, wl, n = self.u0, self.x, self.wavelength, self.n

        def plane(z):
            return _asm_1d(u0, x, wl, z, n)

        self.u = jax.vmap(plane)(jnp.asarray(self.z))
        return self.u

    def bpm(self, n_xz=None, has_edges=True, pow_edge=80):
        """Split-step BPM through n(z, x) (reference:
        pyqed/beam/scalar_fields_XZ.py BPM — Python z loop; one
        ``lax.scan`` here). n_xz: (nz, nx) index sheet or None.

        Plane k of the result lives exactly at ``self.z[k]`` (the first
        step covers 0 -> z[0]); non-uniform z grids are supported."""
        x, z = self.x, self.z
        wl, n0 = self.wavelength, self.n
        dzs = np.diff(np.concatenate([[0.0], np.asarray(z, float)]))
        k0 = 2 * np.pi / wl
        kx = 2 * np.pi * np.fft.fftfreq(len(x), x[1] - x[0])
        kz2 = (k0 * n0) ** 2 - kx ** 2
        # complex kz with +Im branch: exp(i kz dz) decays for evanescent
        kz = np.sqrt(kz2.astype(complex))
        if n_xz is None:
            dn = jnp.zeros((len(z), len(x)))
        else:
            dn = jnp.asarray(n_xz) - n0
        edge = (_edge_filter((len(x),), (x,), pow_edge)
                if has_edges else 1.0)
        uniform = np.ptp(dzs) <= 1e-12 * np.max(np.abs(dzs))

        if uniform:       # hoist H out of the scan (the common case)
            H = jnp.asarray(np.exp(1j * kz * dzs[0]))

            def step(u, sl):
                _, dn_k = sl
                u = (jnp.fft.ifft(H * jnp.fft.fft(u))
                     * jnp.exp(1j * k0 * dn_k * dzs[0]) * edge)
                return u, u
        else:
            kzj = jnp.asarray(kz)

            def step(u, sl):
                dz, dn_k = sl
                u = (jnp.fft.ifft(jnp.exp(1j * kzj * dz)
                                  * jnp.fft.fft(u))
                     * jnp.exp(1j * k0 * dn_k * dz) * edge)
                return u, u

        _, stack = jax.lax.scan(step, self.u0, (jnp.asarray(dzs), dn))
        self.u = stack
        return self.u

    def wpm(self, n_xz=None, levels=None, has_edges=True, pow_edge=80):
        """Wave propagation method (Schmidt kernel) through n(z, x).

        More accurate than split-step BPM for high index contrast and
        wide angles: each z step propagates the field with the EXACT
        homogeneous kernel exp(i dz sqrt((k0 n_m)^2 - kx^2)) for every
        distinct index value n_m in the scene, then keeps each result
        only at the pixels where n == n_m (reference:
        pyqed/beam/scalar_fields_XZ.py:963 ``WPM`` /
        scalar_fields_XY.py:2365 ``WPM_schmidt_kernel`` — a Python
        z x levels double loop there; here the level axis is one
        batched (n_levels, nx) FFT inside ONE ``lax.scan``).

        levels: optional explicit index levels; default = the unique
        values of ``n_xz`` (host-side, static — the scene is a design
        input, not a traced value).
        """
        x, z = self.x, self.z
        wl, n0 = self.wavelength, self.n
        dzs = np.diff(np.concatenate([[0.0], np.asarray(z, float)]))
        k0 = 2 * np.pi / wl
        kx = 2 * np.pi * np.fft.fftfreq(len(x), x[1] - x[0])
        if n_xz is None:
            n_sheet = np.full((len(z), len(x)), complex(n0))
        else:
            n_sheet = np.asarray(n_xz, dtype=complex)
        levels = _wpm_levels(n_sheet, levels)
        # (n_levels, nx) exact homogeneous kernels; +Im branch decays
        kz = np.sqrt(((k0 * levels[:, None]) ** 2
                      - kx[None, :] ** 2).astype(complex))
        kz = np.where(kz.imag < 0, -kz, kz)
        edge = (_edge_filter((len(x),), (x,), pow_edge)
                if has_edges else 1.0)
        # per-slice masks: a guaranteed one-hot partition (each pixel
        # assigned to its NEAREST level, like the reference's exact
        # n == n_m equality on an already-discrete scene) — per-level
        # isclose tests can double-count or drop pixels
        masks = jnp.asarray(_wpm_partition(n_sheet, levels),
                            dtype=jnp.float64)       # (nz, n_levels, nx)
        uniform = np.ptp(dzs) <= 1e-12 * np.max(np.abs(dzs))
        kzj = jnp.asarray(kz)

        if uniform:
            Hm = jnp.asarray(np.exp(1j * kz * dzs[0]))  # (n_levels, nx)

            def step(u, sl):
                _, mask_k = sl
                Ek = jnp.fft.fft(u)
                um = jnp.fft.ifft(Hm * Ek[None, :], axis=1)
                u = jnp.sum(mask_k * um, axis=0) * edge
                return u, u
        else:
            def step(u, sl):
                dz, mask_k = sl
                Ek = jnp.fft.fft(u)
                um = jnp.fft.ifft(jnp.exp(1j * kzj * dz) * Ek[None, :],
                                  axis=1)
                u = jnp.sum(mask_k * um, axis=0) * edge
                return u, u

        _, stack = jax.lax.scan(step, self.u0, (jnp.asarray(dzs), masks))
        self.u = stack
        return self.u

    def pwd(self, n=None):
        """Plane-wave-decomposition propagation: every z step uses the
        EXACT homogeneous kernel exp(i dz sqrt((k0 n)^2 - kx^2)) for a
        single (scalar) index ``n`` — the one-level special case of
        :meth:`wpm` (reference: pyqed/beam/scalar_fields_XZ.py:922
        ``PWD`` with the kernel at scalar_fields_X.py:1155; after
        Schmidt et al., Opt. Express 24, 30188 (2016))."""
        x, z = self.x, self.z
        if n is None:
            n = self.n
        dzs = np.diff(np.concatenate([[0.0], np.asarray(z, float)]))
        k0 = 2 * np.pi / self.wavelength
        kx = 2 * np.pi * np.fft.fftfreq(len(x), x[1] - x[0])
        kz = np.sqrt(((k0 * n) ** 2 - kx ** 2).astype(complex))
        kz = np.where(kz.imag < 0, -kz, kz)
        kzj = jnp.asarray(kz)

        def step(u, dz):
            u = jnp.fft.ifft(jnp.exp(1j * kzj * dz) * jnp.fft.fft(u))
            return u, u

        _, stack = jax.lax.scan(step, self.u0, jnp.asarray(dzs))
        self.u = stack
        return self.u

    def surface_detection(self, n_xz, mode=1, min_incr=0.1):
        """Edge point cloud of an index scene (reference:
        pyqed/beam/scalar_fields_XZ.py:1384). ``n_xz`` is (nz, nx) in
        this class's storage order; returns (xs, zs)."""
        from .fieldutils import surface_detection
        return surface_detection(self.x, self.z,
                                 np.asarray(n_xz).T, mode, min_incr)

    def detect_index_variations(self, n_xz, n_edge, incr_n=0.1):
        """Left/right interface curves of an index scene (reference:
        pyqed/beam/scalar_fields_XZ.py:1290)."""
        from .fieldutils import detect_index_variations
        return detect_index_variations(self.x, self.z,
                                       np.asarray(n_xz).T, n_edge,
                                       incr_n)

    def bpm_inverse(self, n_xz=None, has_edges=True, pow_edge=80):
        """Inverse BPM: reconstruct the field stack BEFORE each plane
        from the field at the LAST plane, undoing the forward steps
        (reference: scalar_fields_XZ.py:735 ``BPM_inverse``). Set
        ``self.u0`` to the exit-plane field first. Returns the stack
        ordered from the exit plane back toward z=0."""
        x, z = self.x, self.z
        wl, n0 = self.wavelength, self.n
        dzs = np.diff(np.concatenate([[0.0], np.asarray(z, float)]))[::-1]
        k0 = 2 * np.pi / wl
        kx = 2 * np.pi * np.fft.fftfreq(len(x), x[1] - x[0])
        kz = np.sqrt(((k0 * n0) ** 2 - kx ** 2).astype(complex))
        if n_xz is None:
            dn = jnp.zeros((len(z), len(x)))
        else:
            dn = jnp.asarray(n_xz) - n0
        dn = dn[::-1]
        edge = (_edge_filter((len(x),), (x,), pow_edge)
                if has_edges else 1.0)
        kzj = jnp.asarray(kz)

        def step(u, sl):
            dz, dn_k = sl
            # undo the phase screen, then back-propagate the free step
            u = u * jnp.exp(-1j * k0 * dn_k * dz)
            u = jnp.fft.ifft(jnp.exp(-1j * kzj * dz) * jnp.fft.fft(u))
            u = u * edge
            return u, u

        _, stack = jax.lax.scan(step, self.u0,
                                (jnp.asarray(np.ascontiguousarray(dzs)),
                                 dn))
        self.u = stack
        return self.u

    def bpm_back_propagation(self, n_xz=None, **kw):
        """Phase-conjugate back propagation (reference:
        scalar_fields_XZ.py:760): the conjugated exit field retracing
        the scene. Store the exit field in ``self.u0``; the returned
        stack is the phase-conjugate field at each earlier plane
        (exact for real media: conj of the exact inverse steps —
        the reference's conjugate-then-forward-BPM picks up O(dz)
        split-step commutator error instead)."""
        u = self.bpm_inverse(n_xz=n_xz, **kw)
        self.u = jnp.conj(u)
        return self.u

    def polychromatic(self, u0_of_wl, wavelengths, spectrum=None,
                      method="bpm", n_xz=None, **kw):
        """Incoherent polychromatic propagation: spectrum-weighted sum
        of |u(x, z; wl)|^2 over wavelengths (reference:
        scalar_fields_XZ.py:1115 ``RS_polychromatic`` / :1155
        ``BPM_polychromatic`` — multiprocessing pools there; here each
        wavelength is one jitted scan). Returns sqrt(I) like the
        reference (amplitude, no phase)."""
        wavelengths = np.atleast_1d(np.asarray(wavelengths, float))
        if spectrum is None:
            spectrum = np.ones_like(wavelengths)
        spectrum = np.asarray(spectrum, float)
        I_total = 0.0
        for wl, w in zip(wavelengths, spectrum):
            f = ScalarFieldXZ(self.x, self.z, wl, self.n)
            f.incident_field(u0_of_wl(wl))
            if method == "bpm":
                u = f.bpm(n_xz=n_xz, **kw)
            elif method == "wpm":
                u = f.wpm(n_xz=n_xz, **kw)
            else:                        # homogeneous ASM stack
                u = f.propagate()
            I_total = I_total + w * jnp.abs(u) ** 2
        self.u = jnp.sqrt(I_total)
        return self.u

    def intensity(self):
        return jnp.abs(self.u) ** 2

    def profile_longitudinal(self, kind="intensity", x0=0.0):
        """Longitudinal profile through x = x0 as a :class:`ScalarFieldZ`
        when kind='field', else the requested array
        (reference: scalar_fields_XZ.py:1704)."""
        ix = int(np.argmin(np.abs(self.x - x0)))
        u = np.asarray(self.u)[:, ix]
        if kind == "field":
            from .fieldz import ScalarFieldZ
            out = ScalarFieldZ(self.z, self.wavelength, self.n)
            out.u = u
            return out
        if kind == "intensity":
            return np.abs(u) ** 2
        if kind == "amplitude":
            return np.abs(u)
        if kind == "phase":
            return np.angle(u)
        raise ValueError(f"unknown profile kind {kind!r}")

    def profile_transversal(self, kind="intensity", z0=0.0):
        """Transversal profile at z = z0
        (reference: scalar_fields_XZ.py:1762)."""
        iz = int(np.argmin(np.abs(self.z - z0)))
        u = np.asarray(self.u)[iz, :]
        if kind == "field":
            return u
        if kind == "intensity":
            return np.abs(u) ** 2
        if kind == "amplitude":
            return np.abs(u)
        if kind == "phase":
            return np.angle(u)
        raise ValueError(f"unknown profile kind {kind!r}")


_WPM_LEVELS_BOUND = 32


def _wpm_levels(n_scene, levels):
    """Resolve the WPM index levels; warn when a smooth/continuous scene
    would explode the per-level kernel batch (the reference's WPM is
    documented as needing a discrete number of refraction indices)."""
    if levels is None:
        levels = np.unique(np.asarray(n_scene).round(9))
    levels = np.asarray(levels, dtype=complex)
    if len(levels) > _WPM_LEVELS_BOUND:
        import warnings
        warnings.warn(
            f"WPM scene has {len(levels)} distinct index levels; the "
            f"kernel batch is O(n_levels * grid). Discretize the scene "
            f"(scenes.discretize_refraction_index) or pass explicit "
            f"`levels=` to bound memory.", RuntimeWarning, stacklevel=3)
    return levels


def _wpm_partition(n_scene, levels):
    """One-hot level masks with the level axis at position 1:
    each pixel is assigned to its NEAREST level (a true partition —
    sums to exactly 1 over levels), matching the reference's exact
    ``n == n_m`` on a discrete scene while staying robust to float
    noise from continuous scene builders."""
    n_scene = np.asarray(n_scene)
    idx = np.argmin(
        np.abs(n_scene[:, None, ...] - levels.reshape(
            (1, len(levels)) + (1,) * (n_scene.ndim - 1))), axis=1)
    return (idx[:, None, ...]
            == np.arange(len(levels)).reshape(
                (1, len(levels)) + (1,) * (n_scene.ndim - 1)))


def _edge_filter(shape, axes_coords, pow_edge=80):
    """Super-Gaussian absorbing frame (the reference's ``has_edges``,
    pyqed/beam/scalar_fields_XYZ.py:618): suppresses wrap-around at the
    periodic FFT boundary."""
    filt = np.ones(shape)
    for ax, c in enumerate(axes_coords):
        c = np.asarray(c)
        half = (c[-1] - c[0]) / 2
        center = (c[-1] + c[0]) / 2
        prof = np.exp(-((c - center) / half) ** pow_edge)
        sh = [1] * len(shape)
        sh[ax] = len(c)
        filt = filt * prof.reshape(sh)
    return jnp.asarray(filt)


class ScalarFieldXYZ:
    """Scalar field in a full (x, y, z) volume — the 2D transverse field
    propagated over a z-stack (reference:
    pyqed/beam/scalar_fields_XYZ.py:560, which parallelizes the z loop
    with multiprocessing.Pool; here the stack is one vmap), plus
    split-step BPM through an inhomogeneous refractive-index volume
    (reference :618 ``BPM`` — a Python z loop there, one ``lax.scan``
    here)."""

    def __init__(self, x, y, z, wavelength, n_background=1.0):
        self.x = np.asarray(x)
        self.y = np.asarray(y)
        self.z = np.asarray(z)
        self.wavelength = wavelength
        self.n = n_background
        self.u = None           # (nz, nx, ny)

    def incident_field(self, u0):
        self.u0 = jnp.asarray(u0, dtype=complex)
        return self

    def propagate(self):
        u0, x, y, wl, n = self.u0, self.x, self.y, self.wavelength, self.n

        def plane(z):
            return _asm_2d(u0, x, y, wl, z, n)

        self.u = jax.vmap(plane)(jnp.asarray(self.z))
        return self.u

    def bpm(self, n_volume=None, has_edges=True, pow_edge=80):
        """Split-step beam propagation through n(x, y, z).

        n_volume: (nz, nx, ny) refractive-index stack (None = uniform
        background, reduces to the ASM result). Each z step applies the
        homogeneous angular-spectrum propagator then the phase screen
        exp(i k0 (n - n0) dz); the full (nz, nx, ny) field stack is
        produced by ONE ``lax.scan``. Plane k lives exactly at
        ``self.z[k]`` (first step covers 0 -> z[0]); non-uniform z grids
        are supported.
        """
        x, y, z = self.x, self.y, self.z
        wl, n0 = self.wavelength, self.n
        dzs = np.diff(np.concatenate([[0.0], np.asarray(z, float)]))
        k0 = 2 * np.pi / wl
        kx = 2 * np.pi * np.fft.fftfreq(len(x), x[1] - x[0])
        ky = 2 * np.pi * np.fft.fftfreq(len(y), y[1] - y[0])
        kz2 = (k0 * n0) ** 2 - kx[:, None] ** 2 - ky[None, :] ** 2
        kz = np.sqrt(kz2.astype(complex))
        if n_volume is None:
            dn = jnp.zeros((len(z), len(x), len(y)))
        else:
            dn = jnp.asarray(n_volume) - n0
        edge = (_edge_filter((len(x), len(y)), (x, y), pow_edge)
                if has_edges else 1.0)
        uniform = np.ptp(dzs) <= 1e-12 * np.max(np.abs(dzs))

        if uniform:       # hoist H out of the scan (the common case)
            H = jnp.asarray(np.exp(1j * kz * dzs[0]))

            def step(u, sl):
                _, dn_k = sl
                u = (jnp.fft.ifft2(H * jnp.fft.fft2(u))
                     * jnp.exp(1j * k0 * dn_k * dzs[0]) * edge)
                return u, u
        else:
            kzj = jnp.asarray(kz)

            def step(u, sl):
                dz, dn_k = sl
                u = (jnp.fft.ifft2(jnp.exp(1j * kzj * dz)
                                   * jnp.fft.fft2(u))
                     * jnp.exp(1j * k0 * dn_k * dz) * edge)
                return u, u

        _, stack = jax.lax.scan(step, self.u0, (jnp.asarray(dzs), dn))
        self.u = stack
        return self.u

    def wpm(self, n_volume=None, levels=None, has_edges=True,
            pow_edge=80):
        """Volume wave propagation method (Schmidt kernel): exact
        homogeneous step per distinct index level, masked selection —
        see ``ScalarFieldXZ.wpm``. Level axis batched as ONE
        (n_levels, nx, ny) FFT stack per scan step (reference:
        pyqed/beam/scalar_fields_XYZ.py WPM loops z x levels)."""
        x, y, z = self.x, self.y, self.z
        wl, n0 = self.wavelength, self.n
        dzs = np.diff(np.concatenate([[0.0], np.asarray(z, float)]))
        k0 = 2 * np.pi / wl
        kx = 2 * np.pi * np.fft.fftfreq(len(x), x[1] - x[0])
        ky = 2 * np.pi * np.fft.fftfreq(len(y), y[1] - y[0])
        if n_volume is None:
            n_vol = np.full((len(z), len(x), len(y)), complex(n0))
        else:
            n_vol = np.asarray(n_volume, dtype=complex)
        levels = _wpm_levels(n_vol, levels)
        kperp2 = kx[:, None] ** 2 + ky[None, :] ** 2
        kz = np.sqrt(((k0 * levels[:, None, None]) ** 2
                      - kperp2[None]).astype(complex))
        kz = np.where(kz.imag < 0, -kz, kz)
        edge = (_edge_filter((len(x), len(y)), (x, y), pow_edge)
                if has_edges else 1.0)
        masks = jnp.asarray(_wpm_partition(n_vol, levels),
                            dtype=jnp.float64)  # (nz, n_levels, nx, ny)
        uniform = np.ptp(dzs) <= 1e-12 * np.max(np.abs(dzs))
        kzj = jnp.asarray(kz)

        if uniform:
            Hm = jnp.asarray(np.exp(1j * kz * dzs[0]))

            def step(u, sl):
                _, mask_k = sl
                Ek = jnp.fft.fft2(u)
                um = jnp.fft.ifft2(Hm * Ek[None], axes=(1, 2))
                u = jnp.sum(mask_k * um, axis=0) * edge
                return u, u
        else:
            def step(u, sl):
                dz, mask_k = sl
                Ek = jnp.fft.fft2(u)
                um = jnp.fft.ifft2(jnp.exp(1j * kzj * dz) * Ek[None],
                                   axes=(1, 2))
                u = jnp.sum(mask_k * um, axis=0) * edge
                return u, u

        _, stack = jax.lax.scan(step, self.u0, (jnp.asarray(dzs), masks))
        self.u = stack
        return self.u

    def pwd(self, n=None):
        """Plane-wave-decomposition volume propagation: exact
        homogeneous kernel at a single scalar index per step — the
        one-level special case of :meth:`wpm` (reference:
        pyqed/beam/scalar_fields_XYZ.py ``PWD``)."""
        x, y, z = self.x, self.y, self.z
        if n is None:
            n = self.n
        dzs = np.diff(np.concatenate([[0.0], np.asarray(z, float)]))
        k0 = 2 * np.pi / self.wavelength
        kx = 2 * np.pi * np.fft.fftfreq(len(x), x[1] - x[0])
        ky = 2 * np.pi * np.fft.fftfreq(len(y), y[1] - y[0])
        kz = np.sqrt(((k0 * n) ** 2 - kx[:, None] ** 2
                      - ky[None, :] ** 2).astype(complex))
        kz = np.where(kz.imag < 0, -kz, kz)
        kzj = jnp.asarray(kz)

        def step(u, dz):
            u = jnp.fft.ifft2(jnp.exp(1j * kzj * dz) * jnp.fft.fft2(u))
            return u, u

        _, stack = jax.lax.scan(step, self.u0, jnp.asarray(dzs))
        self.u = stack
        return self.u

    # ------------------------------------------------- volume utilities

    def to_xy(self, z0):
        """Transverse cut nearest z0 -> (nx, ny)
        (reference: scalar_fields_XYZ.py:850 ``to_Scalar_field_XY``)."""
        return self.u[int(np.argmin(np.abs(self.z - z0)))]

    def to_xz(self, y0=0.0):
        """(z, x) sheet at the y nearest y0 (reference :884)."""
        return self.u[:, :, int(np.argmin(np.abs(self.y - y0)))]

    def to_yz(self, x0=0.0):
        """(z, y) sheet at the x nearest x0 (reference :918)."""
        return self.u[:, int(np.argmin(np.abs(self.x - x0))), :]

    def on_axis(self, x0=0.0, y0=0.0):
        """u(z) along the propagation axis (reference :952 ``to_Z``)."""
        ix = int(np.argmin(np.abs(self.x - x0)))
        iy = int(np.argmin(np.abs(self.y - y0)))
        return self.u[:, ix, iy]

    def average_intensity(self):
        """Mean transverse intensity per z plane (reference :998)."""
        return jnp.mean(jnp.abs(self.u) ** 2, axis=(1, 2))

    def beam_widths(self):
        """Second-moment 1/e widths (wx(z), wy(z)) (reference :1015)."""
        I = jnp.abs(self.u) ** 2
        W = jnp.sum(I, axis=(1, 2))
        xg = jnp.asarray(self.x)[None, :, None]
        yg = jnp.asarray(self.y)[None, None, :]
        cx = jnp.sum(I * xg, axis=(1, 2)) / W
        cy = jnp.sum(I * yg, axis=(1, 2)) / W
        vx = jnp.sum(I * (xg - cx[:, None, None]) ** 2, axis=(1, 2)) / W
        vy = jnp.sum(I * (yg - cy[:, None, None]) ** 2, axis=(1, 2)) / W
        return jnp.sqrt(2 * vx), jnp.sqrt(2 * vy)

    def intensity(self):
        return jnp.abs(self.u) ** 2


def _ez_spectrum(Exk, Eyk, kx, ky, kz, k0, ring_tol=1e-3):
    """Ez(kx,ky) = -(kx Ex + ky Ey)/kz from transversality k·E = 0.

    The reconstruction is singular on the cutoff ring |kz| -> 0 (Ez
    physically diverges at grazing propagation); modes within
    ``ring_tol * k0`` of the ring are zeroed instead of amplifying
    float noise by 1/kz."""
    ring = jnp.abs(kz) < ring_tol * k0
    return jnp.where(ring, 0.0,
                     -(kx * Exk + ky * Eyk) / jnp.where(ring, 1.0, kz))


class VectorFieldXY:
    """Paraxial vector field (Ex, Ey) on a transverse plane with the
    longitudinal Ez reconstructed from transversality
    k·E = 0  ->  Ez(kx, ky) = −(kx Ex + ky Ey)/kz
    (reference: pyqed/beam/vector_fields_XY.py:64 ``Vector_field_XY``).
    """

    def __init__(self, x, y, wavelength, n_background=1.0):
        self.x = np.asarray(x)
        self.y = np.asarray(y)
        self.wavelength = wavelength
        self.n = n_background
        self.Ex = self.Ey = self.Ez = None

    def incident_field(self, Ex, Ey):
        self.Ex = jnp.asarray(Ex, dtype=complex)
        self.Ey = jnp.asarray(Ey, dtype=complex)
        self._fill_Ez()
        return self

    def _kgrids(self):
        kx = 2 * np.pi * np.fft.fftfreq(len(self.x),
                                        self.x[1] - self.x[0])
        ky = 2 * np.pi * np.fft.fftfreq(len(self.y),
                                        self.y[1] - self.y[0])
        return jnp.asarray(kx), jnp.asarray(ky)

    def _kz(self, kx, ky):
        """Complex kz = sqrt(k0^2 - kx^2 - ky^2 + 0i): real for
        propagating modes, +i|kz| for evanescent ones (the principal
        branch is the decaying choice) — the former maximum(kz2, 1e-30)
        clamp divided evanescent Ez components by 1e-15, amplifying
        numerical noise by ~1e15."""
        k0 = 2 * np.pi * self.n / self.wavelength
        kz2 = k0 ** 2 - kx[:, None] ** 2 - ky[None, :] ** 2
        return jnp.sqrt(kz2 + 0j)

    def _fill_Ez(self):
        kx, ky = self._kgrids()
        kz = self._kz(kx, ky)
        Exk = jnp.fft.fft2(self.Ex)
        Eyk = jnp.fft.fft2(self.Ey)
        self.Ez = jnp.fft.ifft2(_ez_spectrum(
            Exk, Eyk, kx[:, None], ky[None, :], kz,
            2 * np.pi * self.n / self.wavelength))

    def propagate(self, z):
        """ASM on each Cartesian component; Ez re-derived after."""
        self.Ex = _asm_2d(self.Ex, self.x, self.y, self.wavelength, z,
                          self.n)
        self.Ey = _asm_2d(self.Ey, self.x, self.y, self.wavelength, z,
                          self.n)
        self._fill_Ez()
        return self

    def vrs(self, z):
        """Vectorial Rayleigh-Sommerfeld propagation (Ye et al., Laser
        Phys. Lett. 10, 065004 (2013); reference:
        pyqed/beam/vector_fields_XY.py ``VRS``): quadrature RS with the
        z-obliquity kernel on Ex/Ey, and Ez from the RS-0 kernel acting
        on (X Ex + Y Ey)/r — exact for the open half-space, unlike the
        periodic ASM of :meth:`propagate`."""
        x, y, wl, n = self.x, self.y, self.wavelength, self.n
        X, Y = np.meshgrid(x, y, indexing="ij")
        r = jnp.asarray(np.sqrt(X ** 2 + Y ** 2 + z ** 2))
        uz = (self.Ex * jnp.asarray(X) + self.Ey * jnp.asarray(Y)) / r
        self.Ex, self.quality = _rs_2d(self.Ex, x, y, wl, z, n, kind="z")
        self.Ey, _ = _rs_2d(self.Ey, x, y, wl, z, n, kind="z")
        self.Ez, _ = _rs_2d(uz, x, y, wl, z, n, kind="0")
        return self

    def _aplanatic(self, radius, focal):
        """Richards-Wolf geometry factors for an aplanatic lens of
        ``radius``/``focal`` on this grid: (rotation stack M(θ, φ),
        pupil mask, sinθ_max).  M bends the collimated Cartesian field
        onto the converging spherical wavefront (reference:
        pyqed/beam/vector_fields_XY.py ``VFFT`` after Jahn & Bokor,
        Opt. Commun. 283, 4859 (2010))."""
        X, Y = np.meshgrid(self.x, self.y, indexing="ij")
        sin_t_max = radius / np.sqrt(radius ** 2 + focal ** 2)
        r = np.sqrt(X ** 2 + Y ** 2)
        phi = np.arctan2(Y, X)
        theta = r / focal
        ct, st = np.cos(theta), np.sin(theta)
        cp, sp = np.cos(phi), np.sin(phi)
        M = np.empty(X.shape + (3, 3))
        M[..., 0, 0] = cp ** 2 * ct + sp ** 2
        M[..., 0, 1] = sp * cp * ct - sp * cp
        M[..., 0, 2] = -st * cp
        M[..., 1, 0] = M[..., 0, 1]
        M[..., 1, 1] = sp ** 2 * ct + cp ** 2
        M[..., 1, 2] = -st * sp
        M[..., 2, 0] = st * cp
        M[..., 2, 1] = st * sp
        M[..., 2, 2] = ct
        pupil = (r <= radius).astype(float)
        return jnp.asarray(M), jnp.asarray(pupil), sin_t_max

    def vfft(self, radius, focal, remove0=True, shift=True):
        """High-NA aplanatic-lens vector focusing: rotate (Ex, Ey, Ez)
        onto the converging wavefront, apodize by sqrt(cosθ) and the
        aplanatic 1/sqrt(1 - sin²θ_max (u²+v²)) factor, and FFT to the
        focal region (Debye integral as one FFT; reference:
        pyqed/beam/vector_fields_XY.py ``VFFT``).  Updates the field
        in place and returns self."""
        M, pupil, stm = self._aplanatic(radius, focal)
        X, Y = np.meshgrid(self.x, self.y, indexing="ij")
        uv2 = (X ** 2 + Y ** 2) / radius ** 2
        G = pupil / jnp.sqrt(jnp.maximum(1.0 - stm ** 2
                                         * jnp.asarray(uv2), 1e-12))
        theta = jnp.asarray(np.hypot(X, Y) / focal)
        apod = jnp.sqrt(jnp.abs(jnp.cos(theta)))
        E = jnp.stack([self.Ex * pupil, self.Ey * pupil,
                       self.Ez * pupil], axis=-1)
        E0 = jnp.einsum("xyij, xyj -> xyi", M.astype(complex), E)
        factor = -1j * stm ** 2 / (focal * self.wavelength)
        comps = []
        for i in range(3):
            Ek = jnp.fft.fft2(apod * G * E0[..., i])
            if remove0 and i < 2:
                Ek = Ek.at[0, 0].set(0.0)
            if shift:
                Ek = jnp.fft.fftshift(Ek)
            comps.append(factor * Ek)
        self.Ex, self.Ey, self.Ez = comps
        return self

    def ivfft(self, radius, focal, shift=True):
        """Inverse of :meth:`vfft`: inverse-FFT the focal field back to
        the pupil, undo the aplanatic weighting, and rotate the
        spherical wavefront back to collimated Cartesian components
        (rotation with θ -> -θ; reference:
        pyqed/beam/vector_fields_XY.py ``IVFFT``)."""
        M, pupil, stm = self._aplanatic(radius, -focal)
        X, Y = np.meshgrid(self.x, self.y, indexing="ij")
        uv2 = (X ** 2 + Y ** 2) / radius ** 2
        G = pupil * jnp.sqrt(jnp.maximum(1.0 - stm ** 2
                                         * jnp.asarray(uv2), 0.0))
        factor = 1.0 / (-1j * stm ** 2 / (focal * self.wavelength))
        comps = []
        for i, E in enumerate([self.Ex, self.Ey, self.Ez]):
            Ek = jnp.fft.ifftshift(E) if shift else E
            comps.append(factor * jnp.fft.ifft2(Ek) * G)
        Es = jnp.stack(comps, axis=-1)
        E0 = jnp.einsum("xyij, xyj -> xyi", M.astype(complex), Es)
        self.Ex, self.Ey, self.Ez = (E0[..., 0] * pupil,
                                     E0[..., 1] * pupil,
                                     E0[..., 2] * pupil)
        return self

    def intensity(self):
        return (jnp.abs(self.Ex) ** 2 + jnp.abs(self.Ey) ** 2
                + jnp.abs(self.Ez) ** 2)

    def stokes(self):
        """(S0, S1, S2, S3) transverse Stokes parameters."""
        Ex, Ey = self.Ex, self.Ey
        S0 = jnp.abs(Ex) ** 2 + jnp.abs(Ey) ** 2
        S1 = jnp.abs(Ex) ** 2 - jnp.abs(Ey) ** 2
        S2 = 2 * jnp.real(Ex * jnp.conj(Ey))
        S3 = -2 * jnp.imag(Ex * jnp.conj(Ey))
        return S0, S1, S2, S3


class VectorFieldXYZ:
    """Vector field over a full (x, y, z) volume.

    The reference's vendored diffractio stops at the transverse plane
    (pyqed/beam/vector_fields_XY.py — no vector XYZ module exists
    there); this extends :class:`VectorFieldXY` to z-stacks the same way
    :class:`ScalarFieldXYZ` extends XY: one batched angular-spectrum
    kernel over all planes (Exk/Eyk are FFT'd ONCE and reused for every
    z), with the longitudinal Ez reconstructed per plane from
    transversality Ez(kx,ky) = -(kx Ex + ky Ey)/kz.  Free-space /
    uniform-background propagation; for inhomogeneous isotropic media
    run the two transverse components through ``ScalarFieldXYZ.bpm``
    (polarization-decoupled in the paraxial isotropic limit).
    """

    def __init__(self, x, y, z, wavelength, n_background=1.0):
        self.x = np.asarray(x)
        self.y = np.asarray(y)
        self.z = np.asarray(z)
        self.wavelength = wavelength
        self.n = n_background
        self.Ex = self.Ey = self.Ez = None      # (nz, nx, ny)

    def incident_field(self, Ex, Ey):
        self.Ex0 = jnp.asarray(Ex, dtype=complex)
        self.Ey0 = jnp.asarray(Ey, dtype=complex)
        return self

    def propagate(self):
        x, y, wl, n = self.x, self.y, self.wavelength, self.n
        kx = 2 * np.pi * np.fft.fftfreq(len(x), x[1] - x[0])
        ky = 2 * np.pi * np.fft.fftfreq(len(y), y[1] - y[0])
        kx = jnp.asarray(kx)[:, None]
        ky = jnp.asarray(ky)[None, :]
        k0 = 2 * np.pi * n / wl
        kz2 = k0 ** 2 - kx ** 2 - ky ** 2
        kz_prop = jnp.sqrt(jnp.abs(kz2))
        kz_c = jnp.sqrt(kz2 + 0j)
        Exk0 = jnp.fft.fft2(self.Ex0)
        Eyk0 = jnp.fft.fft2(self.Ey0)

        def plane(z):
            H = jnp.where(kz2 >= 0, jnp.exp(1j * kz_prop * z),
                          jnp.exp(-kz_prop * jnp.abs(z)))
            Exk = Exk0 * H
            Eyk = Eyk0 * H
            Ezk = _ez_spectrum(Exk, Eyk, kx, ky, kz_c, k0)
            return (jnp.fft.ifft2(Exk), jnp.fft.ifft2(Eyk),
                    jnp.fft.ifft2(Ezk))

        self.Ex, self.Ey, self.Ez = jax.vmap(plane)(jnp.asarray(self.z))
        return self

    def to_xy(self, z0):
        """Nearest-plane VectorFieldXY view at z ~ z0."""
        k = int(np.argmin(np.abs(self.z - z0)))
        out = VectorFieldXY(self.x, self.y, self.wavelength, self.n)
        out.Ex, out.Ey, out.Ez = self.Ex[k], self.Ey[k], self.Ez[k]
        return out

    def intensity(self):
        """(nz, nx, ny) total intensity |Ex|^2 + |Ey|^2 + |Ez|^2."""
        return (jnp.abs(self.Ex) ** 2 + jnp.abs(self.Ey) ** 2
                + jnp.abs(self.Ez) ** 2)

    def on_axis(self, x0=0.0, y0=0.0):
        """(|Ex|^2+|Ey|^2, |Ez|^2) along z at the nearest (x0, y0)."""
        i = int(np.argmin(np.abs(self.x - x0)))
        j = int(np.argmin(np.abs(self.y - y0)))
        It = (jnp.abs(self.Ex[:, i, j]) ** 2
              + jnp.abs(self.Ey[:, i, j]) ** 2)
        Iz = jnp.abs(self.Ez[:, i, j]) ** 2
        return It, Iz

    def stokes(self):
        """Transverse Stokes stacks, each (nz, nx, ny)."""
        Ex, Ey = self.Ex, self.Ey
        S0 = jnp.abs(Ex) ** 2 + jnp.abs(Ey) ** 2
        S1 = jnp.abs(Ex) ** 2 - jnp.abs(Ey) ** 2
        S2 = 2 * jnp.real(Ex * jnp.conj(Ey))
        S3 = -2 * jnp.imag(Ex * jnp.conj(Ey))
        return S0, S1, S2, S3


def laguerre_gauss_beam(field: "ScalarFieldXY", w0, l=1, p=0,
                        x0=0.0, y0=0.0, amplitude=1.0):
    """Laguerre-Gaussian LG_{p,l} vortex source at the waist plane
    (reference: pyqed/beam/scalar_sources_XY.py ``laguerre_beam`` /
    pyqed/beam.py ``LaguerreGaussian``): azimuthal phase e^{i l phi}
    carrying orbital angular momentum l*hbar per photon.
    """
    from scipy.special import genlaguerre
    X, Y = np.meshgrid(field.x, field.y, indexing="ij")
    r2 = (X - x0) ** 2 + (Y - y0) ** 2
    phi = np.arctan2(Y - y0, X - x0)
    rho = 2.0 * r2 / w0 ** 2
    L = genlaguerre(p, abs(l))(rho)
    u = (amplitude * (np.sqrt(r2) * np.sqrt(2.0) / w0) ** abs(l) * L
         * np.exp(-r2 / w0 ** 2) * np.exp(1j * l * phi))
    field.u = jnp.asarray(u)
    return field


# ---------------------------------------------------------------------------
# mask zoo (reference: pyqed/beam/scalar_masks_XY.py — the most-used subset
# of the vendored diffractio fork, rebuilt as vectorized jnp field ops)
# ---------------------------------------------------------------------------

def _XY(field):
    return np.meshgrid(field.x, field.y, indexing="ij")


def square(field, size, x0=0.0, y0=0.0):
    """Square aperture (reference: scalar_masks_XY.py ``square``)."""
    X, Y = _XY(field)
    t = (np.abs(X - x0) <= size / 2) & (np.abs(Y - y0) <= size / 2)
    field.u = field.u * jnp.asarray(t.astype(float))
    return field


def ring(field, r_in, r_out, x0=0.0, y0=0.0):
    """Annular aperture (reference: ``ring``)."""
    X, Y = _XY(field)
    r = np.hypot(X - x0, Y - y0)
    t = (r >= r_in) & (r <= r_out)
    field.u = field.u * jnp.asarray(t.astype(float))
    return field


def cross(field, width, length=None):
    """Cross aperture (reference: ``cross``)."""
    X, Y = _XY(field)
    L = length if length is not None else np.inf
    t = ((np.abs(X) <= width / 2) & (np.abs(Y) <= L / 2)) | \
        ((np.abs(Y) <= width / 2) & (np.abs(X) <= L / 2))
    field.u = field.u * jnp.asarray(t.astype(float))
    return field


def super_gauss(field, w, power=8, x0=0.0, y0=0.0):
    """Super-Gaussian soft aperture (reference: ``super_gauss``)."""
    X, Y = _XY(field)
    r2 = (X - x0) ** 2 + (Y - y0) ** 2
    field.u = field.u * jnp.asarray(np.exp(-(r2 / w ** 2) ** (power / 2)))
    return field


def prism(field, angle_x=0.0, angle_y=0.0):
    """Thin prism: linear phase ramp (reference: ``prism``)."""
    X, Y = _XY(field)
    k = field.k
    field.u = field.u * jnp.exp(
        1j * k * (np.sin(angle_x) * X + np.sin(angle_y) * Y))
    return field


def axicon(field, angle, n_refr=1.5):
    """Conical lens: radial phase ramp producing a Bessel-like zone
    (reference: ``axicon``)."""
    X, Y = _XY(field)
    r = np.hypot(X, Y)
    kr = field.k * (n_refr - 1.0) * np.tan(angle)
    field.u = field.u * jnp.exp(-1j * kr * r)
    return field


def fresnel_lens(field, focal, levels=2):
    """Binary (or multilevel) Fresnel zone lens: the ideal quadratic
    phase quantized to ``levels`` steps (reference: ``fresnel_lens``)."""
    X, Y = _XY(field)
    r2 = X ** 2 + Y ** 2
    phi = -field.k * r2 / (2 * focal)
    phi_q = (np.floor((phi / (2 * np.pi) % 1.0) * levels) / levels
             * 2 * np.pi)
    field.u = field.u * jnp.exp(1j * phi_q)
    return field


def sine_grating(field, period, depth=np.pi, x0=0.0):
    """Thin sinusoidal PHASE grating t = exp(i depth/2 sin(2 pi x/p))
    — diffraction orders weighted by J_m(depth/2)
    (reference: ``sine_grating``)."""
    X, _ = _XY(field)
    field.u = field.u * jnp.exp(
        1j * depth / 2 * np.sin(2 * np.pi * (X - x0) / period))
    return field


def ronchi_grating(field, period, x0=0.0, fill=0.5):
    """Binary amplitude (Ronchi) grating (reference: ``ronchi_grating``)."""
    X, _ = _XY(field)
    t = ((X - x0) / period % 1.0) < fill
    field.u = field.u * jnp.asarray(t.astype(float))
    return field


def binary_grating(field, period, amin=0.0, amax=1.0, phase=0.0, fill=0.5):
    """General binary amplitude/phase grating (reference:
    ``binary_grating``)."""
    X, _ = _XY(field)
    t = (X / period % 1.0) < fill
    amp = np.where(t, amax, amin)
    ph = np.where(t, phase, 0.0)
    field.u = field.u * jnp.asarray(amp * np.exp(1j * ph))
    return field


def blazed_grating(field, period, phase_max=2 * np.pi):
    """Sawtooth phase grating; phase_max = 2 pi throws all energy into
    the +1 order (reference: ``blazed_grating``)."""
    X, _ = _XY(field)
    field.u = field.u * jnp.exp(
        1j * phase_max * ((X / period) % 1.0))
    return field


def forked_grating(field, period, l=1, depth=np.pi):
    """Fork hologram: binary grating with an embedded l-charge
    dislocation — diffraction orders carry OAM ±l
    (reference: ``forked_grating``)."""
    X, Y = _XY(field)
    phi = np.arctan2(Y, X)
    arg = 2 * np.pi * X / period - l * phi
    t = np.cos(arg) > 0
    field.u = field.u * jnp.asarray(t.astype(float))
    return field


# ---------------------------------------------------------------------------
# source zoo (reference: pyqed/beam/scalar_sources_XY.py)
# ---------------------------------------------------------------------------

def spherical_wave(field, z0, x0=0.0, y0=0.0, amplitude=1.0):
    """Paraxial spherical wave from a point at distance z0 behind the
    plane (reference: ``spherical_wave``)."""
    X, Y = _XY(field)
    r2 = (X - x0) ** 2 + (Y - y0) ** 2
    field.u = jnp.asarray(amplitude * np.exp(1j * field.k * r2 / (2 * z0)))
    return field


def hermite_gauss_beam(field, w0, m=0, n=0, amplitude=1.0):
    """HG_{mn} mode at the waist (reference: ``hermite_gauss_beam``)."""
    from scipy.special import eval_hermite
    X, Y = _XY(field)
    s = np.sqrt(2.0) / w0
    u = (amplitude * eval_hermite(m, s * X) * eval_hermite(n, s * Y)
         * np.exp(-(X ** 2 + Y ** 2) / w0 ** 2))
    field.u = jnp.asarray(u.astype(complex))
    return field


def bessel_beam(field, kr, l=0, amplitude=1.0):
    """Nondiffracting Bessel beam J_l(kr r) e^{i l phi}
    (reference: ``bessel_beam``)."""
    from scipy.special import jv
    X, Y = _XY(field)
    r = np.hypot(X, Y)
    phi = np.arctan2(Y, X)
    field.u = jnp.asarray(amplitude * jv(l, kr * r) * np.exp(1j * l * phi))
    return field


def vortex_beam(field, w0, l=1, amplitude=1.0):
    """Gaussian with an embedded l-charge vortex (reference:
    ``vortex_beam``)."""
    return laguerre_gauss_beam(field, w0, l=l, p=0, amplitude=amplitude)


def plane_waves_several_inclined(field, angles, amplitude=1.0):
    """Coherent superposition of tilted plane waves (reference:
    ``plane_waves_several_inclined``)."""
    X, _ = _XY(field)
    u = np.zeros_like(X, dtype=complex)
    for th in np.atleast_1d(angles):
        u += amplitude * np.exp(1j * field.k * np.sin(th) * X)
    field.u = jnp.asarray(u)
    return field


# reference drop-in aliases (pyqed/beam/scalar_fields_XZ.py,
# scalar_fields_XYZ.py class names)
Scalar_field_XZ = ScalarFieldXZ
Scalar_field_XYZ = ScalarFieldXYZ


# ----------------------------------------------------------------------
# drawing conveniences (the vendored diffractio ships draw()/draw_profile
# on every field class — reference: pyqed/beam/scalar_fields_X.py:1008,
# scalar_fields_XY.py:1407,1936, scalar_fields_XYZ.py:1202-1356).
# Implemented once here against utils.style's Agg-safe matplotlib.
# ----------------------------------------------------------------------

def _field_view(u, kind, logarithm=False, normalize=False, cut_value=None):
    """Extract the requested view of a complex field — ONE transform
    shared with beam.drawing (prepare_drawing + normalize_draw), so the
    unified draw() entry point applies identical semantics whichever
    field type it dispatches to.  Kinds: 'intensity', 'amplitude',
    'phase', 'real', 'imag', 'field'."""
    from .drawing import field_view
    return field_view(u, kind, logarithm=logarithm, normalize=normalize,
                      cut_value=cut_value)


def _draw_1d(x, u, kind, logarithm, normalize, cut_value, filename,
             xlabel="x"):
    from ..utils.style import _mpl
    plt = _mpl()
    data = _field_view(u, kind, logarithm, normalize, cut_value)
    fig, ax = plt.subplots(figsize=(4.5, 3))
    ax.plot(np.asarray(x), data)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(kind)
    fig.tight_layout()
    if filename:
        fig.savefig(filename, dpi=150)
        plt.close(fig)
    return fig, ax


def _draw_2d(x, y, u, kind, logarithm, normalize, cut_value, filename,
             xlabel="x", ylabel="y"):
    from ..utils.style import _mpl
    plt = _mpl()
    data = _field_view(u, kind, logarithm, normalize, cut_value)
    fig, ax = plt.subplots(figsize=(4.5, 3.6))
    ext = [float(np.min(x)), float(np.max(x)),
           float(np.min(y)), float(np.max(y))]
    im = ax.imshow(data.T, origin="lower", extent=ext, aspect="auto",
                   cmap="inferno" if kind != "phase" else "twilight")
    fig.colorbar(im, ax=ax, label=kind)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    fig.tight_layout()
    if filename:
        fig.savefig(filename, dpi=150)
        plt.close(fig)
    return fig, ax


def _add_draw_methods():
    def draw_x(self, kind="intensity", logarithm=False, normalize=False,
               cut_value=None, filename=""):
        """Plot the 1D field (reference: scalar_fields_X.py:1008)."""
        return _draw_1d(self.x, self.u, kind, logarithm, normalize,
                        cut_value, filename)

    def draw_xy(self, kind="intensity", logarithm=False, normalize=False,
                cut_value=None, filename=""):
        """Plot the 2D field (reference: scalar_fields_XY.py:1936)."""
        return _draw_2d(self.x, self.y, self.u, kind, logarithm,
                        normalize, cut_value, filename)

    def draw_profile(self, point1, point2, npoints=256, kind="intensity",
                     filename=""):
        """Field profile along the segment point1 -> point2 by bilinear
        interpolation (reference: scalar_fields_XY.py:1407)."""
        x0, y0 = point1
        x1, y1 = point2
        ts = np.linspace(0.0, 1.0, npoints)
        xs = x0 + ts * (x1 - x0)
        ys = y0 + ts * (y1 - y0)
        from scipy.interpolate import RegularGridInterpolator
        u = np.asarray(self.u)
        itp_r = RegularGridInterpolator((self.x, self.y), u.real)
        itp_i = RegularGridInterpolator((self.x, self.y), u.imag)
        pts = np.stack([xs, ys], axis=1)
        prof = itp_r(pts) + 1j * itp_i(pts)
        s = np.hypot(xs - x0, ys - y0)
        if filename:
            _draw_1d(s, prof, kind, False, False, None, filename,
                     xlabel="s")
        return s, prof

    def draw_xz(self, kind="intensity", logarithm=False, normalize=False,
                cut_value=None, filename=""):
        """Plot the XZ field (reference: scalar_fields_XZ.py)."""
        # self.u is (nz, nx): rows follow self.z, columns self.x
        return _draw_2d(self.z, self.x, np.asarray(self.u), kind,
                        logarithm, normalize, cut_value, filename,
                        xlabel="z", ylabel="x")

    def draw_vector(self, kind="intensity", logarithm=False,
                    normalize=False, cut_value=None, filename=""):
        """Panel per component (Ex, Ey, Ez) plus the total intensity
        (reference: pyqed/beam/vector_fields_XY.py ``draw`` modes)."""
        from ..utils.style import _mpl
        plt = _mpl()
        comps = [("Ex", self.Ex), ("Ey", self.Ey)]
        if getattr(self, "Ez", None) is not None:
            comps.append(("Ez", self.Ez))
        fig, axs = plt.subplots(1, len(comps) + 1,
                                figsize=(3.2 * (len(comps) + 1), 3))
        ext = [float(np.min(self.x)), float(np.max(self.x)),
               float(np.min(self.y)), float(np.max(self.y))]
        for a, (name, E) in zip(axs, comps):
            data = _field_view(E, kind, logarithm, normalize, cut_value)
            a.imshow(data.T, origin="lower", extent=ext, aspect="auto",
                     cmap="inferno" if kind != "phase" else "twilight")
            a.set_title(f"{name} {kind}")
        tot = _field_view(np.sqrt(np.asarray(self.intensity())),
                          "intensity", logarithm, normalize, cut_value)
        axs[-1].imshow(tot.T, origin="lower", extent=ext, aspect="auto",
                       cmap="inferno")
        axs[-1].set_title("total intensity")
        fig.tight_layout()
        if filename:
            fig.savefig(filename, dpi=150)
            plt.close(fig)
        return fig, axs

    ScalarFieldX.draw = draw_x
    ScalarFieldXY.draw = draw_xy
    ScalarFieldXY.draw_profile = draw_profile

    ScalarFieldXZ.draw = draw_xz
    VectorFieldXY.draw = draw_vector


_add_draw_methods()


def draw_several_fields(fields, titles=(), kind="intensity",
                        logarithm=False, normalize=False, filename=""):
    """One row of panels, one 2D field each
    (reference: pyqed/beam/utils_drawing.py:146). Returns (fig, axes)."""
    from ..utils.style import _mpl
    plt = _mpl()
    n = len(fields)
    fig, axs = plt.subplots(1, n, figsize=(3.4 * n, 3))
    axs = np.atleast_1d(axs)
    for k, (f, a) in enumerate(zip(fields, axs)):
        data = _field_view(f.u, kind, logarithm, normalize, None)
        ext = [float(np.min(f.x)), float(np.max(f.x)),
               float(np.min(f.y)), float(np.max(f.y))]
        a.imshow(data.T, origin="lower", extent=ext, aspect="auto",
                 cmap="inferno" if kind != "phase" else "twilight")
        if k < len(titles):
            a.set_title(titles[k])
    fig.tight_layout()
    if filename:
        fig.savefig(filename, dpi=150)
        plt.close(fig)
    return fig, axs


# ----------------------------------------------------------- MTF utilities
def mtf_ideal(frequencies, wavelength, diameter, focal, kind="2D"):
    """Diffraction-limited MTF of an ideal lens at the given spatial
    frequencies in lines/mm (reference: pyqed/beam/utils_optics.py:531
    ``MTF_ideal``; standard diffraction-limit formulas — 1D slit:
    triangle; 2D circular pupil: the autocorrelation-of-disks arc
    formula). Returns (mtf, cutoff_frequency_lines_per_mm)."""
    f_number = focal / diameter
    f_cut = 1000.0 / (wavelength * f_number)      # um -> lines/mm
    fn = np.abs(np.asarray(frequencies, dtype=float)) / f_cut
    if kind == "1D":
        mtf = np.clip(1.0 - fn, 0.0, None)
    elif kind == "2D":
        fn_c = np.minimum(fn, 1.0)
        phi = np.arccos(fn_c)
        mtf = np.where(fn <= 1.0,
                       (2.0 / np.pi) * (phi - np.cos(phi) * np.sin(phi)),
                       0.0)
    else:
        raise ValueError(f"kind {kind!r}")
    return mtf, f_cut


def _mtf_1d(self):
    """Normalized MTF of the 1D field: |FT of the intensity PSF|,
    normalized at zero frequency (reference:
    pyqed/beam/scalar_fields_X.py:914 ``MTF``). Returns (fx_lines_per_mm,
    mtf)."""
    dx = self.x[1] - self.x[0]
    psf = np.abs(np.asarray(self.u)) ** 2
    otf = np.fft.fftshift(np.fft.fft(np.fft.ifftshift(psf)))
    mtf = np.abs(otf)
    mtf = mtf / mtf[len(mtf) // 2]
    fx = 1000.0 * np.fft.fftshift(np.fft.fftfreq(len(self.x), dx))
    return fx, mtf


def _mtf_2d(self):
    """2D MTF (reference: pyqed/beam/scalar_fields_XY.py:1492)."""
    dx = self.x[1] - self.x[0]
    dy = self.y[1] - self.y[0]
    psf = np.abs(np.asarray(self.u)) ** 2
    otf = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(psf)))
    mtf = np.abs(otf)
    mtf = mtf / mtf[mtf.shape[0] // 2, mtf.shape[1] // 2]
    fx = 1000.0 * np.fft.fftshift(np.fft.fftfreq(len(self.x), dx))
    fy = 1000.0 * np.fft.fftshift(np.fft.fftfreq(len(self.y), dy))
    return fx, fy, mtf


ScalarFieldX.MTF = _mtf_1d
ScalarFieldXY.MTF = _mtf_2d
