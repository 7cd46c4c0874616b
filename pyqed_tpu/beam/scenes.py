"""Refraction-index scene builders for the XZ sheet and XYZ volume BPM.

TPU-native counterpart of the reference's ``Scalar_mask_XZ`` /
``Scalar_mask_XYZ`` geometry builders (reference:
pyqed/beam/scalar_masks_XZ.py — ``object_by_surfaces:302``,
``semi_plane:535``, ``layer:560``, ``rectangle:587``, ``slit:640``,
``sphere:692``, ``semi_sphere:729``, ``lens_plane_convergent:767``,
``lens_convergent:837``, ``lens_plane_divergent:912``,
``lens_divergent:979``, ``aspheric_surface_z:1056``,
``aspheric_lens:1107``, ``wedge:1193``, ``prism:1233``,
``biprism:1264``, ``probe:1380``, ``rough_sheet:1412``,
``mask_from_function:112``, ``mask_from_array:146``,
``discretize_refraction_index:436``; pyqed/beam/scalar_masks_XYZ.py —
``object_by_surfaces``, ``sphere``, ``cylinder``).

Design differences from the reference (deliberate, TPU-first):

* The scene is a plain ``(nz, nx)`` (XZ) or ``(nz, nx, ny)`` (XYZ)
  index array — exactly the ``n_xz`` / ``n_volume`` input of
  ``ScalarFieldXZ.bpm`` / ``ScalarFieldXYZ.bpm`` — not a mutable field
  object.  Builders are pure: ``n_new = builder(n, x, z, ...)``.
* Surface conditions are plain Python callables ``f(Xrot, Zrot) ->
  bool array`` instead of the reference's ``eval``/numexpr strings —
  jit-traceable, composable and safe.
* Stochastic surfaces (``rough_sheet``) take an explicit
  ``jax.random`` key.

All geometry is evaluated as vectorized boolean fields on the full
meshgrid (no per-pixel loops).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "xz_grids", "object_by_surfaces", "semi_plane", "layer", "rectangle",
    "slit", "sphere", "semi_sphere", "wedge", "prism", "biprism", "probe",
    "lens_plane_convergent", "lens_convergent", "lens_plane_divergent",
    "lens_divergent", "aspheric_surface_z", "aspheric_lens",
    "mask_from_function_xz", "mask_from_array_xz", "rough_sheet",
    "discretize_refraction_index", "image_xz",
    "extrude_mask_xz", "dots_xz", "add_surfaces", "ronchi_grating_xz",
    "sine_grating_xz",
    "sphere_xyz", "cylinder_xyz", "object_by_surfaces_xyz",
]


def xz_grids(x, z):
    """Meshgrids with the BPM sheet layout (nz, nx): returns (X, Z)."""
    Z, X = jnp.meshgrid(jnp.asarray(z), jnp.asarray(x), indexing="ij")
    return X, Z


def _rot_xz(X, Z, angle, point):
    """Rotate about ``point``; stays in the ABSOLUTE frame (the
    reference's ``__rotate__``, scalar_fields_XZ.py:217)."""
    x0, z0 = point
    c, s = np.cos(angle), np.sin(angle)
    Xr = x0 + (X - x0) * c + (Z - z0) * s
    Zr = z0 - (X - x0) * s + (Z - z0) * c
    return Xr, Zr


def object_by_surfaces(n, x, z, conditions, refraction_index, angle=0.0,
                       rotation_point=(0.0, 0.0)):
    """Set ``refraction_index`` where ALL ``conditions`` hold.

    conditions: iterable of callables ``f(Xrot, Zrot) -> bool array``
    (absolute rotated coordinates). ``refraction_index`` may be a
    scalar or a callable ``n(Xrot, Zrot)``.
    Returns the updated (nz, nx) sheet.
    """
    X, Z = xz_grids(x, z)
    Xr, Zr = _rot_xz(X, Z, angle, rotation_point)
    inside = jnp.ones(X.shape, dtype=bool)
    for cond in conditions:
        inside = inside & cond(Xr, Zr)
    if callable(refraction_index):
        val = refraction_index(Xr, Zr)
    else:
        val = refraction_index
    return jnp.where(inside, val, jnp.asarray(n))


def semi_plane(n, x, z, r0, refraction_index, angle=0.0,
               rotation_point=None):
    """Half space z > z0."""
    x0, z0 = r0
    rp = r0 if rotation_point is None else rotation_point
    return object_by_surfaces(n, x, z, [lambda X, Z: Z > z0],
                              refraction_index, angle, rp)


def layer(n, x, z, r0, depth, refraction_index, angle=0.0,
          rotation_point=None):
    """Slab z0 < z < z0 + depth."""
    x0, z0 = r0
    rp = r0 if rotation_point is None else rotation_point
    return object_by_surfaces(
        n, x, z, [lambda X, Z: (Z > z0) & (Z < z0 + depth)],
        refraction_index, angle, rp)


def rectangle(n, x, z, r0, size, refraction_index, angle=0.0,
              rotation_point=None):
    """Centered rectangle of (sizex, sizez)."""
    x0, z0 = r0
    sx, sz = (size, size) if np.isscalar(size) else size
    rp = r0 if rotation_point is None else rotation_point
    return object_by_surfaces(
        n, x, z,
        [lambda X, Z: (jnp.abs(X - x0) < sx / 2)
         & (jnp.abs(Z - z0) < sz / 2)],
        refraction_index, angle, rp)


def slit(n, x, z, r0, aperture, depth, refraction_index,
         refraction_index_center=None, angle=0.0, rotation_point=None):
    """Opaque screen of ``depth`` with an opening of ``aperture``.
    The opening keeps the previous index (or gets
    ``refraction_index_center`` if given)."""
    x0, z0 = r0
    rp = r0 if rotation_point is None else rotation_point
    n_prev = jnp.asarray(n)
    n1 = object_by_surfaces(
        n_prev, x, z, [lambda X, Z: (Z > z0) & (Z < z0 + depth)],
        refraction_index, angle, rp)
    inside_center = [lambda X, Z: (Z > z0) & (Z < z0 + depth)
                     & (jnp.abs(X - x0) < aperture / 2)]
    if refraction_index_center is not None:
        return object_by_surfaces(n1, x, z, inside_center,
                                  refraction_index_center, angle, rp)
    # restore the pre-existing index inside the aperture
    X, Z = xz_grids(x, z)
    Xr, Zr = _rot_xz(X, Z, angle, rp)
    hole = inside_center[0](Xr, Zr)
    return jnp.where(hole, n_prev, n1)


def sphere(n, x, z, r0, radius, refraction_index, angle=0.0,
           rotation_point=None):
    """Circle/ellipse cross-section (the XZ cut of a sphere)."""
    x0, z0 = r0
    rx, rz = (radius, radius) if np.isscalar(radius) else radius
    rp = r0 if rotation_point is None else rotation_point
    return object_by_surfaces(
        n, x, z,
        [lambda X, Z: (X - x0) ** 2 / rx ** 2
         + (Z - z0) ** 2 / rz ** 2 < 1],
        refraction_index, angle, rp)


def semi_sphere(n, x, z, r0, radius, refraction_index, angle=0.0,
                rotation_point=None):
    """Half-disc z > z0 inside the ellipse."""
    x0, z0 = r0
    rx, rz = (radius, radius) if np.isscalar(radius) else radius
    rp = r0 if rotation_point is None else rotation_point
    return object_by_surfaces(
        n, x, z,
        [lambda X, Z: Z > z0,
         lambda X, Z: (X - x0) ** 2 / rx ** 2
         + (Z - z0) ** 2 / rz ** 2 < 1],
        refraction_index, angle, rp)


def wedge(n, x, z, r0, length, refraction_index, angle_wedge, angle=0.0,
          rotation_point=None):
    """Wedge pointing into the beam: x > x0, z < z0 + length,
    (x - x0) < tan(angle_wedge) (z - z0)."""
    x0, z0 = r0
    rp = r0 if rotation_point is None else rotation_point
    t = np.tan(angle_wedge)
    return object_by_surfaces(
        n, x, z,
        [lambda X, Z: X > x0,
         lambda X, Z: Z < z0 + length,
         lambda X, Z: (X - x0) < t * (Z - z0)],
        refraction_index, angle, rp)


def prism(n, x, z, r0, length, refraction_index, angle_prism, angle=0.0,
          rotation_point=None):
    """Prism with one face parallel to x = x0 (reference ``prism:1233``)."""
    x0, z0 = r0
    rp = r0 if rotation_point is None else rotation_point
    t1 = np.tan(angle_prism / 2)
    t2 = np.tan(np.pi - angle_prism / 2)
    return object_by_surfaces(
        n, x, z,
        [lambda X, Z: X > x0,
         lambda X, Z: (Z - z0) > t1 * (X - x0),
         lambda X, Z: (Z - (z0 + length)) < t2 * (X - x0)],
        refraction_index, angle, rp)


def biprism(n, x, z, r0, length, height, refraction_index, angle=0.0):
    """Fresnel biprism: tent profile of base ``length`` and apex
    ``height`` sitting on z = z0."""
    x0, z0 = r0
    slope = 2 * height / length
    return object_by_surfaces(
        n, x, z,
        [lambda X, Z: Z > z0,
         lambda X, Z: (Z - (z0 + height)) < -slope * (X - x0),
         lambda X, Z: (Z - (z0 + height)) < slope * (X - x0)],
        refraction_index, angle, r0)


def probe(n, x, z, r0, base, length, refraction_index, angle=0.0):
    """Sinusoidal-tip probe (near-field tip model)."""
    x0, z0 = r0
    return object_by_surfaces(
        n, x, z,
        [lambda X, Z: Z < (length - z0)
         + length / 2 * jnp.cos(2 * np.pi * X / base),
         lambda X, Z: jnp.abs(X - x0) < base / 2,
         lambda X, Z: Z > z0],
        refraction_index, angle, r0)


# ------------------------------------------------------------------
# lens builders (spherical surfaces; reference :767-1050)
# ------------------------------------------------------------------

def lens_plane_convergent(n, x, z, r0, aperture, radius, thickness,
                          refraction_index, angle=0.0, mask=None):
    """Plano-convex lens: flat entry face at z0, spherical exit face of
    curvature ``radius`` (center at z0 + thickness - radius).
    Returns (n_new, focal) with focal = radius / (n_lens - 1)."""
    x0, z0 = r0
    n_new = object_by_surfaces(
        n, x, z,
        [lambda X, Z: Z > z0,
         lambda X, Z: jnp.abs(X - x0) < aperture / 2,
         lambda X, Z: (X - x0) ** 2
         + (Z - (z0 + thickness - radius)) ** 2 < radius ** 2],
        refraction_index, angle, r0)
    focal = radius / (refraction_index - 1)
    return n_new, focal


def lens_convergent(n, x, z, r0, aperture, radius, thickness,
                    refraction_index, angle=0.0):
    """Biconvex lens from two spherical caps; radius=(R1, -R2) with the
    diffractio sign convention (R1 > 0 entry, R2 < 0 exit).
    Returns (n_new, focal) via the lensmaker equation (thin-lens
    approximation of the thick formula)."""
    x0, z0 = r0
    R1, R2 = radius
    nl = refraction_index
    n_new = object_by_surfaces(
        n, x, z,
        [lambda X, Z: jnp.abs(X - x0) < aperture / 2,
         lambda X, Z: (X - x0) ** 2 + (Z - (z0 + R1)) ** 2 < R1 ** 2,
         lambda X, Z: (X - x0) ** 2
         + (Z - (z0 + thickness + R2)) ** 2 < R2 ** 2],
        refraction_index, angle, r0)
    inv_f = (nl - 1) * (1 / R1 - 1 / R2
                        + (nl - 1) * thickness / (nl * R1 * (-R2)))
    return n_new, 1.0 / inv_f


def lens_plane_divergent(n, x, z, r0, aperture, radius, thickness,
                         refraction_index, angle=0.0):
    """Plano-concave lens: flat entry at z0, concave exit (the sphere of
    curvature ``radius`` centered BEYOND the exit face is removed).
    Returns (n_new, focal), focal < 0."""
    x0, z0 = r0
    n_new = object_by_surfaces(
        n, x, z,
        [lambda X, Z: Z > z0,
         lambda X, Z: Z < z0 + thickness,
         lambda X, Z: jnp.abs(X - x0) < aperture / 2,
         lambda X, Z: (X - x0) ** 2
         + (Z - (z0 + thickness + radius)) ** 2 > radius ** 2],
        refraction_index, angle, r0)
    return n_new, -radius / (refraction_index - 1)


def lens_divergent(n, x, z, r0, aperture, radius, thickness,
                   refraction_index, angle=0.0):
    """Biconcave lens; radius=(-R1, R2) diffractio convention.
    Returns (n_new, focal) via the lensmaker equation."""
    x0, z0 = r0
    R1, R2 = radius
    nl = refraction_index
    n_new = object_by_surfaces(
        n, x, z,
        [lambda X, Z: jnp.abs(X - x0) < aperture / 2,
         lambda X, Z: Z > z0,
         lambda X, Z: Z < z0 + thickness,
         lambda X, Z: (X - x0) ** 2 + (Z - (z0 + R1)) ** 2 > R1 ** 2,
         lambda X, Z: (X - x0) ** 2
         + (Z - (z0 + thickness + R2)) ** 2 > R2 ** 2],
        refraction_index, angle, r0)
    inv_f = (nl - 1) * (1 / R1 - 1 / R2
                        + (nl - 1) * thickness / (nl * R1 * (-R2)))
    return n_new, 1.0 / inv_f


def _asphere_sag(X, x0, cx, Qx, a2, a3, a4):
    r2 = (X - x0) ** 2
    disc = jnp.maximum(1 - (1 + Qx) * cx ** 2 * r2, 0.0)
    return (cx * r2 / (1 + jnp.sqrt(disc))
            + a2 * r2 ** 2 + a3 * r2 ** 3 + a4 * r2 ** 4)


def aspheric_surface_z(n, x, z, r0, refraction_index, cx, Qx, a2=0.0,
                       a3=0.0, a4=0.0, side="right", angle=0.0):
    """Half-space bounded by the even-asphere surface
    z = z0 + sag(x); ``side`` picks which half gets the index."""
    x0, z0 = r0
    def cond(X, Z):
        surf = z0 + _asphere_sag(X, x0, cx, Qx, a2, a3, a4)
        return Z > surf if side == "right" else Z < surf
    return object_by_surfaces(n, x, z, [cond], refraction_index, angle, r0)


def aspheric_lens(n, x, z, r0, refraction_index, cx, Qx, depth, size,
                  a2=(0.0, 0.0), a3=(0.0, 0.0), a4=(0.0, 0.0), angle=0.0):
    """Lens bounded by two aspheric surfaces a distance ``depth`` apart
    (Gomez-Pedrero parameterization, reference ``aspheric_lens:1107``)."""
    x0, z0 = r0
    cx1, cx2 = cx
    Qx1, Qx2 = Qx
    a21, a22 = a2
    a31, a32 = a3
    a41, a42 = a4

    def cond1(X, Z):
        return Z > z0 + _asphere_sag(X, x0, cx1, Qx1, a21, a31, a41)

    def cond2(X, Z):
        return Z < z0 + depth + _asphere_sag(X, x0, cx2, Qx2, a22, a32,
                                             a42)

    return object_by_surfaces(
        n, x, z,
        [cond1, cond2,
         lambda X, Z: jnp.abs(X - x0) < size / 2,
         lambda X, Z: (Z > z0 - depth) & (Z < z0 + 2 * depth)],
        refraction_index, angle, r0)


# ------------------------------------------------------------------
# generic builders
# ------------------------------------------------------------------

def mask_from_function_xz(n, x, z, f1, f2, refraction_index, x_sides=None,
                          angle=0.0, rotation_point=(0.0, 0.0)):
    """Material between two surface functions f1(x) < z < f2(x)
    (reference ``mask_from_function:112`` — eval strings there,
    callables here)."""
    conds = [lambda X, Z: (Z > f1(X)) & (Z < f2(X))]
    if x_sides is not None:
        conds.append(lambda X, Z: (X > x_sides[0]) & (X < x_sides[1]))
    return object_by_surfaces(n, x, z, conds, refraction_index, angle,
                              rotation_point)


def mask_from_array_xz(n, x, z, array1, array2, refraction_index,
                       x_sides=None, angle=0.0,
                       rotation_point=(0.0, 0.0)):
    """Material between two sampled profiles given as (N, 2) arrays of
    (x, z) points, linearly interpolated (reference
    ``mask_from_array:146``)."""
    a1 = np.asarray(array1, dtype=float)
    a2 = np.asarray(array2, dtype=float)

    def f1(X):
        return jnp.interp(X, jnp.asarray(a1[:, 0]), jnp.asarray(a1[:, 1]))

    def f2(X):
        return jnp.interp(X, jnp.asarray(a2[:, 0]), jnp.asarray(a2[:, 1]))

    return mask_from_function_xz(n, x, z, f1, f2, refraction_index,
                                 x_sides, angle, rotation_point)


def rough_sheet(n, x, z, r0, size, t, s, refraction_index, key,
                angle=0.0, rotation_point=None):
    """Sheet whose exit surface has Gaussian-correlated roughness
    (correlation length t, std s; Ogilvy p.224). Deterministic under
    the explicit PRNG ``key``."""
    import jax
    x0, z0 = r0
    rp = r0 if rotation_point is None else rotation_point
    sx, sz = (size, size) if np.isscalar(size) else size
    xa = np.asarray(x)
    noise = jax.random.normal(key, (len(xa),))
    xc = xa - xa[len(xa) // 2]
    kern = jnp.asarray(np.exp(-xc ** 2 / t ** 2))
    kf = jnp.fft.fft(jnp.fft.ifftshift(kern))
    h = jnp.real(jnp.fft.ifft(jnp.fft.fft(noise) * kf))
    h = h - jnp.mean(h)
    h = h * (s / jnp.std(h))          # rough height profile h(x)

    x_jax = jnp.asarray(xa)

    def cond(X, Z):
        hX = jnp.interp(X, x_jax, h)
        return ((Z > z0) & (Z < z0 + sz - hX)
                & (jnp.abs(X - x0) < sx / 2))

    return object_by_surfaces(n, x, z, [cond], refraction_index, angle,
                              rp)


def discretize_refraction_index(n, levels):
    """Snap every pixel of the index sheet/volume to the nearest value
    in ``levels`` (real part; imaginary part carried along)."""
    n = jnp.asarray(n)
    levels = jnp.asarray(np.asarray(levels, dtype=complex))
    dist = jnp.abs(jnp.real(n)[..., None] - jnp.real(levels))
    idx = jnp.argmin(dist, axis=-1)
    return levels[idx]


def image_xz(n, x, z, filename, n_max, n_min=1.0, invert=False):
    """Grey-level image -> refraction-index sheet in [n_min, n_max]
    (reference ``image:~500``)."""
    import matplotlib.image as mpimg
    from scipy.ndimage import zoom
    img = mpimg.imread(filename)
    if img.ndim == 3:
        img = img[..., :3].mean(axis=-1)
    img = np.asarray(img, dtype=float)
    img = img / (img.max() if img.max() > 0 else 1.0)
    if invert:
        img = 1 - img
    img = zoom(img, (len(z) / img.shape[0], len(x) / img.shape[1]),
               order=1)[:len(z), :len(x)]
    return jnp.asarray(n_min + (n_max - n_min) * img)


# ------------------------------------------------------------------
# XYZ volume builders (reference: pyqed/beam/scalar_masks_XYZ.py)
# ------------------------------------------------------------------

def xyz_grids(x, y, z):
    """Meshgrids with the volume BPM layout (nz, nx, ny)."""
    Z, X, Y = jnp.meshgrid(jnp.asarray(z), jnp.asarray(x),
                           jnp.asarray(y), indexing="ij")
    return X, Y, Z


def object_by_surfaces_xyz(n, x, y, z, conditions, refraction_index):
    """Set ``refraction_index`` where ALL callables
    ``f(X, Y, Z) -> bool`` hold, on the (nz, nx, ny) volume."""
    X, Y, Z = xyz_grids(x, y, z)
    inside = jnp.ones(X.shape, dtype=bool)
    for cond in conditions:
        inside = inside & cond(X, Y, Z)
    if callable(refraction_index):
        val = refraction_index(X, Y, Z)
    else:
        val = refraction_index
    return jnp.where(inside, val, jnp.asarray(n))


def sphere_xyz(n, x, y, z, r0, radius, refraction_index):
    """Ellipsoid (rx, ry, rz) centered at r0 = (x0, y0, z0)."""
    x0, y0, z0 = r0
    rx, ry, rz = ((radius,) * 3 if np.isscalar(radius) else radius)
    return object_by_surfaces_xyz(
        n, x, y, z,
        [lambda X, Y, Z: (X - x0) ** 2 / rx ** 2
         + (Y - y0) ** 2 / ry ** 2 + (Z - z0) ** 2 / rz ** 2 < 1],
        refraction_index)


def square_xyz(n, x, y, z, r0, lengths, refraction_index):
    """Axis-aligned box of half-extents ``lengths/2`` centered at
    ``r0 = (x0, y0, z0)`` (reference: pyqed/beam/scalar_masks_XYZ.py:101
    ``square``; the reference's rotated variant composes a rotation of
    the grid — pass rotated conditions to ``object_by_surfaces_xyz``)."""
    x0, y0, z0 = r0
    lx, ly, lz = ((lengths,) * 3 if np.isscalar(lengths) else lengths)
    return object_by_surfaces_xyz(
        n, x, y, z,
        [lambda X, Y, Z: jnp.abs(X - x0) < lx / 2,
         lambda X, Y, Z: jnp.abs(Y - y0) < ly / 2,
         lambda X, Y, Z: jnp.abs(Z - z0) < lz / 2],
        refraction_index)


def cylinder_xyz(n, x, y, z, r0, radius, length, refraction_index,
                 axis="z"):
    """Circular cylinder of ``radius`` and ``length`` along ``axis``."""
    x0, y0, z0 = r0
    rx, ry = (radius, radius) if np.isscalar(radius) else radius
    if axis == "z":
        conds = [lambda X, Y, Z: (X - x0) ** 2 / rx ** 2
                 + (Y - y0) ** 2 / ry ** 2 < 1,
                 lambda X, Y, Z: jnp.abs(Z - z0) < length / 2]
    elif axis == "x":
        conds = [lambda X, Y, Z: (Y - y0) ** 2 / rx ** 2
                 + (Z - z0) ** 2 / ry ** 2 < 1,
                 lambda X, Y, Z: jnp.abs(X - x0) < length / 2]
    else:
        conds = [lambda X, Y, Z: (X - x0) ** 2 / rx ** 2
                 + (Z - z0) ** 2 / ry ** 2 < 1,
                 lambda X, Y, Z: jnp.abs(Y - y0) < length / 2]
    return object_by_surfaces_xyz(n, x, y, z, conds, refraction_index)


def extrude_mask_xz(n, x, z, t_u, z0, z1, refraction_index,
                    n_background=1.0):
    """Extrude a 1D amplitude mask t(x) into the slab z0 < z < z1:
    inside the slab, n = index (1 - t) + n_background t — transparent
    (t=1) pixels keep the background, opaque (t=0) pixels get the
    material (reference: pyqed/beam/scalar_masks_XZ.py:79
    ``extrude_mask``, eval-strings replaced by a plain t array)."""
    X, Z = xz_grids(x, z)
    t_u = jnp.asarray(t_u)
    inside = (Z >= z0) & (Z <= z1)
    val = (refraction_index * (1.0 - t_u)[None, :]
           + n_background * t_u[None, :])
    return jnp.where(inside, val, jnp.asarray(n))


def dots_xz(n, x, z, positions, refraction_index):
    """Single-pixel scatterers at (x_i, z_i) (reference:
    scalar_masks_XZ.py:512 ``dots``)."""
    n = jnp.asarray(n)
    x = np.asarray(x)
    z = np.asarray(z)
    for (xi, zi) in positions:
        ix = int(np.argmin(np.abs(x - xi)))
        iz = int(np.argmin(np.abs(z - zi)))
        n = n.at[iz, ix].set(refraction_index)
    return n


def add_surfaces(n, x, z, f_bottom, f_top, x_sides, refraction_index):
    """Region between two height profiles z = f_bottom(x) and
    z = f_top(x), clipped to x_sides = (x_min, x_max) (reference:
    scalar_masks_XZ.py:369 ``add_surfaces``; callables instead of the
    reference's eval strings)."""
    X, Z = xz_grids(x, z)
    cond = ((Z >= f_bottom(X)) & (Z <= f_top(X))
            & (X >= x_sides[0]) & (X <= x_sides[1]))
    return jnp.where(cond, refraction_index, jnp.asarray(n))


def ronchi_grating_xz(n, x, z, r0, period, fill_factor, length, height,
                      Dx, refraction_index, height_substrate=0.0,
                      refraction_index_substrate=None,
                      n_background=1.0):
    """Surface-relief Ronchi grating on an optional substrate
    (reference: scalar_masks_XZ.py:1304 — extrude a 1D ronchi
    amplitude mask, then the substrate rectangle, then clip to
    ``length``)."""
    x0, z0 = r0
    xs = np.asarray(x)
    t = (np.cos(2 * np.pi * (xs - Dx) / period)
         > np.cos(np.pi * fill_factor)).astype(float)
    zb = z0 + height_substrate / 2
    n1 = extrude_mask_xz(n, x, z, 1.0 - t, zb, zb + height,
                         refraction_index, n_background)
    if height_substrate > 0 and refraction_index_substrate is not None:
        n1 = rectangle(n1, x, z, r0, (length, height_substrate),
                       refraction_index_substrate)
    # clip the teeth outside the grating length
    X, Z = xz_grids(x, z)
    outside = ((jnp.abs(X - x0) > length / 2)
               & (Z >= zb) & (Z <= zb + height))
    return jnp.where(outside, n_background, n1)


def sine_grating_xz(n, x, z, r0, period, height_sine,
                    refraction_index, height_substrate=0.0,
                    n_background=1.0):
    """Sinusoidal surface-relief grating: material below the surface
    z = z0 + h_sub + (h_sine/2)(1 + sin(2 pi x / period))
    (reference: scalar_masks_XZ.py:1345 ``sine_grating``)."""
    x0, z0 = r0
    X, Z = xz_grids(x, z)
    zsurf = (z0 + height_substrate
             + 0.5 * height_sine * (1 + jnp.sin(2 * jnp.pi
                                                * (X - x0) / period)))
    cond = (Z >= z0) & (Z <= zsurf)
    return jnp.where(cond, refraction_index, jnp.asarray(n))
