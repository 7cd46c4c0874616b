"""XZ scene-builder long tail (reference: pyqed/beam/scalar_masks_XZ.py
extrude_mask:79, dots:512, add_surfaces:369, ronchi_grating:1304,
sine_grating:1345) and the 1D/XY mask closures."""
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.beam.scenes import (
    xz_grids, extrude_mask_xz, dots_xz, add_surfaces,
    ronchi_grating_xz, sine_grating_xz,
)
from pyqed_tpu.beam import masks_x
from pyqed_tpu.beam.masks import set_amplitude, set_phase


def _grid(nx=128, nz=64):
    x = np.linspace(-50, 50, nx)
    z = np.linspace(0, 100, nz)
    n = jnp.ones((nz, nx))
    return x, z, n


def test_extrude_mask_xz():
    x, z, n = _grid()
    t = (np.abs(x) < 20).astype(float)         # transparent core
    n2 = np.asarray(extrude_mask_xz(n, x, z, t, 30, 60, 1.5))
    iz = np.argmin(np.abs(np.asarray(z) - 45))
    ix_core = np.argmin(np.abs(x - 0))
    ix_edge = np.argmin(np.abs(x - 40))
    assert n2[iz, ix_core] == 1.0              # open aperture
    assert n2[iz, ix_edge] == 1.5              # opaque -> material
    assert n2[0, ix_edge] == 1.0               # outside the slab


def test_dots_xz():
    x, z, n = _grid()
    n2 = np.asarray(dots_xz(n, x, z, [(0.0, 50.0), (-25.0, 10.0)], 2.0))
    assert (n2 == 2.0).sum() == 2
    iz = np.argmin(np.abs(np.asarray(z) - 50))
    ix = np.argmin(np.abs(x - 0))
    assert n2[iz, ix] == 2.0


def test_add_surfaces_region():
    x, z, n = _grid()
    n2 = np.asarray(add_surfaces(
        n, x, z, lambda X: 20 + 0.2 * X, lambda X: 60 - 0.2 * X,
        (-30, 30), 1.4))
    X, Z = (np.asarray(a) for a in xz_grids(x, z))
    inside = ((Z >= 20 + 0.2 * X) & (Z <= 60 - 0.2 * X)
              & (np.abs(X) <= 30))
    assert np.array_equal(n2 == 1.4, inside)


def test_ronchi_grating_xz_periodicity():
    x, z, n = _grid(nx=256)
    n2 = np.asarray(ronchi_grating_xz(
        n, x, z, r0=(0, 20), period=10.0, fill_factor=0.5, length=80,
        height=8.0, Dx=0.0, refraction_index=1.5,
        height_substrate=6.0, refraction_index_substrate=1.5))
    # teeth row inside the relief
    iz = np.argmin(np.abs(np.asarray(z) - (20 + 3 + 4)))
    row = n2[iz]
    core = np.abs(x) < 35
    frac = (row[core] == 1.5).mean()
    assert 0.3 < frac < 0.7                    # ~fill factor
    # periodic structure: autocorrelation peak at one period
    sig = (row[core] == 1.5).astype(float)
    sig = sig - sig.mean()
    ac = np.correlate(sig, sig, mode="full")[len(sig) - 1:]
    dx = x[1] - x[0]
    lag = int(round(10.0 / dx))
    assert ac[lag] > 0.5 * ac[0]


def test_sine_grating_xz_surface():
    x, z, n = _grid(nx=256)
    n2 = np.asarray(sine_grating_xz(n, x, z, r0=(0, 10), period=25.0,
                                    height_sine=10.0,
                                    refraction_index=1.6,
                                    height_substrate=5.0))
    # column heights follow the sine profile
    depth = (n2 == 1.6).sum(axis=0) * (np.asarray(z)[1] - np.asarray(z)[0])
    i_hi = np.argmin(np.abs(x - 25.0 / 4))     # sin = +1
    i_lo = np.argmin(np.abs(x + 25.0 / 4))     # sin = -1
    assert depth[i_hi] > depth[i_lo] + 8.0


def test_masks_x_closures():
    x = np.linspace(-10, 10, 501)
    u = masks_x.dots(x, [0.0, 5.0])
    assert np.asarray(np.abs(u)).sum() == 2
    u2 = masks_x.mask_from_function(x, lambda q: (np.abs(q) < 3))
    assert abs(float(jnp.mean(jnp.abs(u2))) - 0.3) < 0.01
    u3 = masks_x.mask_from_array(x, [-10, 0, 10], [0.0, 1.0, 0.0])
    assert abs(float(jnp.abs(u3[250])) - 1.0) < 1e-12
    u4 = masks_x.filter_mask(x, u2, kernel_width=0.5)
    # smoothing preserves the mean, kills the sharp edge
    assert abs(float(jnp.mean(jnp.abs(u4))) - 0.3) < 0.02
    edge = np.argmin(np.abs(x - 3))
    assert 0.1 < abs(np.asarray(u4)[edge]) < 0.9


def test_set_amplitude_phase():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((8, 8))
                    + 1j * rng.standard_normal((8, 8)))
    a = np.abs(np.asarray(u))
    u2 = set_amplitude(u, 2.0)
    assert np.allclose(np.abs(np.asarray(u2)), 2.0)
    assert np.allclose(np.angle(np.asarray(u2)), np.angle(np.asarray(u)))
    u3 = set_phase(u, 0.7)
    assert np.allclose(np.angle(np.asarray(u3)), 0.7)
    assert np.allclose(np.abs(np.asarray(u3)), a)
