"""ScalarFieldZ container + XZ profile extraction + new mask/vector
surface (reference: pyqed/beam/scalar_fields_Z.py,
scalar_masks_XY.py:474,1043,1437,1654, vector_masks_XY.py:180,235,263).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.beam import ScalarFieldZ, ScalarFieldXZ, optics
from pyqed_tpu.beam import masks
from pyqed_tpu.beam.vector import (VectorMaskXY, VectorSourceXY,
                                   polarizer_linear)


def _gaussian_z_field():
    # on-axis field of a Gaussian beam: u(z) ∝ 1/sqrt(1+(z/zR)^2)
    z = np.linspace(-60.0, 60.0, 1201)
    zR = 10.0
    f = ScalarFieldZ(z, wavelength=0.633)
    f.u = 1.0 / np.sqrt(1 + (z / zR) ** 2) * np.exp(
        1j * np.arctan(z / zR))
    return f, zR


def test_fieldz_intensity_dof():
    f, zR = _gaussian_z_field()
    I = f.intensity()
    assert abs(I.max() - 1.0) < 1e-12
    # axial FWHM of I(z)=1/(1+(z/zR)^2) is 2 zR
    assert abs(f.FWHM1D() - 2 * zR) < 0.2
    dof, w0, (zl, z0, zr) = f.DOF()
    # width curve reconstructed from axial intensity: w = sqrt(2) w0 at
    # |z| = zR -> DOF = 2 zR
    assert abs(dof - 2 * zR) < 0.2
    assert abs(z0) < 0.1


def test_fieldz_algebra_resample_io(tmp_path):
    f, _ = _gaussian_z_field()
    g = f + f
    assert np.allclose(g.u, 2 * f.u)
    h = g - f
    assert np.allclose(h.u, f.u)
    cut = f.cut_resample(z_limits=(-20, 20), new_field=True)
    assert cut.z[0] >= -20 - 1e-9 and cut.z[-1] <= 20 + 1e-9
    res = f.cut_resample(z_limits=(-20, 20), num_points=101,
                         new_field=True)
    assert len(res.z) == 101
    # interpolation preserves the on-axis profile
    assert np.allclose(np.abs(res.u),
                       1 / np.sqrt(1 + (res.z / 10.0) ** 2), atol=1e-3)
    p = tmp_path / "fz.npz"
    f.save_data(p)
    f2 = ScalarFieldZ.load_data(p)
    assert np.allclose(f2.u, f.u) and np.allclose(f2.z, f.z)


def test_xz_profile_extraction():
    wl = 0.5
    x = np.linspace(-40, 40, 256)
    z = np.linspace(1.0, 60.0, 40)
    f = ScalarFieldXZ(x, z, wl)
    f.incident_field(np.exp(-x ** 2 / 25.0))
    f.propagate()
    prof = f.profile_longitudinal(kind="field", x0=0.0)
    assert isinstance(prof, ScalarFieldZ)
    assert prof.u.shape == (len(z),)
    # Gaussian beam spreads: on-axis intensity decreases with z
    I = prof.intensity()
    assert I[-1] < I[0]
    tr = f.profile_transversal(kind="intensity", z0=30.0)
    assert tr.shape == (len(x),)
    iz = int(np.argmin(np.abs(z - 30.0)))
    assert np.allclose(tr, np.abs(np.asarray(f.u)[iz]) ** 2)


def test_ronchi_and_prism_masks():
    x = np.linspace(-50, 50, 512)
    X, Y = np.meshgrid(x, x, indexing="ij")
    u = np.asarray(masks.ronchi_grating(X, Y, period=20.0)).real
    # exact 50% fill factor
    assert abs(u.mean() - 0.5) < 0.02
    assert set(np.unique(u)) <= {0.0, 1.0}
    w = np.asarray(masks.prism(X, Y, 0.5, (0, 0), angle_wedge=0.01))
    assert np.allclose(np.abs(w), 1.0)
    # phase gradient = k sin(angle)
    dphi = np.angle(w[1, 0] * np.conj(w[0, 0]))
    assert abs(dphi - 2 * np.pi / 0.5 * np.sin(0.01) * (x[1] - x[0])) \
        < 1e-6


def test_hammer_mask_geometry():
    x = np.linspace(-60, 60, 480)
    X, Y = np.meshgrid(x, x, indexing="ij")
    u = np.asarray(masks.hammer(X, Y, (0, 0), (60.0, 30.0), 8.0)).real
    # hammer adds area beyond the bare rectangle
    base = np.asarray(masks.square(X, Y, (0, 0), (60.0, 30.0))).real
    assert u.sum() > base.sum()
    assert set(np.unique(u)) <= {0.0, 1.0}
    # corners covered
    i30 = np.argmin(np.abs(x - 30.0))
    i15 = np.argmin(np.abs(x - 15.0))
    assert u[i30, i15] == 1.0


def test_photon_sieve():
    x = np.linspace(-50, 50, 256)
    X, Y = np.meshgrid(x, x, indexing="ij")
    hole = np.asarray(masks.circle(X, Y, (0, 0), 3.0)).real
    pos = [(-20.0, 0.0), (20.0, 0.0), (0.0, 25.0)]
    u, npts = masks.photon_sieve(x, x, hole, pos)
    assert npts == 3
    u = np.asarray(u).real
    # each hole stamped at its position
    for (px, py) in pos:
        ix = np.argmin(np.abs(x - px))
        iy = np.argmin(np.abs(x - py))
        assert u[ix, iy] > 0.9
    # total area ~ 3 x hole area (no overlap here)
    assert abs(u.sum() - 3 * hole.sum()) / hole.sum() < 0.1


def test_vector_pupil_and_complementary():
    x = np.linspace(-10, 10, 64)
    m = VectorMaskXY(x, x, 0.6)
    m.pupil(radius=(5.0, 3.0))
    # inside identity, outside zero
    assert np.allclose(m.M[32, 32], np.eye(2))
    assert np.allclose(m.M[0, 0], 0.0)

    X, Y = np.meshgrid(x, x, indexing="ij")
    sq = np.asarray(masks.square(X, Y, (0, 0), 8.0)).real
    m2 = VectorMaskXY(x, x, 0.6)
    m2.complementary_masks(sq, polarizer_linear(0.0),
                           polarizer_linear(np.pi / 2))
    assert np.allclose(m2.M[32, 32], polarizer_linear(0.0))
    assert np.allclose(m2.M[0, 0], polarizer_linear(np.pi / 2))

    # multilevel: 3 gray levels -> 3 Jones states
    grad = np.broadcast_to(np.linspace(0, 1, 64)[:, None],
                           (64, 64)).copy()
    states = [np.eye(2), polarizer_linear(0.0),
              polarizer_linear(np.pi / 2)]
    m3 = VectorMaskXY(x, x, 0.6)
    m3.multilevel_mask(grad, states)
    assert np.allclose(m3.M[0, 0], np.eye(2))
    assert np.allclose(m3.M[32, 0], polarizer_linear(0.0))
    assert np.allclose(m3.M[63, 0], polarizer_linear(np.pi / 2))
