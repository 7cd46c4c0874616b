"""Vector (polarization) optics layer (beam/vector.py).

Physics pins: Malus's law, quarter/half-wave plate action, cylindrical
vector beams, q-plate handedness flip, polarization-ellipse parameters
(reference: pyqed/beam/vector_{sources,masks,fields}_XY.py).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.beam.vector import (
    VectorMaskXY, VectorSourceXY, polarizer_linear, quarter_waveplate,
    half_waveplate, retarder, polarization_ellipse, polarization_states,
    Vector_mask_XY, Vector_source_XY)
from pyqed_tpu.beam.beam import VectorFieldXY

WL = 0.6328
XY = np.linspace(-30, 30, 48)


def _x_polarized(amp=1.0):
    u = amp * np.exp(-(XY[:, None] ** 2 + XY[None, :] ** 2) / 15 ** 2)
    return VectorFieldXY(XY, XY, WL).incident_field(
        u.astype(complex), np.zeros_like(u, dtype=complex))


def _power(f):
    return float(jnp.sum(jnp.abs(f.Ex) ** 2 + jnp.abs(f.Ey) ** 2))


def test_malus_law():
    src = _x_polarized()
    p0 = _power(src)
    for th in (0.0, np.pi / 6, np.pi / 4, np.pi / 3, np.pi / 2):
        mask = VectorMaskXY(XY, XY, WL).polarizer_linear(th)
        out = mask * src
        assert abs(_power(out) / p0 - np.cos(th) ** 2) < 1e-12, th


def test_quarter_waveplate_makes_circular():
    src = _x_polarized()
    out = VectorMaskXY(XY, XY, WL).quarter_waveplate(np.pi / 4) * src
    S0, S1, S2, S3 = out.stokes()
    tot = float(jnp.sum(S0))
    assert abs(abs(float(jnp.sum(S3))) / tot - 1.0) < 1e-12
    assert abs(float(jnp.sum(S1))) / tot < 1e-12
    assert abs(float(jnp.sum(S2))) / tot < 1e-12
    # energy conserved (pure retarder)
    assert abs(_power(out) / _power(src) - 1.0) < 1e-12


def test_half_waveplate_rotates_by_2theta():
    src = _x_polarized()
    th = np.pi / 6
    out = VectorMaskXY(XY, XY, WL).half_waveplate(th) * src
    # linear at angle 2 theta: Ey/Ex = tan(2 theta), S3 = 0
    ratio = complex(jnp.sum(out.Ey) / jnp.sum(out.Ex))
    assert abs(ratio - np.tan(2 * th)) < 1e-12
    S0, _, _, S3 = out.stokes()
    assert abs(float(jnp.sum(S3) / jnp.sum(S0))) < 1e-12


def test_crossed_polarizers_extinguish():
    src = _x_polarized()
    px = VectorMaskXY(XY, XY, WL).polarizer_linear(0.0)
    py = VectorMaskXY(XY, XY, WL).polarizer_linear(np.pi / 2)
    assert _power(py * (px * src)) < 1e-24
    # inserting a 45-degree polarizer between restores cos^2(45)*cos^2(45)
    p45 = VectorMaskXY(XY, XY, WL).polarizer_linear(np.pi / 4)
    out = py * (p45 * (px * src))
    assert abs(_power(out) / _power(src) - 0.25) < 1e-12


def test_retarder_general_reduces_to_waveplates():
    for th in (0.1, 0.7):
        np.testing.assert_allclose(retarder(np.pi / 2, th),
                                   quarter_waveplate(th), atol=1e-14)
        np.testing.assert_allclose(retarder(np.pi, th),
                                   half_waveplate(th), atol=1e-14)
    # diattenuation: p1=1, p2=0 at 0 retardance == linear polarizer
    np.testing.assert_allclose(retarder(0.0, 0.3, p1=1.0, p2=0.0),
                               polarizer_linear(0.3), atol=1e-14)


def test_radial_and_azimuthal_sources():
    rad = VectorSourceXY(XY, XY, WL).radial_wave(1.0)
    azi = VectorSourceXY(XY, XY, WL).azimuthal_wave(1.0)
    X, Y = np.meshgrid(XY, XY, indexing="ij")
    th = np.arctan2(Y, X)
    # radial: E x r_hat = 0 everywhere
    cross = np.asarray(rad.Ex) * np.sin(th) - np.asarray(rad.Ey) * np.cos(th)
    assert np.max(np.abs(cross)) < 1e-12
    # orthogonal polarizations pixel by pixel
    dot = (np.asarray(rad.Ex) * np.conj(np.asarray(azi.Ex))
           + np.asarray(rad.Ey) * np.conj(np.asarray(azi.Ey)))
    assert np.max(np.abs(dot)) < 1e-12
    # local_polarized m=1 fi0=0 == radial
    loc = VectorSourceXY(XY, XY, WL).local_polarized_vector_wave(1.0, m=1)
    assert np.max(np.abs(np.asarray(loc.Ex) - np.asarray(rad.Ex))) < 1e-12


def test_spiral_alpha0_is_azimuthal_inverse():
    sp = VectorSourceXY(XY, XY, WL).spiral_polarized_beam(1.0, alpha=0.0)
    az = VectorSourceXY(XY, XY, WL).azimuthal_inverse_wave(1.0)
    assert np.max(np.abs(np.asarray(sp.Ex) - np.asarray(az.Ex))) < 1e-12
    assert np.max(np.abs(np.asarray(sp.Ey) - np.asarray(az.Ey))) < 1e-12


def test_qplate_flips_handedness():
    u = np.exp(-(XY[:, None] ** 2 + XY[None, :] ** 2) / 15 ** 2)
    src = VectorFieldXY(XY, XY, WL).incident_field(
        u.astype(complex), 1j * u)          # S3 = +S0 circular
    out = VectorMaskXY(XY, XY, WL).q_plate(q=1) * src
    S0, _, _, S3 = out.stokes()
    assert abs(float(jnp.sum(S3) / jnp.sum(S0)) + 1.0) < 1e-12
    # and imprints an optical vortex: on-axis intensity ~ 0 after
    # propagation (charge-2 singularity from q=1 on circular input)
    out.propagate(120.0)
    I = np.asarray(out.intensity())
    c = len(XY) // 2
    assert I[c, c] < 1e-3 * I.max()


def test_polarization_ellipse_linear_and_circular():
    src = _x_polarized()
    th = 0.4
    lin = VectorMaskXY(XY, XY, WL).half_waveplate(th / 2) * src
    A, B, ang, h = polarization_ellipse(lin)
    c = len(XY) // 2
    assert float(B[c, c]) < 1e-8 * float(A[c, c])
    assert abs(float(ang[c, c]) - th) < 1e-8
    u = np.exp(-(XY[:, None] ** 2 + XY[None, :] ** 2) / 15 ** 2)
    circ = VectorFieldXY(XY, XY, WL).incident_field(
        u.astype(complex), 1j * u)
    A, B, ang, h = polarization_ellipse(circ)
    assert abs(float(A[c, c] / B[c, c]) - 1.0) < 1e-10
    assert float(h[c, c]) == 1.0
    S = polarization_states(circ)
    assert len(S) == 4


def test_scalar_mask_and_pupil():
    src = _x_polarized()
    m = VectorMaskXY(XY, XY, WL).polarizer_linear(0.0)
    m.apply_scalar_mask(0.5 * np.ones((len(XY), len(XY))))
    assert abs(_power(m * src) / _power(src) - 0.25) < 1e-12
    m2 = VectorMaskXY(XY, XY, WL).polarizer_linear(0.0).apply_circle(
        radius=10.0)
    out = m2 * src
    X, Y = np.meshgrid(XY, XY, indexing="ij")
    outside = X ** 2 + Y ** 2 > 10.0 ** 2 + 1e-9
    assert np.max(np.abs(np.asarray(out.Ex)[outside])) == 0.0


def test_reference_aliases():
    assert Vector_mask_XY is VectorMaskXY
    assert Vector_source_XY is VectorSourceXY


class TestVectorFieldXYZ:
    """Vector volume propagation (extends the reference surface — its
    vendored diffractio has no vector XYZ module)."""

    def _grid(self, n=96, L=40.0):
        x = np.linspace(-L / 2, L / 2, n, endpoint=False)
        return x, x

    def test_single_plane_matches_vector_xy(self):
        from pyqed_tpu.beam import VectorFieldXY, VectorFieldXYZ
        x, y = self._grid()
        wl = 0.6
        X, Y = np.meshgrid(x, y, indexing="ij")
        Ex = np.exp(-(X**2 + Y**2) / 9.0) * np.exp(0.3j * X)
        Ey = 0.5j * np.exp(-(X**2 + Y**2) / 16.0)
        z0 = 23.0
        vol = VectorFieldXYZ(x, y, [z0], wl).incident_field(Ex, Ey)
        vol.propagate()
        ref = VectorFieldXY(x, y, wl).incident_field(Ex, Ey)
        ref.propagate(z0)
        assert np.allclose(np.asarray(vol.Ex[0]), np.asarray(ref.Ex),
                           atol=1e-10)
        assert np.allclose(np.asarray(vol.Ey[0]), np.asarray(ref.Ey),
                           atol=1e-10)
        assert np.allclose(np.asarray(vol.Ez[0]), np.asarray(ref.Ez),
                           atol=1e-10)

    def test_focused_radial_beam_longitudinal_on_axis(self):
        """Dorn-Quabis-Leuchs physics: a focused RADIALLY polarized
        doughnut develops a strong longitudinal Ez on axis at focus,
        while the transverse intensity stays null there; the focused
        AZIMUTHAL beam has Ez = 0 on axis."""
        from pyqed_tpu.beam import VectorFieldXYZ
        from pyqed_tpu.beam.vector import VectorSourceXY
        x, y = self._grid(n=128, L=60.0)
        wl = 1.0
        f = 60.0
        X, Y = np.meshgrid(x, y, indexing="ij")
        r2 = X**2 + Y**2
        env = np.sqrt(r2) / 6.0 * np.exp(-r2 / 36.0)   # doughnut
        lens_ph = np.exp(-1j * np.pi / (wl * f) * r2)
        # low-Fresnel-number focusing shifts the axial peak toward the
        # lens — scan a wide interior window rather than pinning z = f
        zs = np.linspace(0.5 * f, 1.3 * f, 17)

        def focus(kind):
            src = VectorSourceXY(x, y, wl)
            getattr(src, kind)(u=env)
            vol = VectorFieldXYZ(x, y, zs, wl).incident_field(
                np.asarray(src.Ex) * lens_ph, np.asarray(src.Ey) * lens_ph)
            vol.propagate()
            return vol

        rad = focus("radial_wave")
        It, Iz = rad.on_axis()
        It, Iz = np.asarray(It), np.asarray(Iz)
        # longitudinal field dominates on axis for radial polarization
        assert Iz.max() > 30 * It.max()
        # axial peak interior to the scan (focal region, shifted toward
        # the lens at this Fresnel number)
        kpk = int(np.argmax(Iz))
        assert 0 < kpk < len(zs) - 1

        azi = focus("azimuthal_wave")
        _, Iz_azi = azi.on_axis()
        assert np.asarray(Iz_azi).max() < 1e-3 * Iz.max()

    def test_energy_conservation_free_space(self):
        from pyqed_tpu.beam import VectorFieldXYZ
        x, y = self._grid()
        X, Y = np.meshgrid(x, y, indexing="ij")
        Ex = np.exp(-(X**2 + Y**2) / 25.0)
        vol = VectorFieldXYZ(x, y, [0.0, 15.0, 30.0], 0.8)
        vol.incident_field(Ex, 0.0 * Ex).propagate()
        # transverse power conserved plane to plane (paraxial beam,
        # no evanescent content, no clipping)
        S0 = np.asarray(vol.stokes()[0]).sum(axis=(1, 2))
        assert np.allclose(S0, S0[0], rtol=1e-6)
