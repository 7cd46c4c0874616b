"""WPM (Schmidt wave propagation method), inverse/backward BPM, and
polychromatic drivers.

Pins: WPM == ASM exactly in a homogeneous scene; WPM == BPM in the
weak-contrast limit; WPM lens focus physics; bpm_inverse retraces bpm
(round trip); polychromatic reduces to monochromatic for one
wavelength; XYZ WPM matches XZ WPM on a y-invariant scene.

Reference: pyqed/beam/scalar_fields_XZ.py:963 (WPM), :735
(BPM_inverse), :760 (BPM_back_propagation), :1115/:1155
(polychromatic); scalar_fields_XY.py:2365 (WPM_schmidt_kernel).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.beam import ScalarFieldXZ, ScalarFieldXYZ
from pyqed_tpu.beam import scenes as sc


WL = 0.6


def gauss_u0(x, w=12.0):
    return jnp.asarray(np.exp(-np.asarray(x) ** 2 / w ** 2), dtype=complex)


def test_wpm_equals_asm_homogeneous():
    x = np.linspace(-60.0, 60.0, 256)
    z = np.linspace(0.5, 120.0, 160)
    f1 = ScalarFieldXZ(x, z, WL)
    f1.incident_field(gauss_u0(x))
    u_wpm = f1.wpm(has_edges=False)
    f2 = ScalarFieldXZ(x, z, WL)
    f2.incident_field(gauss_u0(x))
    u_asm = f2.propagate()
    # one index level -> WPM = stepped exact kernel = one-shot ASM
    assert float(jnp.max(jnp.abs(u_wpm - u_asm))) < 1e-10


def test_wpm_matches_bpm_weak_contrast():
    x = np.linspace(-60.0, 60.0, 256)
    z = np.linspace(0.25, 100.0, 400)
    n0 = jnp.ones((len(z), len(x)))
    n_sheet = sc.layer(n0, x, z, (0.0, 30.0), 20.0, 1.002, 0.0)
    fa = ScalarFieldXZ(x, z, WL)
    fa.incident_field(gauss_u0(x))
    ua = fa.wpm(n_xz=n_sheet)
    fb = ScalarFieldXZ(x, z, WL)
    fb.incident_field(gauss_u0(x))
    ub = fb.bpm(n_xz=n_sheet)
    # paraxial beam, dn = 2e-3: the two schemes agree to O(dn^2 + dz^2)
    err = float(jnp.max(jnp.abs(ua - ub)))
    assert err < 5e-3


def test_wpm_lens_focus():
    x = np.linspace(-80.0, 80.0, 512)
    z = np.linspace(0.5, 260.0, 520)
    n0 = jnp.ones((len(z), len(x)))
    R, thick, nl = 60.0, 18.0, 1.5
    n_sheet, f = sc.lens_plane_convergent(n0, x, z, (0.0, 4.0), 110.0,
                                          R, thick, nl)
    fld = ScalarFieldXZ(x, z, WL)
    fld.incident_field(jnp.ones(len(x), dtype=complex))
    u = fld.wpm(n_xz=n_sheet)
    inten = np.asarray(jnp.abs(u) ** 2)
    ix0 = np.argmin(np.abs(x))
    z_peak = z[inten[:, ix0].argmax()]
    assert abs(z_peak - (4.0 + thick + f)) < 0.15 * f
    assert inten[:, ix0].max() > 10.0


def test_bpm_inverse_round_trip():
    x = np.linspace(-60.0, 60.0, 256)
    z = np.linspace(0.25, 80.0, 320)
    n0 = jnp.ones((len(z), len(x)))
    n_sheet = sc.sphere(n0, x, z, (0.0, 40.0), 15.0, 1.2)
    fwd = ScalarFieldXZ(x, z, WL)
    u0 = gauss_u0(x, 20.0)
    fwd.incident_field(u0)
    u = fwd.bpm(n_xz=n_sheet, has_edges=False)
    back = ScalarFieldXZ(x, z, WL)
    back.incident_field(u[-1])
    ub = back.bpm_inverse(n_xz=n_sheet, has_edges=False)
    # the last backward plane is the input plane
    assert float(jnp.max(jnp.abs(ub[-1] - u0))) < 1e-8


def test_bpm_back_propagation_refocuses():
    # phase conjugation through the SAME inhomogeneity reproduces the
    # input intensity profile (aberration cancellation)
    x = np.linspace(-60.0, 60.0, 256)
    z = np.linspace(0.25, 80.0, 320)
    n0 = jnp.ones((len(z), len(x)))
    n_sheet = sc.sphere(n0, x, z, (5.0, 40.0), 12.0, 1.3)
    fwd = ScalarFieldXZ(x, z, WL)
    u0 = gauss_u0(x, 15.0)
    fwd.incident_field(u0)
    u = fwd.bpm(n_xz=n_sheet, has_edges=False)
    back = ScalarFieldXZ(x, z, WL)
    back.incident_field(u[-1])
    ub = back.bpm_back_propagation(n_xz=n_sheet, has_edges=False)
    I_in = np.asarray(jnp.abs(u0) ** 2)
    I_out = np.asarray(jnp.abs(ub[-1]) ** 2)
    assert np.max(np.abs(I_out - I_in)) < 1e-8


def test_polychromatic_single_wavelength_limit():
    x = np.linspace(-60.0, 60.0, 256)
    z = np.linspace(0.25, 80.0, 160)
    n0 = jnp.ones((len(z), len(x)))
    n_sheet = sc.layer(n0, x, z, (0.0, 30.0), 15.0, 1.3, 0.0)
    poly = ScalarFieldXZ(x, z, WL)
    up = poly.polychromatic(lambda wl: gauss_u0(x), [WL], method="bpm",
                            n_xz=n_sheet)
    mono = ScalarFieldXZ(x, z, WL)
    mono.incident_field(gauss_u0(x))
    um = mono.bpm(n_xz=n_sheet)
    assert float(jnp.max(jnp.abs(up - jnp.abs(um)))) < 1e-10


def test_polychromatic_smooths_fringes():
    # two-wavelength incoherent sum has lower fringe contrast than
    # either monochromatic pattern behind a double aperture
    x = np.linspace(-100.0, 100.0, 512)
    z = np.linspace(1.0, 400.0, 200)
    slits = ((np.abs(np.abs(x) - 20.0) < 5.0)).astype(complex)

    def u0(wl):
        return jnp.asarray(slits)

    poly = ScalarFieldXZ(x, z, 0.6)
    up = poly.polychromatic(u0, [0.5, 0.7], method="asm")
    mono = ScalarFieldXZ(x, z, 0.5)
    mono.incident_field(u0(0.5))
    um = jnp.abs(mono.propagate())

    def contrast(I):
        row = np.asarray(I[-1])
        return (row.max() - row.min()) / (row.max() + row.min())

    assert contrast(up ** 2) < contrast(um ** 2)


def test_xyz_wpm_matches_xz_on_invariant_scene():
    x = np.linspace(-40.0, 40.0, 128)
    y = np.linspace(-40.0, 40.0, 64)
    z = np.linspace(0.5, 60.0, 120)
    n0_xz = jnp.ones((len(z), len(x)))
    n_xz = sc.layer(n0_xz, x, z, (0.0, 20.0), 10.0, 1.4, 0.0)
    # volume scene: same layer, invariant along y
    n_vol = jnp.broadcast_to(jnp.asarray(n_xz)[:, :, None],
                             (len(z), len(x), len(y)))
    u0_1d = gauss_u0(x, 10.0)
    f2 = ScalarFieldXZ(x, z, WL)
    f2.incident_field(u0_1d)
    u_xz = f2.wpm(n_xz=n_xz, has_edges=False)
    f3 = ScalarFieldXYZ(x, y, z, WL)
    # y-uniform input: plane-wave along y
    f3.incident_field(jnp.broadcast_to(u0_1d[:, None],
                                       (len(x), len(y))))
    u_vol = f3.wpm(n_volume=n_vol, has_edges=False)
    # the central y slice equals the 1D XZ propagation
    assert float(jnp.max(jnp.abs(u_vol[:, :, 32] - u_xz))) < 1e-8
