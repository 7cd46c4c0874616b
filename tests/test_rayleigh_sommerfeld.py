"""True quadrature Rayleigh-Sommerfeld propagation (reference:
pyqed/beam/scalar_fields_X.py:622 RS / :1089 kernelRS, Shen & Wang 2006)
— near-field behavior, quality factor, and agreement with both the
angular spectrum (interior, well-sampled) and the analytic Fresnel-zone
edge diffraction."""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.beam.beam import (
    ScalarFieldX, ScalarFieldXY, gauss_beam, _rs_1d, _kernel_rs_1d,
)

um, mm = 1.0, 1e3


def _gauss_field(nx=1024, width=400 * um, w0=40 * um, wl=0.6328 * um):
    x = np.linspace(-width / 2, width / 2, nx, endpoint=False)
    f = ScalarFieldX(x, wl)
    gauss_beam(f, w0=w0)
    return f


def test_rs_matches_asm_in_validity_range():
    # well-contained Gaussian: open-boundary RS and periodic ASM agree
    # in the interior
    z = 2 * mm
    fa = _gauss_field()
    fb = fa.duplicate()
    fa.angular_spectrum(z)
    fb.RS(z)
    assert fb.quality > 1
    ua = np.asarray(fa.u)
    ub = np.asarray(fb.u)
    core = slice(256, 768)
    err = np.max(np.abs(ua[core] - ub[core])) / np.max(np.abs(ua))
    assert err < 2e-2


def test_rs_near_field_edge_matches_fresnel_integral():
    """Half-plane (knife-edge) diffraction: |u|^2 follows the classic
    Fresnel-integral solution I/I0 = ((C(v)+1/2)^2 + (S(v)+1/2)^2)/2 —
    a NEAR-FIELD pin where naive unpadded ASM wraps around."""
    from scipy.special import fresnel
    wl = 0.6328 * um
    z = 5 * mm
    nx = 4096
    width = 2000 * um
    x = np.linspace(-width / 2, width / 2, nx, endpoint=False)
    f = ScalarFieldX(x, wl)
    f.u = jnp.asarray((x > 0).astype(complex))   # edge at x = 0
    f.RS(z)
    assert f.quality > 1
    I = np.abs(np.asarray(f.u)) ** 2
    v = x * np.sqrt(2.0 / (wl * z))
    S, C = fresnel(v)
    I_exact = 0.5 * ((C + 0.5) ** 2 + (S + 0.5) ** 2)
    core = slice(nx // 2 - 600, nx // 2 + 600)   # away from window edges
    assert np.max(np.abs(I[core] - I_exact[core])) < 0.05
    # shadow-side decay and bright-side fringing are both present
    assert I[nx // 2 - 500] < 0.1
    assert I[core].max() > 1.2


def test_rs_differs_from_asm_on_wraparound():
    # a field filling the window: periodic ASM wraps, open RS does not
    wl = 0.6328 * um
    z = 5 * mm
    nx = 1024
    width = 500 * um
    x = np.linspace(-width / 2, width / 2, nx, endpoint=False)
    fa = ScalarFieldX(x, wl)
    fa.u = jnp.asarray((x > 0).astype(complex))
    fb = fa.duplicate()
    fa.angular_spectrum(z)
    fb.RS(z)
    # deep shadow region: open-boundary RS decays; periodic ASM leaks
    # the bright half back in through the wrap
    Ia = np.abs(np.asarray(fa.u[:nx // 8])) ** 2
    Ib = np.abs(np.asarray(fb.u[:nx // 8])) ** 2
    assert Ib.max() < 0.05
    assert Ia.max() > 2 * Ib.max()


def test_rs_forward_backward_roundtrip():
    z = 1 * mm
    f = _gauss_field()
    u0 = np.asarray(f.u).copy()
    f.RS(z)
    f.RS(-z)
    u1 = np.asarray(f.u)
    core = slice(384, 640)
    assert np.max(np.abs(u1[core] - u0[core])) / np.max(np.abs(u0)) < 2e-2


def test_rs_quality_flags_coarse_sampling():
    wl = 0.6328 * um
    x = np.linspace(-5000, 5000, 128)    # very coarse
    f = ScalarFieldX(x, wl)
    gauss_beam(f, w0=1000.0)
    f.RS(0.5 * mm)
    assert f.quality < 1


def test_rs_fast_kernel_asymptotics():
    # large-argument Hankel asymptotic vs exact kernel
    wl = 0.6328 * um
    x = np.linspace(100.0, 500.0, 64)
    exact = _kernel_rs_1d(x, wl, z=300.0, fast=False)
    fast = _kernel_rs_1d(x, wl, z=300.0, fast=True)
    assert np.max(np.abs(exact - fast) / np.abs(exact)) < 1e-3


def test_rs_2d_matches_asm_gaussian():
    wl = 0.6328 * um
    n = 384
    width = 300 * um
    x = np.linspace(-width / 2, width / 2, n, endpoint=False)
    f = ScalarFieldXY(x, x, wl)
    gauss_beam(f, w0=25 * um)
    g = ScalarFieldXY(x, x, wl, u=f.u)
    f.angular_spectrum(0.5 * mm)
    g.RS(0.5 * mm)
    assert g.quality > 1
    ua = np.asarray(f.u)
    ub = np.asarray(g.u)
    core = (slice(96, 288),) * 2
    assert np.max(np.abs(ua[core] - ub[core])) / np.max(np.abs(ua)) < 3e-2
