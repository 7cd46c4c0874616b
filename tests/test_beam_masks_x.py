"""1D mask/source zoo (reference: pyqed/beam/scalar_masks_X.py,
scalar_sources_X.py). Pins: separable reuse == 2D y=0 row, chirp
instantaneous frequency, bar codes, dust coverage, source sums."""
import numpy as np
import jax
import jax.numpy as jnp

from pyqed_tpu.beam import masks_x as mx
from pyqed_tpu.beam import masks as mk


x = np.linspace(-100.0, 100.0, 1024)


def test_slit_matches_2d_row():
    u1 = mx.slit(x, 0.0, 30.0)
    X = jnp.asarray(x)[:, None]
    Y = jnp.zeros_like(X)
    u2 = mk.slit(X, Y, 0.0, 30.0)[:, 0]
    assert bool(jnp.all(u1 == u2))


def test_gray_scale_levels():
    u = mx.gray_scale(x, 4, 0.0, 1.0)
    vals = np.unique(np.real(np.asarray(u)))
    assert np.allclose(vals, [0.0, 1/3, 2/3, 1.0])
    # equal occupancy
    counts = [np.sum(np.real(np.asarray(u)) == v) for v in vals]
    assert max(counts) - min(counts) <= 1


def test_prism_ramp_phase():
    wl, n, ang = 0.6, 1.5, 0.01
    u = mx.prism(x, wl, 0.0, n, ang)
    k = 2 * np.pi / wl
    dphi = np.unwrap(np.angle(np.asarray(u)))
    slope = (dphi[-1] - dphi[0]) / (x[-1] - x[0])
    assert abs(slope - k * (n - 1) * np.sin(ang)) < 1e-9


def test_chirped_grating_p_local_period():
    # local period must vary from ~p0 at x[0] to ~p1 at x[-1]
    p0, p1 = 4.0, 12.0
    u = mx.chirped_grating_p(x, "amplitude", p0, p1)
    t = np.real(np.asarray(u))
    # measure local period from zero crossings of t - 1/2
    s = np.sign(t - 0.5)
    crossings = x[np.where(np.diff(s) != 0)[0]]
    periods = 2 * np.diff(crossings)
    assert abs(periods[0] - p0) < 1.0
    assert abs(periods[-1] - p1) < 2.0


def test_chirped_grating_q_frequency():
    p0, p1 = 4.0, 8.0
    u = mx.chirped_grating_q(x, "amplitude", p0, p1)
    t = np.real(np.asarray(u))
    s = np.sign(t - 0.5)
    crossings = x[np.where(np.diff(s) != 0)[0]]
    periods = 2 * np.diff(crossings)
    assert abs(periods[0] - p0) < 1.0
    assert abs(periods[-1] - p1) < 1.5


def test_chirped_grating_callable_uniform_limit():
    u_c = mx.chirped_grating(x, "amplitude", lambda xx: 10.0 + 0 * xx)
    u_p = mx.chirped_grating_p(x, "amplitude", 10.0, 10.0)
    # both are cos gratings of period 10 (phases may differ by grid
    # half-step); compare local periods via FFT peak
    def fpk(u):
        F = np.abs(np.fft.rfft(np.real(np.asarray(u)) - 0.5))
        return np.fft.rfftfreq(len(x), x[1] - x[0])[F.argmax()]
    assert abs(fpk(u_c) - 0.1) < 5e-3
    assert abs(fpk(u_p) - 0.1) < 5e-3


def test_binary_code_positions_flips():
    u = mx.binary_code_positions(x, [-50.0, 0.0, 50.0], start="up")
    t = np.real(np.asarray(u))
    assert t[0] == 1.0
    assert t[np.argmin(np.abs(x + 25))] == 0.0
    assert t[np.argmin(np.abs(x - 25))] == 1.0
    assert t[-1] == 0.0


def test_binary_code_pattern():
    code = [1, 0, 1, 1]
    u = mx.binary_code(x, code, 20.0, x0=-40.0)
    t = np.real(np.asarray(u))
    for j, b in enumerate(code):
        xc = -40.0 + (j + 0.5) * 20.0
        assert t[np.argmin(np.abs(x - xc))] == b
    assert t[np.argmin(np.abs(x + 60.0))] == 0.0   # outside the code


def test_dust_coverage_and_determinism():
    key = jax.random.PRNGKey(11)
    u1, pos, sizes = mx.dust(x, 0.2, 5.0, key)
    u2, _, _ = mx.dust(x, 0.2, 5.0, key)
    assert bool(jnp.all(u1 == u2))
    blocked = 1 - float(jnp.mean(jnp.real(u1)))
    assert 0.08 < blocked < 0.35    # ~20% minus overlaps


def test_sources_superpose():
    wl = 0.6
    u = mx.gauss_beams_several_parallel(x, wl, 1.0, 2, 10.0, 0.0, 80.0)
    direct = (mx.gauss_beam(x, wl, 10.0, -20.0)
              + mx.gauss_beam(x, wl, 10.0, 20.0))
    assert float(jnp.max(jnp.abs(u - direct))) < 1e-10
    sph = mx.spherical_wave(x, wl, 0.0, -1000.0)
    # amplitude falls off as 1/sqrt(R)
    i0 = np.argmin(np.abs(x)); i1 = np.argmin(np.abs(x - 80.0))
    R0, R1 = np.hypot(x[i0], 1000.0), np.hypot(x[i1], 1000.0)
    ratio = float(jnp.abs(sph[i1]) / jnp.abs(sph[i0]))
    assert abs(ratio - np.sqrt(R0 / R1)) < 1e-6


def test_lens_spherical_1d_matches_2d_row():
    u1 = mx.lens_spherical(x, 0.6, 0.0, 80.0, 4000.0)
    X = jnp.asarray(x)[:, None]; Y = jnp.zeros_like(X)
    u2 = mk.lens_spherical(X, Y, 0.6, (0.0, 0.0), 80.0, 4000.0)[:, 0]
    assert bool(jnp.all(u1 == u2))
