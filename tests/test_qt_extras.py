"""qt/ long-tail variants (VERDICT r2 #10): anharmonic-oscillator QTF
(reference: pyqed/qt/1D/AHO.py), the para-H2 MLR potential
(qt/1D/pH2.py), and the domain-decomposed LQF for double wells
(qt/1D/domain/ — half-finished scripts there, completed in
grid/qtraj.py::qpot_domains)."""
from functools import partial

import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.grid.qtraj import QTF, qpot_domains, vpot_ph2
from pyqed_tpu.grid.dvr import SineDVR


def _dvr_e0(vfun, xmin, xmax, npts=301, mass=1.0):
    d = SineDVR(xmin, xmax, npts, mass=mass)
    H = np.asarray(d.h(jnp.asarray(vfun(np.asarray(d.x)))))
    return float(np.linalg.eigvalsh(H)[0])


def test_aho_ground_state_relaxation():
    """Quartic anharmonic oscillator (reference: qt/1D/AHO.py —
    V = x^2/2 + eps x^4/4): QTF relaxes to the exact E0 from DVR."""
    eps = 0.4

    def derivs(x):
        return x ** 2 / 2.0 + eps * x ** 4 / 4.0, x + eps * x ** 3

    E0 = _dvr_e0(lambda x: x ** 2 / 2.0 + eps * x ** 4 / 4.0, -6, 6)
    solver = QTF(ntraj=1001, mass=1.0, order=5, friction=0.3)
    x, p, r, w = solver.sample(a0=1.4, x0=0.3)
    res = solver.run(x, p, r, w, derivs, dt=0.02, nt=4000, nout=100)
    Etot = res.observables[:, 3]
    assert abs(Etot[-1] - E0) / E0 < 0.01
    assert np.all(res.observables[:, 2] > 0)


def test_ph2_potential_shape():
    """MLR para-H2 potential (reference: qt/1D/pH2.py): depth and
    minimum position in bohr, long-range decay."""
    r = np.linspace(5.0, 14.0, 1200)
    v = np.asarray(vpot_ph2(r))
    cm = 219474.63
    i = np.argmin(v)
    assert abs(r[i] - 3.47005 / 0.52917721092) < 0.02    # re in bohr
    assert abs(v[i] * cm + 24.2288) < 0.01               # well depth
    assert abs(v[-1]) < abs(v[i]) * 0.05                 # tail decays
    assert np.all(np.isfinite(v))


def _bimodal_ensemble(ntraj=1201, a0=2.0, a=1.3):
    """Deterministic two-Gaussian (double-well-like) ensemble with the
    ANALYTIC nonclassical momentum r = rho'/(2 rho)."""
    x = np.linspace(-4, 4, ntraj)
    rho = np.exp(-a0 * (x - a) ** 2) + np.exp(-a0 * (x + a) ** 2)
    drho = (-2 * a0 * (x - a) * np.exp(-a0 * (x - a) ** 2)
            - 2 * a0 * (x + a) * np.exp(-a0 * (x + a) ** 2))
    w = rho / rho.sum()
    r = drho / (2 * rho)
    return (jnp.asarray(x), jnp.zeros(ntraj), jnp.asarray(r),
            jnp.asarray(w))


def test_domain_lqf_fits_bimodal_r():
    """The tanh-partitioned piecewise-linear fit must capture the
    bimodal nonclassical momentum of a double-well density far better
    than the single global linear fit (the whole point of the
    reference's qt/1D/domain approach)."""
    from pyqed_tpu.grid.qtraj import qpot_poly
    x, p, r, w = _bimodal_ensemble()

    def fit_mse(qp):
        # reconstruct r_hat from the returned quantum force by probing
        # the fit directly: refit here with the same machinery
        Eu, fq, fr = qp(x, p, r, w, mass=1.0)
        return Eu, fq

    # r_hat via the internal blend: compare Eu (depends on the fit) and
    # the pointwise quantum force against the ANALYTIC values of the
    # mixture density
    a0, a = 2.0, 1.3
    xs = np.asarray(x)
    rho = np.exp(-a0 * (xs - a) ** 2) + np.exp(-a0 * (xs + a) ** 2)
    # exact Eu = -<r^2 + r'>/2m with exact r (finite differences)
    rr = np.asarray(r)
    drr = np.gradient(rr, xs)
    Eu_exact = -np.dot(np.asarray(w), rr ** 2 + drr) / 2.0

    Eu_dom, _, _ = qpot_domains(x, p, r, w, xdom=np.array([0.0]),
                                sharp=3.0)
    Eu_lin, _, _ = qpot_poly(x, p, r, w, order=1)
    assert abs(float(Eu_dom) - Eu_exact) < 0.2 * abs(
        float(Eu_lin) - Eu_exact)
    assert abs(float(Eu_dom) - Eu_exact) < 0.10 * abs(Eu_exact)


def test_domain_lqf_short_relaxation_stable():
    """Short-window double-well relaxation with the domain quantum
    force: energy decreases monotonically-ish and stays physical
    (>= 0 for this V >= 0 well; the long-time ensemble eventually
    tangles — a known limitation of trajectory AQP on double wells,
    which is why the pin is the FIT, not the asymptote)."""
    k, a = 0.25, 1.3

    def derivs(x):
        return k * (x ** 2 - a ** 2) ** 2, 4.0 * k * x * (x ** 2 - a ** 2)

    qp = partial(qpot_domains, xdom=np.array([0.0]), sharp=3.0)
    solver = QTF(ntraj=1201, mass=1.0, order=1, friction=0.4, qpot=qp)
    x, p, r, w = _bimodal_ensemble()
    res = solver.run(x, p, r, w, derivs, dt=0.01, nt=150, nout=30)
    E = res.observables[:, 3]
    assert np.all(np.isfinite(E))
    assert E[-1] < E[0]
    assert np.all(E > 0)


def test_domain_lqf_single_domain_matches_linear():
    """With one domain spanning everything (edge far away), the domain
    fit must reduce to the global linear LQF forces."""
    from pyqed_tpu.grid.qtraj import qpot_poly
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(400))
    p = jnp.asarray(0.3 * rng.standard_normal(400))
    r = jnp.asarray(-0.7 * np.asarray(x) + 0.1)
    w = jnp.full(400, 1.0 / 400)
    Eu_d, fq_d, fr_d = qpot_domains(x, p, r, w, xdom=[50.0], sharp=4.0)
    Eu_p, fq_p, fr_p = qpot_poly(x, p, r, w, order=1)
    assert abs(float(Eu_d - Eu_p)) < 1e-8
    assert np.max(np.abs(np.asarray(fq_d - fq_p))) < 1e-7
    assert np.max(np.abs(np.asarray(fr_d - fr_p))) < 1e-7
