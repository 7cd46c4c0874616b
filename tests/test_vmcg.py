"""Variational moving-basis Gaussian dynamics (grid/vmcg.py).

Oracle: matrix elements vs the ACTUAL reference complex-GWP integrals
(/root/reference/pyqed/ldr/gwp.py:1470 overlap_1d, :1531 kin_1d), plus
direct quadrature; dynamics vs SPO populations on a quadratic diabatic
model (LHA exact there), where VERDICT round-1 set the <=1e-6 bar.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqed_tpu.grid.vmcg import VMCG, GWPMatrixElements
from pyqed_tpu.grid.spo import SPON
from pyqed_tpu.grid.gwp import ThawedGaussian

from ref_oracle import load_reference_module


def _rand_set(N=6, D=1, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(N, D))
    p = rng.normal(size=(N, D))
    a = rng.uniform(0.5, 2.0, size=(N, D))
    s = rng.normal(size=(N,))
    return q, p, a, s


def test_overlap_kinetic_vs_reference_oracle():
    gwp = load_reference_module("ldr.gwp")
    N = 6
    q, p, a, s = _rand_set(N)
    S = np.asarray(GWPMatrixElements.overlap(q, p, a.astype(complex), s))
    K = np.asarray(GWPMatrixElements.kinetic(
        q, p, a.astype(complex), s, jnp.ones(1)))
    for j in range(N):
        for k in range(N):
            sref = gwp.overlap_1d(a[j, 0], q[j, 0], p[j, 0], s[j],
                                  a[k, 0], q[k, 0], p[k, 0], s[k])
            kref = gwp.kin_1d(a[j, 0], q[j, 0], p[j, 0], s[j],
                              a[k, 0], q[k, 0], p[k, 0], s[k], 1.0)
            assert abs(S[j, k] - sref) < 1e-13
            assert abs(K[j, k] - kref) < 1e-13


def test_overlap_kinetic_vs_quadrature_complex_widths():
    # complex (thawed) widths — beyond what the reference integrals
    # support; pin against direct quadrature
    rng = np.random.default_rng(3)
    N = 4
    q, p, _, s = _rand_set(N, seed=3)
    a = (rng.uniform(0.8, 1.5, size=(N, 1))
         + 1j * rng.uniform(-0.4, 0.4, size=(N, 1)))
    S = np.asarray(GWPMatrixElements.overlap(q, p, a, s))
    K = np.asarray(GWPMatrixElements.kinetic(q, p, a, s, jnp.ones(1)))
    x = np.linspace(-12, 12, 12001)
    dx = x[1] - x[0]

    def g(j):
        return ((np.real(a[j, 0]) / np.pi) ** 0.25
                * np.exp(-0.5 * a[j, 0] * (x - q[j, 0]) ** 2
                         + 1j * p[j, 0] * (x - q[j, 0]))
                * np.exp(1j * s[j]))

    for j, k in [(0, 1), (2, 3), (1, 2)]:
        gj, gk = g(j), g(k)
        sq = np.sum(np.conj(gj) * gk) * dx
        kq = np.sum(np.conj(gj)
                    * (-0.5 * np.gradient(np.gradient(gk, dx), dx))) * dx
        assert abs(S[j, k] - sq) < 1e-8
        assert abs(K[j, k] - kq) < 1e-5


def test_overlap_factorizes_multidim():
    q, p, a, s = _rand_set(5, D=3, seed=1)
    S3 = np.asarray(GWPMatrixElements.overlap(q, p, a.astype(complex), s))
    prod = np.ones((5, 5), complex)
    for d in range(3):
        prod *= np.asarray(GWPMatrixElements.overlap(
            q[:, d:d + 1], p[:, d:d + 1],
            a[:, d:d + 1].astype(complex), np.zeros(5)))
    prod *= np.exp(1j * (s[None, :] - s[:, None]))
    assert np.max(np.abs(S3 - prod)) < 1e-13


def _dho_model(c=0.15, gap=0.3):
    def V(x):
        x = x[0]
        return jnp.array([[0.5 * (x + 1.0) ** 2, c],
                          [c, 0.5 * (x - 1.0) ** 2 + gap]])
    return V


def _spo_pops(c, gap, dt, nt, q0=-1.0, a0=1.0):
    xg = np.linspace(-8, 8, 256)
    spo = SPON([xg], masses=1.0, nstates=2)
    v = np.zeros((256, 2, 2))
    v[:, 0, 0] = 0.5 * (xg + 1.0) ** 2
    v[:, 1, 1] = 0.5 * (xg - 1.0) ** 2 + gap
    v[:, 0, 1] = v[:, 1, 0] = c
    spo.set_dpes(v)
    psi0 = np.zeros((256, 2), complex)
    psi0[:, 0] = (a0 / np.pi) ** 0.25 * np.exp(-0.5 * a0 * (xg - q0) ** 2)
    psi0 /= np.sqrt(np.sum(np.abs(psi0) ** 2) * (xg[1] - xg[0]))
    res = spo.run(psi0, dt=dt, nt=nt, nout=nt)
    psiT = np.asarray(res.states[-1]).reshape(256, 2)
    return np.sum(np.abs(psiT) ** 2, axis=0) * (xg[1] - xg[0])


def test_vmcg_nonadiabatic_vs_spo():
    """Moving-basis variational dynamics matches SPO populations <=1e-6
    (round-1 VERDICT acceptance bar) on a quadratic diabatic model."""
    c, gap, dt, nt = 0.15, 0.3, 0.01, 400
    pops_spo = _spo_pops(c, gap, dt, nt)
    sol = VMCG(_dho_model(c, gap), mass=1.0, nstates=2, ndim=1,
               motion="ehrenfest")
    N = 24
    qs = np.linspace(-3.5, 2.5, N)[:, None]
    ps = np.zeros((N, 1))
    al = np.ones((N, 1), complex)
    C0 = sol.project(qs, ps, al, np.array([-1.0]), np.array([0.0]),
                     np.array([1.0 + 0j]), state=0)
    out = sol.run(qs, ps, al, C0, dt, nt, nout=nt)
    pops = np.asarray(out["populations"][-1])
    assert np.max(np.abs(pops - pops_spo)) < 1e-6
    assert abs(pops.sum() - 1.0) < 1e-5


def test_vmcg_single_surface_matches_thawed_heller():
    """ns=1, one thawed basis function on a harmonic surface: the
    variational moving-basis EOM must reproduce Heller's exact
    thawed-Gaussian trajectory (grid/gwp.py ThawedGaussian)."""
    def Vh(x):
        return 0.5 * 2.0 * x[0] ** 2          # omega^2 = 2

    sol = VMCG(lambda x: jnp.array([[0.5 * 2.0 * x[0] ** 2]]),
               mass=1.0, nstates=1, ndim=1, motion=0, thawed=True)
    q0, p0 = np.array([[1.2]]), np.array([[0.0]])
    al0 = np.array([[0.7 + 0.0j]])
    C0 = np.ones((1, 1), complex)
    dt, nt = 0.005, 300
    out = sol.run(q0, p0, al0, C0, dt, nt, nout=10)

    tg = ThawedGaussian(lambda x: 0.5 * 2.0 * jnp.sum(x ** 2),
                        mass=1.0, ndim=1)
    times, qs, ps, As, gs, norms = tg.run(
        np.array([1.2]), np.array([0.0]), a0=np.array([[0.7]]),
        dt=dt, nt=nt, nout=10)
    # alpha = -2iA  (exponent conventions exp(-a/2 x^2) vs exp(iAx^2))
    alpha_heller = np.asarray(-2j * As[:, 0, 0])
    alpha_mine = np.asarray(out["alpha"][1:, 0, 0])
    assert np.max(np.abs(np.asarray(out["q"][1:, 0, 0])
                         - np.asarray(qs[:, 0]))) < 1e-10
    assert np.max(np.abs(alpha_mine - alpha_heller)) < 1e-8
    # norm conserved by the variational amplitude on its moving basis
    pops = np.asarray(out["populations"])
    assert np.max(np.abs(pops.sum(axis=1) - 1.0)) < 1e-9


def test_vmcg_projection_completeness():
    sol = VMCG(_dho_model(), mass=1.0, nstates=2, ndim=1)
    N = 24
    qs = np.linspace(-3.5, 2.5, N)[:, None]
    ps = np.zeros((N, 1))
    al = np.ones((N, 1), complex)
    C0 = sol.project(qs, ps, al, np.array([-1.0]), np.array([0.0]),
                     np.array([1.0 + 0j]), state=0)
    # <psi|psi> of the projected state ~ 1 (basis covers the target)
    S = GWPMatrixElements.overlap(jnp.asarray(qs, float),
                                  jnp.asarray(ps, float),
                                  jnp.asarray(al), jnp.zeros(N))
    n = float(jnp.real(jnp.einsum("ja, jk, ka ->",
                                  jnp.conj(C0), S, C0)))
    assert abs(n - 1.0) < 1e-8


def test_vmcg_2d_nonadiabatic_vs_spo():
    """2D two-state quadratic diabatic model: moving-basis dynamics vs
    SPO2 populations (coarse basis, short time)."""
    c = 0.1

    def V2(x):
        return jnp.array([
            [0.5 * ((x[0] + 1.0) ** 2 + x[1] ** 2), c],
            [c, 0.5 * ((x[0] - 1.0) ** 2 + x[1] ** 2) + 0.3]])

    dt, nt = 0.01, 200
    xg = np.linspace(-7, 7, 128)
    spo = SPON([xg, xg], masses=1.0, nstates=2)
    X, Y = np.meshgrid(xg, xg, indexing="ij")
    v = np.zeros((128, 128, 2, 2))
    v[..., 0, 0] = 0.5 * ((X + 1.0) ** 2 + Y ** 2)
    v[..., 1, 1] = 0.5 * ((X - 1.0) ** 2 + Y ** 2) + 0.3
    v[..., 0, 1] = v[..., 1, 0] = c
    spo.set_dpes(v)
    psi0 = np.zeros((128, 128, 2), complex)
    psi0[..., 0] = np.exp(-0.5 * ((X + 1.0) ** 2 + Y ** 2))
    psi0 /= np.sqrt(np.sum(np.abs(psi0) ** 2) * (xg[1] - xg[0]) ** 2)
    res = spo.run(psi0, dt=dt, nt=nt, nout=nt)
    psiT = np.asarray(res.states[-1]).reshape(128, 128, 2)
    pops_spo = np.sum(np.abs(psiT) ** 2, axis=(0, 1)) * (xg[1] - xg[0]) ** 2

    sol = VMCG(V2, mass=1.0, nstates=2, ndim=2, motion="ehrenfest")
    g1 = np.linspace(-2.8, 1.6, 9)
    g2 = np.linspace(-1.8, 1.8, 7)
    QX, QY = np.meshgrid(g1, g2, indexing="ij")
    qs = np.stack([QX.ravel(), QY.ravel()], axis=1)
    N = qs.shape[0]
    ps = np.zeros((N, 2))
    al = np.ones((N, 2), complex)
    C0 = sol.project(qs, ps, al, np.array([-1.0, 0.0]),
                     np.array([0.0, 0.0]), np.array([1.0, 1.0],
                                                    dtype=complex),
                     state=0)
    out = sol.run(qs, ps, al, C0, dt, nt, nout=nt)
    pops = np.asarray(out["populations"][-1])
    assert np.max(np.abs(pops - pops_spo)) < 5e-5


def test_vmcg_observables_vs_grid_quadrature():
    """rdm_el / obs_el / obs_nuc / nuclear_density against direct grid
    quadrature of the represented wavefunction
    (reference: pyqed/ldr/gwp.py:1077-1420 obs_el/obs_nuc/nuclear_density)."""
    rng = np.random.default_rng(7)
    N, ns = 5, 2
    sol = VMCG(lambda x: jnp.diag(jnp.array([0.5 * x[0] ** 2,
                                             0.5 * x[0] ** 2 + 0.3])),
               mass=1.0, nstates=ns, ndim=1)
    q = rng.normal(size=(N, 1))
    p = rng.normal(size=(N, 1)) * 0.5
    al = rng.uniform(0.8, 1.5, size=(N, 1)) + 0j
    g = rng.normal(size=(N,)) * 0.2
    C = rng.normal(size=(N, ns)) + 1j * rng.normal(size=(N, ns))
    state = (jnp.asarray(q), jnp.asarray(p), jnp.asarray(al),
             jnp.asarray(g), jnp.asarray(C))

    x = np.linspace(-12, 12, 4001)[:, None]
    dx = x[1, 0] - x[0, 0]
    psi = np.asarray(sol.wavefunction(state, x))      # (M, ns)

    # rdm_el == grid quadrature rho[a,b] = int psi_a psi_b^*
    rho_grid = np.einsum("ma, mb -> ab", psi, psi.conj()) * dx
    rho = np.asarray(sol.rdm_el(state))
    assert np.max(np.abs(rho - rho_grid)) < 1e-9

    A = np.array([[0.2, 0.1 - 0.3j], [0.1 + 0.3j, -0.5]])
    want = np.trace(rho_grid @ A)
    assert np.asarray(sol.obs_el(state, A)) == pytest.approx(want, abs=1e-9)

    # nuclear observables
    dens = np.sum(np.abs(psi) ** 2, axis=1)
    xbar = np.sum(dens * x[:, 0]) * dx
    x2 = np.sum(dens * x[:, 0] ** 2) * dx
    assert np.asarray(sol.obs_nuc(state, "x"))[0] == pytest.approx(
        xbar, abs=1e-8)
    assert np.asarray(sol.obs_nuc(state, "x2"))[0] == pytest.approx(
        x2, abs=1e-8)
    dpsi = np.gradient(psi, dx, axis=0)
    pbar = np.real(np.sum(psi.conj() * (-1j) * dpsi)) * dx
    assert np.asarray(sol.obs_nuc(state, "p"))[0] == pytest.approx(
        pbar, abs=1e-5)

    # nuclear density on the grid + normalization consistency
    nd = np.asarray(sol.nuclear_density(state, x))
    assert np.max(np.abs(nd - dens)) < 1e-12
    assert np.sum(nd) * dx == pytest.approx(float(sol.norm(state)),
                                            abs=1e-9)
