"""Equilibrium contour Green functions and the Volterra marcher
(reference semantics: pyqed/gw/green.py:806 green_equilibrium,
green.py:2133 volterra_intdiff)."""
import numpy as np
import pytest

from pyqed_tpu.negf.contour import (
    ContourGF, green_equilibrium, green_equilibrium_H, semicircle_dos,
    DOS, volterra_intdiff,
)


BETA, DT, NT, NTAU = 5.0, 0.05, 40, 64


@pytest.fixture(scope="module")
def bethe_gf():
    return green_equilibrium(semicircle_dos(2.0), BETA, DT, NT, NTAU,
                             limit=4001, mu=0.3)


def test_matsubara_sum_rule(bethe_gf):
    # G^M(0+) + G^M(beta-) = -1 for a unit-normalized fermion DOS
    G = bethe_gf
    assert abs(G.mat[0, 0, 0] + G.mat[-1, 0, 0] + 1.0) < 1e-5


def test_kms_boundary(bethe_gf):
    # left-mixing at t=0 meets Matsubara: G^rc(0, tau) = i xi G^M(beta - tau)
    G = bethe_gf
    lhs = G.tv[0, :, 0, 0]
    rhs = 1j * (-1) * G.mat[::-1, 0, 0]
    assert np.max(np.abs(lhs - rhs)) < 1e-6


def test_occupation_matches_quadrature(bethe_gf):
    G = bethe_gf
    dos = semicircle_dos(2.0)
    w = np.linspace(-2, 2, 4001)
    f = 0.5 * (1 - np.tanh(0.5 * BETA * (w - 0.3)))
    n_exact = np.trapezoid(dos.dos(w) * f, w)
    assert abs(G.occupation(0)[0] - n_exact) < 1e-8
    # equal-time lesser is time-translation invariant in equilibrium
    assert abs(G.occupation(NT // 2)[0] - n_exact) < 1e-8


def test_retarded_equal_time(bethe_gf):
    # G^R(t, t) = -i \int A = -i for unit-normalized DOS
    G = bethe_gf
    assert abs(G.ret[7, 7, 0, 0] + 1j) < 1e-5


def test_single_level_closed_form():
    """A single level e0: every component has a closed form."""
    e0, mu = 0.7, 0.1
    G = green_equilibrium_H(np.array([[e0]]), BETA, DT, NT, NTAU, mu=mu)
    f = 1.0 / (np.exp(BETA * (e0 - mu)) + 1.0)
    ts = np.arange(NT + 1) * DT
    taus = np.arange(NTAU + 1) * (BETA / NTAU)
    # retarded
    assert np.allclose(G.ret[:, 0, 0, 0],
                       -1j * np.exp(-1j * e0 * ts), atol=1e-12)
    # lesser on the stored upper triangle: e^{-i e0 (t_i - t_j)}, i<=j
    assert np.allclose(G.les[0, :, 0, 0],
                       1j * f * np.exp(1j * e0 * ts), atol=1e-12)
    # Matsubara: -e^{-(e0-mu) tau} (1 - f)
    assert np.allclose(G.mat[:, 0, 0],
                       -np.exp(-(e0 - mu) * taus) * (1 - f), atol=1e-12)
    # tv: i f e^{-i e0 t} e^{(e0-mu) tau}
    ref = 1j * f * np.exp(-1j * e0 * ts)[:, None] \
        * np.exp((e0 - mu) * taus)[None, :]
    assert np.allclose(G.tv[:, :, 0, 0], ref, atol=1e-10)


def test_matrix_H_basis_covariance():
    """2x2 H: GF from eigen-decomposition must equal the similarity
    transform of the diagonal GF."""
    H = np.array([[0.5, 0.3], [0.3, -0.2]])
    w, v = np.linalg.eigh(H)
    G = green_equilibrium_H(H, BETA, DT, 10, 16, mu=0.05)
    Gd = green_equilibrium_H(np.diag(w), BETA, DT, 10, 16, mu=0.05)
    # rotate the diagonal result into the site basis
    rot = np.einsum("ak, ...kl, bl -> ...ab", v, Gd.ret, np.conj(v))
    assert np.allclose(G.ret, rot, atol=1e-12)
    rotm = np.einsum("ak, ...kl, bl -> ...ab", v, Gd.mat, np.conj(v))
    assert np.allclose(G.mat, np.real(rotm), atol=1e-12)


def test_spectral_function_recovers_level():
    e0 = 0.4
    G = green_equilibrium_H(np.array([[e0]]), BETA, dt=0.05, nt=2000,
                            ntau=8, mu=0.0)
    wgrid = np.linspace(-2, 2, 401)
    A = G.spectral_function(wgrid)
    assert abs(wgrid[np.argmax(A)] - e0) < 0.02


def test_volterra_no_kernel_is_exponential():
    # dy/dt = q y, K = 0  ->  y(t) = e^{q t} y0; the marcher is an
    # implicit trapezoid, so the error must be small AND shrink ~dt^2
    from scipy.linalg import expm
    qm = np.array([[0.0, 1.0], [-1.0, 0.0]]) * 1j
    ref = expm(qm * 2.0)

    def err(nt, dt):
        q = np.broadcast_to(qm, (nt + 1, 2, 2))
        K = np.zeros((nt + 1, nt + 1, 2, 2))
        y = volterra_intdiff(q, K, np.eye(2), dt, nt,
                             corrector_iters=3)
        return np.max(np.abs(np.asarray(y[-1]) - ref))

    e1, e2 = err(200, 0.01), err(400, 0.005)
    assert e1 < 1e-4
    assert e2 < e1 / 3.0  # second-order convergence


def test_volterra_memory_kernel_cosine():
    # dy/dt = -\int_0^t y(s) ds, y(0)=1  ->  y = cos(t)
    nt, dt = 400, 0.01
    q = np.zeros((nt + 1, 1, 1))
    K = -np.ones((nt + 1, nt + 1, 1, 1))
    y = volterra_intdiff(q, K, np.eye(1), dt, nt, corrector_iters=3)
    ts = np.arange(nt + 1) * dt
    assert np.max(np.abs(np.asarray(y)[:, 0, 0] - np.cos(ts))) < 1e-4


def test_volterra_inhomogeneous():
    # dy/dt = -y + f(t), f = const c  ->  y -> c (scalar, y0 = 0)
    nt, dt = 600, 0.02
    q = np.full((nt + 1, 1, 1), -1.0)
    K = np.zeros((nt + 1, nt + 1, 1, 1))
    f = np.full((nt + 1, 1, 1), 0.8)
    y = volterra_intdiff(q, K, np.zeros((1, 1)), dt, nt, f=f,
                         corrector_iters=2)
    assert abs(np.asarray(y)[-1, 0, 0] - 0.8) < 1e-4


def test_equilibrium_vs_H_single_site():
    """green_equilibrium with a sharply peaked DOS approaches the
    single-level green_equilibrium_H result."""
    e0 = 0.2
    width = 5e-4
    dos = DOS(lambda w: np.exp(-((w - e0) / width) ** 2 / 2)
              / (width * np.sqrt(2 * np.pi)), e0 - 8 * width,
              e0 + 8 * width)
    Ga = green_equilibrium(dos, BETA, DT, 10, 16, limit=2001)
    Gb = green_equilibrium_H(np.array([[e0]]), BETA, DT, 10, 16)
    assert np.max(np.abs(Ga.ret - Gb.ret)) < 1e-4
    assert np.max(np.abs(Ga.mat - Gb.mat)) < 1e-4
    assert np.max(np.abs(Ga.tv - Gb.tv)) < 1e-4
