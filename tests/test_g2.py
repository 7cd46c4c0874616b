"""Second-order optical coherence g2 (the reference ships this physics
only as qutip scratch scripts, examples/g2_qutip.py; its Biphoton.g2 at
pyqed/optics.py:672 is a ``pass`` stub — both made real here).
"""
import numpy as np
import pytest

from pyqed_tpu.open import g2_coherence
from pyqed_tpu.ops.operators import destroy


def _thermal(dim, nbar):
    p = (nbar / (1 + nbar)) ** np.arange(dim)
    p /= p.sum()
    return np.diag(p)


def test_g2_thermal_light():
    """Damped thermal cavity: g2(0) = 2 and g2(tau) = 1 + e^{-kappa tau}
    (Lorentzian-spectrum chaotic light, Siegert relation)."""
    dim, nbar, kappa, w = 12, 0.3, 0.5, 0.0
    a = np.asarray(destroy(dim))
    H = w * a.conj().T @ a
    c_ops = [np.sqrt(kappa * (nbar + 1)) * a,
             np.sqrt(kappa * nbar) * a.conj().T]
    rho_ss = _thermal(dim, nbar)
    t, g2 = g2_coherence(H, rho_ss, a, c_ops=c_ops, dt=0.02, nt=400)
    t, g2 = np.asarray(t), np.asarray(g2)
    # tau->0 limit: first sample at dt
    assert abs(g2[0] - (1 + np.exp(-kappa * t[0]))) < 5e-3
    exact = 1 + np.exp(-kappa * t)
    assert np.max(np.abs(g2 - exact)) < 5e-3
    # long-time factorization
    assert abs(g2[-1] - 1) < 0.02


def test_g2_coherent_light():
    """Driven damped cavity steady state is coherent: g2(tau) = 1."""
    dim, kappa, eps = 14, 1.0, 0.4
    a = np.asarray(destroy(dim))
    H = eps * (a + a.conj().T)
    c_ops = [np.sqrt(kappa) * a]
    # steady coherent amplitude alpha = -2i eps / kappa
    alpha = -2j * eps / kappa
    vac = np.zeros(dim, complex)
    from scipy.linalg import expm
    D = expm(alpha * a.conj().T - np.conj(alpha) * a)
    psi = D @ np.eye(dim)[:, 0]
    rho = np.outer(psi, psi.conj())
    t, g2 = g2_coherence(H, rho, a, c_ops=c_ops, dt=0.02, nt=200)
    assert np.max(np.abs(np.asarray(g2) - 1.0)) < 2e-2


def test_biphoton_g2_schmidt():
    """Biphoton.g2 = 1 + 1/K: ~2 for a separable JSA, smaller for an
    entangled one."""
    from pyqed_tpu.models.pulse import Biphoton
    b = Biphoton(omegap=0.0, bw=0.2, Te=20.0)
    p = np.linspace(-1.0, 1.0, 128)
    b.set_grid(p, p.copy())
    b.get_jsa()
    g2_ent = float(b.g2())
    K_ent = float(b.schmidt_number())
    assert abs(g2_ent - (1 + 1 / K_ent)) < 1e-9
    # separable JSA: overwrite with a product Gaussian
    P, Q = np.meshgrid(p, p, indexing="ij")
    b.jsa = np.exp(-(P**2) / 0.1) * np.exp(-(Q**2) / 0.05)
    assert abs(float(b.g2()) - 2.0) < 1e-6
    assert abs(float(b.schmidt_number()) - 1.0) < 1e-8


def test_absorption_eseries_lorentzian():
    """Eigen-series absorption of a decaying 2-level system is a
    Lorentzian at w0 with HWHM gamma/2 (reference:
    pyqed/signal/liouville.py:27, made real)."""
    from pyqed_tpu.open.lindblad import absorption_eseries
    from pyqed_tpu.ops.superoperator import liouvillian
    from pyqed_tpu.ops.operators import pauli, sigmam
    s0, sx, sy, sz = pauli()
    w0, gamma = 1.0, 0.1
    H = np.diag([0.0, w0]).astype(complex)
    L = np.asarray(liouvillian(H, [np.sqrt(gamma) * np.asarray(sigmam())]))
    rho0 = np.diag([1.0, 0.0]).astype(complex)
    w = np.linspace(0.5, 1.5, 801)
    S = np.asarray(absorption_eseries(w, L, np.asarray(sx), rho0))
    # one-sided FT of a decaying cosine: absorption = Re S (Lorentzian,
    # peak 2/gamma), dispersion = Im S
    assert abs(S.real.max() - 2 / gamma) / (2 / gamma) < 2e-2
    A = S.real
    A = A / A.max()
    # peak at w0, half-maximum at w0 +- gamma/2
    assert abs(w[np.argmax(A)] - w0) < 2e-3
    exact = (gamma / 2)**2 / ((w - w0)**2 + (gamma / 2)**2)
    assert np.max(np.abs(A - exact)) < 2e-2
