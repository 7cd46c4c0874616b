"""GW self-energy on the two-time Kadanoff-Baym grid (negf/kb2t.py):
screened interaction from the Volterra Dyson chain W = v + v P W,
pinned against second Born in the weak-U limit and against the
equilibrium contour GF at U = 0 (VERDICT r2 #5)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.negf.kb2t import KBSolver2T
from pyqed_tpu.negf.contour import green_equilibrium_H


def _dimer(U, selfenergy, nt=48, dt=0.05, beta=5.0):
    h = np.array([[0.0, -1.0], [-1.0, 0.5]])
    sol = KBSolver2T(lambda t: h, nt=nt, dt=dt, beta=beta, mu=0.0,
                     U=U, selfenergy=selfenergy)
    sol.run(sc_iter=2)
    return sol


def test_gw_weak_u_reduces_to_second_born():
    """Wt = v P v + O(U^3): on the SAME (free) G, the GW self-energy
    minus the second-Born self-energy is exactly the higher-bubble
    chain, so halving U shrinks it ~8x (U^3). The comparison is at the
    Sigma level — propagated occupations mix in O(U^2 dt^2)
    discretization asymmetry that masks the scaling."""
    h = np.array([[0.0, -1.0], [-1.0, 0.5]])
    base = KBSolver2T(lambda t: h, nt=48, dt=0.05, beta=5.0, U=0.0)
    GR, GL = base.run()
    devs = {}
    for U in (0.4, 0.2):
        sol = KBSolver2T(lambda t: h, nt=48, dt=0.05, beta=5.0, U=U,
                         selfenergy="GW")
        SRg, SLg = sol.gw_self_energy(GR, GL)
        SR2, SL2 = sol.second_born(GR, GL)
        devs[U] = max(np.max(np.abs(np.asarray(SRg) - np.asarray(SR2))),
                      np.max(np.abs(np.asarray(SLg) - np.asarray(SL2))))
    assert devs[0.4] < 0.1 * 0.4 ** 2   # small next to the U^2 term
    ratio = devs[0.4] / devs[0.2]
    assert 6.0 < ratio < 10.5           # third-order scaling
    # and the propagated dynamics stays close at weak U
    n_gw = _dimer(0.2, "GW").occupations()
    n_2b = _dimer(0.2, "2B").occupations()
    assert np.max(np.abs(n_gw - n_2b)) < 5e-3


def test_gw_changes_dynamics_at_strong_u():
    # the screening chain must actually do something beyond 2B
    n_gw = _dimer(1.5, "GW").occupations()
    n_2b = _dimer(1.5, "2B").occupations()
    assert np.max(np.abs(n_gw - n_2b)) > 1e-3
    # (exact number conservation needs the FULL Baym-Kadanoff
    # self-consistency, not the sc_iter=2 refresh used here; finiteness
    # and boundedness are what a truncated iteration guarantees)
    assert np.all(np.isfinite(n_gw))
    assert np.max(np.abs(n_gw)) < 2.0


def test_free_kb_matches_equilibrium_contour():
    """U = 0: the KB march's G^R(t, 0) must equal the equilibrium
    contour GF's retarded component (ties kb2t to negf/contour)."""
    h = np.array([[0.0, -1.0], [-1.0, 0.5]])
    nt, dt, beta = 60, 0.05, 5.0
    sol = KBSolver2T(lambda t: h, nt=nt, dt=dt, beta=beta, U=0.0)
    GR, GL = sol.run()
    G = green_equilibrium_H(h, beta, dt, nt - 1, ntau=16, mu=0.0)
    dev = np.max(np.abs(np.asarray(GR[:, 0]) - G.ret[:, 0]))
    assert dev < 5e-3                  # 2nd-order march vs exact
    # equal-time lesser = i rho_eq at t=0 exactly
    assert np.max(np.abs(np.asarray(GL[0, 0]) - G.les[0, 0])) < 1e-12


def test_gw_sigma_structure():
    """Causality and Langreth symmetry of the GW self-energy arrays."""
    sol = _dimer(0.8, "GW", nt=30)
    SR, SL = sol.gw_self_energy(sol.GR, sol.GL)
    SR = np.asarray(SR)
    SL = np.asarray(SL)
    nt = sol.nt
    iu = np.triu_indices(nt, k=1)
    assert np.max(np.abs(SR[iu])) == 0.0          # strictly causal
    # Sigma^<(t',t) = -Sigma^<(t,t')^dagger (local/elementwise W keeps
    # the fermionic Langreth symmetry of G^<)
    SL_sw = np.conj(np.swapaxes(SL, 0, 1).transpose(0, 1, 3, 2))
    assert np.max(np.abs(SL + SL_sw)) < 1e-10


def test_spectral_function_peaks_at_eigenvalues():
    h = np.array([[0.0, -0.7], [-0.7, 0.3]])
    w_exact = np.linalg.eigvalsh(h)
    nt, dt = 400, 0.05
    sol = KBSolver2T(lambda t: h, nt=nt, dt=dt, beta=5.0, U=0.0)
    GR, _ = sol.run()
    ts = np.arange(nt) * dt
    g = np.asarray(GR[:, 0])                      # (nt, n, n)
    wgrid = np.linspace(-3, 3, 601)
    damp = np.exp(-0.5 * (ts / (nt * dt / 4)) ** 2)
    ph = np.exp(1j * np.outer(wgrid, ts)) * damp[None, :]
    A = -np.imag(np.trace(
        np.tensordot(ph, g, axes=(1, 0)), axis1=1, axis2=2)) / np.pi
    peaks = wgrid[np.argsort(A)[-20:]]
    # both eigenvalues are represented among the top bins
    assert min(abs(peaks - w_exact[0]).min(),
               abs(peaks - w_exact[1]).min()) < 0.05
    assert abs(wgrid[np.argmax(A)] - w_exact[np.argmin(
        np.abs(w_exact - wgrid[np.argmax(A)]))]) < 0.05
