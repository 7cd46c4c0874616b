"""Non-Hermitian LDR (grid/ldr.py::NonHermLDRN) parity + physics.

The full-grid LDR propagator in the biorthogonal adiabatic representation
is algebraically identical to diabatic Strang splitting with POINTWISE
MATRIX exponentials of the complex potential:

    R e^{-i w dt/2} L  (K ⊗ 1)  R e^{-i w dt/2} L
      = e^{-i V dt/2} (K ⊗ 1) e^{-i V dt/2}

so we pin the diabatic-frame result against that (machine precision),
then check the resonance physics (norm decay rate).
Reference semantics: pyqed/ldr/nonherm.py:156 NonHermitianLDR2.
"""
import numpy as np
import scipy.linalg
import jax.numpy as jnp

from pyqed_tpu.grid.ldr import NonHermLDRN, LDRN


def _setup(gamma=0.3, levels=(4,), ns=2):
    domains = [(-6.0, 6.0)]
    sol = NonHermLDRN(domains, list(levels), nstates=ns, mass=[1.0])
    x = sol.x[0]
    v = np.zeros((len(x), ns, ns), complex)
    v[:, 0, 0] = 0.5 * x ** 2
    v[:, 1, 1] = 0.5 * (x - 1.0) ** 2 + 2.0 - 1j * gamma
    v[:, 0, 1] = v[:, 1, 0] = 0.2 * np.exp(-x ** 2)
    return sol, x, v


def _psi0(x, ns):
    psi = np.zeros((len(x), ns), complex)
    psi[:, 0] = np.exp(-(x - 1.0) ** 2)
    psi[:, 1] = 0.5 * np.exp(-(x + 0.5) ** 2 + 0.5j * x)
    psi /= np.linalg.norm(psi)
    return psi


def _diabatic_strang(sol, v, psi0, dt, nt):
    """Direct diabatic-basis Strang with pointwise expm(-i V dt/2)."""
    nx, ns = psi0.shape
    expV2 = np.stack([scipy.linalg.expm(-0.5j * dt * v[i])
                      for i in range(nx)])
    K = np.asarray(sol.dvr[0].expT(dt))
    psi = psi0.copy()
    for _ in range(nt):
        psi = np.einsum("iab, ib -> ia", expV2, psi)
        psi = np.einsum("ij, ja -> ia", K, psi)
        psi = np.einsum("iab, ib -> ia", expV2, psi)
    return psi


def test_nonherm_ldr_matches_diabatic_strang():
    sol, x, v = _setup()
    sol.set_diabatic(v)
    psi0_dia = _psi0(x, 2)
    dt, nt = 0.01, 40

    psi0_adi = np.asarray(sol.from_diabatic(psi0_dia))
    r = sol.run(jnp.asarray(psi0_adi), dt, nt, nout=nt)
    # undo the stored trailing half-V offset (LDRN stores expV2 * exact)
    psi_adi = np.asarray(r.psi) / np.asarray(
        np.exp(-0.5j * dt * np.asarray(sol.apes)))
    psi_dia = np.asarray(sol.to_diabatic(psi_adi))

    ref = _diabatic_strang(sol, v, psi0_dia, dt, nt)
    assert np.max(np.abs(psi_dia - ref)) < 1e-9


def test_nonherm_ldr_hermitian_limit_norm_conserved():
    sol, x, v = _setup(gamma=0.0)
    sol.set_diabatic(v)
    psi0_dia = _psi0(x, 2)
    dt, nt = 0.01, 30
    psi0_adi = np.asarray(sol.from_diabatic(psi0_dia))
    r = sol.run(jnp.asarray(psi0_adi), dt, nt, nout=nt)
    psi_adi = np.asarray(r.psi) / np.asarray(
        np.exp(-0.5j * dt * np.asarray(sol.apes)))
    # Hermitian limit: diabatic-frame norm conserved
    dia = np.asarray(sol.to_diabatic(psi_adi))
    assert abs(np.linalg.norm(dia) - 1.0) < 1e-9


def test_nonherm_ldr_decay_physics():
    """Population put on the decaying surface decays ~ exp(-gamma t)."""
    gamma = 0.5
    domains = [(-6.0, 6.0)]
    sol = NonHermLDRN(domains, [4], nstates=2, mass=[1.0])
    x = sol.x[0]
    v = np.zeros((len(x), 2, 2), complex)
    v[:, 0, 0] = 0.5 * x ** 2
    v[:, 1, 1] = 0.5 * x ** 2 + 2.0 - 0.5j * gamma
    # no coupling: clean exponential decay of state-1 population
    sol.set_diabatic(v)
    psi_dia = np.zeros((len(x), 2), complex)
    psi_dia[:, 1] = np.exp(-x ** 2 / 2) / np.pi ** 0.25
    psi_dia[:, 1] /= np.sqrt(np.sum(np.abs(psi_dia[:, 1]) ** 2) * sol.dx[0])

    dt, nt = 0.01, 100
    psi0_adi = np.asarray(sol.from_diabatic(psi_dia))
    r = sol.run(jnp.asarray(psi0_adi), dt, nt, nout=nt)
    psi_adi = np.asarray(r.psi) / np.asarray(
        np.exp(-0.5j * dt * np.asarray(sol.apes)))
    n_final = sol.norm(jnp.asarray(psi_adi))
    t = dt * nt
    assert abs(n_final - np.exp(-gamma * t)) < 1e-6


def test_nonherm_factored_matches_dense():
    """Non-Hermitian factored path: A = L·R applied through the distinct
    bra (left-eigenvector) and ket (right-eigenvector) factors equals
    the dense dressed propagator to machine precision."""
    from pyqed_tpu.grid.ldr import NonHermLDRN
    ldr = NonHermLDRN([(-5, 5), (-4, 4)], [3, 3], ndim=2, nstates=2)
    X, Y = np.meshgrid(ldr.x[0], ldr.x[1], indexing="ij")
    v = np.zeros((*ldr.nx, 2, 2), complex)
    v[..., 0, 0] = 0.5 * (X ** 2 + Y ** 2) - 0.05j
    v[..., 1, 1] = 0.5 * (X ** 2 + Y ** 2) + 1.0 - 0.15j * np.exp(-X ** 2)
    v[..., 0, 1] = v[..., 1, 0] = 0.2 * X
    ldr.set_diabatic(v)
    ldr.build_ovlp()
    psi0 = np.zeros((*ldr.nx, 2), complex)
    g = np.exp(-((X - 0.5) ** 2 + Y ** 2))
    psi0[..., 0] = g / np.sqrt((np.abs(g) ** 2).sum())
    rd = ldr.run(psi0, dt=0.005, nt=40, nout=10, method="dense")
    ldr.set_diabatic(v)
    ldr.build_ovlp()
    rf = ldr.run(psi0, dt=0.005, nt=40, nout=10, method="factored")
    assert np.max(np.abs(np.asarray(rd.states)
                         - np.asarray(rf.states))) < 1e-12
