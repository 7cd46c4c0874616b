"""Fewest-switches surface hopping tests.

Beyond-parity method (the reference's trajectory layer is an unfinished
Ehrenfest sketch, pyqed/namd/ehrenfest.py); physics pinned against
closed-form classical motion and EXACT quantum wavepacket dynamics (our
independent SPO path) on Tully model I.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyqed_tpu.grid import FSSH, SPON, tully_i, tully_ii, tully_iii


def test_fssh_zero_coupling_classical_limit():
    # diagonal diabatic matrix -> no hops, active surface fixed, nuclear
    # motion = classical harmonic oscillator
    def vdiag(x):
        d = x[0]
        return jnp.array([[0.5 * d ** 2, 0.0 * d],
                          [0.0 * d, 0.5 * d ** 2 + 1.0]])
    sol = FSSH(vdiag, mass=1.0, nstates=2, ndim=1)
    res = sol.run(np.array([[1.0]]), np.array([[0.0]]), active0=0,
                  dt=0.01, nt=700, nout=7)
    x = np.asarray(res.x)[:, 0, 0]
    t = np.asarray(res.times)
    assert np.max(np.abs(x - np.cos(t))) < 1e-4
    assert np.all(np.asarray(res.active) == 0)
    e = np.asarray(res.energy)
    assert np.max(np.abs(e - e[0])) < 1e-4


def test_fssh_energy_and_norm_conserved_through_hops():
    sol = FSSH(tully_i(), mass=2000.0, nstates=2, ndim=1)
    ntraj = 64
    x0 = np.full((ntraj, 1), -8.0)
    p0 = np.full((ntraj, 1), 20.0)
    res = sol.run(x0, p0, active0=0, dt=2.0, nt=4000, nout=200, key=1)
    # hops happened (both surfaces populated at the end)
    pop = np.asarray(res.population)[-1]
    assert pop[1] > 0.1
    # total energy conserved per trajectory INCLUDING momentum-rescaled hops
    e = np.asarray(res.energy)
    assert np.max(np.abs(e - e[0:1])) < 1e-4
    # electronic norm conserved (exact expm micro-propagation)
    nrm = np.sum(np.abs(np.asarray(res.c)) ** 2, axis=-1)
    assert np.max(np.abs(nrm - 1.0)) < 1e-8


def test_fssh_matches_exact_wavepacket_tully_i():
    # exact quantum (SPO, independent code path) vs FSSH surface pops
    v = tully_i()
    m, k0, sig = 2000.0, 20.0, 1.0

    x = np.linspace(-25, 35, 512, endpoint=False)
    spo = SPON([x], masses=[m], nstates=2)
    V = np.asarray(jnp.stack([v(jnp.array([xi])) for xi in x]))
    spo.set_dpes(V)
    dx = x[1] - x[0]
    gauss = np.exp(-(x + 8.0) ** 2 / (4 * sig ** 2) + 1j * k0 * (x + 8.0))
    psi0 = np.zeros((512, 2), complex)
    psi0[:, 0] = gauss / np.sqrt(np.sum(np.abs(gauss) ** 2) * dx)
    res = spo.run(jnp.asarray(psi0), dt=1.0, nt=2600, nout=2600,
                  return_states=True)
    psiT = np.asarray(res.psilist[-1])
    _, Us = np.linalg.eigh(V)
    pop_exact = np.sum(np.abs(np.einsum("xia, xi -> xa", Us, psiT)) ** 2,
                       axis=0) * dx

    sol = FSSH(v, mass=m, nstates=2, ndim=1)
    ntraj = 500
    rng = np.random.default_rng(3)
    x0 = rng.normal(-8.0, sig, (ntraj, 1))
    p0 = rng.normal(k0, 1.0 / (2 * sig), (ntraj, 1))
    r2 = sol.run(x0, p0, active0=0, dt=2.0, nt=4000, nout=400, key=7)
    pop_fssh = np.asarray(r2.population)[-1]

    # k0=20 run above gives exact [0.507, 0.493] vs FSSH [0.506, 0.494]
    assert np.max(np.abs(pop_fssh - pop_exact)) < 0.06
    # and the wavefunction estimator agrees too
    assert np.max(np.abs(np.asarray(r2.population_wf)[-1] - pop_exact)) < 0.06


def test_fssh_low_momentum_mostly_adiabatic():
    # k0 = 5 on Tully-I: far below the band gap scale -> mostly stays on
    # the lower adiabatic surface (adiabatic regime)
    sol = FSSH(tully_i(), mass=2000.0, nstates=2, ndim=1)
    ntraj = 128
    x0 = np.full((ntraj, 1), -6.0)
    p0 = np.full((ntraj, 1), 5.0)
    res = sol.run(x0, p0, active0=0, dt=4.0, nt=4000, nout=400, key=2)
    pop = np.asarray(res.population)[-1]
    assert pop[0] > 0.8


def test_tully_models_shapes_and_symmetry():
    for mk in (tully_i, tully_ii, tully_iii):
        v = mk()
        M = np.asarray(v(jnp.array([0.3])))
        assert M.shape == (2, 2)
        assert abs(M[0, 1] - M[1, 0]) < 1e-14


def test_fssh_edc_decoherence_norm_and_physics():
    # EDC keeps the norm exactly and leaves the (already accurate)
    # Tully-I populations within tolerance of the exact result
    sol = FSSH(tully_i(), mass=2000.0, nstates=2, ndim=1,
               decoherence="edc")
    ntraj = 200
    rng = np.random.default_rng(3)
    x0 = rng.normal(-8.0, 1.0, (ntraj, 1))
    p0 = rng.normal(20.0, 0.5, (ntraj, 1))
    res = sol.run(x0, p0, active0=0, dt=2.0, nt=4000, nout=400, key=7)
    nrm = np.sum(np.abs(np.asarray(res.c)) ** 2, axis=-1)
    assert np.max(np.abs(nrm - 1.0)) < 1e-8
    pop = np.asarray(res.population)[-1]
    assert abs(pop[0] - 0.51) < 0.1
    # with decoherence, the wavefunction estimator collapses toward the
    # surface estimator (internal consistency)
    d_edc = np.max(np.abs(np.asarray(res.population_wf)[-1] - pop))
    assert d_edc < 0.1


def test_fssh_sharded_equals_unsharded():
    # trajectory axis sharded over the 8-device mesh: per-trajectory PRNG
    # keys make the sharded ensemble IDENTICAL to the unsharded one
    import jax
    import pytest as _pytest
    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 virtual devices")
    from pyqed_tpu.parallel import make_mesh
    sol = FSSH(tully_i(), mass=2000.0, nstates=2, ndim=1)
    ntraj = 64
    rng = np.random.default_rng(1)
    x0 = rng.normal(-8.0, 1.0, (ntraj, 1))
    p0 = rng.normal(20.0, 0.5, (ntraj, 1))
    r1 = sol.run(x0, p0, active0=0, dt=2.0, nt=800, nout=200, key=4)
    mesh = make_mesh({"walker": 8})
    r2 = sol.run(x0, p0, active0=0, dt=2.0, nt=800, nout=200, key=4,
                 mesh=mesh)
    assert np.allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-12)
    assert np.array_equal(np.asarray(r1.active), np.asarray(r2.active))
    assert np.allclose(np.asarray(r1.population),
                       np.asarray(r2.population), atol=1e-12)


def test_wigner_sample_harmonic_variances():
    from pyqed_tpu.utils.wigner import wigner_sample_harmonic
    # ground state: sigma_x^2 = 1/(2 m w), sigma_p^2 = m w / 2
    x, p = wigner_sample_harmonic(0, 40000, omega=2.0, mass=3.0)
    assert abs(float(np.var(np.asarray(x))) - 1 / 12.0) < 3e-3
    assert abs(float(np.var(np.asarray(p))) - 3.0) < 0.05
    # thermal scaling: coth(beta w / 2)
    xT, _ = wigner_sample_harmonic(1, 40000, omega=2.0, mass=3.0, beta=0.5)
    fac = 1 / np.tanh(0.5)
    assert abs(float(np.var(np.asarray(xT))) - fac / 12.0) < 5e-3
    # multidimensional shapes
    x2, p2 = wigner_sample_harmonic(2, 10, omega=np.array([1.0, 2.0]))
    assert x2.shape == (10, 2) and p2.shape == (10, 2)


def test_fssh_2d_energy_conserved_through_hops():
    # 2D avoided crossing: momentum rescaling happens along the 2D NAC
    # direction; total energy must still be conserved through hops
    A, B, C, D = 0.01, 1.6, 0.005, 1.0

    def v2d(x):
        d, y = x[0], x[1]
        v11 = A * jnp.tanh(B * d) + 0.002 * y ** 2
        v12 = C * jnp.exp(-D * (d ** 2 + y ** 2))
        return jnp.array([[v11, v12], [v12, -v11 + 0.002 * y ** 2]])

    sol = FSSH(v2d, mass=2000.0, nstates=2, ndim=2)
    ntraj = 48
    rng = np.random.default_rng(5)
    x0 = np.column_stack([np.full(ntraj, -8.0), rng.normal(0, 0.5, ntraj)])
    p0 = np.column_stack([np.full(ntraj, 20.0), rng.normal(0, 1.0, ntraj)])
    res = sol.run(x0, p0, active0=0, dt=2.0, nt=3000, nout=300, key=9)
    pop = np.asarray(res.population)[-1]
    assert pop[1] > 0.05                      # hops occurred
    e = np.asarray(res.energy)
    assert np.max(np.abs(e - e[0:1])) < 5e-4  # conserved incl. 2D rescaling
    nrm = np.sum(np.abs(np.asarray(res.c)) ** 2, axis=-1)
    assert np.max(np.abs(nrm - 1.0)) < 1e-8


def test_fssh_flat_1d_input_means_ntraj():
    # regression: flat (ntraj,) input used to become ONE ntraj-dimensional
    # trajectory via atleast_2d
    sol = FSSH(tully_i(), mass=2000.0, nstates=2, ndim=1)
    res = sol.run(np.full(8, -8.0), np.full(8, 20.0), active0=0,
                  dt=2.0, nt=100, nout=100, key=0)
    assert np.asarray(res.x).shape == (1, 8, 1)   # (nsnap, ntraj, ndim)


def test_fssh_result_dump_keeps_extras(tmp_path):
    # regression: Result.dump dropped non-dataclass attributes
    from pyqed_tpu.core.result import load_result
    sol = FSSH(tully_i(), mass=2000.0, nstates=2, ndim=1)
    res = sol.run(np.full((4, 1), -8.0), np.full((4, 1), 20.0),
                  active0=0, dt=2.0, nt=100, nout=50, key=0)
    f = tmp_path / "fssh.npz"
    res.dump(f)
    back = load_result(f)
    assert np.allclose(np.asarray(back.population),
                       np.asarray(res.population))
    assert np.array_equal(np.asarray(back.active), np.asarray(res.active))


def test_wigner_sample_scalar_omega_array_mass():
    from pyqed_tpu.utils.wigner import wigner_sample_harmonic
    x, p = wigner_sample_harmonic(0, 10, omega=1.0,
                                  mass=np.array([1.0, 2.0]))
    assert x.shape == (10, 2) and p.shape == (10, 2)


def test_fssh_single_c0_vector_broadcasts():
    # regression: a single (ns,) c0 crashed vmap for ntraj > 1
    sol = FSSH(tully_i(), mass=2000.0, nstates=2, ndim=1)
    res = sol.run(np.full(4, -8.0), np.full(4, 20.0), active0=0,
                  c0=np.array([1.0, 0.0]), dt=2.0, nt=50, nout=50, key=0)
    assert np.asarray(res.c).shape == (1, 4, 2)
