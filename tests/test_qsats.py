"""QSATS solid-helium exchange VMC (qmc/qsats.py + native engine).

Round-1 VERDICT item 4: the pair-product (Einstein x McMillan Jastrow)
trial on an fcc/hcp lattice with the HFD-B(He) potential, permutation-
exchange moves, and walker-sharded replicas. Acceptance gates:
  - local energies agree between the JAX path, the C++ engine, and an
    INDEPENDENT numpy estimator (formulas re-derived from the trial
    function; structure cited to the reference eloc.f:313);
  - the closed-form kinetic estimator matches jax.grad/Laplacian of
    log_psi (autodiff cross-check);
  - VMC energies of a small solid-He-like cluster agree between the
    JAX and C++ chains within statistical error.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqed_tpu.qmc import (QSATS, hfdbhe, fcc_lattice, hcp_lattice,
                           build_pairs, qsats_eloc_native,
                           qsats_vmc_native)
from pyqed_tpu.qmc.qsats import K_PER_ATOM, HE4_MASS, HART2K


def _small_solid(lattice="fcc"):
    # solid-He-like density (~nn distance 6.5 bohr)
    density = 4.0 / 7.5 ** 3  # fcc cube a=7.5 bohr
    if lattice == "fcc":
        sites, box = fcc_lattice((2, 2, 2), density)
    else:
        sites, box = hcp_lattice((2, 2, 1), density)
    return QSATS(sites, box, a=0.06, b=5.0)


def _eloc_numpy(sol, q):
    """Independent numpy local-energy estimator: analytic grad/Laplacian
    of ln psi = -a|q|^2 - 1/2 sum (b/r)^5 (same physics as the reference
    eloc.f:313 'local'; derived from the trial function, not transcribed).
    """
    i = sol.ipairs[:, 0]
    j = sol.ipairs[:, 1]
    d = q[j] - q[i] + sol.vpvec
    r2 = (d ** 2).sum(1)
    dlng = -2.0 * sol.a * q
    d2lng = np.full_like(q, -2.0 * sol.a)
    br52 = sol.b ** 5 / r2 ** 3.5
    np.add.at(dlng, i, -2.5 * br52[:, None] * d)
    np.add.at(d2lng, i, 2.5 * br52[:, None] * (1 - 7 * d * d / r2[:, None]))
    t = -0.5 / sol.mass * np.sum(d2lng + dlng ** 2)
    v = 0.5 * np.asarray(hfdbhe(jnp.asarray(r2))).sum()
    return t, v


def test_lattices_and_pairs():
    # 3-cell-wide box: no minimum-image pair collapse, so the directed
    # nearest-neighbor count is exactly 12 per atom (fcc coordination)
    sites, box = fcc_lattice((3, 3, 3), 4.0 / 7.5 ** 3)
    assert sites.shape == (108, 3)
    ip, vp, rnn = build_pairs(sites, box, ratio=1.1)
    assert ip.shape[0] == 108 * 12
    assert abs(rnn - 7.5 / np.sqrt(2)) < 1e-10
    sites, box = hcp_lattice((3, 3, 3), 4.0 / 7.5 ** 3)
    ip, vp, rnn_hcp = build_pairs(sites, box, ratio=1.07)
    # ideal hcp also has 12 nearest neighbors
    assert ip.shape[0] == sites.shape[0] * 12


def test_hfdbhe_shape():
    # published HFD-B(He) well: depth ~ -10.948 K at r_m = 5.59926 bohr
    r = np.linspace(4.0, 12.0, 2001)
    v = np.asarray(hfdbhe(jnp.asarray(r ** 2))) * HART2K
    imin = v.argmin()
    assert abs(r[imin] - 5.59926) < 0.01
    assert abs(v[imin] + 10.948) < 0.01
    assert v[0] > 100.0  # steep repulsive wall


def test_local_energy_three_way_parity():
    sol = _small_solid()
    rng = np.random.default_rng(7)
    for _ in range(3):
        q = 0.4 * rng.normal(size=(sol.natoms, 3))
        tj, vj = sol.local_energy(jnp.asarray(q))
        tn, vn = _eloc_numpy(sol, q)
        tc, vc = qsats_eloc_native(q, sol.ipairs, sol.vpvec, sol.a,
                                   sol.b, sol.mass)
        assert abs(float(tj) - tn) < 1e-11 * max(1, abs(tn))
        assert abs(float(vj) - vn) < 1e-11 * max(1, abs(vn))
        assert abs(float(tj) - tc[0]) < 1e-11 * max(1, abs(tn))
        assert abs(float(vj) - vc[0]) < 1e-11 * max(1, abs(vn))


def test_kinetic_estimator_vs_autodiff():
    """T_loc = -1/2m (lap ln psi + |grad ln psi|^2) with autodiff."""
    sol = _small_solid()
    rng = np.random.default_rng(11)
    q = 0.3 * rng.normal(size=(sol.natoms, 3))

    def lp_flat(x):
        return sol.log_psi(x.reshape(sol.natoms, 3))

    x = jnp.asarray(q.ravel())
    g = jax.grad(lp_flat)(x)
    lap = jnp.trace(jax.hessian(lp_flat)(x))
    t_ad = -0.5 / sol.mass * (lap + jnp.sum(g * g))
    t, _ = sol.local_energy(jnp.asarray(q))
    assert abs(float(t) - float(t_ad)) < 1e-10 * max(1.0, abs(float(t_ad)))


def test_einstein_limit_exact():
    """b -> 0, V ignored: pure Einstein crystal, <T> = 3 N a / (2 m)."""
    sites, box = fcc_lattice((1, 1, 1), 4.0 / 7.5 ** 3)
    sol = QSATS(sites, box, a=0.05, b=0.0)
    key = jax.random.PRNGKey(0)
    qs = (jax.random.normal(key, (4096, sol.natoms, 3))
          / np.sqrt(4 * sol.a))           # exact |psi|^2 samples
    t, _ = jax.vmap(sol.local_energy)(qs)
    exact = 3 * sol.natoms * sol.a / (2 * sol.mass)
    assert abs(float(t.mean()) / exact - 1.0) < 0.02


def test_vmc_jax_vs_native():
    sol = _small_solid()
    out = sol.run(0, nwalkers=48, nsweeps=450, nequil=250, step=0.5)
    assert 0.2 < out["acceptance"] < 0.95
    # C++ chain (the child.f per-atom move structure) on the same system
    rng = np.random.default_rng(5)
    es = []
    for seed in (11, 22, 33):
        q0 = 0.3 * rng.normal(size=(sol.natoms, 3)) / np.sqrt(4 * sol.a)
        E, tr, qf = qsats_vmc_native(q0, sol.ipairs, sol.vpvec, sol.a,
                                     sol.b, sol.mass, nsweeps=3000,
                                     nequil=1200, step=0.5, seed=seed)
        es.append(E)
    e_cpp = np.mean(es)
    spread = max(np.std(es), 3 * out["error"], 0.5)
    assert abs(out["energy"] - e_cpp) < 3 * spread, \
        (out["energy"], es, out["error"])


def test_allatom_mode_consistent():
    """The batched all-atom proposal samples the same distribution as
    the (child.f-faithful) per-atom sweep: measure all-atom hot-started
    from per-atom-equilibrated walkers."""
    sol = _small_solid()
    out2 = sol.run(2, nwalkers=32, nsweeps=400, nequil=200, step=0.5,
                   mode="peratom")
    out1 = sol.run(1, nsweeps=600, nequil=100, step=0.1,
                   mode="allatom", q0=out2["walkers"])
    tol = 3 * max(out1["error"] + out2["error"], 1.0)
    assert abs(out1["energy"] - out2["energy"]) < tol, (out1["energy"],
                                                        out2["energy"])


@pytest.mark.slow
def test_exchange_moves():
    """Permutation-exchange sampling: exact detailed balance (full
    trial re-evaluated), so it must not bias the energy; acceptance
    bookkeeping sane. Also pin the rebasing identity: an exchange keeps
    every absolute position, so the Einstein-factor change dominates."""
    sol = _small_solid()
    out = sol.run(3, nwalkers=48, nsweeps=700, nequil=450, step=0.5,
                  exchange_prob=0.5)
    out0 = sol.run(3, nwalkers=48, nsweeps=700, nequil=450, step=0.5,
                   exchange_prob=0.0)
    # exchanges in a cold solid are rare but the machinery must not bias
    # (block errors under-count autocorrelation: floor the tolerance)
    tol = 3 * max(out["error"] + out0["error"], 0.5)
    assert abs(out["energy"] - out0["energy"]) < tol
    assert out["exchange_acceptance"] >= 0.0
    # rebasing identity: swapped configuration preserves the pair-set of
    # absolute positions for the swapped pair itself
    import jax.numpy as jnp
    q = jnp.asarray(0.2 * np.random.default_rng(0).normal(
        size=(sol.natoms, 3)))
    i, j = int(sol.ipairs[0, 0]), int(sol.ipairs[0, 1])
    R = sol.vpvec[0]
    q_new = q.at[i].set(q[j] + R).at[j].set(q[i] - R)
    r2_old, _, _, _ = sol._pair_r2(q)
    r2_new, _, _, _ = sol._pair_r2(q_new)
    # the (i, j) stencil entry keeps its distance under the swap
    n_ij = int(np.where((sol.ipairs[:, 0] == i)
                        & (sol.ipairs[:, 1] == j))[0][0])
    assert abs(float(r2_new[n_ij] - r2_old[n_ij])) < 1e-10


def test_walker_sharded_run():
    ndev = jax.device_count()
    if ndev < 2:
        pytest.skip("needs multi-device mesh")
    from jax.sharding import Mesh
    sol = _small_solid()
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(-1), ("walker",))
    out = sol.run(4, nwalkers=32, nsweeps=120, nequil=50, step=0.5,
                  mesh=mesh)
    out0 = sol.run(4, nwalkers=32, nsweeps=120, nequil=50, step=0.5)
    # same PRNG keys -> identical trajectories, sharded or not
    assert np.allclose(out["e_trace"], out0["e_trace"], rtol=1e-10)
