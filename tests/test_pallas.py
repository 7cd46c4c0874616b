"""Parity tests for the Pallas kernels (ops/pallas_kernels.py).

Each kernel runs through the Pallas interpreter on CPU at float64 and is
checked against plain-numpy semantics at 1e-8 (the BASELINE parity gate),
plus cross-checks of the three HEOMSolver kernel paths.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqed_tpu.ops import pallas_kernels as pk
from pyqed_tpu.open.heom import HEOMSolver
from pyqed_tpu.open.bath import DrudeBath
from pyqed_tpu.grid.spo import SPO


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def crand(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


# ----------------------------------------------------------- (a) HEOM RHS

def test_heom_rhs_kernel_parity(rng):
    """Level-blocked Pallas RHS (interpret mode, f64) == the stacked
    superoperator dot on the gathered neighbor stack."""
    from pyqed_tpu.open.heom import enumerate_hierarchy, neighbor_maps
    M, lmax, n = 3, 3, 3
    keys, index = enumerate_hierarchy(M, lmax)
    plus_idx, minus_idx = neighbor_maps(keys, index)
    nado = keys.shape[0]
    V = n * n
    H = rng.standard_normal((n, n))
    H = H + H.T
    Q = rng.standard_normal((M, n, n))
    Q = Q + np.swapaxes(Q, 1, 2)
    c = crand(rng, M)
    nu = rng.uniform(0.5, 2.0, M) + 0j

    B0, Bk = pk.heom_superop_split(H, Q, c)
    damp = (keys @ nu).real
    all_idx = np.concatenate([plus_idx, minus_idx], axis=1)
    wocc = np.concatenate([np.ones_like(keys), keys], axis=1).astype(float)
    ados = crand(rng, nado, n, n)
    flat = ados.reshape(nado, V)
    padded = np.concatenate([flat, np.zeros((1, V), complex)], axis=0)
    g = padded[all_idx] * wocc[:, :, None]
    ref = np.asarray(pk.heom_rhs_dot(jnp.asarray(B0), jnp.asarray(Bk),
                                     jnp.asarray(damp), jnp.asarray(flat),
                                     jnp.asarray(g)))

    rhs, embed, extract, nado_pad = pk.heom_rhs_levels_factory(
        H, Q, c, nu, keys, plus_idx, minus_idx, interpret=True,
        dtype=np.float64)
    fr, fi = embed(ados)
    gr, gi = rhs(jnp.asarray(fr), jnp.asarray(fi))
    out = extract(gr, gi).reshape(nado, V)
    assert np.max(np.abs(out - ref)) / np.max(np.abs(ref)) < 1e-12


def test_heom_rhs_levels_xla_parity(rng):
    """Order-aware mode-folded XLA level RHS == the stacked
    superoperator dot (f64, generic dense couplings)."""
    from pyqed_tpu.open.heom import enumerate_hierarchy, neighbor_maps
    M, lmax, n = 3, 3, 3
    keys, index = enumerate_hierarchy(M, lmax)
    plus_idx, minus_idx = neighbor_maps(keys, index)
    nado = keys.shape[0]
    V = n * n
    H = rng.standard_normal((n, n))
    H = H + H.T
    Q = rng.standard_normal((M, n, n))
    Q = Q + np.swapaxes(Q, 1, 2)
    c = crand(rng, M)
    nu = rng.uniform(0.5, 2.0, M) + 0j

    B0, Bk = pk.heom_superop_split(H, Q, c)
    damp = (keys @ nu).real
    all_idx = np.concatenate([plus_idx, minus_idx], axis=1)
    wocc = np.concatenate([np.ones_like(keys), keys], axis=1).astype(float)
    ados = crand(rng, nado, n, n)
    flat = ados.reshape(nado, V)
    padded = np.concatenate([flat, np.zeros((1, V), complex)], axis=0)
    g = padded[all_idx] * wocc[:, :, None]
    ref = np.asarray(pk.heom_rhs_dot(jnp.asarray(B0), jnp.asarray(Bk),
                                     jnp.asarray(damp), jnp.asarray(flat),
                                     jnp.asarray(g)))

    rhs, embed, extract, _ = pk.heom_rhs_levels_xla_factory(
        H, Q, c, nu, keys, plus_idx, minus_idx, dtype=np.float64)
    fr, fi = embed(ados)
    gr, gi = rhs(jnp.asarray(fr), jnp.asarray(fi))
    out = extract(gr, gi).reshape(nado, V)
    assert np.max(np.abs(out - ref)) / np.max(np.abs(ref)) < 1e-12


def test_heom_rhs_rowcol_parity(rng):
    """Site-projector row/column RHS == the stacked superoperator dot
    (f64, random complex ADOs, complex bath amplitudes)."""
    from pyqed_tpu.open.heom import enumerate_hierarchy, neighbor_maps
    nsite, nexp, lmax, n = 3, 2, 3, 4
    M = nsite * nexp
    keys, index = enumerate_hierarchy(M, lmax)
    plus_idx, minus_idx = neighbor_maps(keys, index)
    nado = keys.shape[0]
    V = n * n
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = H + H.conj().T
    Q = np.zeros((M, n, n))
    for m in range(M):
        s = 1 + m // nexp
        Q[m, s, s] = 1.0
    c = crand(rng, M)
    nu = rng.uniform(0.5, 2.0, M) + 1j * rng.standard_normal(M)

    B0, Bk = pk.heom_superop_split(H, Q, c)
    damp = keys @ nu
    all_idx = np.concatenate([plus_idx, minus_idx], axis=1)
    wocc = np.concatenate([np.ones_like(keys), keys], axis=1).astype(float)
    ados = crand(rng, nado, n, n)
    flat = ados.reshape(nado, V)
    padded = np.concatenate([flat, np.zeros((1, V), complex)], axis=0)
    g = padded[all_idx] * wocc[:, :, None]
    ref = np.asarray(pk.heom_rhs_dot(
        jnp.asarray(B0), jnp.asarray(Bk), jnp.asarray(damp.real),
        jnp.asarray(flat), jnp.asarray(g)))
    # heom_rhs_dot uses real damp; add the imaginary part by hand so the
    # reference carries the full complex decay
    ref = ref - 1j * damp.imag[:, None] * flat

    rhs = pk.heom_rhs_rowcol_factory(H, Q, c, nu, keys, plus_idx,
                                     minus_idx, dtype=np.float64)
    out = np.asarray(rhs(jnp.asarray(ados))).reshape(nado, V)
    assert np.max(np.abs(out - ref)) / np.max(np.abs(ref)) < 1e-12


def test_heom_rowcol_rejects_nonprojector(rng):
    Q = np.diag([1.0, -1.0])[None]
    assert pk.heom_q_projector_sites(Q) is None
    import pytest
    with pytest.raises(ValueError):
        pk.heom_rhs_rowcol_factory(np.eye(2), Q, np.ones(1), np.ones(1),
                                   np.zeros((1, 1), int),
                                   np.full((1, 1), 1),
                                   np.full((1, 1), 1))


def test_heom_run_rowcol_kernel_end_to_end(rng):
    """Full propagation: rowcol kernel vs einsum kernel at f64."""
    n = 3
    H = np.array([[0.0, 0.1, 0.0], [0.1, 1.0, 0.2], [0.0, 0.2, 1.3]])
    Q1 = np.zeros((n, n)); Q1[1, 1] = 1.0
    Q2 = np.zeros((n, n)); Q2[2, 2] = 1.0
    bath = DrudeBath(temperature=1.0, cutoff=0.5, reorg=0.1)
    c, nu = bath.matsubara(1)
    rho0 = np.zeros((n, n)); rho0[1, 1] = 1.0
    e_ops = [np.diag([0.0, 1.0, 0.0])]
    kw = dict(dt=0.01, nt=100, e_ops=e_ops)
    sol = HEOMSolver(H, bath=[(Q1, c, nu), (Q2, c, nu)], lmax=3)
    r1 = sol.run(rho0, kernel="einsum", **kw)
    r2 = sol.run(rho0, kernel="rowcol", **kw)
    assert np.max(np.abs(np.asarray(r1.observables)
                         - np.asarray(r2.observables))) < 1e-12


def test_heom_solver_kernels_agree(rng):
    n = 3
    H = rng.standard_normal((n, n))
    H = H + H.T
    Q = np.diag(rng.standard_normal(n))
    bath = DrudeBath(temperature=0.3, cutoff=0.5, reorg=0.05)
    c, nu = bath.matsubara(2)
    sol = HEOMSolver(H, bath=[(Q, c, nu)], lmax=3)
    r_e, nado = sol.rhs_fn(jnp.complex128, kernel="einsum")
    r_m, _ = sol.rhs_fn(jnp.complex128, kernel="matmul")
    r_p, _ = sol.rhs_fn(jnp.complex128, kernel="pallas")
    r_l, _ = sol.rhs_fn(jnp.complex128, kernel="levels")
    ados = jnp.asarray(crand(rng, nado, n, n))
    a = np.asarray(r_e(ados))
    assert np.max(np.abs(a - np.asarray(r_m(ados)))) < 1e-12
    assert np.max(np.abs(a - np.asarray(r_p(ados)))) < 1e-12
    assert np.max(np.abs(a - np.asarray(r_l(ados)))) < 1e-12


def test_heom_run_levels_padded_outputs_match(rng):
    """_run_levels (in-representation padded propagation) must return
    the SAME Result surface as the compact path: observables, rho
    trajectory, final ADO stack, store_ados stacks."""
    n = 2
    H = np.array([[1.0, 0.2], [0.2, -1.0]])
    Q = np.diag([1.0, -1.0])
    bath = DrudeBath(temperature=1.0, cutoff=0.5, reorg=0.1)
    c, nu = bath.matsubara(1)
    rho0 = np.array([[1.0, 0.0], [0.0, 0.0]])
    e_ops = [np.diag([1.0, 0.0]), np.array([[0.0, 1.0], [0.0, 0.0]])]
    kw = dict(dt=0.01, nt=60, nout=3, e_ops=e_ops)
    sol = HEOMSolver(H, bath=[(Q, c, nu)], lmax=4)
    r_m = sol.run(rho0, kernel="matmul", store_ados=True, **kw)
    r_l = sol.run(rho0, kernel="levels", store_ados=True, **kw)
    assert np.max(np.abs(np.asarray(r_m.observables)
                         - np.asarray(r_l.observables))) < 1e-12
    assert np.max(np.abs(np.asarray(r_m.states)
                         - np.asarray(r_l.states))) < 1e-12
    assert np.max(np.abs(np.asarray(r_m.ado) - np.asarray(r_l.ado))) < 1e-12
    assert np.max(np.abs(np.asarray(r_m.rho) - np.asarray(r_l.rho))) < 1e-12
    # second call hits the evolve cache and must agree bitwise
    r_l2 = sol.run(rho0, kernel="levels", store_ados=True, **kw)
    assert np.array_equal(np.asarray(r_l.observables),
                          np.asarray(r_l2.observables))


def test_heom_run_levels_kernel_end_to_end(rng):
    """Full propagation: mode-folded XLA levels kernel (the TPU
    auto-selection) vs einsum kernel at f64."""
    n = 3
    H = np.array([[0.0, 0.1, 0.0], [0.1, 1.0, 0.2], [0.0, 0.2, 1.3]])
    Q1 = np.zeros((n, n)); Q1[1, 1] = 1.0
    Q2 = np.zeros((n, n)); Q2[2, 2] = 1.0
    bath = DrudeBath(temperature=1.0, cutoff=0.5, reorg=0.1)
    c, nu = bath.matsubara(1)
    rho0 = np.zeros((n, n)); rho0[1, 1] = 1.0
    e_ops = [np.diag([0.0, 1.0, 0.0])]
    kw = dict(dt=0.01, nt=100, e_ops=e_ops)
    sol = HEOMSolver(H, bath=[(Q1, c, nu), (Q2, c, nu)], lmax=3)
    r1 = sol.run(rho0, kernel="einsum", **kw)
    r2 = sol.run(rho0, kernel="levels", **kw)
    assert np.max(np.abs(np.asarray(r1.observables)
                         - np.asarray(r2.observables))) < 1e-12


def test_heom_run_matmul_kernel_end_to_end(rng):
    """Full propagation: matmul kernel vs einsum kernel at f64."""
    n = 2
    H = np.array([[1.0, 0.2], [0.2, -1.0]])
    Q = np.diag([1.0, -1.0])
    bath = DrudeBath(temperature=1.0, cutoff=0.5, reorg=0.1)
    c, nu = bath.matsubara(1)
    rho0 = np.array([[1.0, 0.0], [0.0, 0.0]])
    e_ops = [np.diag([1.0, 0.0])]
    kw = dict(dt=0.01, nt=100, e_ops=e_ops)
    sol = HEOMSolver(H, bath=[(Q, c, nu)], lmax=4)
    r1 = sol.run(rho0, kernel="einsum", **kw)
    r2 = sol.run(rho0, kernel="matmul", **kw)
    assert np.max(np.abs(np.asarray(r1.observables)
                         - np.asarray(r2.observables))) < 1e-12


def test_heom_complex_rates_accepted(rng):
    """Complex decay rates (underdamped/Prony baths) must propagate
    (ADVICE round-1: float(nu) rejected complex rates)."""
    n = 2
    H = np.diag([0.0, 1.0])
    Q = np.array([[0.0, 1.0], [1.0, 0.0]])
    c = [0.05 + 0.02j, 0.05 - 0.02j]
    nu = [0.3 + 0.5j, 0.3 - 0.5j]
    sol = HEOMSolver(H, bath=[(Q, c, nu)], lmax=2)
    r = sol.run(np.array([[1.0, 0], [0, 0.0]]), dt=0.01, nt=20,
                e_ops=[np.diag([1.0, 0.0])])
    obs = np.asarray(r.observables)
    assert np.all(np.isfinite(obs))
    # trace-conserving dynamics on rho0 (hierarchy preserves trace)
    r2 = sol.run(np.array([[1.0, 0], [0, 0.0]]), dt=0.01, nt=20,
                 e_ops=[np.eye(2)])
    assert np.max(np.abs(np.asarray(r2.observables) - 1.0)) < 1e-6


# ------------------------------------------------------------ (b) SPO

def test_spo_phase_multiply(rng):
    shape = (33, 17)
    ns = 2
    psik = crand(rng, *shape, ns)
    expK = np.exp(-1j * rng.standard_normal(shape))
    out = pk.spo_phase_multiply(jnp.asarray(expK), jnp.asarray(psik),
                                interpret=True)
    assert np.max(np.abs(np.asarray(out) - expK[..., None] * psik)) < 1e-12


def test_spo_potential_apply(rng):
    shape = (21, 13)
    ns = 3
    expV = crand(rng, *shape, ns, ns)
    psi = crand(rng, *shape, ns)
    out = pk.spo_potential_apply(jnp.asarray(expV), jnp.asarray(psi),
                                 interpret=True)
    ref = np.einsum("...ab, ...b -> ...a", expV, psi)
    assert np.max(np.abs(np.asarray(out) - ref)) < 1e-12


def test_spo_harmonic_pallas_vs_xla(rng):
    """Full SPO propagation with kernel='pallas' (interpreter) matches
    the XLA einsum path."""
    x = np.linspace(-8, 8, 64, endpoint=False)
    psi0 = np.exp(-(x - 1.0) ** 2 / 2) / np.pi ** 0.25

    def run(kernel):
        spo = SPO(x, mass=1.0, nstates=1)
        if kernel == "pallas":
            # route through the interpreter on CPU
            spo.kernel = "pallas"
            import pyqed_tpu.ops.pallas_kernels as m
            orig = m.default_backend_is_tpu
            m.default_backend_is_tpu = lambda: False
            try:
                spo._peo_orig = spo._peo
                r = None
                spo.set_potential(lambda xx: 0.5 * xx ** 2)
                # interpret=True via monkeypatched wrappers
                phase, pot = m.spo_phase_multiply, m.spo_potential_apply
                m.spo_phase_multiply = (
                    lambda *a, **k: phase(*a, interpret=True, **k))
                m.spo_potential_apply = (
                    lambda *a, **k: pot(*a, interpret=True, **k))
                try:
                    r = spo.run(psi0.astype(complex), dt=0.02, nt=50)
                finally:
                    m.spo_phase_multiply, m.spo_potential_apply = phase, pot
            finally:
                m.default_backend_is_tpu = orig
            return r
        spo = SPO(x, mass=1.0, nstates=1, kernel="xla")
        spo.set_potential(lambda xx: 0.5 * xx ** 2)
        return spo.run(psi0.astype(complex), dt=0.02, nt=50)

    r_x = run("xla")
    r_p = run("pallas")
    assert np.max(np.abs(np.asarray(r_p.psi) - np.asarray(r_x.psi))) < 1e-10


# ------------------------------------------------- (c) Liouvillian matvec

def test_liouvillian_commutator_kernel(rng):
    n = 37
    H = crand(rng, n, n)
    rho = crand(rng, n, n)
    out = pk.liouvillian_commutator_pallas(jnp.asarray(H), jnp.asarray(rho),
                                           interpret=True)
    ref = -1j * (H @ rho - rho @ H.conj().T)
    assert np.max(np.abs(np.asarray(out) - ref)) < 1e-10


def test_liouvillian_matvec_full(rng):
    n = 12
    H = crand(rng, n, n)
    H = H + H.conj().T
    cs = [crand(rng, n, n) for _ in range(2)]
    rho = crand(rng, n, n)
    L = pk.liouvillian_matvec(jnp.asarray(H), [jnp.asarray(c) for c in cs],
                              use_pallas=True, interpret=True)
    out = np.asarray(L(jnp.asarray(rho)))
    ref = -1j * (H @ rho - rho @ H)
    for c in cs:
        cd = c.conj().T
        ref += c @ rho @ cd - 0.5 * (cd @ c @ rho + rho @ cd @ c)
    assert np.max(np.abs(out - ref)) < 1e-10

    # jnp fallback agrees as well
    L2 = pk.liouvillian_matvec(jnp.asarray(H), [jnp.asarray(c) for c in cs],
                               use_pallas=False)
    assert np.max(np.abs(np.asarray(L2(jnp.asarray(rho))) - ref)) < 1e-10


def test_graft_entry_step_matches_solver_rhs(rng):
    """x64 CPU consistency: the real-split __graft_entry__ HEOM step must
    implement the same RHS as HEOMSolver (round-1 VERDICT weak #8)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _heom_setup, _heom_step_fn
    H, keys, plus_idx, minus_idx, Q, cvec, nuvec = _heom_setup(
        nsite=2, nexp_per_bath=2, lmax=3)
    dt = 1e-3
    step, nado, n = _heom_step_fn(H, keys, plus_idx, minus_idx, Q, cvec,
                                  nuvec, dt=dt)
    sol = HEOMSolver(H, bath=None)
    sol._modes = [(jnp.asarray(q), complex(c), complex(nu))
                  for (q, c, nu) in [(Q[m], cvec[m], nuvec[m])
                                     for m in range(len(cvec))]]
    sol.lmax = 3
    rhs, nado2 = sol.rhs_fn(jnp.complex128, kernel="einsum")
    assert nado2 == nado
    ados = crand(rng, nado, n, n)
    # one RK4 step via the solver rhs at f64
    y = jnp.asarray(ados)
    k1 = rhs(y); k2 = rhs(y + k1 * (dt / 2)); k3 = rhs(y + k2 * (dt / 2))
    k4 = rhs(y + k3 * dt)
    ref = np.asarray(y + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4))
    # graft step runs f32: compare at f32 tolerance
    re, im = step(ados.real.astype(np.float32), ados.imag.astype(np.float32))
    got = np.asarray(re) + 1j * np.asarray(im)
    assert np.max(np.abs(got - ref)) < 1e-4


def test_heom_matmul_fast_parity():
    """kernel='matmul-fast' (Precision.DEFAULT) == 'matmul' at f64 on CPU
    (precision flags are MXU-only; CPU math is identical)."""
    import numpy as np
    import jax
    from __graft_entry__ import _heom_setup, _heom_step_fn

    H, keys, pi, mi, Q, c, nu = _heom_setup(nsite=3, nexp_per_bath=2,
                                            lmax=2)
    s1, nado, n = _heom_step_fn(H, keys, pi, mi, Q, c, nu,
                                kernel="matmul")
    s2, _, _ = _heom_step_fn(H, keys, pi, mi, Q, c, nu,
                             kernel="matmul-fast")
    re = np.zeros((nado, n, n), np.float64)
    re[0, 0, 0] = 1.0
    im = np.zeros_like(re)
    o1 = jax.jit(s1)(re, im)
    o2 = jax.jit(s2)(re, im)
    assert float(np.max(np.abs(np.asarray(o1[0])
                               - np.asarray(o2[0])))) < 1e-12
