"""Second batch of TRUE-ORACLE tests: exec ACTUAL reference modules from
/root/reference at test time (never copied) and pin pyqed_tpu outputs
against them.  Covers the polariton/cavity stack, closed-system
SESolver, entanglement, and time-frequency analysis."""
import numpy as np
import jax.numpy as jnp
import pytest

from ref_oracle import load_reference_module


@pytest.fixture()
def rng():
    return np.random.default_rng(7)


# ---------------------------------------------------------------- cavity

def test_cavity_operators_vs_reference():
    ref = load_reference_module("polariton.cavity")
    from pyqed_tpu.models.cavity import Cavity

    rc = ref.Cavity(freq=1.3, n_cav=5)
    mc = Cavity(freq=1.3, n_cav=5)
    for name in ("getH", "create", "annihilate", "vacuum_dm"):
        R = getattr(rc, name)()
        R = R.toarray() if hasattr(R, "toarray") else np.asarray(R)
        M = np.asarray(getattr(mc, name)())
        assert np.max(np.abs(R - M)) < 1e-12, name
    vac = np.asarray(mc.vacuum()).ravel()
    rvac = np.asarray(rc.vacuum(sparse=False)).ravel()
    assert np.max(np.abs(vac - rvac)) < 1e-12


def test_polariton_hamiltonian_vs_reference(rng):
    """Polariton.getH in both RWA and full coupling — pins the tensor
    ordering, coupling operator, and gauge convention of the whole
    polariton stack against the actual reference (pyqed/polariton/
    cavity.py:577)."""
    ref = load_reference_module("polariton.cavity")
    refmol = load_reference_module("mol")
    from pyqed_tpu.models.mol import Mol
    from pyqed_tpu.models.cavity import Cavity, Polariton

    H = np.diag([0.0, 1.0, 1.7])
    mu = rng.standard_normal((3, 3))
    mu = mu + mu.T
    rp = ref.Polariton(refmol.Mol(H.astype(complex), mu),
                       ref.Cavity(freq=1.0, n_cav=4), g=0.15)
    Rh = rp.getH(RWA=False)
    Rh = Rh.toarray() if hasattr(Rh, "toarray") else np.asarray(Rh)
    mp = Polariton(Mol(jnp.asarray(H, dtype=complex), jnp.asarray(mu)),
                   Cavity(freq=1.0, n_cav=4), g=0.15)
    Mh = np.asarray(mp.getH(RWA=False))
    assert np.max(np.abs(Rh - Mh)) < 1e-12

    # the reference RWA branch CRASHES for a plain Mol (mol.raising is
    # not an attribute, pyqed/polariton/cavity.py:659) — ours works and
    # stays Hermitian
    with pytest.raises(AttributeError):
        rp.getH(RWA=True)
    Mrwa = np.asarray(mp.getH(RWA=True))
    assert np.max(np.abs(Mrwa - Mrwa.conj().T)) < 1e-12


def test_composite_rdm_and_purity_vs_reference(rng):
    ref = load_reference_module("polariton.cavity")
    refmol = load_reference_module("mol")
    from pyqed_tpu.models.mol import Mol
    from pyqed_tpu.models.cavity import Cavity, Composite

    H = np.diag([0.0, 1.0])
    mu = np.array([[0.0, 1.0], [1.0, 0.0]])
    rc = ref.Composite(refmol.Mol(H.astype(complex), mu),
                       ref.Cavity(freq=1.0, n_cav=3))
    mc = Composite(Mol(jnp.asarray(H, dtype=complex), jnp.asarray(mu)),
                   Cavity(freq=1.0, n_cav=3))
    psi = rng.standard_normal(6) + 1j * rng.standard_normal(6)
    psi /= np.linalg.norm(psi)
    for which in ("A", "B"):
        R = np.asarray(rc.rdm(psi, which=which))
        M = np.asarray(mc.rdm(jnp.asarray(psi), which=which))
        assert np.max(np.abs(R - M)) < 1e-12, which


# ---------------------------------------------------------------- SESolver

def test_sesolver_vs_reference():
    refmol = load_reference_module("mol")
    from pyqed_tpu import SESolver

    H = np.array([[0.0, 0.5, 0.0], [0.5, 1.0, 0.3], [0.0, 0.3, 2.0]])
    psi0 = np.zeros(3, complex)
    psi0[0] = 1.0
    e_ops = [np.diag([1.0, 0, 0]), np.diag([0, 1.0, 0])]
    dt, Nt = 0.02, 400

    rres = refmol.SESolver(H.astype(complex)).run(
        psi0=psi0, dt=dt, Nt=Nt, e_ops=e_ops, use_sparse=False)
    mres = SESolver(jnp.asarray(H, dtype=complex)).run(
        psi0=jnp.asarray(psi0), dt=dt, Nt=Nt,
        e_ops=[jnp.asarray(e, dtype=complex) for e in e_ops])
    R = np.asarray(rres.observables).real
    M = np.asarray(mres.observables).real
    n = min(len(R), len(M))
    assert n >= Nt - 1
    assert np.max(np.abs(R[:n] - M[:n])) < 1e-8


# ------------------------------------------------------------- wigner/WVD

def test_wigner_ville_vs_reference(rng):
    ref = load_reference_module("wigner")
    import importlib
    my_wigner = importlib.import_module("pyqed_tpu.utils.wigner")

    x = np.cos(2 * np.pi * 0.17 * np.arange(64)) \
        + 0.3 * rng.standard_normal(64)
    try:
        R = ref.wigner(x, d=0.5)
    except Exception as exc:
        pytest.skip(f"reference wigner not runnable headless: {exc}")
    W_ref, f_ref = (np.asarray(r) for r in R)
    W_my, f_my = (np.asarray(m) for m in my_wigner.wigner(x, d=0.5))
    # the reference lays the distribution out as (t, w); ours is (w, t)
    assert np.max(np.abs(W_ref.T - W_my)) < 1e-10


# -------------------------------------------------------------- LQF

def test_lqf_quantum_force_vs_reference(rng):
    """Linearized quantum force: fitted r(x) equal, and the reference's
    du = grad(Q) is exactly -F_q (pyqed/qt/lqf.py:349 LQF; its `mass`
    is a module global set by the import-time demo — injected here).

    NOTE the reference's ``Sym`` (lqf.py:238) copies the never-filled
    UPPER triangle over the built lower one, silently zeroing every
    cross moment — its LQF solves with a diagonal moment matrix.  The
    pin therefore uses a tensor-product symmetric sample, where the
    cross and first moments vanish exactly and the bug is inert; on a
    correlated ensemble ours keeps the full covariance (correct) and
    the reference does not."""
    ref = load_reference_module("qt.lqf")
    from pyqed_tpu.grid.qtraj import lqf

    n1 = np.array([-1.7, -0.6, 0.6, 1.7])
    w1 = np.array([0.2, 0.8, 0.8, 0.2])
    X1, X2 = np.meshgrid(n1, 1.3 * n1, indexing="ij")
    x = np.stack([X1.ravel(), X2.ravel()], axis=1)
    w = np.outer(w1, w1).ravel()
    w = w / w.sum()
    mass = np.array([1.0, 2.5])
    ref.mass = mass
    r_ref, du_ref = ref.LQF(x.copy(), w.copy())
    r, fq, Eu = lqf(jnp.asarray(x), jnp.asarray(w), jnp.asarray(mass))
    assert np.max(np.abs(np.asarray(r) - r_ref)) < 1e-10
    assert np.max(np.abs(np.asarray(fq) + du_ref)) < 1e-10


# ------------------------------------------------------------ sparse grid

def test_sparse_grid_vs_reference():
    """Node set AND hierarchical interpolant equal to the reference
    SparseGrid (pyqed/smolyak/mysg.py:108) — pins point generation,
    nodal->hierarchical conversion, and evaluation."""
    ref = load_reference_module("smolyak.mysg")
    from pyqed_tpu.grid.smolyak import SparseGrid

    rsg = ref.SparseGrid(dim=2, level=4)
    rsg.generatePoints()
    ref_pts = sorted(tuple(round(c, 12) for c in p.pos)
                     for p in rsg.gP.values())
    msg = SparseGrid(ndim=2, level=4)
    msg.generate_points()
    my_pts = sorted(tuple(round(float(c), 12) for c in row)
                    for row in msg.points)
    assert ref_pts == my_pts

    def f(u, v):
        return np.sin(np.pi * u) * (v + 0.3)

    for key in rsg.gP:
        p = rsg.gP[key]
        p.fv = f(p.pos[0], p.pos[1])
    rsg.nodal2Hier()
    msg.fit(f)
    for xq in [(0.37, 0.61), (0.5, 0.5), (0.123, 0.9), (0.77, 0.02)]:
        rv = float(rsg.evalFunct(list(xq)))
        mv = float(np.asarray(msg.eval(np.array(xq)))[0])
        assert abs(rv - mv) < 1e-12, xq


# ---------------------------------------------------------- driven dynamics

def test_driven_dynamics_vs_reference():
    """Laser-driven TDSE: reference module-level driven_dynamics
    (pyqed/mol.py:1862, H(t) = H0 - E(t) mu) vs Mol.run(pulse=) on the
    same cosine drive."""
    refmol = load_reference_module("mol")
    from pyqed_tpu.models.mol import Mol

    H0 = np.diag([0.0, 1.0, 2.1]).astype(complex)
    mu = np.array([[0, 1.0, 0], [1.0, 0, 0.6], [0, 0.6, 0]],
                  dtype=complex)
    psi0 = np.zeros(3, complex)
    psi0[0] = 1.0
    e_ops = [np.diag([0, 1.0, 0]).astype(complex)]
    dt, Nt = 0.01, 600

    # use_sparse=False is broken in the reference (calls .toarray() on
    # a scalar) — drive its default sparse path
    from scipy.sparse import csr_matrix

    def ref_run(field, dt_, Nt_):
        r = refmol.driven_dynamics([H0, (mu, field)], psi0, dt=dt_,
                                   Nt=Nt_, e_ops=[csr_matrix(e)
                                                  for e in e_ops])
        return np.asarray(r.observables).real.ravel()

    def my_run(field, dt_, Nt_):
        r = Mol(jnp.asarray(H0), jnp.asarray(mu)).run(
            psi0=jnp.asarray(psi0), dt=dt_, Nt=Nt_,
            e_ops=[jnp.asarray(e_ops[0])], pulse=field)
        return np.asarray(r.observables).real.ravel()

    # (a) constant drive: the reference's frozen-H-per-step convention
    # is exact, so the two must agree to integrator precision
    R = ref_run(lambda t: 0.1, dt, Nt)
    M = my_run(lambda t: 0.1, dt, Nt)
    n = min(len(R), len(M))
    assert n >= Nt - 1
    assert np.max(np.abs(R[:n] - M[:n])) < 1e-10

    # (b) cosine drive: the reference holds H(t) fixed across each RK4
    # step (pyqed/mol.py calcH once per step) — a globally FIRST-order
    # field treatment; ours evaluates E(t) at the RK4 stage times.
    # Pin that the reference converges linearly to OUR solution:
    anchor = my_run(lambda t: 0.1 * jnp.cos(0.95 * t), dt / 4, 4 * Nt)[::4]
    M = my_run(lambda t: 0.1 * jnp.cos(0.95 * t), dt, Nt)
    Rc = ref_run(lambda t: 0.1 * np.cos(0.95 * t), dt, Nt)
    Rf = ref_run(lambda t: 0.1 * np.cos(0.95 * t), dt / 20, 20 * Nt)[::20]
    n = min(len(anchor), len(M), len(Rc), len(Rf))
    err_my = np.max(np.abs(M[:n] - anchor[:n]))        # ~2e-11: converged
    err_rc = np.max(np.abs(Rc[:n] - anchor[:n]))       # ~2.3e-4
    err_rf = np.max(np.abs(Rf[:n] - anchor[:n]))       # ~1.1e-5 = err_rc/20
    assert err_my < 1e-9
    assert err_rf < 2e-5
    assert 10.0 < err_rc / err_rf < 40.0               # first-order in dt
