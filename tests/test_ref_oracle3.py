"""True-oracle parity, round 3 (VERDICT r2 #7): SPO3 volumes,
FloquetBloch band tracking, LDR2, and MPO-on-MPS application, each
against the ACTUAL reference code exec'd from /root/reference."""
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ref_oracle import load_reference_module


# --------------------------------------------------------------- SPO3

def test_spo3_vs_reference():
    """3D nonadiabatic split-operator (reference: pyqed/wpd.py:1105
    ``SPO3``) == SPON on a 2-state 3D model at 1e-8."""
    ref_wpd = load_reference_module("wpd")
    from pyqed_tpu.grid.spo import SPON

    n = 16
    x = np.linspace(-5, 5, n, endpoint=False)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    v1 = 0.5 * (X ** 2 + Y ** 2 + Z ** 2)
    v2 = 0.5 * ((X - 0.5) ** 2 + Y ** 2 + Z ** 2) + 0.8
    cpl = 0.15 * np.exp(-(X ** 2 + Y ** 2))

    psi0 = np.zeros((n, n, n, 2), complex)
    psi0[..., 1] = np.exp(-(X + 0.3) ** 2 - Y ** 2 - Z ** 2)
    dt, nt = 0.02, 12

    ref = ref_wpd.SPO3(x=x, y=x, z=x, masses=[1.0, 1.0, 1.0], nstates=2)
    ref.set_DPES(surfaces=[v1, v2], diabatic_couplings=[[(0, 1), cpl]])
    r_ref = ref.run(psi0=psi0.copy(), dt=dt, nt=nt, nout=nt,
                    return_states=True)
    psi_ref = np.asarray(r_ref.psilist[-1])

    mine = SPON([x, x, x], masses=[1.0, 1.0, 1.0], nstates=2,
                kernel="xla")
    mine.set_DPES([v1, v2], [[(0, 1), cpl]])
    r_my = mine.run(psi0, dt=dt, nt=nt, nout=nt)
    assert np.max(np.abs(np.asarray(r_my.psi) - psi_ref)) < 1e-8


# ------------------------------------------------------- FloquetBloch

@pytest.fixture(scope="module")
def floquet_pair():
    """Reference TightBinding->FloquetBloch vs ours on the 2-orbital 1D
    chain of the reference's own test_1D_2norbs (Floquet.py:1685):
    coords [0, 0.6], hoppings (1.5, 1.0), a = 1."""
    refF = load_reference_module("floquet.Floquet")
    from pyqed_tpu.floquet import FloquetBloch, make_peierls_blocks_fn

    omega, nt = 4.95, 7
    tb = refF.TightBinding([[0.0], [0.6]], relative_Hopping=[1.5, 1.0],
                           lambda_decay=1.0, lattice_constant=[1.0],
                           nk=10, mu=0.0)
    tmp = tempfile.mkdtemp()
    ref = tb.Floquet(data_path=tmp, omegad=omega, E0=[0.0, 0.3, 0.6],
                     nt=nt, polarization=[1])

    hops = [(0, 1, 0.6, 0.0, 1.5),     # intracell: displacement r1-r0
            (0, 1, -0.4, -1.0, 1.0)]   # intercell wrap, shift -a

    def Hk(k):
        h01 = 1.5 + 1.0 * jnp.exp(-1j * k)
        return jnp.array([[0.0, h01], [jnp.conj(h01), 0.0]])

    mine = FloquetBloch(make_peierls_blocks_fn(hops, omega, nmax=3),
                        omega, nt=nt, norbs=2, Hk_func=Hk)
    return ref, mine


def test_floquet_extended_hamiltonian_vs_reference(floquet_pair):
    """Sambe-space matrix (reference: pyqed/floquet/Floquet.py:495
    ``build_extendedH``), Bessel-dressed Peierls blocks."""
    ref, mine = floquet_pair
    for k, E in [(0.0, 0.3), (0.37, 0.6), (-1.1, 0.6)]:
        F_ref = ref.build_extendedH(k, Ecur=E)
        F_my = np.asarray(mine.build_extendedH(k, E))
        assert np.max(np.abs(F_my - F_ref)) < 1e-12


def test_floquet_run_band_tracking_vs_reference(floquet_pair):
    """Full FloquetBloch.run (reference: Floquet.py:771): adiabatic
    continuation of the tracked bands over the E0 ramp."""
    ref, mine = floquet_pair
    ks = np.linspace(-np.pi, np.pi, 21)
    qe_ref, _ = ref.run(ks)

    qe, st = mine.track_band(jnp.asarray(ks), 0.0)
    for E in (0.3, 0.6):
        qe, st = mine.track_band(jnp.asarray(ks), E, quasienergy=qe,
                                 previous_state=st)
    assert np.max(np.abs(np.asarray(qe) - np.asarray(qe_ref))) < 1e-10


# --------------------------------------------------------------- LDR2

def test_ldr2_vs_reference():
    """LDR2 2-mode nonadiabatic dynamics (reference:
    pyqed/ldr/ldr.py:1111). The reference builds its kinetic DVR with
    walls AT the first/last grid point (SineDVR(x[0], x[-1], nx)), so
    our solver is given domains (x[0], x[-1]) to replicate that
    convention exactly."""
    ref_ldr = load_reference_module("ldr.ldr")
    from pyqed_tpu.grid.ldr import LDRN

    level, ns, dt, nt = 4, 2, 0.01, 6
    base = LDRN([(-4.0, 4.0), (-4.0, 4.0)], [level, level], nstates=ns)
    x, y = np.asarray(base.x[0]), np.asarray(base.x[1])
    X, Y = np.meshgrid(x, y, indexing="ij")
    apes = np.stack([0.5 * (X ** 2 + Y ** 2),
                     0.5 * (X ** 2 + Y ** 2) + 1.0], axis=-1)
    th = 0.3 * np.exp(-(X ** 2 + Y ** 2)).reshape(base.ntot)
    S = np.zeros((base.ntot, 2, 2))
    S[:, 0, 0] = np.cos(th)
    S[:, 1, 1] = np.cos(th)
    S[:, 0, 1] = -np.sin(th)
    S[:, 1, 0] = np.sin(th)
    psi0 = (np.exp(-(X ** 2 + Y ** 2))[..., None]
            * np.array([1.0, 0.0])).astype(complex)
    psi0 /= np.linalg.norm(psi0)

    ref = ref_ldr.LDR2(x, y, nstates=ns)
    ref.apes = apes
    ref.A = np.einsum("mca, ncb -> manb", S, S).reshape(
        len(x), len(y), ns, len(x), len(y), ns)
    r_ref = ref.run(psi0.copy(), dt=dt, nt=nt, nout=1)
    ref_psi = np.asarray(r_ref.psilist[-1])

    mine = LDRN([(x[0], x[-1]), (y[0], y[-1])], [level, level],
                nstates=ns)
    mine.apes = apes
    mine.build_ovlp(jnp.asarray(S).reshape(len(x), len(y), 2, ns))
    U = np.asarray(mine.short_time_propagator(dt))
    psi = psi0.reshape(base.ntot * ns).copy()
    for _ in range(nt):
        psi = U @ psi
    ours = psi.reshape(len(x), len(y), ns)
    # reference hot loop: psilist[-1] = (V K)^nt Vh psi0 = Vh U^nt psi0
    expVh = np.exp(-1j * dt / 2 * apes)
    assert np.max(np.abs(expVh * ours - ref_psi)) < 1e-8


# ---------------------------------------------------------- apply_mpo

def test_apply_mpo_vs_reference():
    """MPO applied to MPS (reference: pyqed/mps/mps.py:702
    ``apply_mpo`` — mutates B_list in place with the boundary bonds
    left open): the reference's mutated tensor chain, closed with the
    (0, -1) boundary selection, equals our apply_mpo (which selects
    the boundary per site) as a dense state; our compressed variant
    matches the dense H|psi> (the reference's compress call is
    commented out)."""
    ref_mps = load_reference_module("mps.mps")
    from pyqed_tpu.tn.mps import MPS, MPO, apply_mpo, mpo_tfim

    L = 5
    rng = np.random.default_rng(4)
    mps = MPS.random(L, d=2, chi=4, seed=11)
    mpo = mpo_tfim(L, J=1.2, h=0.6)

    # reference layout: W [b1, d_out, b2, d_in]; ours (wL, wR, p, p*)
    w_list = [np.asarray(W).transpose(0, 2, 1, 3) for W in mpo.Ws]
    B_list = [np.asarray(B) for B in mps.Bs]
    ref_mps.apply_mpo(w_list, B_list, chi_max=64)   # mutates B_list

    # close the reference chain: row 0 on the left, column -1 right
    # (combined index (chi, b) is chi-major; boundary chis are 1)
    th = B_list[0][0]                                 # (d, chi b)
    for B in B_list[1:]:
        th = np.tensordot(th, B, axes=([-1], [0]))
    ref_dense = th[..., -1].reshape(-1)

    mine = apply_mpo(mpo, mps)
    my_dense = np.asarray(mine.to_dense())
    assert np.max(np.abs(my_dense - ref_dense)) < 1e-12

    # dense ground truth + compression
    truth = np.asarray(mpo.to_dense()) @ np.asarray(mps.to_dense())
    assert np.max(np.abs(my_dense - truth)) < 1e-12
    comp = apply_mpo(mpo, mps, chi_max=16)
    d2 = np.asarray(comp.to_dense())
    sc = np.vdot(d2, truth) / np.vdot(d2, d2)
    assert np.max(np.abs(sc * d2 - truth)) / np.max(np.abs(truth)) < 1e-10


# ------------------------------------------------------- HEOM (rk4)

def test_heom_rk4_trajectory_vs_reference():
    """High-T Drude HEOM trajectory vs the ACTUAL reference ``_heom``
    (pyqed/HEOM/heom.py:275, RK4 + frozen-top terminator) exec'd from
    /root/reference — completing the oracle chain beyond the Euler
    transcription pin (tests/test_open.py). The reference there uses
    the strict high-T coefficient D0 = reorg*(2T - i*gamma)
    (heom.py:313), not the coth form, so the generic multi-exponential
    HEOMSolver is driven with that D0 through set_bath; truncation at
    lmax = nado - 2 matches its never-propagated top level."""
    import io
    from contextlib import redirect_stdout
    ref_heom = load_reference_module("HEOM.heom")
    from pyqed_tpu.open.heom import HEOMSolver
    from pyqed_tpu.ops.operators import pauli

    _, sx, _, sz = pauli()
    eps, Delta = 0.5, 1.0
    H = 0.5 * eps * np.asarray(sz) + 0.5 * Delta * np.asarray(sx)
    Q = np.asarray(sz).astype(complex)
    T, gamma, reorg = 1.0, 0.5, 0.05
    nado, dt, nt = 8, 0.002, 400
    rho0 = np.zeros((2, 2), complex)
    rho0[0, 0] = 1.0
    e_ops = [np.diag([1.0, 0.0]).astype(complex),
             np.asarray(sx).astype(complex)]

    with redirect_stdout(io.StringIO()):          # its print chatter
        obs_ref = ref_heom._heom(H, rho0, [Q], e_ops, temperature=T,
                                 cutoff=gamma, reorganization=reorg,
                                 nado=nado, dt=dt, nt=nt)

    D0 = reorg * (2.0 * T - 1j * gamma)           # heom.py:313 high-T
    sol = HEOMSolver(jnp.asarray(H), bath=[(Q, [D0], [gamma])],
                     lmax=nado - 2)
    res = sol.run(jnp.asarray(rho0), dt, nt,
                  e_ops=[jnp.asarray(e) for e in e_ops], method="rk4")

    got = np.asarray(res.observables)             # (nt+1, 2), incl t=0
    assert got.shape[0] == nt + 1
    for j in range(2):
        assert np.max(np.abs(got[1:, j] - obs_ref[j])) < 1e-8


def test_deom_pade_and_trajectory_vs_reference():
    """DEOM vs the ACTUAL reference solver (pyqed/heom/deom.py:953
    ``DEOMSolver`` with the sympy Pade bath decomposition at :226),
    exec'd from /root/reference with the pass-through numba stub.

    Two pins in one: (a) the repo's NUMERIC Pade decomposition
    (open/bath.py::DrudeBath.pade) reproduces the reference's sympy
    residue calculus coefficient-for-coefficient; (b) a full 50-step
    lmax=4 spin-boson hierarchy trajectory agrees step-by-step at the
    f64 floor (measured 8e-17 — same RK4, same couplings)."""
    import io
    from contextlib import redirect_stdout, redirect_stderr
    deom_ref = load_reference_module("heom.deom")
    import sympy as sp
    from pyqed_tpu.open.deom import DEOMBath, DEOMSolver

    lam, gam, beta = 0.2, 1.0, 1.0
    w = sp.symbols("w", real=True)
    J = 2 * lam * gam * w / (w ** 2 + gam ** 2)
    bath_ref = deom_ref.Bath(J, w, beta, 1, function=[None])

    # (a) coefficient parity: numeric matrix-pencil Pade == sympy
    bath = DEOMBath.drude(temperature=1.0 / beta, cutoff=gam, reorg=lam,
                          npsd=1, decomposition="pade")
    assert np.max(np.abs(np.asarray(bath.etal)
                         - bath_ref.etal)) < 1e-10
    assert np.max(np.abs(np.asarray(bath.expn)
                         - bath_ref.expn)) < 1e-10

    # (b) trajectory parity with identical coefficients
    H = np.array([[1.0, 0.5], [0.5, -1.0]], dtype=complex)
    Q = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
    zero = lambda t: 0.0
    ref = deom_ref.DEOMSolver(
        system=H, system_dipole=0 * H, bath=bath_ref, coupling=[Q],
        coupling_dipole=[0 * Q], lmax=4,
        pulse_system_func=zero, pulse_coupling_func=zero)
    from scipy.sparse import coo_matrix
    rho0 = np.diag([1.0, 0.0]).astype(complex)
    with redirect_stdout(io.StringIO()), redirect_stderr(io.StringIO()):
        _, rhos = ref.run(coo_matrix(rho0), 0.02, 50)
    traj_ref = np.array([np.asarray(x.todense() if hasattr(x, "todense")
                                    else x) for x in rhos])

    b2 = DEOMBath(bath_ref.etal, bath_ref.etar, bath_ref.etaa,
                  bath_ref.expn)
    sol = DEOMSolver(system=H, system_dipole=0 * H, bath=b2,
                     coupling=[Q], coupling_dipole=[0 * Q], lmax=4)
    r = sol.run(rho0, 0.02, 50)
    got = np.asarray(r.states)
    assert got.shape == traj_ref.shape          # both include t=0
    assert np.max(np.abs(got - traj_ref)) < 1e-12


def test_deom_freq_domain_2des_map_vs_reference():
    """Frequency-domain third-order response map (the BASELINE config
    #4 north star) vs the ACTUAL reference resolvent contraction
    (pyqed/heom/deom.py:1127 ``correlation_4op_3t``, the double Python
    (wx, wy) loop at :1183-1190): same hierarchy, same eig path, the
    repo's single-einsum map must agree at the f64 floor."""
    import io
    from contextlib import redirect_stdout, redirect_stderr
    deom_ref = load_reference_module("heom.deom")
    import sympy as sp
    from pyqed_tpu.open.deom import DEOMBath, DEOMSolver

    lam, gam, beta = 0.2, 1.0, 1.0
    w = sp.symbols("w", real=True)
    J = 2 * lam * gam * w / (w ** 2 + gam ** 2)
    bath_ref = deom_ref.Bath(J, w, beta, 1, function=[None])
    H = np.array([[1.0, 0.5], [0.5, -1.0]], dtype=complex)
    Q = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
    mu = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
    zero = lambda t: 0.0
    ref = deom_ref.DEOMSolver(
        system=H, system_dipole=0 * H, bath=bath_ref, coupling=[Q],
        coupling_dipole=[0 * Q], lmax=2,
        pulse_system_func=zero, pulse_coupling_func=zero)
    ref.check_()
    ref.init_()
    wx = np.array([0.5, 1.0, 2.1])
    wy = np.array([-2.1, -1.0, 0.3])
    rho0 = np.diag([1.0, 0.0]).astype(complex)
    with redirect_stdout(io.StringIO()), redirect_stderr(io.StringIO()):
        cw_ref = ref.correlation_4op_3t(mu, mu, mu, mu, rho0, 0.4,
                                        wx, wy, lcr="llll")

    b2 = DEOMBath(bath_ref.etal, bath_ref.etar, bath_ref.etaa,
                  bath_ref.expn)
    sol = DEOMSolver(system=H, system_dipole=0 * H, bath=b2,
                     coupling=[Q], coupling_dipole=[0 * Q], lmax=2)
    cw = np.asarray(sol.correlation_4op_3t(mu, mu, mu, mu, rho0, 0.4,
                                           wx, wy, lcr="llll"))
    scale = np.max(np.abs(cw_ref))
    assert np.max(np.abs(cw - cw_ref)) / scale < 1e-12


def test_lindblad_correlation_vs_reference_liouvillian_expm():
    """Correlation suite vs the ACTUAL reference Liouvillian: the
    repo's RK4 correlation_2op_1t must match the EXACT e^{Lt}
    evaluation of the reference's own L matrix
    (pyqed/superoperator.py:29 ``liouvillian``).

    Why not the reference's eig-path correlation_2op_1t directly: its
    biorthogonal normalization keeps only Re<vl|vr> (superoperator.py
    ``norm = diagonal(cdot(vl, vr)).real``), which is complex for a
    non-normal L — measured 1.9e-2 self-inconsistency at t = 0 where
    the exact value is Tr[a b rho0].  The repo path has no such
    approximation."""
    import scipy.linalg
    import scipy.sparse as sp
    so = load_reference_module("superoperator")
    import jax.numpy as jnp
    from pyqed_tpu.open import LindbladSolver

    H = np.array([[0.0, 0.4], [0.4, 1.0]])
    sm = np.array([[0.0, 1.0], [0.0, 0.0]])
    sz = np.diag([1.0, -1.0])
    c_ops = [np.sqrt(0.15) * sm, np.sqrt(0.08) * sz]
    L = np.asarray(so.liouvillian(
        sp.csr_matrix(H), [sp.csr_matrix(c) for c in c_ops]).todense())
    rho0 = np.array([[0.0, 0.0], [0.0, 1.0]], complex)
    a = np.array([[0.0, 1.0], [1.0, 0.0]])

    def vec(m):
        return np.asarray(so.operator_to_vector(sp.csr_matrix(m)))\
            .reshape(-1)

    idv = vec(np.eye(2))
    seed = vec(sm @ rho0)
    tl = np.linspace(0, 4.0, 41)
    cor_exact = np.array([idv.conj() @ (np.kron(np.eye(2), a)
                          @ (scipy.linalg.expm(L * t) @ seed))
                          for t in tl])
    # ^ left multiplication superoperator in the reference's own
    # convention: cross-check it against so.left
    left_a = np.asarray(so.left(sp.csr_matrix(a)).todense())
    assert np.max(np.abs(left_a - np.kron(np.eye(2), a))) < 1e-14 or \
        np.max(np.abs(left_a - np.kron(a, np.eye(2)))) < 1e-14
    cor_exact = np.array([idv.conj() @ (left_a
                          @ (scipy.linalg.expm(L * t) @ seed))
                          for t in tl])

    ls = LindbladSolver(jnp.asarray(H),
                        [jnp.asarray(c) for c in c_ops])
    dt = (tl[1] - tl[0]) / 20
    cor = np.asarray(ls.correlation_2op_1t(rho0, jnp.asarray(a),
                                           jnp.asarray(sm),
                                           dt=dt, Nt=800))
    assert abs(cor[0] - np.trace(a @ sm @ rho0)) < 1e-10
    err = np.max(np.abs(cor[::20][:41] - cor_exact))
    assert err < 1e-7          # RK4 at dt = 0.005


def test_redfield_greens_function_vs_reference_getG():
    """RedfieldSolver.propagator vs the ACTUAL reference ``getG``
    (pyqed/oqs.py:465) on the SAME Redfield tensor: getG's convention
    is i∂t ρ = L ρ (G = −iθ e^{−iLt}), the tensor convention is
    ∂t ρ = R ρ — so getG(iR, t) must equal −i e^{Rt} exactly."""
    import scipy.sparse as sp
    oqs_ref = load_reference_module("oqs")
    import jax.numpy as jnp
    from pyqed_tpu.open.redfield import RedfieldSolver
    from pyqed_tpu.open.bath import DrudeBath

    H = np.diag([0.0, 1.0, 1.3])
    sx = np.zeros((3, 3))
    sx[0, 1] = sx[1, 0] = 1.0
    sx[1, 2] = sx[2, 1] = 0.6
    bath = DrudeBath(temperature=0.4, cutoff=1.0, reorg=0.03)
    sol = RedfieldSolver(jnp.asarray(H),
                         a_ops=[(jnp.asarray(sx), bath)])
    R, _ = sol.redfield_tensor()
    R = np.asarray(R)
    ts = np.linspace(0, 3.0, 7)
    G_ref = np.asarray(oqs_ref.getG(sp.csr_matrix(1j * R), ts,
                                    domain="time"))
    U = np.asarray(sol.propagator(jnp.asarray(ts)))
    assert np.max(np.abs(-1j * U - G_ref)) < 1e-12
