"""Cavity/polariton and Floquet tests.

Golden physics: Jaynes-Cummings analytic polariton splitting, RWA vs full
Rabi model at weak coupling, photon fractions, vacuum Rabi oscillation;
Floquet: static limit reproduces Bloch bands, high-frequency limit
renormalizes hopping by J_0, SSH winding numbers 0/1 across the
topological transition.
"""
import numpy as np
import jax.numpy as jnp

from pyqed_tpu import Mol, pauli, sigmam, basis, ket2dm, dag
from pyqed_tpu.models.cavity import Cavity, Polariton, Composite
from pyqed_tpu.open import LindbladSolver
from pyqed_tpu.floquet import (
    TightBinding, FloquetBloch, floquet_matrix, make_peierls_blocks_fn,
    gomez_leon_model,
)


def tls(omega0=1.0):
    H = jnp.diag(jnp.array([0.0, omega0]))
    _, sx, _, _ = pauli()
    m = Mol(H, edip=sx, lowering=sigmam())
    return m


class TestPolariton:
    def test_jaynes_cummings_splitting(self):
        """Resonant JC: polariton doublet at omega +- g."""
        omega = 1.0
        g = 0.1
        mol = tls(omega)
        cav = Cavity(freq=omega, n_cav=5)
        pol = Polariton(mol, cav, g=g)
        pol.getH(RWA=True)
        evals, evecs, n_ph = pol.eigenstates()
        E = np.sort(np.asarray(evals))
        # ground state 0, then doublet omega -+ g
        assert np.isclose(E[0], 0.0, atol=1e-12)
        assert np.isclose(E[1], omega - g, atol=1e-10)
        assert np.isclose(E[2], omega + g, atol=1e-10)
        # polariton doublet has ~half photon character
        idx = np.argsort(np.asarray(evals))
        nph = np.asarray(n_ph)[idx]
        assert np.isclose(nph[1], 0.5, atol=1e-8)
        assert np.isclose(nph[2], 0.5, atol=1e-8)

    def test_full_vs_rwa_weak_coupling(self):
        omega = 1.0
        g = 0.005
        mol = tls(omega)
        cav = Cavity(freq=omega, n_cav=8)
        pol = Polariton(mol, cav, g=g)
        H_full = pol.getH(RWA=False)
        w_full = np.sort(np.asarray(jnp.linalg.eigvalsh(H_full)))
        pol2 = Polariton(tls(omega), Cavity(freq=omega, n_cav=8), g=g)
        H_rwa = pol2.getH(RWA=True)
        w_rwa = np.sort(np.asarray(jnp.linalg.eigvalsh(H_rwa)))
        # low polariton states agree to O(g^2/omega) ~ Bloch-Siegert shift
        assert np.max(np.abs(w_full[:3] - w_rwa[:3])) < 5 * g**2 / omega

    def test_vacuum_rabi_oscillation(self):
        """|e, 0> oscillates to |g, 1> at frequency 2g (RWA)."""
        omega, g = 1.0, 0.05
        mol = tls(omega)
        cav = Cavity(freq=omega, n_cav=3)
        pol = Polariton(mol, cav, g=g)
        H = pol.getH(RWA=True)
        psi0 = jnp.kron(basis(2, 1), basis(3, 0))
        from pyqed_tpu import SESolver
        e_num = pol.promote_op(cav.num(), kind="cav")
        res = SESolver(H).run(psi0=psi0, dt=0.05, Nt=2000, e_ops=[e_num],
                              method="expm")
        nph = np.asarray(res.observables[:, 0]).real
        t = np.asarray(res.times)
        assert np.max(np.abs(nph - np.sin(g * t) ** 2)) < 1e-10

    def test_cavity_leak_lindblad(self):
        """Photon decays at rate kappa via the cav_leak collapse operator."""
        omega, g, kappa = 1.0, 0.0, 0.1
        mol = tls(omega)
        cav = Cavity(freq=omega, n_cav=3, decay=kappa)
        pol = Polariton(mol, cav, g=g)
        H = pol.getH(RWA=True)
        c = jnp.sqrt(kappa) * pol.get_cav_leak()
        rho0 = ket2dm(jnp.kron(basis(2, 0), basis(3, 1)))
        num = pol.promote_op(cav.num(), kind="cav")
        solver = LindbladSolver(H, c_ops=[c])
        res = solver.run(rho0, dt=0.05, Nt=1000, e_ops=[num])
        nph = np.asarray(res.observables[:, 0]).real
        t = np.asarray(res.times)
        assert np.max(np.abs(nph - np.exp(-kappa * t))) < 1e-8

    def test_composite_promote(self):
        A = tls(1.0)
        B = Cavity(freq=0.8, n_cav=4)
        comp = Composite(A, B)
        _, sx, _, _ = pauli()
        op = comp.promote(sx, "A")
        assert op.shape == (8, 8)
        H = comp.getH()
        assert np.allclose(np.asarray(H),
                           np.kron(np.asarray(A.H), np.eye(4))
                           + np.kron(np.eye(2), np.asarray(B.H)))


class TestFloquet:
    def test_floquet_matrix_static_limit(self):
        """With only the p=0 block, quasienergies = E_n + m*omega."""
        rng = np.random.default_rng(0)
        A = rng.normal(size=(2, 2))
        H0 = (A + A.T) / 2
        omega = 10.0
        nt = 5
        blocks = np.zeros((1, 2, 2), dtype=complex)
        blocks[0] = H0
        F = np.asarray(floquet_matrix(jnp.asarray(blocks), omega, nt))
        w = np.sort(np.linalg.eigvalsh(F))
        E = np.linalg.eigvalsh(H0)
        expected = np.sort(np.concatenate(
            [E + m * omega for m in range(-2, 3)]))
        assert np.allclose(w, expected, atol=1e-10)

    def test_tightbinding_bands(self):
        """Single-orbital chain: E(k) = 2t cos(ka) - mu."""
        tb = TightBinding(coords=[[0.0]], hopping={(0, 0): 1.0},
                          lattice_constant=1.0, nk=32)
        k, bands = tb.run()
        k = np.asarray(k)
        assert np.allclose(np.asarray(bands)[:, 0], 2 * np.cos(k), atol=1e-10)

    def test_high_frequency_hopping_renormalization(self):
        """Fast driving renormalizes t -> t*J_0(E0*d/omega): band width of
        the driven chain approaches the J_0-scaled static band."""
        from scipy.special import j0
        omega = 20.0
        t = 1.0
        a = 1.0
        b = 0.5
        hops, Hk = gomez_leon_model(b=b, t=t, a=a)
        hk_blocks = make_peierls_blocks_fn(hops, omega, nmax=3)
        fb = FloquetBloch(hk_blocks, omega, nt=7, norbs=2, Hk_func=Hk)
        ks = np.linspace(-np.pi, np.pi, 31, endpoint=False)
        E0 = 4.0
        qe, states = fb.run(ks, E0=E0, nE_steps=5)
        qe = np.asarray(qe).real
        # effective hoppings
        t1 = t * j0(E0 * b * a / omega)
        t2 = t * j0(E0 * (b - 1.0) * a / omega)
        exact = np.array([[-(abs(t1 + t2 * np.exp(-1j * k))), abs(t1 + t2 * np.exp(-1j * k))]
                          for k in ks])
        got = np.sort(qe, axis=1)
        assert np.max(np.abs(got - exact)) < 2e-2

    def test_ssh_subspace_winding(self):
        """Static SSH chain via the Floquet machinery at E0=0: winding of
        the lower band is 1 for intercell > intracell hopping and 0
        otherwise (computed on the Bloch states directly)."""
        for (t1, t2, expected) in [(1.0, 0.5, 0), (0.5, 1.0, 1)]:
            def Hk(k, t1=t1, t2=t2):
                h01 = t1 + t2 * jnp.exp(-1j * k)
                H = jnp.zeros((2, 2), dtype=jnp.complex128)
                H = H.at[0, 1].set(h01)
                H = H.at[1, 0].set(jnp.conj(h01))
                return H
            ks = np.linspace(-np.pi, np.pi, 101, endpoint=False)
            import jax
            evals, evecs = jnp.linalg.eigh(jax.lax.map(Hk, jnp.asarray(ks)))
            lower = evecs[:, :, 0]  # (Nk, 2)
            fb = FloquetBloch(lambda k, E: None, 1.0, 1, 2)
            w = fb.subspace_winding([0], states=[lower])
            assert w == expected, (t1, t2, w)


class TestFreeElectron:
    def test_quiver_matches_analytic(self):
        """Free electron (w0=0) in a circular field: analytic quiver
        q(t) = q0 + p-drift + E0/w^2 * (field-phase terms)."""
        import numpy as np
        from pyqed_tpu.floquet import light_driven_free_electron
        E0, om, cep = 0.8, 1.3, 0.4
        t, q, p = light_driven_free_electron(
            tf=20.0, nt=8000, q0=(0.4, 0, 0), p0=(0, 0, 0), E0=E0,
            omega=om, cep=cep, omega0=0.0, polarization="circular")
        t = np.asarray(t); q = np.asarray(q)
        # dp/dt = -E(t) with E = E0(cos(wt+c), -sin(wt+c), 0):
        px = -E0 / om * (np.sin(om * t + cep) - np.sin(cep))
        py = E0 / om * (np.cos(cep) - np.cos(om * t + cep))
        x = 0.4 + E0 / om ** 2 * (np.cos(om * t + cep) - np.cos(cep)) \
            + E0 / om * np.sin(cep) * t
        y = -E0 / om ** 2 * (np.sin(om * t + cep) - np.sin(cep)) \
            + E0 / om * np.cos(cep) * t
        assert np.max(np.abs(q[:, 0] - x)) < 1e-8
        assert np.max(np.abs(q[:, 1] - y)) < 1e-8
        assert np.max(np.abs(np.asarray(p)[:, 0] - px)) < 1e-8
        assert np.max(np.abs(np.asarray(p)[:, 1] - py)) < 1e-8

    def test_cep_scan_batches(self):
        import numpy as np
        from pyqed_tpu.floquet import cep_scan
        t, q, p = cep_scan(np.array([0.0, np.pi / 4]), tf=5.0, nt=100)
        assert q.shape == (2, 101, 3)
        assert not np.allclose(np.asarray(q)[0], np.asarray(q)[1])


def test_polariton_rwa_default_lowering():
    """Polariton.getH(RWA=True) works for a plain Mol (lowering derived
    from the dipole's upper triangle) and gives the JC doublet."""
    import numpy as np
    from pyqed_tpu.models.cavity import Cavity, Polariton
    from pyqed_tpu.models.mol import Mol

    wm = wc = 1.0
    g = 0.08
    mol = Mol(np.diag([0.0, wm]), np.array([[0.0, 1.0], [1.0, 0.0]]))
    cav = Cavity(freq=wc, n_cav=3)
    pol = Polariton(mol, cav, g=g)
    H = np.asarray(pol.getH(RWA=True))
    w = np.linalg.eigvalsh(H)
    # one-excitation doublet at wc ± g
    assert np.min(np.abs(w - (wc - g))) < 1e-10
    assert np.min(np.abs(w - (wc + g))) < 1e-10


def test_floquet_evolution_vs_direct():
    """Floquet-state evolution == direct RK4 integration at 5e-10
    (reference: pyqed/floquet/FloquetBloch.py's 2-level script,
    generalized)."""
    import numpy as np
    from pyqed_tpu.floquet.floquet import floquet_evolution, floquet_states

    delta, A, w = 1.0, 0.3, 2.5
    sz = np.diag([1.0, -1.0])
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    blocks = np.stack([0.5 * A * sx, 0.5 * delta * sz,
                       0.5 * A * sx]).astype(complex)
    psi0 = np.array([1.0, 0.0], complex)
    ts = np.linspace(0, 20, 41)
    psis = np.asarray(floquet_evolution(blocks, w, 21, psi0, ts))

    def rhs(p, t):
        return -1j * ((0.5 * delta * sz + A * np.cos(w * t) * sx) @ p)

    p = psi0.copy()
    dt = 0.0005
    out = [p.copy()]
    t = 0.0
    for _ in range(int(20 / dt)):
        k1 = rhs(p, t)
        k2 = rhs(p + k1 * dt / 2, t + dt / 2)
        k3 = rhs(p + k2 * dt / 2, t + dt / 2)
        k4 = rhs(p + k3 * dt, t + dt)
        p = p + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        t += dt
        out.append(p.copy())
    idx = (ts / dt).round().astype(int)
    direct = np.array(out)[idx]
    assert np.max(np.abs(np.abs(psis) ** 2 - np.abs(direct) ** 2)) < 5e-10
    # norm conserved exactly by construction
    assert np.max(np.abs(np.sum(np.abs(psis) ** 2, 1) - 1)) < 1e-12
    # quasienergies: weak drive ~ unperturbed +- delta/2 (mod omega)
    eps, _ = floquet_states(blocks, w, 21)
    assert np.all(np.abs(np.asarray(eps)) <= w / 2 + 1e-12)


def test_floquet_evolution_chiral_drive_amplitudes():
    """Chiral (circularly polarized) drive with H^{(+1)} != H^{(-1)}:
    COMPLEX amplitudes match direct integration — pins the e^{+ipwt}
    Fourier convention (a conjugation error passes the real-drive
    |psi|^2 test but fails here)."""
    import numpy as np
    from pyqed_tpu.floquet.floquet import floquet_evolution

    delta, A, w = 1.0, 0.3, 2.5
    sz = np.diag([1.0, -1.0])
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    sy = np.array([[0.0, -1j], [1j, 0.0]])
    H0 = 0.5 * delta * sz
    Hp1 = A * (sx - 1j * sy) / 2      # e^{+i w t} component
    Hm1 = A * (sx + 1j * sy) / 2
    blocks = np.stack([Hm1, H0, Hp1])
    psi0 = np.array([1.0, 0.0], complex)
    ts = np.linspace(0, 15, 31)
    psis = np.asarray(floquet_evolution(blocks, w, 31, psi0, ts))

    def rhs(p, t):
        Ht = H0 + A * (sx * np.cos(w * t) + sy * np.sin(w * t))
        return -1j * (Ht @ p)

    p = psi0.copy()
    dt = 0.0002
    out = [p.copy()]
    t = 0.0
    for _ in range(int(15 / dt)):
        k1 = rhs(p, t)
        k2 = rhs(p + k1 * dt / 2, t + dt / 2)
        k3 = rhs(p + k2 * dt / 2, t + dt / 2)
        k4 = rhs(p + k3 * dt, t + dt)
        p = p + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        t += dt
        out.append(p.copy())
    idx = (ts / dt).round().astype(int)
    direct = np.array(out)[idx]
    assert np.max(np.abs(psis - direct)) < 1e-8


def test_qrm_factory_jaynes_cummings_splitting():
    """QRM factory (reference pyqed/cavity.py:741): at resonance the
    RWA (Jaynes-Cummings) polariton doublet splits by 2 g sqrt(n+1)."""
    import numpy as np
    from pyqed_tpu.models import QRM
    w = 1.0
    g = 0.05
    pol = QRM(w, w, ncav=6)
    pol.g = g
    H = np.asarray(pol.getH(RWA=True))
    evals = np.sort(np.linalg.eigvalsh(H))
    # ground state at 0; first doublet at w -/+ g
    assert abs(evals[0]) < 1e-10
    assert abs(evals[1] - (w - g)) < 1e-8
    assert abs(evals[2] - (w + g)) < 1e-8
    # second doublet splits by 2 g sqrt(2)
    assert abs((evals[4] - evals[3]) - 2 * g * np.sqrt(2)) < 1e-6


class TestCompositeExtras:
    """Composite spectrum/transform_basis/purity/get_nonhermH +
    Polariton.get_dm (reference: pyqed/polariton/cavity.py)."""

    def _jc(self, g=0.1):
        s0, sx, sy, sz = pauli()
        mol = Mol(0.5 * (jnp.eye(2) - jnp.asarray(np.asarray(sz))),
                  edip=jnp.asarray(np.asarray(sx), dtype=complex))
        cav = Cavity(1.0, 3, decay=0.01, quality_factor=50.0)
        pol = Polariton(mol, cav, g=g)
        pol.getH()
        return pol

    def test_spectrum_and_transform_basis(self):
        pol = self._jc()
        w, v = pol.spectrum()[:2]
        Ht = np.asarray(pol.transform_basis(pol.H))
        # H in its own eigenbasis is diagonal with the spectrum
        assert np.allclose(Ht, np.diag(np.asarray(w)), atol=1e-10)

    def test_purity_product_vs_entangled(self):
        pol = self._jc()
        # product state |g, 0>
        psi_prod = np.zeros(pol.dim, complex)
        psi_prod[0] = 1.0
        assert abs(float(pol.purity(jnp.asarray(psi_prod))) - 1.0) < 1e-12
        # Bell-like (|e,0> + |g,1>)/sqrt(2): purity = 1/2
        psi = np.zeros(pol.dim, complex)
        psi[pol.cav.n_cav] = 1 / np.sqrt(2)       # |e, 0>
        psi[1] = 1 / np.sqrt(2)                   # |g, 1>
        assert abs(float(pol.purity(jnp.asarray(psi))) - 0.5) < 1e-12

    def test_get_dm_product_vacuum(self):
        pol = self._jc()
        dm = np.asarray(pol.get_dm())
        assert abs(np.trace(dm) - 1.0) < 1e-12
        ref = np.zeros((pol.dim, pol.dim), complex)
        ref[0, 0] = 1.0
        assert np.allclose(dm, ref, atol=1e-12)

    def test_composite_get_nonhermH(self):
        s0, sx, sy, sz = pauli()
        mol = Mol(0.5 * (jnp.eye(2) - jnp.asarray(np.asarray(sz))),
                  edip=jnp.asarray(np.asarray(sx), dtype=complex),
                  gamma=[0.0, 0.05])
        cav = Cavity(1.0, 3, quality_factor=100.0)
        comp = Composite(mol, cav)
        a = cav.annihilate()
        H = np.asarray(comp.get_nonhermH(
            a_ops=[jnp.asarray(np.asarray(sx), complex)],
            b_ops=[a + dag(a)], g=[0.1]))
        # anti-Hermitian part strictly dissipative (eigvals <= 0)
        gamma = (H - H.conj().T) / 2j
        assert np.max(np.linalg.eigvalsh(gamma)) < 1e-12
        # Hermitian part == Hermitian composite H with same coupling
        comp2 = Composite(mol, cav)
        Hh = np.asarray(comp2.getH(a_ops=[jnp.asarray(np.asarray(sx), complex)],
                                   b_ops=[a + dag(a)], g=[0.1]))
        assert np.allclose((H + H.conj().T) / 2, Hh, atol=1e-10)
