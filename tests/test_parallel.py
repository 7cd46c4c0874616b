"""Multi-device sharding tests on the virtual 8-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8 — SURVEY.md §4's
TPU stand-in for multi-chip)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pyqed_tpu.parallel import make_mesh, shard_along, pad_to_multiple


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


class TestMesh:
    @requires_8
    def test_make_mesh_axes(self):
        mesh = make_mesh({"ado": 8})
        assert mesh.devices.size == 8
        mesh2 = make_mesh({"dp": 2, "tp": -1})
        assert mesh2.shape["tp"] == 4

    def test_bad_sizes_raise(self):
        with pytest.raises(ValueError):
            make_mesh({"a": 3})

    @requires_8
    def test_pad_to_multiple(self):
        x = jnp.ones((10, 3))
        y, n = pad_to_multiple(x, 8)
        assert y.shape == (16, 3) and n == 10


class TestShardedSolvers:
    @requires_8
    def test_heom_sharded_step_matches_unsharded(self):
        """ADO-axis sharding must not change the numerics."""
        from __graft_entry__ import _heom_setup, _heom_step_fn
        H, keys, plus_idx, minus_idx, Q, cvec, nuvec = _heom_setup(
            nsite=2, nexp_per_bath=2, lmax=3)
        step, nado, n = _heom_step_fn(H, keys, plus_idx, minus_idx, Q,
                                      cvec, nuvec)
        rng = np.random.default_rng(0)
        a_re = rng.standard_normal((nado, n, n)).astype(np.float32)
        a_im = rng.standard_normal((nado, n, n)).astype(np.float32)

        ref = jax.jit(step)(a_re, a_im)

        mesh = make_mesh({"ado": 8})
        pad = (-nado) % 8

        def padded_step(re, im):
            r, i = step(re[:nado], im[:nado])
            r = jnp.concatenate([r, jnp.zeros((pad, n, n), r.dtype)])
            i = jnp.concatenate([i, jnp.zeros((pad, n, n), i.dtype)])
            return r, i

        sh = NamedSharding(mesh, P("ado", None, None))
        a_re_p = jax.device_put(np.concatenate(
            [a_re, np.zeros((pad, n, n), np.float32)]), sh)
        a_im_p = jax.device_put(np.concatenate(
            [a_im, np.zeros((pad, n, n), np.float32)]), sh)
        out = jax.jit(padded_step, in_shardings=(sh, sh),
                      out_shardings=(sh, sh))(a_re_p, a_im_p)
        assert np.allclose(np.asarray(out[0])[:nado], np.asarray(ref[0]),
                           atol=1e-5)
        assert np.allclose(np.asarray(out[1])[:nado], np.asarray(ref[1]),
                           atol=1e-5)

    @requires_8
    def test_frequency_sharded_echo_map(self):
        """omega1-sharded photon-echo map equals the replicated result."""
        from pyqed_tpu.signal.sos import _photon_echo
        E = jnp.asarray([0.0, 1.0, 2.05])
        dip = jnp.asarray(np.ones((3, 3)) - np.eye(3))
        gamma = jnp.asarray([0.01, 0.01, 0.01])
        w = jnp.asarray(np.linspace(0.8, 1.2, 32))

        def pe(w1):
            S = _photon_echo(E, dip, -w1, w, 0.0, [0], [1], [2], gamma)
            return jnp.real(S), jnp.imag(S)

        ref = pe(w)
        mesh = make_mesh({"omega": 8})
        wsh = NamedSharding(mesh, P("omega"))
        w_p = jax.device_put(np.asarray(w), wsh)
        out = jax.jit(pe, in_shardings=(wsh,),
                      out_shardings=NamedSharding(mesh, P("omega", None)))(w_p)
        assert np.allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=1e-10)

    @requires_8
    def test_walker_sharded_dmc(self):
        """DMC with the walker axis sharded over the mesh produces the same
        physics (HO ground state)."""
        from pyqed_tpu.qmc import DMC
        mesh = make_mesh({"walker": 8})
        dmc = DMC(ndim=1, potential=lambda x: 0.5 * jnp.sum(x**2))
        E, trace, xf = dmc.run_sharded(jax.random.PRNGKey(0), mesh,
                                       nwalkers=4096, nsteps=800, dt=0.02,
                                       eref=0.5, nequil=300)
        assert np.isclose(float(E), 0.5, atol=0.03)


class TestMeshAwareSolvers:
    """Production solvers accept mesh= and must match unsharded at f64
    (round-1 VERDICT next-round item #3)."""

    @requires_8
    def test_heom_run_mesh(self):
        from pyqed_tpu.open.heom import HEOMSolver
        from pyqed_tpu.open.bath import DrudeBath
        H = np.array([[1.0, 0.2], [0.2, -1.0]])
        Q = np.diag([1.0, -1.0])
        bath = DrudeBath(temperature=1.0, cutoff=0.5, reorg=0.1)
        c, nu = bath.matsubara(1)
        rho0 = np.array([[1.0, 0.0], [0.0, 0.0]])
        e_ops = [np.diag([1.0, 0.0])]
        sol = HEOMSolver(H, bath=[(Q, c, nu)], lmax=4)
        r0 = sol.run(rho0, dt=0.01, nt=60, e_ops=e_ops)
        mesh = make_mesh({"ado": 8})
        r1 = sol.run(rho0, dt=0.01, nt=60, e_ops=e_ops, mesh=mesh)
        assert np.max(np.abs(np.asarray(r0.observables)
                             - np.asarray(r1.observables))) < 1e-12

    @requires_8
    def test_spo_run_mesh(self):
        from pyqed_tpu.grid.spo import SPO2
        x = np.linspace(-6, 6, 32, endpoint=False)
        y = np.linspace(-6, 6, 32, endpoint=False)
        X, Y = np.meshgrid(x, y, indexing="ij")
        v1 = 0.5 * (X ** 2 + Y ** 2)
        v2 = 0.5 * ((X - 1) ** 2 + Y ** 2) + 1.0
        cpl = 0.1 * np.ones_like(X)
        psi0 = np.zeros((32, 32, 2), complex)
        psi0[..., 0] = np.exp(-(X + 1) ** 2 - Y ** 2)
        psi0[..., 0] /= np.sqrt(np.sum(np.abs(psi0) ** 2)
                                * (x[1] - x[0]) * (y[1] - y[0]))

        def go(mesh):
            s = SPO2(x, y, masses=[1.0, 1.0], nstates=2, mesh=mesh)
            s.set_DPES([v1, v2], [[(0, 1), cpl]])
            return s.run(psi0, dt=0.02, nt=40, nout=10)

        r0 = go(None)
        r1 = go(make_mesh({"x": 8}))
        assert np.max(np.abs(np.asarray(r0.psi) - np.asarray(r1.psi))) < 1e-12
        assert np.max(np.abs(np.asarray(r0.population)
                             - np.asarray(r1.population))) < 1e-12

    @requires_8
    def test_ldr_run_mesh(self):
        from pyqed_tpu.grid.ldr import LDRN
        sol = LDRN(domains=[(-6, 6), (-6, 6)], levels=[5, 5], nstates=2)
        X, Y = np.meshgrid(*sol.x, indexing="ij")
        apes = np.stack([0.5 * (X ** 2 + Y ** 2),
                         0.5 * (X ** 2 + Y ** 2) + 1.0], axis=-1)
        sol.apes = apes
        states = np.zeros((*sol.nx, 2, 2))
        theta = 0.2 * X
        states[..., 0, 0] = np.cos(theta)
        states[..., 1, 0] = np.sin(theta)
        states[..., 0, 1] = -np.sin(theta)
        states[..., 1, 1] = np.cos(theta)
        sol.build_ovlp(jnp.asarray(states))
        psi0 = np.zeros((*sol.nx, 2), complex)
        psi0[..., 0] = np.exp(-(X - 1) ** 2 - Y ** 2)
        r0 = sol.run(psi0, dt=0.01, nt=20)
        r1 = sol.run(psi0, dt=0.01, nt=20, mesh=make_mesh({"row": 8}))
        assert np.max(np.abs(np.asarray(r0.psi) - np.asarray(r1.psi))) < 1e-12

    @requires_8
    def test_ldr_diabatic_separable_fast_path(self):
        """A=None must not materialize a dense propagator and must match
        the dense identity-overlap result."""
        from pyqed_tpu.grid.ldr import LDRN
        sol = LDRN(domains=[(-6, 6)], levels=[5], nstates=2)
        x = sol.x[0]
        apes = np.stack([0.5 * x ** 2, 0.5 * x ** 2 + 1.0], axis=-1)
        sol.apes = apes
        sol.build_ovlp()          # diabatic: A stays None
        assert sol.A is None
        psi0 = np.zeros((len(x), 2), complex)
        psi0[:, 0] = np.exp(-(x - 1.0) ** 2)
        r_fast = sol.run(psi0, dt=0.005, nt=40)
        # dense identity overlap for comparison
        sol2 = LDRN(domains=[(-6, 6)], levels=[5], nstates=2)
        sol2.apes = apes
        eye = np.zeros((len(x), 2, 2))
        eye[:, 0, 0] = eye[:, 1, 1] = 1.0
        sol2.build_ovlp(jnp.asarray(eye))   # states = identity basis
        r_dense = sol2.run(psi0, dt=0.005, nt=40)
        assert np.max(np.abs(np.asarray(r_fast.psi)
                             - np.asarray(r_dense.psi))) < 1e-10

    @requires_8
    def test_photon_echo_t2series_mesh(self):
        from pyqed_tpu.signal.sos import photon_echo_t2series
        from pyqed_tpu.models.mol import Mol
        rng = np.random.default_rng(3)
        E = np.array([0.0, 1.0, 1.1, 2.05])
        dip = rng.random((4, 4))
        dip = dip + dip.T
        mol = Mol(np.diag(E), dip)
        mol.gamma = np.full(4, 0.02)
        pump = np.linspace(0.8, 1.3, 16)
        probe = np.linspace(0.8, 1.3, 16)
        t2 = np.array([0.0, 10.0])
        S0 = photon_echo_t2series(mol, pump, probe, t2, e_idx=[1, 2],
                                  f_idx=[3])
        S1 = photon_echo_t2series(mol, pump, probe, t2, e_idx=[1, 2],
                                  f_idx=[3], mesh=make_mesh({"w": 8}))
        assert np.max(np.abs(np.asarray(S0) - np.asarray(S1))) < 1e-10


class TestField2DESSharded:
    def test_batch_sharded_matches_unsharded(self):
        """Explicit-field 2DES: mesh-sharded (phase x t1) batch ==
        unsharded at 1e-12 (pure data parallelism)."""
        from pyqed_tpu import pauli, DrudeBath, HEOMSolver
        from pyqed_tpu.signal import field_2des_rephasing
        _, sx, _, sz = [np.asarray(p) for p in pauli()]
        bath = DrudeBath(temperature=0.5, cutoff=0.5, reorg=0.01)
        bath.set_bath_ops([jnp.asarray(sz)])
        sol = HEOMSolver(jnp.asarray(0.5 * sz, dtype=complex), bath=bath,
                         lmax=1, decomposition="pade", nexp=1)
        rho0 = np.array([[1.0, 0], [0, 0]], complex)
        t1s = np.arange(8) * 0.3     # batch = 4*4*8 = 128, divisible by 8
        kw = dict(t2=0.3, nt3=32, dt=0.05, pulse_width=0.3,
                  e_amps=(0.05, 0.05, 0.05), omega_c=1.0)
        P3a, _, _ = field_2des_rephasing(sol, rho0, sx, t1s, **kw)
        mesh = make_mesh({"batch": 8})
        P3b, _, _ = field_2des_rephasing(sol, rho0, sx, t1s, mesh=mesh,
                                         **kw)
        assert np.max(np.abs(P3a - P3b)) < 1e-12


class TestScalingEvidence:
    """Weak-scaling + communication-pattern pins (VERDICT r2 #8): the
    dryrun proves the sharded programs compile and run; these pin the
    SHAPE of the scaling. Per-device work is read from XLA's compiled
    cost analysis (the SPMD module is the per-device program), so the
    check is deterministic — no wall-clock flakiness on the virtual
    CPU mesh."""

    @staticmethod
    def _mesh_n(n, axis):
        from jax.sharding import Mesh
        return Mesh(np.array(jax.devices()[:n]), (axis,))

    @requires_8
    def test_heom_weak_scaling_flops_per_device(self):
        """ADO-sharded HEOM: grow the hierarchy 8x with the mesh by the
        truncation depth (M=14 modes fixed: lmax 1 -> 2 takes nado from
        15 to 120 while the per-ADO superoperator width (2M+1)V is
        UNCHANGED) and assert per-device FLOPs stay flat."""
        from __graft_entry__ import _heom_setup, _heom_step_fn

        def per_device_flops(ndev, lmax):
            H, keys, plus_idx, minus_idx, Q, cvec, nuvec = _heom_setup(
                nsite=7, nexp_per_bath=2, lmax=lmax)
            step, nado, n = _heom_step_fn(H, keys, plus_idx, minus_idx,
                                          Q, cvec, nuvec)
            mesh = self._mesh_n(ndev, "ado")
            sh = NamedSharding(mesh, P("ado", None, None))
            pad = (-nado) % ndev

            def sharded(re, im):
                re = jax.lax.with_sharding_constraint(re, sh)
                im = jax.lax.with_sharding_constraint(im, sh)
                r, i = step(re[:nado], im[:nado])
                r = jnp.concatenate([r, jnp.zeros((pad, n, n), r.dtype)])
                i = jnp.concatenate([i, jnp.zeros((pad, n, n), i.dtype)])
                return (jax.lax.with_sharding_constraint(r, sh),
                        jax.lax.with_sharding_constraint(i, sh))

            z = jnp.zeros((nado + pad, n, n), jnp.float32)
            comp = jax.jit(sharded).lower(z, z).compile()
            return comp.cost_analysis()["flops"], nado

        f1, n1 = per_device_flops(1, lmax=1)    # nado = 15
        f8, n8 = per_device_flops(8, lmax=2)    # nado = 120
        assert n8 == 8 * n1            # the problem really grew 8x
        # per-device work flat: same modes, same per-ADO cost
        assert 0.6 < f8 / f1 < 1.7

    @requires_8
    def test_ldr_batch_weak_scaling_flops_per_device(self):
        """Batch-sharded LDR propagator matvecs (the production
        trajectory parallelism — the ldr_batch/polariton bench rows):
        trajectories ∝ devices, per-device FLOPs flat. (FFT-based
        programs — SPO — cannot currently shard under GSPMD at all:
        XLA has no FFT partitioning rule and all-gathers even a purely
        batch-sharded FFT; measured and pinned in
        test_sharded_fft_collective_pattern. Matmul-based steps shard
        cleanly, so LDR/HEOM carry the weak-scaling evidence.)"""
        n = 512
        rng = np.random.default_rng(0)
        Ur = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
        Ui = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))

        def per_device_flops(ndev):
            B = 4 * ndev
            mesh = self._mesh_n(ndev, "b")
            sh = NamedSharding(mesh, P("b", None))

            def one(pr, pi):
                pr = jax.lax.with_sharding_constraint(pr, sh)
                pi = jax.lax.with_sharding_constraint(pi, sh)
                qr = pr @ Ur.T - pi @ Ui.T
                qi = pr @ Ui.T + pi @ Ur.T
                return (jax.lax.with_sharding_constraint(qr, sh),
                        jax.lax.with_sharding_constraint(qi, sh))

            z = jnp.zeros((B, n), jnp.float32)
            comp = jax.jit(one).lower(z, z).compile()
            return comp.cost_analysis()["flops"]

        f1 = per_device_flops(1)
        f4 = per_device_flops(4)
        f8 = per_device_flops(8)
        assert 0.8 < f4 / f1 < 1.3
        assert 0.8 < f8 / f4 < 1.3

    @requires_8
    def test_sharded_fft_collective_pattern(self):
        """Pin the communication pattern of a GSPMD-partitioned FFT
        along a sharded grid axis. MEASURED (jax 0.9 GSPMD): the
        partitioner does NOT decompose FFT along the transform axis —
        it all-gathers the axis, FFTs locally, and dynamic-slices the
        shard back out. This is WHY the production SPON(mesh=) path
        routes through parallel/pencil_fft.py (shard_map + explicit
        all-to-all, O(N/d) per device — see TestPencilFFT below)
        instead of GSPMD; this pin documents the fallback's behavior
        so a partitioner change shows up here rather than silently
        altering the communication model."""
        mesh = make_mesh({"x": 8})
        sh = NamedSharding(mesh, P("x", None))

        def fftstep(p_re, p_im):
            p = jax.lax.with_sharding_constraint(p_re + 1j * p_im, sh)
            q = jnp.fft.fft(p, axis=0)      # along the SHARDED axis
            q = jax.lax.with_sharding_constraint(q, sh)
            return jnp.real(q), jnp.imag(q)

        z = jnp.zeros((256, 64), jnp.float32)
        hlo = jax.jit(fftstep).lower(z, z).compile().as_text()
        assert "all-gather" in hlo and "dynamic-slice" in hlo, \
            "sharded-axis FFT no longer gathers+reslices — the " \
            "communication model changed; re-derive the comm volume"
        # the transform axis is NOT redistributed via all-to-all today
        assert "all-to-all" not in hlo

    @requires_8
    def test_heom_sharded_collectives_present(self):
        """The ADO-sharded HEOM step's neighbor gather must communicate
        (the plus/minus maps cross shard boundaries): pin that the
        compiled module contains an on-mesh collective at all."""
        from __graft_entry__ import _heom_setup, _heom_step_fn
        H, keys, plus_idx, minus_idx, Q, cvec, nuvec = _heom_setup(
            nsite=4, nexp_per_bath=2, lmax=2)
        step, nado, n = _heom_step_fn(H, keys, plus_idx, minus_idx, Q,
                                      cvec, nuvec)
        mesh = make_mesh({"ado": 8})
        sh = NamedSharding(mesh, P("ado", None, None))
        pad = (-nado) % 8

        def sharded(re, im):
            re = jax.lax.with_sharding_constraint(re, sh)
            im = jax.lax.with_sharding_constraint(im, sh)
            r, i = step(re[:nado], im[:nado])
            r = jnp.concatenate([r, jnp.zeros((pad, n, n), r.dtype)])
            i = jnp.concatenate([i, jnp.zeros((pad, n, n), i.dtype)])
            return (jax.lax.with_sharding_constraint(r, sh),
                    jax.lax.with_sharding_constraint(i, sh))

        z = jnp.zeros((nado + pad, n, n), jnp.float32)
        hlo = jax.jit(sharded).lower(z, z).compile().as_text()
        assert any(c in hlo for c in
                   ("all-to-all", "all-gather", "collective-permute")), \
            "ADO-sharded HEOM compiled with no inter-shard communication"


class TestPencilFFT:
    """The distributed pencil/four-step FFT (parallel/pencil_fft.py) —
    the framework's true context parallelism for FFT-based KEO
    (reference workload: pyqed/wpd.py:837 ``_KEO_linear``). Verdict-r4
    item #1: the production sharded-FFT path must communicate via
    all-to-all transposes with O(N/d) per-device memory, not the GSPMD
    all-gather pinned above."""

    def _expk(self, grid, seed=0):
        rng = np.random.default_rng(seed)
        k = np.exp(-1j * 0.01 * rng.standard_normal(grid))
        return (jnp.real(jnp.asarray(k)), jnp.imag(jnp.asarray(k))), k

    @requires_8
    def test_fft_sharded_matches_fftn(self):
        """Forward/inverse distributed FFT == jnp.fft.fftn to 1e-12
        (x64), for the 1D four-step and the ND pencil decomposition."""
        from pyqed_tpu.parallel.pencil_fft import fft_sharded, ifft_sharded
        mesh = make_mesh({"grid": 8})
        rng = np.random.default_rng(1)
        for shape, fnd in [((512, 2), 1), ((1024,), 1),
                           ((64, 64, 2), 2), ((32, 64, 16, 1), 3)]:
            x = jnp.asarray(rng.standard_normal(shape)
                            + 1j * rng.standard_normal(shape))
            ref = jnp.fft.fftn(x, axes=tuple(range(fnd)))
            got = jax.jit(lambda a: fft_sharded(a, mesh, "grid", fnd))(x)
            scale = float(jnp.max(jnp.abs(ref)))
            assert float(jnp.max(jnp.abs(got - ref))) / scale < 1e-12
            back = jax.jit(lambda a: ifft_sharded(a, mesh, "grid", fnd))(got)
            assert float(jnp.max(jnp.abs(back - x))) < 1e-12

    @requires_8
    def test_keo_pencil_collectives(self):
        """FLIPPED PIN (verdict-r4 #1): the fused sharded KEO compiles
        to all-to-all transposes and contains NO all-gather — each
        device touches only its O(N/d) pencil."""
        from pyqed_tpu.parallel.pencil_fft import make_keo_pencil
        mesh = make_mesh({"grid": 8})
        for grid, ns in [((256, 64), 2), ((512,), 2), ((32, 64, 16), 1)]:
            expk_ri, expk = self._expk(grid)
            keo = make_keo_pencil(grid, ns, expk_ri, mesh, "grid")
            assert keo is not None
            psi = jnp.zeros(grid + (ns,), jnp.complex128)
            hlo = jax.jit(keo).lower(psi).compile().as_text()
            assert "all-to-all" in hlo, f"pencil KEO {grid}: no all-to-all"
            assert "all-gather" not in hlo, \
                f"pencil KEO {grid}: all-gather crept back in"

    @requires_8
    def test_keo_pencil_matches_dense(self):
        """Fused sharded KEO == ifftn(expK * fftn(psi)) to 1e-12."""
        from pyqed_tpu.parallel.pencil_fft import make_keo_pencil
        mesh = make_mesh({"grid": 8})
        rng = np.random.default_rng(2)
        for grid, ns in [((64, 64), 2), ((512,), 3), ((32, 64, 16), 1)]:
            expk_ri, expk = self._expk(grid, seed=hash(grid) % 100)
            keo = make_keo_pencil(grid, ns, expk_ri, mesh, "grid")
            psi = jnp.asarray(rng.standard_normal(grid + (ns,))
                              + 1j * rng.standard_normal(grid + (ns,)))
            axes = tuple(range(len(grid)))
            ref = jnp.fft.ifftn(jnp.fft.fftn(psi, axes=axes)
                                * jnp.asarray(expk)[..., None], axes=axes)
            got = jax.jit(keo)(psi)
            scale = float(jnp.max(jnp.abs(ref)))
            assert float(jnp.max(jnp.abs(got - ref))) / scale < 1e-12

    @requires_8
    def test_keo_pencil_memory_per_device(self):
        """Per-device compiled memory is O(N/d): arguments shrink
        exactly with the mesh and temporaries by ≥2.5x from 2 to 8
        devices (verdict-r4 #1 'done' criterion)."""
        from pyqed_tpu.parallel.pencil_fft import make_keo_pencil
        grid, ns = (256, 256), 2
        expk_ri, _ = self._expk(grid)
        stats = {}
        for nd in (2, 8):
            mesh = make_mesh({"grid": nd}, devices=jax.devices()[:nd])
            keo = make_keo_pencil(grid, ns, expk_ri, mesh, "grid")
            psi = jnp.zeros(grid + (ns,), jnp.complex128)
            stats[nd] = jax.jit(keo).lower(psi).compile().memory_analysis()
        assert stats[2].argument_size_in_bytes \
            == 4 * stats[8].argument_size_in_bytes
        assert stats[8].temp_size_in_bytes \
            < stats[2].temp_size_in_bytes / 2.5

    @requires_8
    def test_spon_mesh_step_uses_pencil(self):
        """End-to-end: the compiled SPON(mesh=) evolve program carries
        the pencil FFT's all-to-alls and no all-gather (the production
        path, not just the kernel in isolation)."""
        from pyqed_tpu.grid.spo import SPO2
        n = 32
        x = np.linspace(-6, 6, n, endpoint=False)
        X, Y = np.meshgrid(x, x, indexing="ij")
        s = SPO2(x, x, masses=[1.0, 1.0], nstates=2,
                 mesh=make_mesh({"grid": 8}))
        s.set_DPES([0.5 * (X**2 + Y**2), 0.5 * (X**2 + Y**2) + 1.0],
                   [[(0, 1), 0.1 * np.ones_like(X)]])
        psi0 = np.zeros((n, n, 2), complex)
        psi0[..., 0] = np.exp(-X**2 - Y**2)
        s.build(0.02)
        from pyqed_tpu.parallel.pencil_fft import make_keo_pencil
        keo = make_keo_pencil(s.shape, s.nstates, s._exp_K_ri, s.mesh)
        assert keo is not None, "SPO2 32x32 on 8 devices must take pencil"
        # and the full run still matches unsharded to 1e-12 (covered by
        # test_spo_run_mesh); here assert the HLO of one full Strang
        # step (V/2 K V/2) through the public step path
        peo = s._peo

        def strang(psi):
            return peo(keo(peo(psi, half=True)), half=True)

        psi = jnp.asarray(psi0)
        hlo = jax.jit(strang).lower(psi).compile().as_text()
        assert "all-to-all" in hlo
        assert "all-gather" not in hlo

    @requires_8
    def test_spo2_jacobi_mesh_pencil(self):
        """Jacobi-coordinate SPO2 with mesh= routes its sequential
        per-axis KEO factors through the pencil machinery: parity vs
        the unsharded run at 1e-12 and all-to-all (no all-gather) in
        the compiled factor KEO."""
        from pyqed_tpu.grid.spo import SPO2
        from pyqed_tpu.parallel.pencil_fft import make_keo_factors_pencil
        n = 32
        x = np.linspace(1.2, 4.2, n, endpoint=False)   # radial-like
        th = np.linspace(-np.pi, np.pi, n, endpoint=False)
        X, TH = np.meshgrid(x, th, indexing="ij")
        v1 = 0.5 * (X - 2.5) ** 2 + 0.1 * np.cos(TH)
        v2 = v1 + 1.0
        cpl = 0.05 * np.ones_like(X)
        psi0 = np.zeros((n, n, 2), complex)
        psi0[..., 0] = np.exp(-(X - 2.5) ** 2 - TH ** 2)
        psi0[..., 0] /= np.linalg.norm(psi0)

        def go(mesh):
            s = SPO2(x, th, masses=[1.0, lambda r: 1.0 * r ** 2],
                     nstates=2, coords="jacobi", mesh=mesh)
            s.set_DPES([v1, v2], [[(0, 1), cpl]])
            return s.run(psi0, dt=0.01, nt=20, nout=10)

        r0 = go(None)
        mesh = make_mesh({"grid": 8})
        r1 = go(mesh)
        assert np.max(np.abs(np.asarray(r0.psi)
                             - np.asarray(r1.psi))) < 1e-12
        # HLO pin on the factor KEO itself
        s = SPO2(x, th, masses=[1.0, lambda r: 1.0 * r ** 2],
                 nstates=2, coords="jacobi", mesh=mesh)
        s.set_DPES([v1, v2], [[(0, 1), cpl]])
        s.build(0.01)
        keo = make_keo_factors_pencil(
            s.shape, s.nstates, s._jacobi_factors(), mesh)
        assert keo is not None
        psi = jnp.zeros((n, n, 2), jnp.complex128)
        hlo = jax.jit(keo).lower(psi).compile().as_text()
        assert "all-to-all" in hlo and "all-gather" not in hlo
        # and the pencil factor KEO == the class _keo exactly
        rng2 = np.random.default_rng(5)
        p = jnp.asarray(rng2.standard_normal((n, n, 2))
                        + 1j * rng2.standard_normal((n, n, 2)))
        ref = s._keo(p)
        got = jax.jit(keo)(p)
        assert float(jnp.max(jnp.abs(got - ref))) < 1e-12
