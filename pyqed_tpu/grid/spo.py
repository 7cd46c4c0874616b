"""Split-operator nonadiabatic wavepacket dynamics on uniform grids.

TPU-native counterpart of the reference's three near-identical SPO stacks
(reference: pyqed/wpd.py — ``SPO:191``, ``SPO2:379``, ``SPO3:1105``;
duplicates pyqed/namd/diabatic.py and pyqed/spo/ are unified here, per
SURVEY.md §7 unification decisions).

Strang splitting for H = K + V(x) with an ns-state diabatic potential
matrix V(x) at every grid point:

    e^{-iH dt} = e^{-iV dt/2} e^{-iK dt} e^{-iV dt/2}

TPU mapping:
- setup: the per-grid-point eigendecomposition of V(x) (the reference's
  Python double loop, pyqed/wpd.py:583-623) is one ``vmap``-batched ``eigh``
  over all grid points;
- step: kinetic factor = N-d FFT (XLA FFT) x broadcast phase multiply;
  potential factor = one batched (npts, ns, ns) @ (npts, ns) matmul;
- time loop: ``lax.scan`` storing sampled states/observables on device.

The same class covers 1/2/3/N dimensions; ``SPO``, ``SPO2``, ``SPO3`` are
thin aliases with the reference constructor signatures. nstates=1 covers
the single-surface adiabatic propagator (reference: pyqed/namd/adiabatic.py
and pyqed/spo/SPO_1D.py).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.math import interval
from ..core.result import Result
from ..ops import pallas_kernels as pk


def _kgrid(n, d):
    return 2.0 * np.pi * np.fft.fftfreq(n, d)


def _ri(z):
    """Split complex -> (re, im) real pair (axon host-boundary safe)."""
    return jnp.real(z), jnp.imag(z)


def _cc(ri):
    """Recombine a (re, im) pair into complex (call inside traced code)."""
    return ri[0] + 1j * ri[1]


class ResultSPO(Result):
    """Result with grid metadata (reference: pyqed/wpd.py:57 ResultSPO2)."""

    def __init__(self, grids=None, **kwargs):
        super().__init__(**kwargs)
        self.grids = grids
        self.population = None
        self.rho_el = None

    @property
    def x(self):
        return self.grids[0] if self.grids else None

    def get_population(self, fname=None):
        """Per-state populations from the stored snapshots (reference:
        pyqed/wpd.py ResultSPO2.get_population — a per-snapshot loop
        there; one einsum here). Returns (nt, nstates)."""
        psis = jnp.asarray(self.psilist)
        dvol = float(np.prod([g[1] - g[0] for g in self.grids]))
        p = jnp.einsum("t...a, t...a -> ta",
                       jnp.conj(psis), psis).real * dvol
        self.population = np.asarray(p)
        if fname is not None:
            np.savez(fname, self.population)
        return self.population

    def position(self):
        """Position expectations <x_d>(t), all dims in one einsum each
        (reference: pyqed/wpd.py ResultSPO2.position). Returns
        (nt, ndim)."""
        psis = jnp.asarray(self.psilist)
        dvol = float(np.prod([g[1] - g[0] for g in self.grids]))
        ndim = len(self.grids)
        cols = []
        abc = "ijklm"[:ndim]
        for d, g in enumerate(self.grids):
            sub = f"t{abc}n, {abc[d]}, t{abc}n -> t"
            cols.append(jnp.einsum(sub, jnp.conj(psis), jnp.asarray(g),
                                   psis).real * dvol)
        return np.asarray(jnp.stack(cols, axis=-1))

    @property
    def y(self):
        return self.grids[1] if self.grids and len(self.grids) > 1 else None


class SPON:
    """N-dimensional, ns-state split-operator propagator."""

    def __init__(self, grids: Sequence, masses=None, nstates: int = 2,
                 abc: bool = False, kernel=None, mesh=None,
                 nonherm: bool = False):
        #: nonherm: allow a FULL non-Hermitian diabatic potential matrix
        #: (complex surfaces/couplings, state-dependent decay) — the
        #: potential propagator is then built with a vmapped Padé expm
        #: instead of batched eigh (reference: pyqed/wpd.py:921 SPO2NH,
        #: which does a per-point biorthogonal eig loop)
        self.nonherm = nonherm
        #: kernel: None=XLA (measured faster at all sizes; CROSSOVER_r02) |
        #: "xla" | "pallas" — explicit opt-in selects the
        #: fused phase-multiply/potential-apply Pallas kernels for the hot
        #: Strang-splitting step (north-star kernel (b), pyqed/wpd.py:837-848)
        self.kernel = kernel
        #: mesh: jax.sharding.Mesh — shards the leading grid axis of psi
        #: (the framework's context parallelism, SURVEY.md §5.7). The FFT
        #: along the sharded axis runs as a shard_map pencil/four-step
        #: FFT with explicit all-to-all transposes (parallel/pencil_fft.py)
        #: so per-device memory and communication are O(N/d); when the
        #: grid is not divisible (pencil_supported) it falls back to the
        #: GSPMD path, which all-gathers the transform axis.
        self.mesh = mesh
        self.grids = [np.asarray(g) for g in grids]
        self.ndim = len(self.grids)
        self.shape = tuple(len(g) for g in self.grids)
        self.dxs = [float(interval(g)) for g in self.grids]
        self.dvol = float(np.prod(self.dxs))
        if masses is None:
            masses = [1.0] * self.ndim
        if np.isscalar(masses):
            masses = [float(masses)] * self.ndim
        self.masses = self.mass = masses
        self.nstates = self.ns = nstates
        self.abc = abc
        self.v = self.V = None
        self.apes = None
        self._d2a_ri = None
        self._exp_K_ri = None
        self._step_mat_ri = None
        self._exp_V_ri = None
        self._exp_V_half_ri = None
        self._built_dt = None

    # ------------------------------------------------------------- potential
    def set_dpes(self, v):
        """Set the diabatic potential-energy matrix, shape
        grid_shape + (ns, ns) (or grid_shape for a single surface)."""
        v = jnp.asarray(v)
        if self.nstates == 1 and v.shape == self.shape:
            v = v[..., None, None]
        assert v.shape == self.shape + (self.nstates, self.nstates), \
            f"dpes shape {v.shape} != {self.shape + (self.nstates, self.nstates)}"
        self.v = self.V = v
        return self

    set_DPEM = set_dpes
    set_potential = set_dpes

    def set_DPES(self, surfaces, diabatic_couplings=(), eta=None,
                 abc_center=None, abc_width=None):
        """Build the diabatic PE matrix from surfaces + couplings
        (reference: pyqed/wpd.py:444).

        With ``abc=True``, a quadratic complex absorbing potential
        −i·eta·(x − x0)² is applied on the diagonal beyond ``abc_center``
        (x0). The reference hard-codes x0 = 9.0 (pyqed/wpd.py:489); here it
        defaults to the start of the last ``abc_width`` fraction (10%) of
        the first coordinate's range so it works on any grid.
        """
        ns = self.nstates
        v = np.zeros(self.shape + (ns, ns), dtype=complex if self.abc else float)
        for a in range(ns):
            v[..., a, a] = np.asarray(surfaces[a])
        for dc in diabatic_couplings:
            a, b = dc[0][:2]
            v[..., a, b] = np.asarray(dc[1])
            v[..., b, a] = np.conj(v[..., a, b])
        if self.abc:
            if eta is None:
                raise ValueError(
                    "abc=True needs an absorbing strength: set_DPES(..., "
                    "eta=<float>, abc_center=<x0>)")
            x = self.grids[0]
            if abc_center is None:
                frac = 0.1 if abc_width is None else abc_width
                abc_center = x[-1] - frac * (x[-1] - x[0])
            X = np.meshgrid(*self.grids, indexing="ij")[0]
            cap = np.where(X > abc_center, (X - abc_center) ** 2, 0.0)
            for n in range(ns):
                v[..., n, n] = v[..., n, n] - 1j * eta * cap
        return self.set_dpes(v)

    # ----------------------------------------------------------------- build
    def build(self, dt):
        """Precompute the kinetic and potential propagator factors."""
        dt = float(dt)
        ks = [_kgrid(n, d) for n, d in zip(self.shape, self.dxs)]
        K2 = 0.0
        for axis, (k, m) in enumerate(zip(ks, self.masses)):
            shape = [1] * self.ndim
            shape[axis] = len(k)
            K2 = K2 + (k.reshape(shape) ** 2) / (2.0 * m)
        self.ks = ks
        # Complex build products are stored as (re, im) REAL device arrays
        # and combined inside traced code: the axon TPU backend cannot
        # transfer complex arrays across the host boundary, and jit
        # constant-folding of complex closure arrays needs exactly such a
        # transfer. Real closure constants embed fine.
        self._exp_K_ri = jax.jit(
            lambda k2: _ri(jnp.exp(-1j * k2 * dt)))(jnp.asarray(K2))

        if self.v is None:
            raise ValueError("The diabatic PES is not specified.")

        v = self.v
        ns = self.nstates
        npts = int(np.prod(self.shape))
        vflat = jnp.reshape(v, (npts, ns, ns))

        if self.nonherm and ns > 1:
            # general non-Hermitian blocks: exp(-i V dt) per grid point by
            # a vmapped matrix exponential — exact for arbitrary complex
            # V(x), no eigendecomposition needed
            @jax.jit
            def _vprop_nh(vflat):
                vc = vflat.astype(jnp.result_type(vflat, 1j))
                expV = jax.vmap(jax.scipy.linalg.expm)(-1j * dt * vc)
                expV2 = jax.vmap(jax.scipy.linalg.expm)(-0.5j * dt * vc)
                w = jnp.einsum("paa -> pa", vc)     # diag for bookkeeping
                u = jnp.broadcast_to(jnp.eye(ns, dtype=vc.dtype),
                                     (npts, ns, ns))
                return _ri(w), _ri(u), _ri(expV), _ri(expV2)

            w_ri, u_ri, expV_ri, expV2_ri = _vprop_nh(vflat)
            sh = self.shape + (ns, ns)
            self._exp_V_ri = tuple(jnp.reshape(a, sh) for a in expV_ri)
            self._exp_V_half_ri = tuple(jnp.reshape(a, sh)
                                        for a in expV2_ri)
            self.apes = None          # complex eigvals not tracked here
            self._d2a_ri = tuple(jnp.reshape(a, sh) for a in u_ri)
            self._built_dt = dt
            if self.kernel == "dft":
                raise NotImplementedError("kernel='dft' with nonherm")
            return self

        @jax.jit
        def _vprop(vflat):
            if ns == 1:
                w = vflat[:, 0, 0][:, None]
                u = jnp.ones((npts, 1, 1), dtype=jnp.result_type(v, 1j))
            elif jnp.iscomplexobj(vflat):
                # non-Hermitian (absorbing-boundary) diabatic blocks: the
                # CAP from set_DPES is a multiple of the identity at each
                # grid point, so exp(-i(V_h - i eta c)dt) factorizes
                # EXACTLY into the Hermitian propagator times a diagonal
                # complex phase
                vh = 0.5 * (vflat + jnp.conj(jnp.swapaxes(vflat, -1, -2)))
                cap = vflat - vh
                w, u = jnp.linalg.eigh(vh)
                capd = jnp.einsum("pii -> pi", cap) / ns
                w = w + capd  # complex shift applied per state
            else:
                w, u = jnp.linalg.eigh(vflat)  # batched over grid points
            phase = jnp.exp(-1j * w * dt)      # (npts, ns)
            phase2 = jnp.exp(-1j * w * dt / 2)
            uc = jnp.conj(jnp.swapaxes(u, -1, -2))
            expV = jnp.einsum("pab, pb, pbc -> pac", u, phase, uc)
            expV2 = jnp.einsum("pab, pb, pbc -> pac", u, phase2, uc)
            return _ri(w), _ri(u), _ri(expV), _ri(expV2)

        w_ri, u_ri, expV_ri, expV2_ri = _vprop(vflat)
        sh = self.shape + (ns, ns)
        self._exp_V_ri = tuple(jnp.reshape(a, sh) for a in expV_ri)
        self._exp_V_half_ri = tuple(jnp.reshape(a, sh) for a in expV2_ri)
        w = np.asarray(w_ri[0]) + (1j * np.asarray(w_ri[1])
                                   if bool(np.any(np.asarray(w_ri[1])))
                                   else 0.0)
        self.apes = np.reshape(w, self.shape + (ns,))
        self._d2a_ri = tuple(jnp.reshape(a, sh) for a in u_ri)
        self._built_dt = dt

        if self.kernel == "dft":
            # Fold the whole Strang step into ONE dense matrix
            #   M[(p,a),(q,c)] = sum_b expV2[p,a,b] C[p,q] expV2[q,b,c],
            #   C = F^H diag(expK) F / n  (the DFT done as a matmul).
            # For small 1D grids the per-step cost becomes a single MXU
            # matvec instead of two sub-critical-size FFTs — the TPU
            # answer to the reference's np.fft loop (pyqed/wpd.py:723).
            if self.ndim != 1:
                raise NotImplementedError("kernel='dft' is 1D-only")
            n0 = self.shape[0]
            j = jnp.arange(n0)

            @jax.jit
            def _fold(expK_ri, expV2_ri):
                F = jnp.exp(-2j * jnp.pi * jnp.outer(j, j) / n0)
                eK = expK_ri[0] + 1j * expK_ri[1]
                C = (jnp.conj(F.T) * eK[None, :]) @ F / n0
                V2 = expV2_ri[0] + 1j * expV2_ri[1]
                M = jnp.einsum("pab, pq, qbc -> paqc", V2, C, V2,
                               precision=jax.lax.Precision.HIGHEST)
                M = jnp.reshape(M, (n0 * ns, n0 * ns))
                return jnp.real(M), jnp.imag(M)

            self._step_mat_ri = _fold(self._exp_K_ri,
                                      self._exp_V_half_ri)
        return self

    # complex views (combine inside traced code or on CPU backends)
    @property
    def _exp_K(self):
        return None if self._exp_K_ri is None else _cc(self._exp_K_ri)

    @property
    def _exp_V(self):
        return None if self._exp_V_ri is None else _cc(self._exp_V_ri)

    @property
    def _exp_V_half(self):
        return (None if self._exp_V_half_ri is None
                else _cc(self._exp_V_half_ri))

    @property
    def d2a(self):
        return None if self._d2a_ri is None else _cc(self._d2a_ri)

    # ------------------------------------------------------------------ step
    def _use_pallas(self):
        if self.mesh is not None:
            return False   # GSPMD partitions the jnp ops; pallas is per-chip
        k = self.kernel
        if k is None:
            # measured crossover (benchmarks/CROSSOVER_r02.json, on-chip):
            # the XLA einsum/broadcast formulation beats the Pallas phase
            # kernels at EVERY grid size tested (4k-1M points), so plain
            # XLA is the production default; kernel='pallas' stays as the
            # explicit opt-in (parity-tested)
            return False
        return k == "pallas"

    def _keo(self, psi):
        axes = tuple(range(self.ndim))
        psik = jnp.fft.fftn(psi, axes=axes)
        if self._use_pallas():
            psik = pk.spo_phase_multiply(self._exp_K, psik)
        else:
            psik = psik * self._exp_K[..., None]
        return jnp.fft.ifftn(psik, axes=axes)

    def _peo(self, psi, half=False):
        M = self._exp_V_half if half else self._exp_V
        if self._use_pallas():
            return pk.spo_potential_apply(M, psi)
        return jnp.einsum("...ab, ...b -> ...a", M, psi)

    def _step_dft(self, psi):
        """Folded one-matmul Strang step (kernel='dft')."""
        M = _cc(self._step_mat_ri)
        out = jnp.matmul(M, jnp.reshape(psi, (-1,)),
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.reshape(out, psi.shape)

    def step(self, psi):
        """One full Strang step V/2 . K . V/2 (reference loop:
        pyqed/wpd.py:723-732)."""
        if self._step_mat_ri is not None:
            return self._step_dft(psi)
        psi = self._peo(psi, half=True)
        psi = self._keo(psi)
        psi = self._peo(psi, half=True)
        return psi

    # ------------------------------------------------------------------- run
    def run(self, psi0, dt=0.01, nt=1, e_ops=None, t0=0.0, nout=1,
            return_states=True, checkpoint=None, checkpoint_every=10,
            resume=None) -> ResultSPO:
        """``checkpoint=``: npz path written every ``checkpoint_every``
        observation windows with (psi, window index) so long propagations
        resume mid-run via ``resume=`` (SURVEY.md §5.4 — same contract as
        HEOMSolver.run; resumed trajectory == uninterrupted exactly)."""
        if psi0.shape == self.shape and self.nstates == 1:
            psi0 = psi0[..., None]
        assert psi0.shape == self.shape + (self.nstates,)
        self.build(dt)
        psi0 = jnp.asarray(psi0, dtype=jnp.result_type(psi0, 1j))

        ns_steps = nt // nout
        peo = self._peo   # fused Pallas potential apply when enabled
        keo = self._keo   # dispatches to the jacobi factorization in SPO2

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            axis = self.mesh.axis_names[0]
            spec = P(*([axis] + [None] * self.ndim))
            _shard = NamedSharding(self.mesh, spec)
            psi0 = jax.device_put(psi0, _shard)
            # distributed FFT: replace the GSPMD gather with the fused
            # pencil/four-step KEO (all-to-all, O(N/d) per device) when
            # the grid divides the mesh; jacobi-coordinate subclasses
            # route their sequential per-axis factors through the same
            # machinery (make_keo_factors_pencil)
            if self._step_mat_ri is not None:
                pass        # kernel='dft' folds the step; no KEO runs
            elif getattr(self, "coords", "linear") == "linear":
                from ..parallel.pencil_fft import make_keo_pencil
                _pk = make_keo_pencil(self.shape, self.nstates,
                                      self._exp_K_ri, self.mesh, axis)
                if _pk is not None:
                    keo = _pk
            else:
                from ..parallel.pencil_fft import make_keo_factors_pencil
                _factors = self._jacobi_factors()
                _pk = (make_keo_factors_pencil(self.shape, self.nstates,
                                               _factors, self.mesh, axis)
                       if _factors is not None else None)
                if _pk is not None:
                    keo = _pk

        def one_step(psi):
            if self.mesh is not None:
                psi = jax.lax.with_sharding_constraint(psi, _shard)
            if self._step_mat_ri is not None:
                return self._step_dft(psi)
            psi = peo(psi, half=True)
            psi = keo(psi)
            psi = peo(psi, half=True)
            return psi

        dvol = self.dvol

        def observe(psi):
            # electronic reduced density matrix; populations = diagonal
            rho = jnp.einsum("...a, ...b -> ab", psi.conj(), psi) * dvol
            return rho

        fold = (self._step_mat_ri is not None and self.mesh is None)
        if fold:
            # compose the nout fine steps once: M^nout by squaring
            # (computed OUTSIDE the evolve jit so repeated runs and the
            # scan itself only pay one HBM-bound matvec per window)
            Mk_ri = jax.jit(lambda r, i: _ri(jnp.linalg.matrix_power(
                r + 1j * i, nout)))(*self._step_mat_ri)

        def make_evolve(length):
            @jax.jit
            def evolve(psi0):
                if fold:
                    Mk = _cc(Mk_ri)

                def window(psi, _):
                    if fold:
                        psi = jnp.reshape(
                            jnp.matmul(Mk, jnp.reshape(psi, (-1,)),
                                       precision=jax.lax.Precision.HIGHEST),
                            psi.shape)
                    else:
                        def fine(i, p):
                            return one_step(p)
                        psi = jax.lax.fori_loop(0, nout, fine, psi)
                    out = (observe(psi),
                           psi if return_states else jnp.zeros((0,)))
                    return psi, out
                psi_f, (rhos, states) = jax.lax.scan(window, psi0, None,
                                                     length=length)
                return psi_f, rhos, states
            return evolve

        start_window = 0
        if resume is not None:
            from ..core.diagnostics import load_checkpoint
            start_window, (psi_r,), _meta = load_checkpoint(resume)
            for key, val in (("dt", dt), ("nout", nout)):
                saved = _meta.get(key)
                if saved is not None and abs(float(saved) - val) > 1e-15:
                    raise ValueError(
                        f"resume {key}={val} != checkpointed {key}={saved}"
                        " — the resumed trajectory would silently differ")
            if start_window > ns_steps:
                raise ValueError(
                    f"checkpoint already at window {start_window} > "
                    f"requested nt//nout = {ns_steps}")
            psi0 = jnp.asarray(psi_r)

        if checkpoint is None:
            psi_f, rhos, states = make_evolve(ns_steps - start_window)(psi0)
        else:
            from ..core.diagnostics import save_checkpoint
            every = max(1, int(checkpoint_every))
            rho_parts, state_parts = [], []
            p = psi0
            w = start_window
            ev_every = make_evolve(every)   # compiled once
            while w < ns_steps:
                chunk = min(every, ns_steps - w)
                ev = ev_every if chunk == every else make_evolve(chunk)
                p, rr, ss = ev(p)
                rho_parts.append(rr)
                state_parts.append(ss)
                w += chunk
                save_checkpoint(checkpoint, w, (p,), dt=dt, nout=nout)
            psi_f = p
            if rho_parts:
                rhos = jnp.concatenate(rho_parts, axis=0)
                states = jnp.concatenate(state_parts, axis=0)
            else:
                ns_ = self.nstates
                rhos = jnp.zeros((0, ns_, ns_), dtype=psi0.dtype)
                states = jnp.zeros((0,) + (psi0.shape if return_states
                                           else (0,)), dtype=psi0.dtype)
        rho0 = observe(psi0)
        rho_el = jnp.concatenate([rho0[None], rhos], axis=0)

        r = ResultSPO(grids=self.grids, dt=dt, nt=nt, psi0=psi0, nout=nout)
        r.times = t0 + (start_window
                        + np.arange(rhos.shape[0] + 1)) * dt * nout
        r.rho_el = rho_el
        r.population = jnp.real(jnp.einsum("taa -> ta", rho_el))
        if return_states:
            r.states = jnp.concatenate([psi0[None], states], axis=0)
        r.psi = psi_f
        return r

    # ----------------------------------------------------------- observables
    def population(self, psi, representation="diabatic"):
        """Electronic populations (reference: pyqed/wpd.py:627)."""
        if isinstance(psi, list):
            psi = jnp.stack(psi)
            return np.asarray(jax.vmap(
                lambda p: self.population(p, representation))(psi))
        if representation == "adiabatic":
            psi = jnp.einsum("...ab, ...b -> ...a", self.d2a, psi)
        elif representation != "diabatic":
            raise ValueError("representation must be diabatic or adiabatic")
        axes = tuple(range(self.ndim))
        return jnp.sum(jnp.abs(psi) ** 2, axis=axes) * self.dvol

    def rdm_el(self, psi):
        """Reduced electronic density matrix (reference: pyqed/wpd.py:760)."""
        if isinstance(psi, list):
            return [self.rdm_el(p) for p in psi]
        return jnp.einsum("...a, ...b -> ab", jnp.conj(psi), psi) * self.dvol

    def norm(self, psi):
        return jnp.sum(jnp.abs(psi) ** 2) * self.dvol

    def position_expectation(self, psi, axis=0):
        X = jnp.asarray(np.meshgrid(*self.grids, indexing="ij")[axis])
        return jnp.sum(X[..., None] * jnp.abs(psi) ** 2) * self.dvol

    def current_density(self, psi, state_id=0):
        """Probability-current vector field of one electronic component,
        j_d = Im(chi* d_d chi)/m_d, via spectral (FFT) derivatives
        (reference: pyqed/wpd.py:796 ``SPO2.current_density`` — a
        finite-difference quiver PLOT there; the physical current is
        computed and returned here).

        Returns a list of ndim arrays, each with the grid shape.
        """
        chi = jnp.asarray(psi)[..., state_id]
        js = []
        for d in range(self.ndim):
            n = chi.shape[d]
            k = 2 * np.pi * jnp.fft.fftfreq(n, d=self.dxs[d])
            shape = [1] * self.ndim
            shape[d] = n
            dchi = jnp.fft.ifft(1j * k.reshape(shape)
                                * jnp.fft.fft(chi, axis=d), axis=d)
            js.append(jnp.imag(jnp.conj(chi) * dchi) / self.masses[d])
        return js


class SPO(SPON):
    """1D single- or multi-surface SPO (reference: pyqed/wpd.py:191)."""

    def __init__(self, x, mass=1.0, nstates=1, abc=False, kernel=None,
                 mesh=None):
        super().__init__([x], masses=[mass], nstates=nstates, abc=abc,
                         kernel=kernel, mesh=mesh)
        self.x = np.asarray(x)

    def set_potential(self, potential):
        """Accepts a callable V(x) (reference: pyqed/wpd.py:213) or array."""
        if callable(potential):
            v = potential(self.x)
        else:
            v = potential
        return self.set_dpes(jnp.asarray(v))


class SPO2(SPON):
    """2D nonadiabatic SPO (reference: pyqed/wpd.py:379).

    coords='jacobi' treats y as an angle with x-dependent inertia:
    K = p_x^2/(2 mu) + p_y^2 / (2 I(x)), factorized
    e^{-iK dt} ~ e^{-iK_x dt} e^{-iK_y dt} (reference: pyqed/wpd.py:850
    ``_KEO_jacobi``); masses = [mu, I(x) callable].
    """

    def __init__(self, x, y, mass=None, masses=None, nstates=2, coords="linear",
                 G=None, abc=False, kernel=None, mesh=None, nonherm=False):
        masses = masses if masses is not None else mass
        self.coords = coords
        if coords == "jacobi":
            mu, inertia = masses
            super().__init__([x, y], masses=[mu, 1.0], nstates=nstates,
                             abc=abc, kernel=kernel, mesh=mesh,
                             nonherm=nonherm)
            self._inertia = inertia
        elif coords == "linear":
            super().__init__([x, y], masses=masses, nstates=nstates, abc=abc,
                             kernel=kernel, mesh=mesh, nonherm=nonherm)
        else:
            raise ValueError(f"unknown coords {coords!r}")
        self.x, self.y = np.asarray(x), np.asarray(y)
        self.X, self.Y = np.meshgrid(x, y, indexing="ij")

    def build(self, dt):
        super().build(dt)
        if self.coords == "jacobi":
            kx, ky = self.ks
            mu = self.masses[0]
            Iinv = 1.0 / np.asarray(self._inertia(self.x))   # (nx,)
            self._exp_Kx_ri = jax.jit(
                lambda a: _ri(jnp.exp(-1j * a / (2 * mu) * dt)))(
                    jnp.asarray(kx ** 2))
            self._exp_Ky_ri = jax.jit(
                lambda a: _ri(jnp.exp(-1j * a * dt)))(
                    jnp.asarray(np.outer(Iinv, ky ** 2 / 2.0)))
        return self

    def _keo(self, psi):
        if self.coords == "linear":
            return super()._keo(psi)
        # jacobi: sequential 1D factors (reference: pyqed/wpd.py:850)
        psik = jnp.fft.fft(psi, axis=0)
        psik = psik * _cc(self._exp_Kx_ri)[:, None, None]
        psi = jnp.fft.ifft(psik, axis=0)
        psik = jnp.fft.fft(psi, axis=1)
        psik = psik * _cc(self._exp_Ky_ri)[:, :, None]
        return jnp.fft.ifft(psik, axis=1)

    def _jacobi_factors(self):
        """(axis, phase_ri) factor list for the mesh pencil KEO."""
        return [(0, self._exp_Kx_ri), (1, self._exp_Ky_ri)]


class SPO2NH(SPO2):
    """Non-Hermitian 2D SPO: complex diabatic potential matrices
    (reference: pyqed/wpd.py:921 ``SPO2NH`` — per-point biorthogonal eig
    loop; here a vmapped Padé ``expm`` builds the exact non-unitary
    potential propagator and the FFT kinetic step is unchanged)."""

    def __init__(self, x, y, *args, **kwargs):
        kwargs["nonherm"] = True
        super().__init__(x, y, *args, **kwargs)

    def norm(self, psi):
        """Decaying norm integral |psi|^2 dV."""
        return float(jnp.sum(jnp.abs(psi) ** 2) * self.dvol)


class SPO3(SPON):
    """3D nonadiabatic SPO (reference: pyqed/wpd.py:1105).

    ``coords="jacobi"``: triatomic Jacobi coordinates (r, R, theta) for
    total angular momentum J=0 — the case the reference's SPO3 declares
    (pyqed/wpd.py:1124,1264) but leaves half-built (it never constructs
    the angular kinetic factor). The KEO used here is the standard

        T = p_r^2/(2 mu1) + p_R^2/(2 mu2)
            + [1/(2 mu1 r^2) + 1/(2 mu2 R^2)] p_theta^2

    with ``masses=(mu1, mu2)`` and the third grid = theta. Every term is
    diagonal after a 1D FFT along its own axis (the angular phase depends
    on the (r, R) grid point but not on the conjugate variable), so the
    kinetic propagator is three sequential FFT-diagonal factors — each one
    an XLA batched FFT + broadcast phase multiply on TPU.
    """

    def __init__(self, x, y, z, masses=None, nstates=2, coords="linear",
                 G=None, abc=False, kernel=None, mesh=None):
        if coords not in ("linear", "jacobi"):
            raise ValueError(f"unknown coords {coords!r}")
        self.coords = coords
        if coords == "jacobi":
            if masses is None or np.isscalar(masses) or len(masses) < 2:
                raise ValueError("jacobi coords need masses=(mu1, mu2)")
            mu1, mu2 = float(masses[0]), float(masses[1])
            super().__init__([x, y, z], masses=[mu1, mu2, 1.0],
                             nstates=nstates, abc=abc, kernel=kernel,
                             mesh=mesh)
            self._mu12 = (mu1, mu2)
        else:
            super().__init__([x, y, z], masses=masses, nstates=nstates,
                             abc=abc, kernel=kernel, mesh=mesh)
        self.x, self.y, self.z = np.asarray(x), np.asarray(y), np.asarray(z)
        self.X, self.Y, self.Z = np.meshgrid(x, y, z, indexing="ij")

    def build(self, dt):
        super().build(dt)
        if self.coords == "jacobi":
            mu1, mu2 = self._mu12
            kx = _kgrid(self.shape[0], self.dxs[0])
            ky = _kgrid(self.shape[1], self.dxs[1])
            kz = _kgrid(self.shape[2], self.dxs[2])
            self.ks = [kx, ky, kz]
            binv = (1.0 / (2.0 * mu1 * self.x ** 2)[:, None]
                    + 1.0 / (2.0 * mu2 * self.y ** 2)[None, :])  # (nx, ny)
            self._exp_Kx_ri = jax.jit(
                lambda a: _ri(jnp.exp(-1j * a / (2 * mu1) * dt)))(
                    jnp.asarray(kx ** 2))
            self._exp_Ky_ri = jax.jit(
                lambda a: _ri(jnp.exp(-1j * a / (2 * mu2) * dt)))(
                    jnp.asarray(ky ** 2))
            self._exp_Kz_ri = jax.jit(
                lambda a: _ri(jnp.exp(-1j * a * dt)))(
                    jnp.asarray(binv[:, :, None] * (kz ** 2)[None, None, :]))
        return self

    def _keo(self, psi):
        if self.coords == "linear":
            return super()._keo(psi)
        # jacobi: three sequential FFT-diagonal factors (see class docstring)
        psik = jnp.fft.fft(psi, axis=0)
        psik = psik * _cc(self._exp_Kx_ri)[:, None, None, None]
        psi = jnp.fft.ifft(psik, axis=0)
        psik = jnp.fft.fft(psi, axis=1)
        psik = psik * _cc(self._exp_Ky_ri)[None, :, None, None]
        psi = jnp.fft.ifft(psik, axis=1)
        psik = jnp.fft.fft(psi, axis=2)
        psik = psik * _cc(self._exp_Kz_ri)[:, :, :, None]
        return jnp.fft.ifft(psik, axis=2)

    def _jacobi_factors(self):
        """(axis, phase_ri) factor list for the mesh pencil KEO."""
        return [(0, self._exp_Kx_ri), (1, self._exp_Ky_ri),
                (2, self._exp_Kz_ri)]

ResultSPO2 = ResultSPO      # reference drop-in name (pyqed/spo.py)
