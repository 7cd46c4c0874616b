"""Hierarchical equations of motion (HEOM).

TPU-native unification of the reference's three HEOM implementations
(reference: pyqed/oqs.py — ``HEOMSolver:1332``, ``_heom:1808`` high-T Drude
single-exponential; pyqed/HEOM/heom.py — ``HEOMSolver:161`` Matsubara
multi-exponential with number-state enumeration ``state_number_enumerate:40``;
pyqed/heom/deom.py — hash-indexed hierarchy walk ``hash_plus/minus:589``).

Equation (unscaled ADOs, standard convention):

  d rho_n/dt = -i[H, rho_n] - (n . nu) rho_n
               - i sum_m [Q_m, rho_{n+e_m}]
               - i sum_m n_m (c_m Q_m rho_{n-e_m} - c_m^* rho_{n-e_m} Q_m)

(The reference's high-T variant pyqed/oqs.py:1856-1873 propagates ADOs
rescaled by i^n; its rho_0 is identical.)

TPU design (SURVEY.md §3.3): the combinatorial hierarchy is flattened at
setup time into one ``(nado, n, n)`` stacked tensor plus static
gather-index maps ``plus_idx``/``minus_idx`` (replacing the reference's
njit hash walk) so the whole RHS is a handful of batched einsums on the MXU
under ``lax.scan`` — no per-ADO Python loop.
"""
from __future__ import annotations

import itertools
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.linalg import dag
from ..core.result import Result
from .bath import DrudeBath
from ..ops import pallas_kernels as pk


def enumerate_hierarchy(nmodes: int, lmax: int):
    """All occupation vectors n with sum(n) <= lmax, graded by level
    (reference: pyqed/HEOM/heom.py:40 ``state_number_enumerate``).

    Returns (keys (nado, nmodes) int array, index dict).
    """
    keys = []
    for level in range(lmax + 1):
        # weak compositions of `level` into nmodes parts
        for comb in itertools.combinations_with_replacement(range(nmodes), level):
            n = [0] * nmodes
            for c in comb:
                n[c] += 1
            keys.append(tuple(n))
    # dedupe preserving order (combinations_with_replacement is unique)
    index = {k: i for i, k in enumerate(keys)}
    return np.array(keys, dtype=np.int32), index


def neighbor_maps(keys, index):
    """Static gather maps: plus_idx[N, m] = index of n+e_m (or nado if
    outside the hierarchy), minus_idx likewise for n-e_m."""
    nado, nmodes = keys.shape
    plus_idx = np.full((nado, nmodes), nado, dtype=np.int32)
    minus_idx = np.full((nado, nmodes), nado, dtype=np.int32)
    for N in range(nado):
        n = keys[N]
        for m in range(nmodes):
            up = tuple(np.asarray(n) + np.eye(nmodes, dtype=np.int32)[m])
            dn = tuple(np.asarray(n) - np.eye(nmodes, dtype=np.int32)[m])
            if up in index:
                plus_idx[N, m] = index[up]
            if n[m] > 0 and dn in index:
                minus_idx[N, m] = index[dn]
    return plus_idx, minus_idx


class HEOMSolver:
    """General multi-exponential HEOM solver.

    Parameters
    ----------
    H : (n, n) system Hamiltonian
    bath : either a :class:`DrudeBath` (with ``decomposition`` choosing
        'matsubara'/'pade' and ``nexp`` terms) or an explicit list of
        (Q, c, nu) tuples per bath: coupling operator Q, exponential
        coefficients c_k and rates nu_k.
    lmax : hierarchy depth (max total occupation).
    """

    def __init__(self, H, bath=None, c_ops=None, e_ops=None, lmax: int = 4,
                 decomposition="matsubara", nexp: int = 1, kernel=None,
                 mesh=None):
        self.H = jnp.asarray(H)
        self._H_np = np.asarray(H)   # host copy: kernel factories need
        # numpy operands, and axon cannot transfer complex device->host
        self.n = H.shape[-1]
        self.e_ops = e_ops
        self.c_ops = c_ops  # reference-style: bath coupling ops
        self.lmax = lmax
        self.decomposition = decomposition
        self.nexp = nexp
        self.kernel = kernel    # None=auto | 'einsum' | 'matmul' | 'pallas'
        self.mesh = mesh        # jax.sharding.Mesh for ADO-axis sharding
        self._modes = None  # list of (Q, c, nu) flattened over baths/terms
        self._evolve_cache = {}  # compiled evolve programs across run()s
        if bath is not None:
            self.set_bath(bath)

    def set_bath(self, bath):
        if isinstance(bath, (list, tuple)):
            modes = []
            for entry in bath:
                if len(entry) == 2 and hasattr(entry[1], "matsubara"):
                    # (Q, DrudeBath-like) pair: decompose per solver
                    # settings — lets each site carry its own bath
                    Q, b = entry
                    if self.decomposition == "pade":
                        cs, nus = b.pade(self.nexp)
                    else:
                        cs, nus = b.matsubara(self.nexp)
                else:
                    Q, cs, nus = entry
                for c, nu in zip(np.atleast_1d(cs), np.atleast_1d(nus)):
                    # nu kept complex: underdamped/Prony decompositions
                    # (open/bath.py prony_decomposition) carry oscillatory
                    # complex rates, like DEOMBath.expn
                    modes.append((np.asarray(Q), complex(c), complex(nu)))
            self._modes = modes
        elif isinstance(bath, DrudeBath):
            if bath.bath_ops is None and self.c_ops is None:
                raise ValueError("bath needs bath_ops (coupling operators)")
            ops = bath.bath_ops if bath.bath_ops is not None else self.c_ops
            if self.decomposition == "pade":
                c, nu = bath.pade(self.nexp)
            else:
                c, nu = bath.matsubara(self.nexp)
            modes = []
            for Q in ops:
                for ck, nuk in zip(c, nu):
                    modes.append((np.asarray(Q), complex(ck), complex(nuk)))
            self._modes = modes
        else:
            raise TypeError("bath must be DrudeBath or list of (Q, c, nu)")
        self._evolve_cache = {}   # hierarchy changed: compiled programs stale
        return self

    # ------------------------------------------------------------ setup
    def _build(self, dtype):
        """HOST-side (numpy) hierarchy operands: numpy constants embed
        into jitted executables for free, while device arrays would need
        a device->host round trip in the kernel factories — which the
        axon TPU backend cannot do for complex dtypes."""
        modes = self._modes
        M = len(modes)
        keys, index = enumerate_hierarchy(M, self.lmax)
        plus_idx, minus_idx = neighbor_maps(keys, index)
        npdt = np.dtype(jnp.dtype(dtype).name)
        Q = np.stack([np.asarray(m[0]).astype(npdt) for m in modes])
        c = np.asarray([m[1] for m in modes], dtype=npdt)            # (M,)
        nus = np.array([m[2] for m in modes])
        rdtype = (np.float64 if jnp.dtype(dtype) == jnp.complex128
                  else np.float32)
        # complex rates (underdamped/Prony baths) keep their imaginary part
        nu = (nus.astype(npdt) if np.any(nus.imag != 0)
              else nus.real.astype(rdtype))
        return (np.asarray(keys), np.asarray(plus_idx),
                np.asarray(minus_idx), Q, c, nu)

    def rhs_fn(self, dtype, kernel=None):
        """Build the hierarchy RHS closure ados (nado,n,n) -> d ados/dt.

        kernel: 'einsum' (batched einsums over gathered neighbors),
        'matmul' (stacked-superoperator single matmul,
        pallas_kernels.heom_rhs_reference), 'pallas' (level-blocked
        Pallas MXU kernel), 'levels' / 'levels-fast' (order-aware
        mode-folded pure-XLA level-blocked RHS,
        pallas_kernels.heom_rhs_levels_xla_factory — the fastest
        measured TPU path: ~4x the stacked matmul at the flagship shape
        and ~3.3x at nado=1771, BENCH_r03), 'rowcol' (site-projector
        row/column gathers — wins on CPU-class gather machines, LOSES
        on TPU where the row/col gathers dominate), or None = auto
        (TPU: levels when the bath rates are real, else matmul; einsum
        elsewhere).
        """
        if kernel is None:
            kernel = self.kernel if getattr(self, "kernel", None) else None

        keys, plus_idx, minus_idx, Q, c, nu = self._build(dtype)
        npdt = np.dtype(jnp.dtype(dtype).name)
        H = self._H_np.astype(npdt)
        damp = (keys @ nu[:, None])[:, 0]        # (nado,) numpy
        nado, M = keys.shape
        n = self.n

        if kernel is None:
            if pk.default_backend_is_tpu():
                # the levels kernel folds damping as (keys @ nu).real —
                # complex rates (underdamped/Prony baths) need the
                # complex-damp matmul path
                kernel = "matmul" if np.iscomplexobj(nu) else "levels"
            else:
                kernel = "einsum"

        if kernel in ("levels", "levels-fast"):
            rdt = np.float64 if dtype == jnp.complex128 else np.float32
            lev_rhs, _, _, nado_pad = pk.heom_rhs_levels_xla_factory(
                self._H_np, Q, c, nu, keys, plus_idx, minus_idx,
                fast=kernel.endswith("fast"), dtype=rdt)
            sizes, offs, pad_sizes, pad_offs, _, _ = \
                pk.heom_level_structure(keys)
            V = n * n
            Vp = lev_rhs.Vp
            L = len(sizes) - 1

            def _embed(plane):
                # compact -> padded level layout via static slice/pad/
                # concat (a per-row scatter costs more than the RHS —
                # measured 10x step slowdown, see __graft_entry__)
                flat = jnp.pad(plane.reshape(nado, V),
                               ((0, 0), (0, Vp - V)))
                segs = []
                for lv in range(L + 1):
                    seg = flat[offs[lv]:offs[lv] + sizes[lv]]
                    segs.append(jnp.pad(
                        seg, ((0, pad_sizes[lv] - sizes[lv]), (0, 0))))
                return jnp.concatenate(segs)

            def _extract(fpad):
                segs = [fpad[pad_offs[lv]:pad_offs[lv] + sizes[lv]]
                        for lv in range(L + 1)]
                return jnp.concatenate(segs)[:, :V]

            def rhs(ados):
                fr = _embed(jnp.real(ados).astype(rdt))
                fi = _embed(jnp.imag(ados).astype(rdt))
                gr, gi = lev_rhs(fr, fi)
                out = (_extract(gr) + 1j * _extract(gi)).astype(dtype)
                return out.reshape(nado, n, n)

            return rhs, nado

        if kernel == "rowcol":
            rdt = np.float64 if dtype == jnp.complex128 else np.float32
            rhs = pk.heom_rhs_rowcol_factory(
                H, Q, c, nu, keys, plus_idx, minus_idx, dtype=rdt)
            return rhs, nado

        if kernel in ("matmul", "pallas"):
            return self._rhs_matmul(dtype, kernel, keys, plus_idx,
                                    minus_idx, Q, c, damp, H), nado

        # fused neighbor formulation (measured +43% on TPU vs separate
        # plus/minus einsums): one gather over [plus; minus] indices and
        # complex left/right weights (all numpy: embedded as jit
        # constants, no per-call device sync)
        all_idx = np.concatenate([plus_idx, minus_idx], axis=1)   # (N, 2M)
        Q2 = np.concatenate([Q, Q], axis=0)                       # (2M, n, n)
        ones = np.ones(keys.shape, dtype=npdt)
        wl = np.concatenate([ones, keys.astype(npdt) * c[None, :]], axis=1)
        wr = np.concatenate([ones, keys.astype(npdt) * np.conj(c)[None, :]],
                            axis=1)

        def rhs(ados):
            # ados: (nado, n, n)
            padded = jnp.concatenate(
                [ados, jnp.zeros((1, n, n), dtype=ados.dtype)], axis=0)
            out = -1j * (H @ ados - ados @ H)
            out = out - damp[:, None, None] * ados
            g = padded[all_idx]                   # (nado, 2M, n, n)
            gl = wl[:, :, None, None] * g
            gr = wr[:, :, None, None] * g
            out = out - 1j * (jnp.einsum("kab, Nkbc -> Nac", Q2, gl)
                              - jnp.einsum("Nkab, kbc -> Nac", gr, Q2))
            return out

        return rhs, nado

    def _rhs_matmul(self, dtype, kernel, keys, plus_idx, minus_idx,
                    Q, c, damp, H):
        """Stacked-superoperator RHS: one (V, (2M+1)V) @ ((2M+1)V, nado)
        contraction per evaluation (see pallas_kernels module docstring)."""
        nado, M = keys.shape
        n = self.n
        V = n * n
        npdt = np.dtype(jnp.dtype(dtype).name)
        B = pk.heom_superop_matrix(H, Q, c).astype(npdt)
        all_idx = np.concatenate([plus_idx, minus_idx], axis=1)    # (N, 2M)
        # real occupation weights: 1 for plus, n_m for minus neighbors
        wocc = np.concatenate(
            [np.ones_like(keys), keys], axis=1).astype(
                np.float64 if dtype == jnp.complex128 else np.float32)
        if np.iscomplexobj(damp) and kernel == "pallas":
            # the Pallas levels kernel takes real damping rates; complex
            # rates (underdamped baths) route through the jnp contraction
            kernel = "matmul"
        if not np.iscomplexobj(damp):
            damp = damp.astype(wocc.dtype)

        if kernel == "pallas":
            # gather-free level-blocked Pallas kernel (the production
            # TPU path; interpreted at f64 off-TPU so CPU tests exercise
            # the same code)
            interpret = not pk.default_backend_is_tpu()
            rdt = (np.float64 if dtype == jnp.complex128 else np.float32)
            lev_rhs, _, _, nado_pad = pk.heom_rhs_levels_factory(
                self._H_np, Q, c, np.asarray(damp, dtype=rdt),
                keys, plus_idx, minus_idx, interpret=interpret,
                dtype=rdt, nu_is_damp=True)
            perm = pk.heom_level_structure(keys)[5]
            Vp = lev_rhs.Vp
            cols = np.arange(V)

            def rhs(ados):
                flat = ados.reshape(nado, V)
                fr = jnp.zeros((nado_pad, Vp), rdt).at[perm[:, None],
                                                       cols[None, :]].set(
                    jnp.real(flat).astype(rdt))
                fi = jnp.zeros((nado_pad, Vp), rdt).at[perm[:, None],
                                                       cols[None, :]].set(
                    jnp.imag(flat).astype(rdt))
                gr, gi = lev_rhs(fr, fi)
                out = (gr[perm][:, :V] + 1j * gi[perm][:, :V]).astype(dtype)
                return out.reshape(nado, n, n)

            return rhs

        B0 = B[:, :V]
        Bk = B[:, V:].reshape(V, 2 * M, V)

        def rhs(ados):
            flat = ados.reshape(nado, V)
            padded = jnp.concatenate(
                [flat, jnp.zeros((1, V), dtype=flat.dtype)], axis=0)
            g = padded[all_idx] * wocc[:, :, None]     # (nado, 2M, V)
            # 'matmul': the no-transpose dot formulation (no (KV, nado)
            # relayout of the gathered stack)
            out = pk.heom_rhs_dot(B0, Bk, damp, flat, g)
            return out.reshape(nado, n, n)

        return rhs

    # ------------------------------------------------------------ run
    def run(self, rho0, dt, nt, e_ops=None, nout=1, method="rk4",
            store_ados=False, mesh=None, kernel=None, checkpoint=None,
            checkpoint_every=10, resume=None, edip=None, pulse=None,
            t0=0.0) -> Result:
        """Propagate the hierarchy. ``edip``/``pulse`` switch on DRIVEN
        dissipative dynamics: H(t) = H + edip * pulse(t) (reference:
        pyqed/heom/deom.py:676 ``generate_time`` — its optional
        time-dependent system-BATH coupling ``coupling_dip`` is not
        supported; the system drive is). ``pulse`` must be a
        jax-traceable scalar function of time (e.g. ``Pulse.efield``);
        the drive enters every ADO as the batched commutator
        -i E(t) [mu, ado]."""
        if e_ops is None:
            e_ops = self.e_ops or []
        if mesh is None:
            mesh = self.mesh
        # padded-representation fast path: the levels kernel wins on TPU
        # only when the WHOLE propagation stays in its padded real
        # (fr, fi) layout — wrapping it per-RHS-call behind the compact
        # complex state loses the win to embed/extract traffic (measured
        # 1432 vs 2475 steps/s at the flagship shape; in-representation:
        # ~6900). Undriven, unsharded, uncheckpointed runs qualify.
        if (mesh is None and edip is None and checkpoint is None
                and resume is None):
            k_req = kernel if kernel is not None else self.kernel
            lev = k_req if k_req in ("levels", "levels-fast") else None
            if lev is None and k_req is None and pk.default_backend_is_tpu():
                nus = np.array([m[2] for m in self._modes])
                if not np.any(nus.imag != 0):
                    lev = "levels"
            if lev is not None:
                return self._run_levels(rho0, dt, nt, e_ops=e_ops,
                                        nout=nout, method=method,
                                        store_ados=store_ados,
                                        kernel=lev, t0=t0)
        rho0 = jnp.asarray(rho0)
        dtype = jnp.result_type(rho0, self.H, 1j)
        if mesh is not None and kernel is None and self.kernel is None:
            # the sharded path partitions jnp ops via GSPMD; the pallas
            # kernel is single-device (it runs per-shard under shard_map
            # in parallel/sharded_heom)
            kernel = "matmul"
        rhs, nado = self.rhs_fn(dtype, kernel=kernel)
        n = self.n

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            axis = mesh.axis_names[0]
            _shard = NamedSharding(mesh, P(axis, None, None))

            base_rhs = rhs

            def rhs(ados):
                ados = jax.lax.with_sharding_constraint(ados, _shard)
                out = base_rhs(ados)
                return jax.lax.with_sharding_constraint(out, _shard)

        ados0 = jnp.zeros((nado, n, n), dtype=dtype).at[0].set(rho0.astype(dtype))
        # (no device_put here: with_sharding_constraint inside jit handles
        # ADO counts that are not divisible by the mesh size)
        # numpy, not jnp: a complex DEVICE array captured as a jit
        # constant is lowered via a device->host copy, which the axon
        # TPU backend cannot do for complex dtypes
        npdt = np.dtype(jnp.dtype(dtype).name)
        eops = np.stack([np.asarray(e).astype(npdt) for e in e_ops]) \
            if e_ops else None

        ns_steps = nt // nout

        def obs_of(ados):
            if eops is None:
                return jnp.zeros((0,), dtype=dtype)
            return jnp.einsum("kij, ji -> k", eops, ados[0])

        if edip is not None:
            if pulse is None:
                raise ValueError("edip given without pulse")
            mu = np.asarray(edip).astype(npdt)
            base_rhs_t = rhs

            def rhs_t(y, t):
                E = pulse(t)
                drive = (-1j * E) * (jnp.einsum("ij, ajk -> aik", mu, y)
                                     - jnp.einsum("aij, jk -> aik", y, mu))
                return base_rhs_t(y) + drive
        else:
            def rhs_t(y, t):
                return rhs(y)

        if method == "rk4":
            def stepper(y, t):
                k1 = rhs_t(y, t)
                k2 = rhs_t(y + k1 * (dt / 2), t + dt / 2)
                k3 = rhs_t(y + k2 * (dt / 2), t + dt / 2)
                k4 = rhs_t(y + k3 * dt, t + dt)
                return y + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
        elif method == "euler":
            def stepper(y, t):
                return y + dt * rhs_t(y, t)
        else:
            raise ValueError(method)

        # compiled-program cache across run() calls: make_evolve builds a
        # NEW closure every call, so plain jax.jit re-traces and
        # re-compiles identical programs (~seconds) on every invocation —
        # painful for parameter scans that call run() repeatedly. Keyed
        # by everything the traced program depends on; skipped for
        # driven/sharded runs (pulse closures and meshes are not
        # reliably hashable), and invalidated by set_bath.
        cacheable = (mesh is None and edip is None)
        cache = getattr(self, "_evolve_cache", None)
        if cache is None:
            cache = self._evolve_cache = {}

        def make_evolve(length):
            ck = (length, nout, method, str(dtype), kernel, store_ados,
                  float(dt), float(t0), self.lmax,
                  None if eops is None else eops.tobytes(),
                  # rhs fingerprint: the cached closure binds the OLD rhs,
                  # valid only while the physics operands are unchanged
                  self._H_np.tobytes(),
                  tuple((np.asarray(Q).tobytes(), c, nu)
                        for Q, c, nu in self._modes))
            if cacheable and ck in cache:
                return cache[ck]

            @jax.jit
            def evolve(a0, w0):
                # w0: traced window offset (array, so chunked/resumed
                # calls reuse the same compilation) — drives the absolute
                # time seen by pulse(t)
                def window(ados, widx):
                    def fine(i, a):
                        t = t0 + (widx * nout + i) * dt
                        return stepper(a, t)
                    ados = jax.lax.fori_loop(0, nout, fine, ados)
                    out = (obs_of(ados),
                           ados[0] if not store_ados else ados)
                    return ados, out
                return jax.lax.scan(window, a0,
                                    w0 + jnp.arange(length))
            if cacheable:
                cache[ck] = evolve
            return evolve

        start_window = 0
        if resume is not None:
            from ..core.diagnostics import load_checkpoint
            start_window, (ados0,), meta = load_checkpoint(resume)

        if checkpoint is None:
            ados_f, (obs, rhos) = make_evolve(
                ns_steps - start_window)(ados0,
                                         jnp.asarray(start_window))
        else:
            # chunked propagation with mid-run ADO-stack checkpoints
            # (SURVEY.md §5.4; round-1 VERDICT row 57)
            from ..core.diagnostics import save_checkpoint
            every = max(1, int(checkpoint_every))
            obs_parts, rho_parts = [], []
            a = ados0
            w = start_window
            ev_every = make_evolve(every)   # compiled once
            while w < ns_steps:
                chunk = min(every, ns_steps - w)
                ev = ev_every if chunk == every else make_evolve(chunk)
                a, (o, r) = ev(a, jnp.asarray(w))
                obs_parts.append(o)
                rho_parts.append(r)
                w += chunk
                save_checkpoint(checkpoint, w, (a,), dt=dt, nout=nout)
            ados_f = a
            obs = jnp.concatenate(obs_parts, axis=0)
            rhos = jnp.concatenate(rho_parts, axis=0)
        observables = jnp.concatenate([obs_of(ados0)[None], obs], axis=0)

        times = (start_window + jnp.arange(obs.shape[0] + 1)) * dt * nout
        res = Result(times=times,
                     observables=observables if e_ops else None,
                     dt=dt, nt=nt, nout=nout)
        res.rho0 = rho0
        res.rho = ados_f[0]
        res.ado = ados_f
        first = ados0 if store_ados else ados0[0]
        res.states = jnp.concatenate([first[None], rhos], axis=0)
        return res

    def _run_levels(self, rho0, dt, nt, e_ops, nout, method, store_ados,
                    kernel, t0):
        """Propagate ENTIRELY in the levels kernel's padded real
        representation (pallas_kernels.heom_rhs_levels_xla_factory):
        embed once, scan in (fr, fi), read observables off the root row
        on-device, extract once at the end. All device I/O is real, so
        this path is also axon-safe (no complex device->host copies).
        Reference semantics: pyqed/heom/deom.py:725 ``rk4`` over
        ``rem_cal``; dispatched from :meth:`run`."""
        rho0 = np.asarray(rho0)
        dtype = jnp.result_type(rho0, self._H_np, 1j)
        npdt = np.dtype(jnp.dtype(dtype).name)
        rdt = np.float64 if dtype == jnp.complex128 else np.float32
        keys, plus_idx, minus_idx, Q, c, nu = self._build(dtype)
        nado, M = keys.shape
        n = self.n
        V = n * n
        rhs_lv, embed, extract, nado_pad = pk.heom_rhs_levels_xla_factory(
            self._H_np, Q, c, nu, keys, plus_idx, minus_idx,
            fast=kernel.endswith("fast"), dtype=rdt)
        sizes, offs, pad_sizes, pad_offs, _, _ = \
            pk.heom_level_structure(keys)
        Vp = rhs_lv.Vp
        L = len(sizes) - 1

        ados0 = np.zeros((nado, n, n), npdt)
        ados0[0] = rho0.astype(npdt)
        fr0, fi0 = embed(ados0)

        # tr(E rho) = sum_ij E_ij rho_ji = E.T.flat . rho.flat
        if e_ops:
            eo = np.stack([np.asarray(e).T.reshape(V) for e in e_ops])
            ef = np.zeros((len(e_ops), Vp), complex)
            ef[:, :V] = eo
            er = np.ascontiguousarray(ef.real.astype(rdt))
            ei = np.ascontiguousarray(ef.imag.astype(rdt))

        def obs_of(fr, fi):
            if not e_ops:
                return jnp.zeros((0,), dtype)
            rr, ri = fr[0], fi[0]              # root ADO = padded row 0
            return jax.lax.complex(
                er @ rr - ei @ ri, er @ ri + ei @ rr).astype(dtype)

        def extract_dev(fr, fi):
            # padded -> compact complex, as static slices (traced)
            segs = [jnp.concatenate(
                [f[pad_offs[lv]:pad_offs[lv] + sizes[lv]]
                 for lv in range(L + 1)])[:, :V] for f in (fr, fi)]
            return (segs[0] + 1j * segs[1]).astype(dtype).reshape(
                nado, n, n)

        def rho_of(fr, fi):
            if store_ados:
                return extract_dev(fr, fi)
            return (fr[0, :V] + 1j * fi[0, :V]).astype(dtype).reshape(n, n)

        if method == "rk4":
            def stepper(y, t):
                fr, fi = y
                k1 = rhs_lv(fr, fi)
                k2 = rhs_lv(fr + dt / 2 * k1[0], fi + dt / 2 * k1[1])
                k3 = rhs_lv(fr + dt / 2 * k2[0], fi + dt / 2 * k2[1])
                k4 = rhs_lv(fr + dt * k3[0], fi + dt * k3[1])
                return (fr + dt / 6 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0]),
                        fi + dt / 6 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1]))
        elif method == "euler":
            def stepper(y, t):
                g = rhs_lv(*y)
                return (y[0] + dt * g[0], y[1] + dt * g[1])
        else:
            raise ValueError(method)

        ns_steps = nt // nout
        cache = getattr(self, "_evolve_cache", None)
        if cache is None:
            cache = self._evolve_cache = {}
        ck = ("levels-padded", kernel, ns_steps, nout, method, str(dtype),
              store_ados, float(dt), float(t0), self.lmax,
              tuple(np.asarray(e).tobytes() for e in e_ops),
              self._H_np.tobytes(),
              tuple((np.asarray(Qm).tobytes(), cm, num)
                    for Qm, cm, num in self._modes))
        if ck in cache:
            evolve = cache[ck]
        else:
            @jax.jit
            def evolve(fr, fi):
                def window(y, widx):
                    def fine(i, yy):
                        return stepper(yy, t0 + (widx * nout + i) * dt)
                    y = jax.lax.fori_loop(0, nout, fine, y)
                    return y, (obs_of(*y), rho_of(*y))
                return jax.lax.scan(window, (fr, fi),
                                    jnp.arange(ns_steps))
            cache[ck] = evolve

        (fr_f, fi_f), (obs, rhos) = evolve(fr0, fi0)
        ados_f = extract(np.asarray(fr_f), np.asarray(fi_f))
        obs0 = (np.einsum("kij, ji -> k",
                          np.stack([np.asarray(e) for e in e_ops]),
                          ados0[0]).astype(npdt)
                if e_ops else np.zeros((0,), npdt))
        observables = jnp.concatenate([jnp.asarray(obs0)[None], obs],
                                      axis=0)
        times = jnp.arange(obs.shape[0] + 1) * dt * nout
        res = Result(times=times,
                     observables=observables if e_ops else None,
                     dt=dt, nt=nt, nout=nout)
        res.rho0 = jnp.asarray(rho0)
        res.rho = jnp.asarray(ados_f[0])
        res.ado = jnp.asarray(ados_f)
        first = ados0 if store_ados else ados0[0]
        res.states = jnp.concatenate([jnp.asarray(first)[None], rhos],
                                     axis=0)
        return res

    # ------------------------------------------------- correlation funcs
    def correlation_3op_1t(self, rho0, oplist, dt, nt, **kwargs):
        """<A B(t) C> via hierarchy propagation of the seeded ADO stack."""
        a_op, b_op, c_op = [jnp.asarray(o) for o in oplist]
        res = self.run(c_op @ jnp.asarray(rho0) @ a_op, dt, nt,
                       e_ops=[b_op], **kwargs)
        return res.observables[:, 0]

    def correlation_2op_1t(self, rho0, a_op, b_op, dt, nt, ados0=None,
                           **kwargs):
        """<A(t) B> through the full hierarchy (reference convention,
        pyqed/oqs.py:1193).  Pass ``ados0=steady_state(full=True)`` for
        the EXACT equilibrium correlator — seeding only the rho_0 slice
        lets the higher ADOs re-equilibrate and drifts the early-time
        correlator.  Returns (nt+1,) complex at t = 0..nt dt."""
        eye = jnp.eye(self.n)
        if ados0 is None:
            return self.correlation_3op_1t(rho0, [eye, a_op, b_op], dt,
                                           nt, **kwargs)
        corr = self.correlation_3op_2t(rho0, [eye, a_op, b_op], dt=dt,
                                       nt=1, ntau=nt + 1, ados0=ados0,
                                       **kwargs)
        return corr[0]

    def liouvillian_dense(self, dtype=None, kernel="einsum"):
        """Materialize the FULL hierarchy Liouvillian as a dense
        (nado*n*n, nado*n*n) matrix by applying the (linear) RHS to a
        vmapped identity basis. Small hierarchies only."""
        if dtype is None:
            dtype = (jnp.complex128 if jax.config.jax_enable_x64
                     else jnp.complex64)
        rhs, nado = self.rhs_fn(dtype, kernel=kernel)
        n = self.n
        D = nado * n * n
        basis = jnp.eye(D, dtype=dtype).reshape(D, nado, n, n)
        cols = jax.lax.map(lambda b: rhs(b).reshape(D), basis)
        return cols.T   # column j = L e_j

    def steady_state(self, kernel="einsum", full=False):
        """Exact HEOM steady state: the null vector of the full
        hierarchy Liouvillian, Hermitized and trace-normalized on the
        rho_0 slice.  Returns the (n, n) reduced density matrix — the
        numerically exact open-system equilibrium INCLUDING
        system-bath-correlation corrections a Lindblad/Redfield
        steady state misses.  With ``full=True`` returns the whole
        stationary (nado, n, n) ADO stack (normalized the same way) —
        seed ``correlation_3op_2t(..., ados0=)`` with it for EXACT
        equilibrium correlation functions.  Small hierarchies only
        (dense null space)."""
        L = np.asarray(self.liouvillian_dense(kernel=kernel))
        _, s, Vh = np.linalg.svd(L)
        if s[-2] < 1e-10 * max(s[0], 1.0):
            import warnings
            warnings.warn(
                "HEOM stationary space is degenerate (e.g. pure "
                "dephasing: [H, Q] = 0 conserves every population); "
                "steady_state returns an arbitrary member.")
        vec = Vh[-1].conj()
        n = self.n
        ados = vec.reshape(-1, n, n)
        # unique null vector == physical stationary stack up to one
        # complex scale; fixing trace(rho_0) = 1 recovers it (higher
        # ADOs are NOT Hermitian in general — only rho_0 is)
        ados = ados / np.trace(ados[0])
        if full:
            return jnp.asarray(ados)
        rho = (ados[0] + ados[0].conj().T) / 2
        return jnp.asarray(rho)

    def propagator(self, dt, nt, kernel="einsum"):
        """Exact hierarchy propagators U(k dt) = e^{L k dt}, k = 0..nt
        (reference: pyqed/oqs.py HEOMSolver.propagator — an RK4 march
        on the stacked identity there; one eig of the dense L here).
        Returns (nt+1, D, D) with D = nado*n*n; apply to a flattened
        ADO stack. Small hierarchies only (D^2 memory)."""
        L = self.liouvillian_dense(kernel=kernel)
        w, V = jnp.linalg.eig(L)
        Vinv = jnp.linalg.inv(V)
        ks = jnp.arange(nt + 1)
        return jax.vmap(
            lambda k: (V * jnp.exp(w * (k * dt))[None, :]) @ Vinv)(ks)

    def correlation_3op_2t(self, rho0, oplist, dt, nt, ntau, ados0=None,
                           **kwargs):
        """Two-time correlator <A(t) B(t+tau) C(t)> through the FULL
        hierarchy — both time legs propagated by HEOM (the reference's
        HEOMSolver.correlation_3op_2t silently falls back to a Lindblad
        solver, pyqed/oqs.py; the genuine hierarchy version here).

        System operators act on every ADO (left/right multiplication
        commutes with the bath indices). Returns (nt, ntau) complex.

        ``ados0``: full (nado, n, n) initial hierarchy — pass
        ``steady_state(full=True)`` for EXACT equilibrium correlators
        (seeding only the rho_0 slice lets the higher ADOs
        re-equilibrate during the t leg)."""
        a_op, b_op, c_op = [jnp.asarray(o) for o in oplist]
        dtype = (jnp.complex128 if jax.config.jax_enable_x64
                 else jnp.complex64)
        rhs, nado = self.rhs_fn(dtype, kernel=kwargs.get("kernel"))
        n = self.n
        if ados0 is not None:
            ados0 = jnp.asarray(ados0, dtype=dtype)
        else:
            rho0 = jnp.asarray(rho0, dtype=dtype)
            ados0 = jnp.zeros((nado, n, n), dtype=dtype).at[0].set(rho0)

        def rk4(y):
            k1 = rhs(y)
            k2 = rhs(y + k1 * (dt / 2))
            k3 = rhs(y + k2 * (dt / 2))
            k4 = rhs(y + k3 * dt)
            return y + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)

        def t_body(y, _):
            return rk4(y), y

        _, ys = jax.lax.scan(t_body, ados0, None, length=nt)   # (nt,nado,n,n)

        Am = a_op.astype(dtype)
        Bm = b_op.astype(dtype)
        Cm = c_op.astype(dtype)

        def one_t(y):
            seeded = jnp.einsum("ab, Nbc, cd -> Nad", Cm, y, Am)

            def tau_body(z, _):
                return rk4(z), jnp.trace(Bm @ z[0])

            _, corr = jax.lax.scan(tau_body, seeded, None, length=ntau)
            return corr

        return jax.lax.map(one_t, ys)                           # (nt, ntau)


    def absorption(self, omegas, edip, dt=None, ntau=2000, kernel=None):
        """Numerically exact linear absorption from the hierarchy:
        S(w) = 2 Re int_0^T dt e^{i w t} <mu(t) mu>_eq with the average
        in the EXACT correlated equilibrium (steady_state(full=True) —
        Lindblad/Redfield absorption misses the system-bath-correlation
        corrections).  Returns (len(omegas),) real."""
        mu = jnp.asarray(edip, dtype=complex)
        ados_ss = self.steady_state(full=True)
        if dt is None:
            wmax = float(np.max(np.abs(np.asarray(omegas))))
            dt = 2.0 * np.pi / (wmax * 40.0) if wmax > 0 else 0.01
            # RK4 stability: the deepest ADO is damped at ~ lmax * max
            # |Re nu| (Pade rates grow fast), plus the coherent scale
            numax = max((abs(complex(m[2]).real) for m in self._modes),
                        default=0.0)
            lam = self.lmax * numax + 2.0 * float(
                jnp.linalg.norm(self.H, ord=2))
            if lam > 0:
                dt = min(dt, 1.5 / lam)
        corr = np.asarray(self.correlation_2op_1t(
            None, mu, mu, dt=dt, nt=ntau - 1, ados0=ados_ss, kernel=kernel))
        t = np.arange(ntau) * dt
        w = np.asarray(omegas, dtype=float)
        # half-Fourier with a soft window against truncation ringing
        win = np.exp(-(t / t[-1]) ** 2 * 4.0)
        ph = np.exp(1j * np.outer(w, t))
        return 2.0 * np.real(ph @ (corr * win)) * dt


class HEOMSolverDrude(HEOMSolver):
    """High-temperature Drude HEOM with the reference's constructor/run
    signature (reference: pyqed/oqs.py:1332,1361).

    ``run(rho0, dt, nt, temperature, cutoff, reorganization, nado)`` uses a
    single-exponential decomposition with the reference's high-T coefficient
    D0 = reorg*cutoff*(coth(cutoff/(2T)) - i) (pyqed/oqs.py:1843) and a
    terminator at level nado-2, reproducing the reference hierarchy exactly
    (its ADOs differ by the rescaling i^n; rho_0 is identical).
    """

    def __init__(self, H=None, c_ops=None, e_ops=None):
        super().__init__(H, bath=None, c_ops=c_ops, e_ops=e_ops)

    def run(self, rho0, dt, nt, temperature, cutoff, reorganization, nado,
            method="rk4", e_ops=None, **kwargs):
        gamma = cutoff
        T = temperature
        D0 = reorganization * gamma * (1.0 / np.tanh(gamma / (2.0 * T)) - 1j)
        Q = self.c_ops[0]
        if method == "euler-seq":
            return self._run_reference_euler(rho0, dt, nt, D0, gamma, Q,
                                             nado, e_ops=e_ops)
        self.lmax = nado - 2
        self.set_bath([(Q, [D0], [gamma])])
        return super().run(rho0, dt, nt, method=method, e_ops=e_ops,
                           **kwargs)

    def _run_reference_euler(self, rho0, dt, nt, D0, gamma, Q, nado,
                             e_ops=None):
        """Bit-faithful reproduction of the reference's stepping
        (pyqed/oqs.py:1856-1873): sequential in-place Euler over the
        chain of i^n-rescaled ADOs — level n reads the ALREADY-UPDATED
        level n-1 and the old level n+1. Used by the true-oracle parity
        test; production runs use the rk4 hierarchy path."""
        e_ops = e_ops or []
        dtype = jnp.complex128 if jnp.asarray(rho0).dtype in (
            jnp.complex128, jnp.float64) else jnp.complex64
        H = self.H.astype(dtype)
        Q = jnp.asarray(Q).astype(dtype)
        n = self.n
        ados0 = jnp.zeros((nado, n, n), dtype=dtype).at[0].set(
            jnp.asarray(rho0).astype(dtype))
        eops = (jnp.stack([jnp.asarray(e).astype(dtype) for e in e_ops])
                if e_ops else None)

        def comm(a, b):
            return a @ b - b @ a

        def anticomm(a, b):
            return a @ b + b @ a

        def step(ados):
            a0 = ados[0]
            a0 = a0 - 1j * comm(H, a0) * dt - comm(Q, ados[1]) * dt
            ados = ados.at[0].set(a0)

            def level(k, a):
                up = comm(Q, a[k + 1])
                down = (jnp.real(D0) * comm(Q, a[k - 1])
                        + 1j * jnp.imag(D0) * anticomm(Q, a[k - 1]))
                new = a[k] + (-1j * comm(H, a[k]) - up
                              - k * gamma * a[k] + k * down) * dt
                return a.at[k].set(new)

            return jax.lax.fori_loop(1, nado - 1, level, ados)

        @jax.jit
        def evolve(ados):
            def body(a, _):
                a = step(a)
                obs = (jnp.einsum("kij, ji -> k", eops, a[0])
                       if eops is not None else jnp.zeros((0,), dtype=dtype))
                return a, obs
            return jax.lax.scan(body, ados, None, length=nt)

        ados_f, obs = evolve(ados0)
        obs0 = (jnp.einsum("kij, ji -> k", eops, ados0[0])
                if eops is not None else jnp.zeros((0,), dtype=dtype))
        res = Result(times=jnp.arange(nt + 1) * dt,
                     observables=jnp.concatenate([obs0[None], obs], axis=0)
                     if e_ops else None, dt=dt, nt=nt)
        res.rho = ados_f[0]
        res.ado = ados_f
        return res
