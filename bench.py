"""Driver benchmark: all five BASELINE.md configs on the real TPU chip.

Primary metric (the driver's headline): config #3 — HEOM hierarchy
steps/sec, FMO-like 7-site exciton system (n=8) with per-site Drude
baths, Padé-2 (M=14 modes), lmax=3 → 680 ADOs; vs_baseline = speedup
over the honest CPU denominator: a single-thread C++ -O3 -ffast-math
transcription of the reference DEOM rem_cal RK4 loop
(benchmarks/heom_ref.cpp — numba is not installed here, so C++ strictly
upper-bounds the numba-jitted reference; parity vs the ACTUAL reference
rem_cal is bitwise, tests/test_bench_parity.py). Fast/low-precision
kernels only reach the headline through an ON-DEVICE parity gate
(_heom_kernel_parity).

The single JSON line also carries an "extra" dict:
  speedup_2des   config #4 ★ — ESA+GSB+SE 2DES response map, excitonic
                 dimer, 512x512 (omega1, omega3) x 256 t2 delays; CPU
                 baseline = the ACTUAL reference pathway functions
                 (pyqed/signal/sos.py:498,624,731) exec'd via the
                 tests/ref_oracle.py shim, looped over t2.
  ldr_*          flagship LDR method, 31x31 grid x 2 states: one dense
                 (1922,1922) MXU matmul per step; CPU baseline = the
                 ACTUAL reference LDRN class (pyqed/ldr/ldr.py:320)
                 exec'd via the oracle shim on the same model.
  ldr_factored_* the factored nonadiabatic path (A = S S† applied
                 through its rank factor; grid/ldr.py run(method=
                 'factored')): same dynamics, no dense U — parity-gated
                 on-device, plus level-7 (127x127) rows at a size whose
                 dense propagator (8.3 GB) cannot be materialized.
  heom_levels_steps_per_sec / heom_matmul_steps_per_sec — kernel split
                 (pallas retired r5: loses to XLA levels fusion; see
                 heom_pallas_note).
  spo_steps_per_sec      config #1 — 1D split-operator, Morse, 1024 pts.
  lindblad_steps_per_sec config #2 — vibronic dimer (n=32) Lindblad RK4.
  polariton_traj_steps_per_sec config #5 — 512-frequency drive scan of
                 the driven cavity-polariton (n=20), batched RK4 (an
                 excitation-spectrum map); *_vs_cpu = vs the sequential
                 reference-shaped scan, *_vs_cpu_batched = vs the
                 strongest CPU counter (NumPy-BLAS batched RK4).
  *_vs_cpu               per-config speedup over a single-core CPU
                         baseline with the reference algorithm shape.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "benchmarks"))


def _force(out):
    """Force a REAL device->host readback of one leaf.

    On the axon tunnel, ``jax.block_until_ready`` does NOT actually wait
    for execution (measured: 3rd+ repeat calls 'complete' in 0.5 ms while
    the honest step time is 190 ms; only a data readback synchronizes).
    Every timed region must therefore end with a readback.
    """
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    # index ON DEVICE first so only 4 bytes cross the tunnel — reading the
    # whole leaf would add ~10 ms/MB of transfer to the timed region
    if hasattr(x, "ndim") and x.ndim > 0:
        x = x[(0,) * x.ndim]
    return float(np.asarray(x).real)


def _rpc_floor_ms():
    """Measured axon round-trip latency: a trivial jitted program +
    single-element readback costs ~55-60 ms on the tunnel. Workloads
    below are sized so device compute dominates this floor; the floor is
    reported in the JSON for transparency."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tiny(x):
        return jnp.sum(x)

    x = np.ones(8, np.float32)
    return _timeit(tiny, x) * 1e3


def _peaks(flops_per_unit, bytes_per_unit, units_per_sec):
    """%-of-peak columns (VERDICT r2 #3). Peaks: v5e-1 HBM 819 GB/s;
    MXU 197/6 TF for the full-f32 6-pass matmuls these programs use
    (precision=HIGHEST)."""
    gbps = bytes_per_unit * units_per_sec / 1e9
    tflops = flops_per_unit * units_per_sec / 1e12
    return {"flops_per_step": flops_per_unit,
            "hbm_bytes_per_step_min": bytes_per_unit,
            "achieved_tflops": round(tflops, 4),
            "achieved_hbm_gbps": round(gbps, 1),
            "frac_of_f32_mxu_peak": round(tflops / (197.0 / 6), 4),
            "frac_of_hbm_peak": round(gbps / 819.0, 4)}


def _matvec_roofline(dim, nout, steps_per_sec):
    """Exact speed-of-light model for the folded-propagator benches
    (SPO, Lindblad): each observation window is ONE complex64 (dim, dim)
    matvec, so per fine step the mandatory work is 8 dim^2 flops / nout
    and the mandatory HBM stream is the 8 dim^2-byte matrix (plus the
    in/out vectors) / nout. These programs are HBM-bound by
    construction (arithmetic intensity ~1 flop/byte): frac_of_hbm_peak
    is the binding column."""
    flops = 8.0 * dim * dim / nout
    byt = (8.0 * dim * dim + 2 * 8.0 * dim) / nout
    out = _peaks(flops, byt, steps_per_sec)
    if 8.0 * dim * dim < 64e6:        # folded propagator fits v5e VMEM
        out["note"] = ("propagator is VMEM-resident at this size: true "
                       "HBM traffic is below the streamed model, the "
                       "program is latency-bound, and frac_of_hbm_peak "
                       "upper-bounds HBM pressure")
    return out


def _xla_roofline(jitted, args, units_per_sec):
    """Roofline from XLA's compiled cost analysis, for SCAN-FREE
    programs only (HLO cost analysis does not multiply loop bodies by
    trip counts): flops / "bytes accessed" of the post-fusion module,
    scaled by the measured per-dispatch rate."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byt = float(ca.get("bytes accessed", 0.0))
    except Exception as exc:                      # axon backends w/o CA
        return {"error": f"cost_analysis unavailable: {exc}"}
    return _peaks(flops, byt, units_per_sec)


def _timeit(fn, *args, repeat=3):
    """Min-of-repeat wall time after a warmup call; each timed call is
    synchronized by an actual readback (see ``_force``)."""
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    _force(out)
    best = np.inf
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    return best


# ===================================================== config #3: HEOM ★

def bench_heom_tpu(kernel, nsteps=2000, dt=1e-3, nsite=7,
                   nexp_per_bath=2, lmax=3):
    import jax
    from __graft_entry__ import _heom_setup, _heom_step_fn
    H, keys, plus_idx, minus_idx, Q, cvec, nuvec = _heom_setup(
        nsite=nsite, nexp_per_bath=nexp_per_bath, lmax=lmax)
    step, nado, n = _heom_step_fn(H, keys, plus_idx, minus_idx, Q, cvec,
                                  nuvec, dt=dt, kernel=kernel)

    @jax.jit
    def run(re, im):
        def body(c, _):
            return step(*c), None
        c, _ = jax.lax.scan(body, (re, im), None, length=nsteps)
        return c

    re = np.zeros((nado, n, n), np.float32)
    re[0, 0, 0] = 1.0
    t = _timeit(run, re, np.zeros_like(re))
    return nsteps / t


def _heom_roofline(steps_per_sec, kernel, nsite=7, nexp_per_bath=2,
                   lmax=3):
    """Speed-of-light accounting for one HEOM RK4 step (VERDICT r2 #3):
    exact FLOP count of the kernel's contractions and a LOWER-BOUND HBM
    traffic model, converted to achieved TFLOP/s / GB/s and fractions of
    the v5e-1 peaks (197 TF bf16 MXU; ~197/6 TF for full-f32 6-pass
    emulation; 819 GB/s HBM). The traffic model counts only mandatory
    streams (state in/out, neighbor-stack round-trip or S-block
    streaming), so the HBM fraction is conservative."""
    from __graft_entry__ import _heom_setup
    from pyqed_tpu.ops import pallas_kernels as pk
    H, keys, plus_idx, minus_idx, Q, cvec, nuvec = _heom_setup(
        nsite=nsite, nexp_per_bath=nexp_per_bath, lmax=lmax)
    nado, M = keys.shape
    n = H.shape[0]
    V = n * n
    state_bytes = 2 * 4 * nado * V          # re+im f32 planes
    if kernel.startswith("levels"):
        # order-aware mode-folded XLA levels kernel
        # (pallas_kernels.heom_rhs_levels_xla_factory): per level l,
        # plus = select-first (real S-fold matmul, then batched complex
        # Y @ Pt), minus = transform-first (batched complex src @ Dt,
        # then real S @ Z).  Sublane-only padding (Vp = V -> 8) since r5.
        sizes, offs, pad_sizes, pad_offs, nado_pad, perm = \
            pk.heom_level_structure(keys)
        Vp = -(-V // 8) * 8
        L = len(sizes) - 1
        flops_rhs = 8 * nado_pad * Vp * Vp                    # C-term dot
        s_elems = 0
        for l in range(L):                 # plus: dest l, src l+1
            dst, src = pad_sizes[l], pad_sizes[l + 1]
            flops_rhs += 4 * M * dst * src * Vp               # S-fold Y
            flops_rhs += 8 * M * dst * Vp * Vp                # Y @ Pt
            s_elems += M * dst * src
        for l in range(1, L + 1):          # minus: dest l, src l-1
            dst, src = pad_sizes[l], pad_sizes[l - 1]
            flops_rhs += 8 * M * src * Vp * Vp                # src @ Dt
            flops_rhs += 4 * M * dst * src * Vp               # S @ Z
            s_elems += M * dst * src
        state_p = 2 * 4 * nado_pad * Vp
        # per RHS: full state read + write, one pass of the f32 S
        # blocks, Pt+Dt operand blocks once (conservative: XLA may
        # re-read them per level)
        op_bytes = s_elems * 4 + 2 * 2 * M * Vp * Vp * 4      # S + Pt/Dt
        rhs_bytes = 2 * state_p + op_bytes
    elif kernel.startswith("pallas"):
        # order-aware since r5 (VERDICT r4 #5): plus couplings run
        # select-first (transform on the SMALLER dest level), minus
        # transform-first — the same FLOP-optimal contraction order as
        # the XLA levels kernel, in-VMEM
        sizes, offs, pad_sizes, pad_offs, nado_pad, perm = \
            pk.heom_level_structure(keys)
        Vp = -(-V // 128) * 128
        L = len(sizes) - 1
        flops_rhs = 8 * nado_pad * Vp * Vp                    # C-term dot
        s_elems = 0
        for l in range(L):                 # plus: select-first
            dst, src = pad_sizes[l], pad_sizes[l + 1]
            flops_rhs += 4 * M * dst * src * Vp               # S fold
            flops_rhs += 8 * M * dst * Vp * Vp                # Y @ Pt
            s_elems += M * dst * src
        for l in range(1, L + 1):          # minus: transform-first
            dst, src = pad_sizes[l], pad_sizes[l - 1]
            flops_rhs += 8 * M * src * Vp * Vp                # src @ Dt
            flops_rhs += 4 * M * dst * src * Vp               # S @ Z
            s_elems += M * dst * src
        s_item = 2 if kernel.endswith("fast") else 4          # bf16 / f32
        s_bytes = s_elems * s_item
        state_p = 2 * 4 * nado_pad * Vp
        # per RHS: each coupling call re-reads the resident flat planes,
        # writes its dest rows; C-term reads/writes the full planes;
        # S blocks stream once
        rhs_bytes = (2 * L + 1) * state_p + state_p + s_bytes
    else:
        flops_rhs = 8 * nado * V * V * (2 * M + 1)
        g_bytes = 2 * 4 * nado * 2 * M * V
        rhs_bytes = 2 * state_bytes + 2 * g_bytes   # state in/out + g w+r
    # RK4: 4 RHS + the axpy update stream (~6 state passes)
    flops_step = 4 * flops_rhs
    bytes_step = 4 * rhs_bytes + 6 * state_bytes
    tflops = flops_step * steps_per_sec / 1e12
    gbps = bytes_step * steps_per_sec / 1e9
    mxu_peak = 197.0 if kernel.endswith("fast") else 197.0 / 6
    return {
        "flops_per_step": flops_step,
        "hbm_bytes_per_step_min": bytes_step,
        "tflops_achieved": round(tflops, 2),
        "frac_mxu_peak": round(tflops / mxu_peak, 3),
        "hbm_gbps_min": round(gbps, 1),
        "frac_hbm_peak": round(gbps / 819.0, 3),
    }


def _best_of(run_once, repeat=3):
    """Fastest of ``repeat`` timed calls of run_once() (which must
    rebuild/copy its own initial state).  Machine load makes single-shot
    CPU timings swing ~2x; the FASTEST CPU run gives the most
    conservative reported speedup."""
    best = np.inf
    for _ in range(repeat):
        t0 = time.perf_counter()
        run_once()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_heom_cpu(nsteps=40, dt=1e-3):
    """Honest CPU denominator: single-thread C++ -O3 -ffast-math
    transcription of the reference DEOM rem_cal RK4 loop
    (benchmarks/heom_ref.cpp; bitwise-matched to the ACTUAL reference
    rem_cal trajectory in tests/test_bench_parity.py). numba is not
    installed in this environment, so the C++ build is used as a strict
    upper bound on the numba-jitted reference's speed — i.e. the reported
    speedup is conservative. Falls back to the pure-Python loop if g++ is
    unavailable."""
    from __graft_entry__ import _heom_setup
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        from heom_ref import heom_ref_rk4
        H, keys, plus_idx, minus_idx, Q, cvec, nuvec = _heom_setup(
            nsite=7, nexp_per_bath=2, lmax=3)
        nado, M = keys.shape
        n = H.shape[0]
        ados = np.zeros((nado, n, n), dtype=np.complex128)
        ados[0, 0, 0] = 1.0
        heom_ref_rk4(H, keys, plus_idx, minus_idx, Q, cvec, nuvec, dt, 2,
                     ados.copy())          # warm the .so build/load
        best = np.inf
        for _ in range(3):
            a = ados.copy()          # state copy outside the timed region
            t0 = time.perf_counter()
            heom_ref_rk4(H, keys, plus_idx, minus_idx, Q, cvec, nuvec,
                         dt, nsteps, a)
            best = min(best, time.perf_counter() - t0)
        return nsteps / best
    except Exception:
        return _bench_heom_cpu_python()


def bench_heom_cpu_refpy(nsteps=2, dt=1e-3):
    """The ACTUAL reference rk4/rem_cal (pyqed/heom/deom.py:725,667)
    exec'd from /root/reference — pure-Python here because numba is not
    installed (its @njit hash helpers run uncompiled). Reported for
    transparency; NOT the denominator (it under-states the reference)."""
    from __graft_entry__ import _heom_setup
    try:
        from ref_deom import ref_deom_rk4
        H, keys, plus_idx, minus_idx, Q, cvec, nuvec = _heom_setup(
            nsite=7, nexp_per_bath=2, lmax=3)
        n = H.shape[0]
        rho0 = np.zeros((n, n), complex)
        rho0[0, 0] = 1.0
        sps, _ = ref_deom_rk4(H, Q, cvec, nuvec, 3, dt, nsteps, rho0)
        return sps
    except Exception:
        return float("nan")


def _bench_heom_cpu_python(nsteps=10, dt=1e-3):
    """Reference-shaped RHS: Python loop over ADOs and modes, complex128
    (the reference DEOM rem_cal loop structure)."""
    from __graft_entry__ import _heom_setup
    H, keys, plus_idx, minus_idx, Q, cvec, nuvec = _heom_setup(
        nsite=7, nexp_per_bath=2, lmax=3)
    nado, M = keys.shape
    n = H.shape[0]
    damp = (keys @ nuvec).real
    H = H.astype(complex)
    Q = Q.astype(complex)

    def rhs(ados):
        out = np.empty_like(ados)
        for N in range(nado):
            acc = -1j * (H @ ados[N] - ados[N] @ H) - damp[N] * ados[N]
            for m in range(M):
                up = plus_idx[N, m]
                if up < nado:
                    acc = acc - 1j * (Q[m] @ ados[up] - ados[up] @ Q[m])
                dn = minus_idx[N, m]
                if dn < nado and keys[N, m] > 0:
                    nk = keys[N, m]
                    acc = acc - 1j * nk * (
                        cvec[m] * Q[m] @ ados[dn]
                        - np.conj(cvec[m]) * ados[dn] @ Q[m])
            out[N] = acc
        return out

    ados = np.zeros((nado, n, n), dtype=np.complex128)
    ados[0, 0, 0] = 1.0
    t0 = time.perf_counter()
    for _ in range(nsteps):
        k1 = rhs(ados)
        k2 = rhs(ados + k1 * (dt / 2))
        k3 = rhs(ados + k2 * (dt / 2))
        k4 = rhs(ados + k3 * dt)
        ados = ados + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
    return nsteps / (time.perf_counter() - t0)


# ===================================================== config #4: 2DES ★

def _dimer_system():
    """Excitonic dimer: g, e1, e2, f with transition dipoles."""
    E = np.array([0.0, 1.0, 1.15, 2.1])
    dip = np.zeros((4, 4))
    dip[0, 1] = dip[1, 0] = 1.0
    dip[0, 2] = dip[2, 0] = 0.7
    dip[1, 3] = dip[3, 1] = 0.8
    dip[2, 3] = dip[3, 2] = 1.1
    gamma = np.array([0.0, 0.02, 0.025, 0.04])
    return E, dip, gamma


def bench_2des_tpu(nw=512, nt2=256):
    import jax
    import jax.numpy as jnp
    from pyqed_tpu.signal.sos import _photon_echo
    E, dip, gamma = _dimer_system()
    w = np.linspace(0.7, 1.45, nw).astype(np.float32)
    t2s = np.linspace(0.0, 30.0, nt2).astype(np.float32)

    # numpy closures: device-array jit constants cost ~30 ms/call on axon
    Ej = E.astype(np.float32)
    dj = dip.astype(np.float32)
    gj = gamma.astype(np.float32)

    @jax.jit
    def run(w, t2s):
        def one(t2):
            S = _photon_echo(Ej, dj, -w, w, t2, [0], [1, 2], [3], gj)
            return jnp.real(S), jnp.imag(S)
        return jax.vmap(one)(t2s)

    t = _timeit(run, w, t2s)
    return t


def bench_2des_tpu_amortized(nw=512, nt2=256, nmaps=32):
    """Amortized per-map time with ``nmaps`` full (nw, nw, nt2) maps per
    dispatch (VERDICT r2 #3: the single-dispatch number was ~95% axon
    RPC floor, measuring transport, not the kernel). A lax.scan over
    per-map t2 offsets computes every map (each reduced on-device to a
    (nw, nw) accumulator — XLA cannot dead-code any t2 row because all
    feed the sum); amortized = total / nmaps."""
    import jax
    import jax.numpy as jnp
    from pyqed_tpu.signal.sos import _photon_echo
    E, dip, gamma = _dimer_system()
    w = np.linspace(0.7, 1.45, nw).astype(np.float32)
    t2s = np.linspace(0.0, 30.0, nt2).astype(np.float32)
    offs = np.linspace(0.0, 1.0, nmaps).astype(np.float32)
    Ej = E.astype(np.float32)
    dj = dip.astype(np.float32)
    gj = gamma.astype(np.float32)

    @jax.jit
    def run(w, t2s, offs):
        def one_map(acc, off):
            def one(t2):
                S = _photon_echo(Ej, dj, -w, w, t2 + off, [0], [1, 2],
                                 [3], gj)
                return jnp.real(S), jnp.imag(S)
            rr, ri = jax.vmap(one)(t2s)
            return (acc[0] + jnp.sum(rr, axis=0),
                    acc[1] + jnp.sum(ri, axis=0)), None
        acc0 = (jnp.zeros((nw, nw), jnp.float32),
                jnp.zeros((nw, nw), jnp.float32))
        acc, _ = jax.lax.scan(one_map, acc0, offs)
        return acc

    t = _timeit(run, w, t2s, offs)

    # roofline from a SCAN-FREE single-map program (HLO cost analysis
    # does not scale loop bodies by trip count), scaled by the measured
    # amortized maps/s
    @jax.jit
    def one_map(w, t2s):
        def one(t2):
            S = _photon_echo(Ej, dj, -w, w, t2, [0], [1, 2], [3], gj)
            return jnp.real(S), jnp.imag(S)
        rr, ri = jax.vmap(one)(t2s)
        return jnp.sum(rr, axis=0), jnp.sum(ri, axis=0)

    roof = _xla_roofline(one_map, (w, t2s), nmaps / t)
    return t / nmaps, roof


def bench_2des_factored_tpu(nw=512, nt2=256):
    """The FULL (nt2, nw, nw) photon-echo cube in ONE dispatch via the
    exact low-rank factorization (signal/sos.py
    ``_photon_echo_factored``: S(t2) = sum_k C_k(t2) A_k(w1) B_k(w3),
    K = 1 + |e|^2 + |e||f| = 7 for the dimer) — the cube is one batched
    (K, W1) x (K, W3) matmul family whose cost is the mandatory 0.5 GB
    output stream, vs nt2 independent pathway evaluations for the
    vmapped kernel. Parity-gated ON-DEVICE against that kernel at a
    reduced shape. Returns (seconds_per_map, parity_err, roofline)."""
    import jax
    import jax.numpy as jnp
    from pyqed_tpu.signal.sos import _photon_echo_factored, _photon_echo
    E, dip, gamma = _dimer_system()
    w = np.linspace(0.7, 1.45, nw).astype(np.float32)
    t2s = np.linspace(0.0, 30.0, nt2).astype(np.float32)
    Ej = E.astype(np.float32)
    dj = dip.astype(np.float32)
    gj = gamma.astype(np.float32)

    @jax.jit
    def run(w, t2s):
        S = _photon_echo_factored(Ej, dj, gj, w, w, t2s,
                                  [0], [1, 2], [3])
        return jnp.real(S), jnp.imag(S)

    # on-device parity gate (f32): factored == vmapped pathway kernel.
    # Run at HIGHEST matmul precision so the gate measures algorithmic
    # parity, not the default bf16-matmul noise (~3e-3) of either side.
    wg = np.linspace(0.7, 1.45, 64).astype(np.float32)
    tg = np.linspace(0.0, 30.0, 8).astype(np.float32)

    @jax.jit
    def gate(w, t2s):
        Sf = _photon_echo_factored(Ej, dj, gj, w, w, t2s,
                                   [0], [1, 2], [3])

        def one(t2):
            return _photon_echo(Ej, dj, -w, w, t2, [0], [1, 2], [3], gj)

        Sv = jax.vmap(one)(t2s)
        return jnp.real(jnp.max(jnp.abs(Sf - Sv))
                        / jnp.max(jnp.abs(Sv)))

    with jax.default_matmul_precision("highest"):
        err = float(gate(wg, tg))
    t = _timeit(run, w, t2s)
    # The kernel is so fast (~5 ms compute for the whole 256-map cube)
    # that ONE dispatch is dominated by the ~54 ms axon RPC floor.
    # Throughput metric: pipeline N dispatches (queue all, one forced
    # readback) so the device queue serializes compute and the tunnel
    # latency is paid once — this is how a production client amortizes
    # the link.
    out = run(w, t2s)
    _force(out)
    N = 16
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _i in range(N):
            out = run(w, t2s)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    t_pipe = best / N
    roof = _xla_roofline(run, (w, t2s), 1.0 / t_pipe)  # per-DISPATCH
    return t / nt2, t_pipe / nt2, err, roof


def bench_2des_cpu(nw=512, nt2=256):
    """The ACTUAL reference pathway functions via the import shim."""
    from ref_oracle import load_reference_module
    ref_sos = load_reference_module("signal.sos")
    E, dip, gamma = _dimer_system()
    w = np.linspace(0.7, 1.45, nw)
    t2s = np.linspace(0.0, 30.0, nt2)
    t0 = time.perf_counter()
    for t2 in t2s:
        s = (ref_sos.GSB(E, dip, w, w, t2, [0], [1, 2], gamma)
             + ref_sos.SE(E, dip, w, w, t2, [0], [1, 2], gamma)
             + ref_sos.ESA(E, dip, w, w, t2, [0], [1, 2], [3], gamma))
    return time.perf_counter() - t0


# ================================================= config #1: SPO Morse

def bench_spo_tpu(nx=1024, nsteps=400000, dt=0.005):
    import jax
    import jax.numpy as jnp
    from pyqed_tpu.grid.spo import SPO
    x = np.linspace(-3, 20, nx, endpoint=False)
    D, a = 8.0, 0.5
    # kernel='dft': the Strang step folded into one dense matrix — a
    # single MXU matvec per step beats two sub-critical 1D FFTs
    spo = SPO(x, mass=1.0, nstates=1, kernel="dft")
    spo.set_potential(lambda xx: D * (1 - np.exp(-a * xx)) ** 2)
    spo.build(dt)

    from pyqed_tpu.grid.spo import _ri
    nout = 50            # observation cadence: nout fine steps composed
                         # into one matvec (M^nout, exact unitary product)
    Mk_ri = jax.jit(lambda r, i: _ri(jnp.linalg.matrix_power(
        r + 1j * i, nout)))(*spo._step_mat_ri)
    jax.block_until_ready(Mk_ri)

    @jax.jit
    def run(re, im, Mr, Mi):
        Mk = Mr + 1j * Mi

        def body(p, _):
            p = jnp.matmul(Mk, p, precision=jax.lax.Precision.HIGHEST)
            return p, jnp.sum(jnp.abs(p) ** 2)   # per-window observable

        p, norms = jax.lax.scan(body, re + 1j * im, None,
                                length=nsteps // nout)
        return jnp.real(p), jnp.imag(p), norms

    psi0 = np.exp(-(x - 2.0) ** 2).astype(np.float32)
    t = _timeit(run, psi0, np.zeros_like(psi0), *Mk_ri)
    rate = nsteps / t
    return rate, _matvec_roofline(nx, nout, rate)


def bench_spo_cpu(nx=1024, nsteps=200, dt=0.005):
    x = np.linspace(-3, 20, nx, endpoint=False)
    D, a = 8.0, 0.5
    v = D * (1 - np.exp(-a * x)) ** 2
    k = 2 * np.pi * np.fft.fftfreq(nx, x[1] - x[0])
    expV2 = np.exp(-0.5j * v * dt)
    expK = np.exp(-1j * k ** 2 / 2 * dt)
    psi0 = np.exp(-(x - 2.0) ** 2).astype(complex)

    def once():
        psi = psi0.copy()
        for _ in range(nsteps):
            psi = expV2 * psi
            psi = np.fft.ifft(expK * np.fft.fft(psi))
            psi = expV2 * psi

    return nsteps / _best_of(once)


# ============================================ config #2: Lindblad dimer

def _vibronic_dimer(nvib=8):
    """2 electronic states x nvib vibrational levels (n=2*nvib)."""
    n = 2 * nvib
    w0, de, g = 0.2, 1.0, 0.15
    H = np.zeros((n, n))
    for s in range(2):
        for v in range(nvib):
            H[s * nvib + v, s * nvib + v] = s * de + w0 * v
    for v in range(nvib - 1):
        H[nvib + v, v + 1] = H[v + 1, nvib + v] = g
    c = np.zeros((n, n))
    for v in range(1, nvib):
        c[v - 1, v] = 0.1 * np.sqrt(v)
        c[nvib + v - 1, nvib + v] = 0.1 * np.sqrt(v)
    return H, c


def bench_lindblad_tpu(nsteps=400000, dt=0.002, nout=50):
    import jax
    import jax.numpy as jnp
    from pyqed_tpu.ops.superoperator import liouvillian
    H, c = _vibronic_dimer()
    n = H.shape[0]
    Hr = H.astype(np.float32)
    cr = c.astype(np.float32)

    # production fast path (LindbladSolver method='propagator'): dense
    # Liouvillian -> RK4 step polynomial -> M^nout, one matvec/window
    @jax.jit
    def build():
        L = liouvillian(jnp.asarray(Hr) + 0j, [jnp.asarray(cr) + 0j])
        X = L * dt
        M = jnp.eye(n * n, dtype=X.dtype)
        term = jnp.eye(n * n, dtype=X.dtype)
        for k in range(1, 5):
            term = (term @ X) / k
            M = M + term
        Mk = jnp.linalg.matrix_power(M, nout)
        return jnp.real(Mk), jnp.imag(Mk)

    Mk_ri = build()
    jax.block_until_ready(Mk_ri)

    @jax.jit
    def run(re, im, Mr, Mi):
        Mk = Mr + 1j * Mi

        def body(v, _):
            v = jnp.matmul(Mk, v, precision=jax.lax.Precision.HIGHEST)
            return v, jnp.real(v[0])
        v, pops = jax.lax.scan(body, (re + 1j * im).reshape(-1), None,
                               length=nsteps // nout)
        return jnp.real(v), jnp.imag(v), pops

    rho0 = np.zeros((n,) * 2, np.float32)
    rho0[n // 2, n // 2] = 1.0
    t = _timeit(run, rho0, np.zeros_like(rho0), *Mk_ri)
    rate = nsteps / t
    return rate, _matvec_roofline(n * n, nout, rate)


def bench_lindblad_cpu(nsteps=200, dt=0.002):
    H, c = _vibronic_dimer()
    H = H.astype(complex)
    cd = c.conj().T
    ldl = cd @ c

    def L(rho):
        return (-1j * (H @ rho - rho @ H) + c @ rho @ cd
                - 0.5 * (ldl @ rho + rho @ ldl))

    rho0 = np.zeros_like(H)
    rho0[H.shape[0] // 2, H.shape[0] // 2] = 1.0

    def once():
        rho = rho0.copy()
        for _ in range(nsteps):
            k1 = L(rho)
            k2 = L(rho + k1 * (dt / 2))
            k3 = L(rho + k2 * (dt / 2))
            k4 = L(rho + k3 * dt)
            rho = rho + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)

    return nsteps / _best_of(once)


# ====================================== config #5: driven polariton

def _polariton_system(nmol=2, ncav=5):
    """Jaynes-Cummings-style polariton: 2-level molecules x cavity."""
    nm = 2 ** nmol
    n = nm * ncav
    H = np.zeros((n, n))
    wc, wm, g0 = 1.0, 1.0, 0.1
    for i in range(nm):
        nex = bin(i).count("1")
        for k in range(ncav):
            H[i * ncav + k, i * ncav + k] = wm * nex + wc * k
    # sigma^+ a + h.c. per molecule
    for m in range(nmol):
        for i in range(nm):
            if not (i >> m) & 1:
                j = i | (1 << m)
                for k in range(1, ncav):
                    a = i * ncav + k
                    b = j * ncav + (k - 1)
                    H[b, a] += g0 * np.sqrt(k)
                    H[a, b] += g0 * np.sqrt(k)
    mu = np.zeros((n, n))
    for m in range(nmol):
        for i in range(nm):
            if not (i >> m) & 1:
                j = i | (1 << m)
                for k in range(ncav):
                    mu[i * ncav + k, j * ncav + k] = 1.0
                    mu[j * ncav + k, i * ncav + k] = 1.0
    return H, mu


def polariton_scan_step(Hr, mr, dt, E0):
    """One RK4 step of the BATCHED driven-polariton drive-frequency scan:
    P (n, B) complex, w (B,) drive frequencies, t scalar. The physical
    workload is a polariton excitation spectrum — one trajectory per
    drive frequency, all propagated as (n,n)@(n,B) MXU matmuls
    (reference driven dynamics: pyqed/polariton/cavity.py:577,936 runs
    one parameter set per call; parity vs the sequential CPU loop is
    asserted in tests/test_bench_parity.py)."""
    import jax.numpy as jnp

    def rhs(P, w, tt):
        c = E0 * jnp.cos(w * tt)                     # (B,)
        return -1j * (Hr @ P + (mr @ P) * c[None, :])

    def step(P, w, t):
        k1 = rhs(P, w, t)
        k2 = rhs(P + k1 * (dt / 2), w, t + dt / 2)
        k3 = rhs(P + k2 * (dt / 2), w, t + dt / 2)
        k4 = rhs(P + k3 * dt, w, t + dt)
        return P + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)

    return step


def bench_polariton_tpu(nsteps=20000, dt=0.002, ndrive=512):
    """Config #5 as a chip-relevant workload: 512-frequency drive scan
    (polariton excitation spectrum), one batched RK4 under lax.scan.
    Returns trajectory-steps/s (= nsteps * ndrive / wall)."""
    import jax
    import jax.numpy as jnp
    H, mu = _polariton_system()
    n = H.shape[0]
    Hr = H.astype(np.float32)
    mr = mu.astype(np.float32)
    E0 = 0.05
    omegas = np.linspace(0.8, 1.2, ndrive).astype(np.float32)

    @jax.jit
    def run(re, im, w):
        step = polariton_scan_step(jnp.asarray(Hr), jnp.asarray(mr), dt, E0)

        def body(P, i):
            return step(P, w, i * dt), None

        P, _ = jax.lax.scan(body, re + 1j * im,
                            jnp.arange(nsteps, dtype=jnp.float32))
        # excitation spectrum: ground-state depletion per drive frequency
        spec = 1.0 - jnp.abs(P[0]) ** 2
        return jnp.real(P), jnp.imag(P), spec

    psi0 = np.zeros((n, ndrive), np.float32)
    psi0[0] = 1.0
    t = _timeit(run, psi0, np.zeros_like(psi0), omegas)
    return nsteps * ndrive / t


def bench_polariton_cpu(nsteps=500, dt=0.002, ndrive=3, batched=False):
    """Sequential reference-shaped scan: one driven-RK4 trajectory per
    drive frequency (the reference's driven dynamics runs one parameter
    set per call). ``batched=True`` instead times the strongest CPU
    counter — a NumPy-BLAS batched (n,n)@(n,B) RK4 over all frequencies
    at once — reported separately for transparency.
    Returns trajectory-steps/s."""
    H, mu = _polariton_system()
    H = H.astype(complex)
    E0 = 0.05
    omegas = np.linspace(0.8, 1.2, 512)[:ndrive]

    if batched:
        B = 64
        w = np.linspace(0.8, 1.2, B)
        P0 = np.zeros((H.shape[0], B), complex)
        P0[0] = 1.0

        def rhs(P, t):
            return -1j * (H @ P + (mu @ P) * (E0 * np.cos(w * t))[None, :])

        def once():
            P = P0.copy()
            t = 0.0
            for _ in range(nsteps):
                k1 = rhs(P, t)
                k2 = rhs(P + k1 * (dt / 2), t + dt / 2)
                k3 = rhs(P + k2 * (dt / 2), t + dt / 2)
                k4 = rhs(P + k3 * dt, t + dt)
                P = P + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
                t += dt

        return nsteps * B / _best_of(once, repeat=2)

    def once():
        for omega_d in omegas:
            def rhs(psi, t):
                return -1j * ((H + E0 * np.cos(omega_d * t) * mu) @ psi)

            psi = np.zeros(H.shape[0], complex)
            psi[0] = 1.0
            t = 0.0
            for _ in range(nsteps):
                k1 = rhs(psi, t)
                k2 = rhs(psi + k1 * (dt / 2), t + dt / 2)
                k3 = rhs(psi + k2 * (dt / 2), t + dt / 2)
                k4 = rhs(psi + k3 * dt, t + dt)
                psi = psi + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
                t += dt

    return nsteps * ndrive / _best_of(once, repeat=2)


# ================================================ flagship method: LDR

def _ldr_model(level=5, ns=2):
    """2D two-state avoided-crossing LDR model: harmonic APES pair +
    smooth position-dependent mixing-angle overlap (the same model family
    as tests/test_dvr_ldr.py, sized for the chip)."""
    from pyqed_tpu.grid.ldr import LDRN
    sol = LDRN([(-4.0, 4.0), (-4.0, 4.0)], [level, level], nstates=ns)
    X, Y = np.meshgrid(sol.x[0], sol.x[1], indexing="ij")
    apes = np.stack([0.5 * (X ** 2 + Y ** 2),
                     0.5 * (X ** 2 + Y ** 2) + 1.0], axis=-1)
    th = 0.3 * np.exp(-(X ** 2 + Y ** 2)).reshape(sol.ntot)
    S = np.zeros((sol.ntot, 2, 2))
    S[:, 0, 0] = np.cos(th)
    S[:, 1, 1] = np.cos(th)
    S[:, 0, 1] = -np.sin(th)
    S[:, 1, 0] = np.sin(th)
    psi0 = (np.exp(-(X ** 2 + Y ** 2))[..., None]
            * np.array([1.0, 0.0])).astype(complex)
    psi0 /= np.linalg.norm(psi0)
    return sol, apes, S, psi0


def bench_ldr_tpu(level=5, nsteps=400, dt=0.01, batch=1, blocked=False):
    """Flagship LDR method (BASELINE: "extremely expensive, ndim<4",
    pyqed/ldr/ldr.py:329): 31x31 grid, 2 states -> the short-time
    propagator is ONE dense (1922, 1922) complex MXU matmul per step
    (grid/ldr.py short_time_propagator). U is built ON DEVICE from the
    small APES/overlap inputs (complex device arrays never cross the axon
    tunnel). ``batch>1``: a wavepacket-parameter scan sharing U (the
    production-throughput variant). Returns trajectory-steps/s."""
    import jax
    import jax.numpy as jnp
    sol, apes, S, psi0 = _ldr_model(level)
    ns = sol.nstates
    ntot = sol.ntot
    n = ntot * ns

    # one-time U build, entirely inside ONE jit: only the SMALL real
    # inputs (APES (*nx, ns), states (*nx, 2, ns)) cross the tunnel; A,
    # exp_T and U = expV/2 (A ⊙ expKx⊗expKy) expV/2 live in HBM as c64
    # (eager complex ops are not usable on the axon backend — complex
    # constants cannot cross the tunnel, so the build must be compiled)
    @jax.jit
    def build(apes_in, S_in):
        sol.apes = apes_in
        if blocked:
            # row-blocked build (grid/ldr.py): required above level 5 —
            # the fused dense build graph kills the TPU compiler there
            U = sol.short_time_propagator_blocked(
                dt, S_in.reshape(*sol.nx, 2, ns))
        else:
            sol.build_ovlp(S_in.reshape(*sol.nx, 2, ns))
            U = sol.short_time_propagator(dt)
        return (jnp.real(U).astype(jnp.float32),
                jnp.imag(U).astype(jnp.float32))

    Ur, Ui = build(apes.astype(np.float32), S.astype(np.float32))
    jax.block_until_ready((Ur, Ui))

    @jax.jit
    def run(re, im, Ur, Ui):
        # real-arithmetic complex matvec with the re|im columns STACKED
        # into one rhs: TWO f32 MXU matmuls per step, so Ur and Ui are
        # GUARANTEED to stream from HBM once per step (the step is
        # HBM-bound at chip scale: U is ~0.5 GB at level 6). Measured
        # head-to-head on v5e at level 6: equal to the naive 4-matmul
        # form (1181 vs 1209 steps/s) because XLA's dot-merger pass
        # already coalesces dots sharing an operand — the explicit stack
        # keeps that property out of the optimizer's hands. A single
        # c64 matmul at this size exhausts the axon TPU's scoped memory.
        hi = jax.lax.Precision.HIGHEST
        b = re.shape[1]

        def body(p, _):
            A = jnp.matmul(Ur, p, precision=hi)     # (n, 2b)
            B = jnp.matmul(Ui, p, precision=hi)
            qr = A[:, :b] - B[:, b:]
            qi = A[:, b:] + B[:, :b]
            q = jnp.concatenate([qr, qi], axis=1)
            return q, jnp.sum(q ** 2)

        p0 = jnp.concatenate([re, im], axis=1)      # (n, 2b)
        pf, norms = jax.lax.scan(body, p0, None, length=nsteps)
        return pf[:, :b], pf[:, b:], norms

    rates = []
    for b in (batch if isinstance(batch, (tuple, list)) else [batch]):
        if b == 1:
            p0 = psi0.reshape(n, 1)
        else:
            # displaced-wavepacket scan sharing the same propagator
            p0 = np.stack([np.roll(psi0.reshape(n), 7 * k)
                           for k in range(b)], axis=1)
        re = np.ascontiguousarray(p0.real, np.float32)
        t = _timeit(run, re, np.zeros_like(re), Ur, Ui)
        rates.append(nsteps * b / t)
    return rates if isinstance(batch, (tuple, list)) else rates[0]


def _ldr_factored_run(level, nsteps, dt, batch):
    """One jitted program for the FACTORED nonadiabatic LDR path
    (grid/ldr.py run(method='factored')): the A-dressed kinetic
    propagator applied through its rank factor A = S S† — per-dimension
    expK tensordots on nbasis scalar fields, the dense (ntot·ns)²
    propagator is NEVER materialized. Only small real f32 arrays cross
    the axon tunnel; all complex lives in HBM."""
    import jax
    import jax.numpy as jnp
    sol, apes, S, psi0 = _ldr_model(level)
    ns = sol.nstates
    ntot = sol.ntot
    n = ntot * ns
    nx = tuple(sol.nx)
    nb = S.shape[1]

    @jax.jit
    def run(apes_in, S_in, re, im):
        sol.apes = apes_in
        sol.buildV(dt)
        sol.buildK(dt)
        c64 = jnp.complex64
        expV = jnp.reshape(sol.exp_V, (n,)).astype(c64)[:, None]
        expV2 = jnp.reshape(sol.exp_V_half, (n,)).astype(c64)[:, None]
        expKs = [jnp.asarray(k).astype(c64) for k in sol.exp_K]
        Sf = S_in.astype(c64)                        # (ntot, nb, ns)
        Sfc = jnp.conj(Sf)
        B = re.shape[1]

        hi = jax.lax.Precision.HIGHEST

        def kin_fact(p):                             # p: (n, B)
            p3 = jnp.reshape(p, (ntot, ns, B))
            phi = jnp.einsum("ncb, nbq -> ncq", Sf, p3, precision=hi)
            phi = jnp.reshape(phi, nx + (nb * B,))
            for d in range(len(nx)):
                phi = jnp.tensordot(expKs[d], phi, axes=([1], [d]),
                                    precision=hi)
                phi = jnp.moveaxis(phi, 0, d)
            chi = jnp.reshape(phi, (ntot, nb, B))
            out = jnp.einsum("mca, mcq -> maq", Sfc, chi, precision=hi)
            return jnp.reshape(out, (n, B))

        def body(p, _):
            q = expV * kin_fact(p)
            return q, None

        p0 = (re + 1j * im).astype(c64) * expV2
        pf, _ = jax.lax.scan(body, p0, None, length=nsteps)
        return jnp.real(pf), jnp.imag(pf), jnp.sum(jnp.abs(pf) ** 2)

    if batch == 1:
        p0 = psi0.reshape(n, 1)
    else:
        p0 = np.stack([np.roll(psi0.reshape(n), 7 * k)
                       for k in range(batch)], axis=1)
    args = (apes.astype(np.float32), S.astype(np.float32),
            np.ascontiguousarray(p0.real, np.float32),
            np.ascontiguousarray(p0.imag, np.float32))
    return run, args


def bench_ldr_factored_tpu(level=5, nsteps=400, dt=0.01, batch=1):
    """Factored-path throughput (trajectory-steps/s)."""
    run, args = _ldr_factored_run(level, nsteps, dt, batch)
    t = _timeit(run, *args)
    return nsteps * batch / t


def bench_ldr_factored_f64_tpu(level=5, nsteps=400, dt=0.01):
    """Factored path at FLOAT64 on the chip via the library's real-split
    stepper (grid/ldr.py make_split_stepper: complex128 is rejected by
    the TPU outright, so the state is carried as separate re/im f64
    planes through the emulated-f64 pipeline).  Returns (steps/s,
    parity-vs-numpy-f64-truth over 30 steps) — the parity lands at the
    1e-8 project gate (measured ~5e-14), making this the program where
    the headline and the gate finally coincide."""
    sol, apes, S, psi0 = _ldr_model(level)
    import jax
    import jax.numpy as jnp
    n = sol.ntot * sol.nstates
    p0 = psi0.reshape(n, 1)
    pr = np.ascontiguousarray(p0.real)
    pi = np.ascontiguousarray(p0.imag)
    # x64 scoped to this row only (the rest of the bench is the f32
    # production surface); traced dtypes are fixed at trace time, so
    # the timed calls below stay f64 programs
    with jax.enable_x64(True):
        run = sol.make_split_stepper(dt, nsteps, dtype=jnp.float64,
                                     apes=apes, states=S)
        t = _timeit(run, pr, pi)
        rate = nsteps / t

        truth, _ = _ldr_f64_truth(level, 30, dt)
        scale = float(np.max(np.abs(truth)))
        run30 = sol.make_split_stepper(dt, 30, dtype=jnp.float64,
                                       apes=apes, states=S)
        fr, fi = run30(pr, pi)
        pf = np.asarray(fr, np.float64)[:, 0] + 1j * np.asarray(
            fi, np.float64)[:, 0]
        err = float(np.max(np.abs(pf - truth)) / scale)
    return rate, err


def _ldr_f64_truth(level, nsteps, dt):
    """Pure-NumPy float64 ground truth for the benched LDR model: the
    dense U = expV/2 (A ⊙ expKx⊗expKy) expV/2 built from the SineDVR's
    analytic FBR spectrum in f64, propagated nsteps. Returns the final
    state WITHOUT the trailing half-V (matching the factored program's
    stored state: p_k = expV·kin·…·expV·kin·expV/2·p0)."""
    sol, apes, S, psi0 = _ldr_model(level)
    ns, ntot = sol.nstates, sol.ntot
    n = ntot * ns
    expKs = []
    for dvr in sol.dvr:
        nn = np.asarray(dvr.n, dtype=np.float64)
        U = (np.sin(np.outer(nn, nn) * np.pi / (dvr.npts + 1))
             * np.sqrt(2.0 / (dvr.npts + 1)))
        ph = np.exp(-1j * dt / (2 * dvr.mass) * nn ** 2
                    * np.pi ** 2 / dvr.L ** 2)
        expKs.append(U.T @ (ph[:, None] * U))
    K = expKs[0]
    for e in expKs[1:]:
        K = np.kron(K, e)                      # row-major grid flatten
    A = np.einsum("mca, ncb -> manb",
                  S.astype(np.float64), S.astype(np.float64))
    Udense = (A * K[:, None, :, None]).reshape(n, n)
    expVh = np.exp(-1j * (dt / 2) * apes.astype(np.float64)).reshape(n)
    Udense = expVh[:, None] * Udense * expVh[None, :]
    p = expVh * psi0.reshape(n).astype(np.complex128)   # leading half-V
    expV = expVh * expVh
    kin = Udense / expVh[:, None] / expVh[None, :]      # A ⊙ K alone

    # factored f64 application for the FORMULATION gate (rank factor
    # S S† applied exactly as grid/ldr.py _factored_kernel)
    def kin_fact(pv):
        p3 = pv.reshape(ntot, ns)
        phi = np.einsum("ncb, nb -> nc", S.astype(np.float64), p3)
        chi = K @ phi
        return np.einsum("mca, mc -> ma",
                         S.astype(np.float64), chi).reshape(n)

    pd = p.copy()
    pf = p.copy()
    for _ in range(nsteps):
        pd = expV * (kin @ pd)
        pf = expV * kin_fact(pf)
    formulation_err = float(np.max(np.abs(pd - pf)) / np.max(np.abs(pd)))
    return pd, formulation_err


def _ldr_factored_parity(level=5, nsteps=30, dt=0.01):
    """Three-way parity accounting for the factored fast path against a
    pure-NumPy float64 ground truth of the SAME model:

      formulation_err  factored vs dense application, both f64 — pins
                       that A⊙K through the rank factor S S† is the SAME
                       OPERATOR (1e-8 project gate; measured ~1e-15);
      factored_err     the benched f32 TPU factored program vs f64 truth
                       (~1.7e-5 over 30 steps — the f32 rounding floor);
      dense_f32_err    the f32 TPU dense-U program vs the same truth
                       (~3e-3: the dense f32 BUILD dominates — the
                       factored fast path is ~180x CLOSER to truth);
      perstep_err      factored_err / nsteps (coherent growth rate, so
                       a T-step production run carries ~T*perstep_err).
    """
    import jax
    import jax.numpy as jnp
    truth, formulation_err = _ldr_f64_truth(level, nsteps, dt)
    scale = float(np.max(np.abs(truth)))

    run, args = _ldr_factored_run(level, nsteps, dt, batch=1)
    re_f, im_f, _ = run(*args)
    pf = np.asarray(re_f)[:, 0] + 1j * np.asarray(im_f)[:, 0]
    factored_err = float(np.max(np.abs(pf - truth)) / scale)

    # dense f32 comparator (the headline ldr_steps_per_sec program)
    sol, apes, S, psi0 = _ldr_model(level)
    n = sol.ntot * sol.nstates

    @jax.jit
    def dense(apes_in, S_in, re, im):
        sol.apes = apes_in
        sol.build_ovlp(S_in.reshape(*sol.nx, 2, sol.nstates))
        U = sol.short_time_propagator(dt).astype(jnp.complex64)
        vh = jnp.reshape(sol.exp_V_half, (n,)).astype(jnp.complex64)
        p = (re + 1j * im).astype(jnp.complex64)

        def body(p, _):
            return jnp.matmul(U, p[:, None],
                              precision=jax.lax.Precision.HIGHEST)[:, 0], None

        # dense U includes BOTH half-steps: strip the leading half so the
        # trailing offset matches the factored program's stored state
        pf, _ = jax.lax.scan(body, p, None, length=nsteps)
        pf = vh * pf
        return jnp.real(pf), jnp.imag(pf)

    p0 = psi0.reshape(n)
    re_d, im_d = dense(apes.astype(np.float32), S.astype(np.float32),
                       np.ascontiguousarray(p0.real, np.float32),
                       np.ascontiguousarray(p0.imag, np.float32))
    pd = np.asarray(re_d) + 1j * np.asarray(im_d)
    dense_f32_err = float(np.max(np.abs(pd - truth)) / scale)
    return {"ldr_formulation_parity_err": formulation_err,
            "ldr_factored_parity_err": factored_err,
            "ldr_factored_perstep_err": factored_err / nsteps,
            "ldr_dense_f32_parity_err": dense_f32_err}


def bench_ldr_cpu(level=5, dt=0.01):
    """The ACTUAL reference LDRN (pyqed/ldr/ldr.py:320) exec'd from
    /root/reference via tests/ref_oracle.py, on the same 31x31 model.
    Per-step time from the nt=6 minus nt=2 run-time delta (isolates the
    per-step opt_einsum hot loop at :611-618 from the one-time exp_T
    build). Returns steps/s."""
    from ref_oracle import load_reference_module
    ref_ldr = load_reference_module("ldr.ldr")
    sol_t, apes, S, psi0 = _ldr_model(level)
    ns = 2
    sol = ref_ldr.LDRN(sol_t.domains, [level, level], ndim=2, nstates=ns)
    sol.apes = apes
    A = np.einsum("mca, ncb -> manb", S, S).reshape(
        *sol_t.nx, ns, *sol_t.nx, ns)
    sol.A = A

    # WARM the reference's cached exp_T/exp_K build first (its run()
    # caches the propagator across calls, so an unwarmed nt=2 run is
    # dominated by the one-time build and the nt=6 - nt=2 delta can go
    # negative — measured in BENCH r02's 4e12 garbage row).
    # Its build prints chatter to stdout, which would corrupt the
    # one-JSON-line bench contract — swallow it.
    import io
    from contextlib import redirect_stdout
    with redirect_stdout(io.StringIO()):
        sol.run(psi0, dt=dt, nt=2, nout=1)
        t2 = _best_of(lambda: sol.run(psi0, dt=dt, nt=2, nout=1),
                      repeat=2)
        t6 = _best_of(lambda: sol.run(psi0, dt=dt, nt=6, nout=1),
                      repeat=2)
    if t6 - t2 > 0.2 * t6:          # clean per-step delta
        return 4 / (t6 - t2)
    # fallback: whole warmed nt=6 run (conservative — includes run()
    # overheads, never inflates the reported speedup)
    return 6 / t6


# ============================== on-device f64 parity rows (VERDICT r4 #3)

def bench_heom_f64_tpu(nsteps=100, dt=1e-3, gate_steps=50):
    """North-star config #3 at FLOAT64 on the chip.

    complex128 cannot compile on this TPU backend, so the hierarchy is
    carried as separate (re, im) f64 planes and the stacked-superoperator
    RHS (pallas_kernels.heom_rhs_dot contraction, reference hot loop
    pyqed/heom/deom.py:641-673) is expanded into real f64 einsums.
    Parity: the full final hierarchy state after ``gate_steps`` RK4
    steps from the non-stationary gate state vs the SAME operator
    stepped in NumPy complex128 on the host — the project's 1e-8 gate
    measured on the TPU itself.  Returns (steps/s, rel_err).
    """
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _heom_setup
    from pyqed_tpu.ops import pallas_kernels as pk

    H, keys, plus_idx, minus_idx, Q, cvec, nuvec = _heom_setup(
        nsite=7, nexp_per_bath=2, lmax=3)
    nado, M = keys.shape
    n = H.shape[0]
    V = n * n
    B0, Bk = pk.heom_superop_split(H, Q, cvec)
    B0r = np.ascontiguousarray(B0.real)
    B0i = np.ascontiguousarray(B0.imag)
    Bkr = np.ascontiguousarray(Bk.real)
    Bki = np.ascontiguousarray(Bk.imag)
    damp = np.asarray((keys @ nuvec).real, np.float64)
    all_idx = np.concatenate([plus_idx, minus_idx], axis=1)
    wocc = np.asarray(np.concatenate([np.ones_like(keys), keys], axis=1),
                      np.float64)

    # non-stationary gate state (same seed as _heom_kernel_parity)
    rng = np.random.default_rng(7)
    psi = np.zeros(n)
    psi[0] = psi[1] = 1 / np.sqrt(2)
    re0 = 1e-3 * rng.standard_normal((nado, n, n))
    im0 = 1e-3 * rng.standard_normal((nado, n, n))
    re0[0] = np.outer(psi, psi)
    im0[0] = 0.0

    # host complex128 truth of the SAME operator
    def np_rhs(flat):
        padded = np.concatenate([flat, np.zeros((1, V), complex)])
        g = padded[all_idx] * wocc[:, :, None]
        out = flat @ B0.T + np.einsum("Nkb, akb -> Na", g, Bk)
        return out - damp[:, None] * flat

    y = (re0 + 1j * im0).reshape(nado, V)
    for _ in range(gate_steps):
        k1 = np_rhs(y)
        k2 = np_rhs(y + k1 * (dt / 2))
        k3 = np_rhs(y + k2 * (dt / 2))
        k4 = np_rhs(y + k3 * dt)
        y = y + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
    truth = y.reshape(nado, n, n)
    scale = float(np.max(np.abs(truth)))

    with jax.enable_x64(True):
        hi = jax.lax.Precision.HIGHEST

        def rhs(fr, fi):
            pr = jnp.concatenate([fr, jnp.zeros((1, V), fr.dtype)])
            pi = jnp.concatenate([fi, jnp.zeros((1, V), fi.dtype)])
            gr = pr[all_idx] * wocc[:, :, None]
            gi = pi[all_idx] * wocc[:, :, None]
            our = (jnp.einsum("Nb, ab -> Na", fr, B0r, precision=hi)
                   - jnp.einsum("Nb, ab -> Na", fi, B0i, precision=hi)
                   + jnp.einsum("Nkb, akb -> Na", gr, Bkr, precision=hi)
                   - jnp.einsum("Nkb, akb -> Na", gi, Bki, precision=hi)
                   - damp[:, None] * fr)
            oui = (jnp.einsum("Nb, ab -> Na", fr, B0i, precision=hi)
                   + jnp.einsum("Nb, ab -> Na", fi, B0r, precision=hi)
                   + jnp.einsum("Nkb, akb -> Na", gr, Bki, precision=hi)
                   + jnp.einsum("Nkb, akb -> Na", gi, Bkr, precision=hi)
                   - damp[:, None] * fi)
            return our, oui

        def one_step(fr, fi):
            k1r, k1i = rhs(fr, fi)
            k2r, k2i = rhs(fr + k1r * (dt / 2), fi + k1i * (dt / 2))
            k3r, k3i = rhs(fr + k2r * (dt / 2), fi + k2i * (dt / 2))
            k4r, k4i = rhs(fr + k3r * dt, fi + k3i * dt)
            return (fr + (dt / 6) * (k1r + 2 * k2r + 2 * k3r + k4r),
                    fi + (dt / 6) * (k1i + 2 * k2i + 2 * k3i + k4i))

        def make_run(length):
            @jax.jit
            def run(fr, fi):
                def body(c, _):
                    return one_step(*c), None
                c, _ = jax.lax.scan(body, (fr, fi), None, length=length)
                return c
            return run

        fr0 = np.ascontiguousarray(re0.reshape(nado, V))
        fi0 = np.ascontiguousarray(im0.reshape(nado, V))
        out = make_run(gate_steps)(fr0, fi0)
        dev = (np.asarray(out[0], np.float64)
               + 1j * np.asarray(out[1], np.float64)).reshape(nado, n, n)
        err = float(np.max(np.abs(dev - truth)) / scale)
        t = _timeit(make_run(nsteps), fr0, fi0)
    return nsteps / t, err


def bench_2des_f64_tpu(nw=512, nt2=256, gate_nw=64, gate_nt2=8):
    """Config #4 cube at FLOAT64 on the chip: the exact low-rank
    factors (signal/sos.py _photon_echo_factors) are computed host-side
    at complex128, then the (T,K)x(K,W1)x(K,W3) cube assembly runs as
    real-split f64 einsums on the TPU.  Parity at the gate shape vs the
    host complex128 assembly (itself pinned to the actual reference
    pathway functions at 1e-10 in tests/).  Returns
    (sec_per_map, rel_err)."""
    import jax
    import jax.numpy as jnp
    from pyqed_tpu.signal.sos import _photon_echo_factors
    E, dip, gamma = _dimer_system()

    with jax.enable_x64(True):
        hi = jax.lax.Precision.HIGHEST

        @jax.jit
        def assemble_ri(Cr, Ci, Ar, Ai, Br, Bi):
            CAr = Cr[:, :, None] * Ar[None] - Ci[:, :, None] * Ai[None]
            CAi = Cr[:, :, None] * Ai[None] + Ci[:, :, None] * Ar[None]
            Sr = (jnp.einsum("tki, kj -> tij", CAr, Br, precision=hi)
                  - jnp.einsum("tki, kj -> tij", CAi, Bi, precision=hi))
            Si = (jnp.einsum("tki, kj -> tij", CAr, Bi, precision=hi)
                  + jnp.einsum("tki, kj -> tij", CAi, Br, precision=hi))
            return Sr, Si

        cpu = jax.devices("cpu")[0]

        def factors(nw_, nt2_):
            w = np.linspace(0.7, 1.45, nw_)
            t2s = np.linspace(0.0, 30.0, nt2_)
            with jax.default_device(cpu):
                C, A, B = _photon_echo_factors(E, dip, gamma, w, w, t2s,
                                               [0], [1, 2], [3])
                C, A, B = (np.asarray(C), np.asarray(A), np.asarray(B))
            return C, A, B

        # parity gate at the reduced shape
        C, A, B = factors(gate_nw, gate_nt2)
        truth = np.einsum("tk, ki, kj -> tij", C, A, B)
        Sr, Si = assemble_ri(
            np.ascontiguousarray(C.real), np.ascontiguousarray(C.imag),
            np.ascontiguousarray(A.real), np.ascontiguousarray(A.imag),
            np.ascontiguousarray(B.real), np.ascontiguousarray(B.imag))
        dev = np.asarray(Sr, np.float64) + 1j * np.asarray(Si, np.float64)
        err = float(np.max(np.abs(dev - truth)) / np.max(np.abs(truth)))

        # full-size f64 throughput
        C, A, B = factors(nw, nt2)
        args = (np.ascontiguousarray(C.real), np.ascontiguousarray(C.imag),
                np.ascontiguousarray(A.real), np.ascontiguousarray(A.imag),
                np.ascontiguousarray(B.real), np.ascontiguousarray(B.imag))
        t = _timeit(assemble_ri, *args)
    return t / nt2, err


def _ldr_f64_dense_ops(level, dt):
    """Host complex128 dense LDR operators for the benched model:
    (Udense, expVh, psi0_flat) — the exact f64 build that
    _ldr_f64_truth steps (SineDVR analytic FBR spectrum)."""
    sol, apes, S, psi0 = _ldr_model(level)
    ns, ntot = sol.nstates, sol.ntot
    n = ntot * ns
    expKs = []
    for dvr in sol.dvr:
        nn = np.asarray(dvr.n, dtype=np.float64)
        U = (np.sin(np.outer(nn, nn) * np.pi / (dvr.npts + 1))
             * np.sqrt(2.0 / (dvr.npts + 1)))
        ph = np.exp(-1j * dt / (2 * dvr.mass) * nn ** 2
                    * np.pi ** 2 / dvr.L ** 2)
        expKs.append(U.T @ (ph[:, None] * U))
    K = expKs[0]
    for e in expKs[1:]:
        K = np.kron(K, e)
    A = np.einsum("mca, ncb -> manb",
                  S.astype(np.float64), S.astype(np.float64))
    Udense = (A * K[:, None, :, None]).reshape(n, n)
    expVh = np.exp(-1j * (dt / 2) * apes.astype(np.float64)).reshape(n)
    Udense = expVh[:, None] * Udense * expVh[None, :]
    return Udense, expVh, psi0.reshape(n).astype(np.complex128)


def bench_ldr_dense_f64_tpu(level=5, nsteps=200, dt=0.01, gate_steps=30):
    """The dense-U LDR row at FLOAT64 on the chip (VERDICT r4 #4: the
    benched dense-f32 row failed parity by 7 decades because the f32
    BUILD dominates — here U is built host-side at complex128 and the
    per-step matvec runs as stacked-rhs real f64 MXU matmuls).  Parity
    vs the NumPy f64 dense trajectory (same trailing-half-V convention
    as _ldr_f64_truth).  Returns (steps/s, rel_err)."""
    import jax
    import jax.numpy as jnp
    Udense, expVh, p0 = _ldr_f64_dense_ops(level, dt)
    n = Udense.shape[0]

    # truth: gate_steps dense complex128 steps, stored WITHOUT the
    # trailing half-V (multiply back at the end, as _ldr_factored_parity
    # does for the dense comparator)
    p = p0.copy()
    for _ in range(gate_steps):
        p = Udense @ p
    truth = p.copy()
    scale = float(np.max(np.abs(truth)))

    Ur = np.ascontiguousarray(Udense.real)
    Ui = np.ascontiguousarray(Udense.imag)

    with jax.enable_x64(True):
        hi = jax.lax.Precision.HIGHEST

        def make_run(length):
            @jax.jit
            def run(re, im, Ur, Ui):
                def body(pp, _):
                    A = jnp.matmul(Ur, pp, precision=hi)   # (n, 2)
                    Bm = jnp.matmul(Ui, pp, precision=hi)
                    q = jnp.stack([A[:, 0] - Bm[:, 1],
                                   A[:, 1] + Bm[:, 0]], axis=1)
                    return q, jnp.sum(q ** 2)
                pp0 = jnp.stack([re, im], axis=1)          # (n, 2)
                pf, norms = jax.lax.scan(body, pp0, None, length=length)
                return pf[:, 0], pf[:, 1], norms

            return run

        Urd = jax.device_put(Ur)
        Uid = jax.device_put(Ui)
        jax.block_until_ready((Urd, Uid))
        rg = make_run(gate_steps)(
            np.ascontiguousarray(p0.real), np.ascontiguousarray(p0.imag),
            Urd, Uid)
        dev = np.asarray(rg[0], np.float64) + 1j * np.asarray(
            rg[1], np.float64)
        err = float(np.max(np.abs(dev - truth)) / scale)
        t = _timeit(make_run(nsteps),
                    np.ascontiguousarray(p0.real),
                    np.ascontiguousarray(p0.imag), Urd, Uid)
    return nsteps / t, err


# =========================== wavepacket at chip scale (VERDICT r4 #2)

def _spo3_model(n, span=7.0):
    """3D two-state coupled-harmonic diabatic model on an n^3 grid
    (reference semantics: pyqed/wpd.py:1349 SPO3.run, sized for the
    chip)."""
    x = np.linspace(-span, span, n, endpoint=False)
    dx = x[1] - x[0]
    shape3 = (n, n, n)
    X = x[:, None, None]
    Y = x[None, :, None]
    Z = x[None, None, :]
    R2 = np.broadcast_to(X ** 2 + Y ** 2 + Z ** 2, shape3)
    v1 = 0.5 * R2
    v2 = 0.5 * (np.broadcast_to((X - 1.0) ** 2 + Y ** 2 + Z ** 2,
                                shape3)) + 1.0
    c = 0.2 * np.exp(-0.5 * R2)
    k = 2 * np.pi * np.fft.fftfreq(n, dx)
    k2 = (k[:, None, None] ** 2 + k[None, :, None] ** 2
          + k[None, None, :] ** 2) / 2.0
    psi0 = np.exp(-((X + 1.0) ** 2 + Y ** 2 + Z ** 2) / 2.0)
    psi0 = np.broadcast_to(psi0, shape3).copy()
    psi0 /= np.sqrt(np.sum(psi0 ** 2) * dx ** 3)
    return v1, v2, c, k2, psi0


def _spo3_phase_ops(v1, v2, c, k2, dt):
    """Closed-form 2x2 Hermitian potential propagator pieces (f64
    host): exp(-i V dt/2) = e^{-i m dt/2}[cos(r dt/2) I
    - i sin(r dt/2)/r (d sz + c sx)], m = (v1+v2)/2, d = (v1-v2)/2."""
    m = 0.5 * (v1 + v2)
    d = 0.5 * (v1 - v2)
    r = np.sqrt(d * d + c * c)
    r_safe = np.where(r == 0, 1.0, r)
    th = dt / 2.0
    cosr = np.cos(r * th)
    sinc = np.sin(r * th) / r_safe
    ph = np.exp(-1j * m * th)
    # U = ph * [[cosr - i sinc d, -i sinc c], [-i sinc c, cosr + i sinc d]]
    u00 = ph * (cosr - 1j * sinc * d)
    u01 = ph * (-1j * sinc * c)
    u11 = ph * (cosr + 1j * sinc * d)
    expK = np.exp(-1j * k2 * dt)
    return u00, u01, u11, expK


def bench_spo3_tpu(n=256, nsteps=20, dt=0.004, gate_n=64, gate_steps=10):
    """Chip-scale 3D SPO: (n, n, n) x 2 states, full Strang step
    V/2.K.V/2 with a 3D FFT KEO — the wavepacket-at-scale row VERDICT
    r4 #2 asked for (the 1024-pt config-#1 row is latency-bound; this
    one must stream).  All complex stays on-device (c64); the jit
    boundary is real f32.  Parity gate: the same program at gate_n^3
    vs the host complex128 NumPy Strang loop.  Returns
    (steps_per_sec, rel_err, roofline)."""
    import jax
    import jax.numpy as jnp

    def make_run(nn, length, dtype=np.float32):
        v1, v2, c, k2, psi0 = _spo3_model(nn)
        u00, u01, u11, expK = _spo3_phase_ops(v1, v2, c, k2, dt)
        f = lambda a: np.ascontiguousarray(a, dtype)
        ops = (f(u00.real), f(u00.imag), f(u01.real), f(u01.imag),
               f(u11.real), f(u11.imag), f(expK.real), f(expK.imag))

        @jax.jit
        def run(pr, pi, a00r, a00i, a01r, a01i, a11r, a11i, kr, ki):
            u00 = a00r + 1j * a00i
            u01 = a01r + 1j * a01i
            u11 = a11r + 1j * a11i
            eK = kr + 1j * ki

            def vapply(p, b00, b01, b11):
                p0 = b00 * p[..., 0] + b01 * p[..., 1]
                p1 = b01 * p[..., 0] + b11 * p[..., 1]
                return jnp.stack([p0, p1], axis=-1)

            # Strang interior fusion: Vh (K V)^{n-1} K Vh = Vh^dag (V K)^n Vh
            # (V unitary here) -> ONE full-V apply per scan step instead of
            # two halves, the boundary halves outside the scan
            v00 = u00 * u00 + u01 * u01
            v01 = u01 * (u00 + u11)
            v11 = u11 * u11 + u01 * u01

            def body(p, _):
                pk_ = jnp.fft.fftn(p, axes=(0, 1, 2))
                pk_ = pk_ * eK[..., None]
                p = jnp.fft.ifftn(pk_, axes=(0, 1, 2))
                p = vapply(p, v00, v01, v11)
                return p, jnp.real(jnp.sum(jnp.abs(p[..., 0]) ** 2))

            p = (pr + 1j * pi)[..., None] * jnp.asarray([1.0, 0.0],
                                                        pr.dtype)
            p = vapply(p, u00, u01, u11)
            p, pops = jax.lax.scan(body, p, None, length=length)
            # undo the extra trailing half-V: Vh^{-1} = Vh^dag (unitary)
            p = vapply(p, jnp.conj(u00), jnp.conj(u01), jnp.conj(u11))
            return jnp.real(p), jnp.imag(p), pops

        pr0 = np.ascontiguousarray(psi0, dtype)
        return run, (pr0, np.zeros_like(pr0)) + ops, psi0

    # ---- parity gate at gate_n^3 vs host complex128 ----
    run_g, args_g, psi0_g = make_run(gate_n, gate_steps)
    out = run_g(*args_g)
    dev = (np.asarray(out[0], np.float64)
           + 1j * np.asarray(out[1], np.float64))
    v1, v2, c, k2, _ = _spo3_model(gate_n)
    u00, u01, u11, expK = _spo3_phase_ops(v1, v2, c, k2, dt)
    p = np.zeros(dev.shape, np.complex128)
    p[..., 0] = psi0_g

    def vhalf_np(p):
        q = np.empty_like(p)
        q[..., 0] = u00 * p[..., 0] + u01 * p[..., 1]
        q[..., 1] = u01 * p[..., 0] + u11 * p[..., 1]
        return q

    for _ in range(gate_steps):
        p = vhalf_np(p)
        p = np.fft.ifftn(np.fft.fftn(p, axes=(0, 1, 2))
                         * expK[..., None], axes=(0, 1, 2))
        p = vhalf_np(p)
    err = float(np.max(np.abs(dev - p)) / np.max(np.abs(p)))

    # ---- chip-scale throughput at n^3 ----
    # operands MUST be device-resident before timing: the model arrays
    # are ~470 MB and the axon tunnel moves ~50 MB/s, so host args would
    # make the row a transfer benchmark (measured 1.2 steps/s vs ~45)
    import jax as _jax
    run, args, _ = make_run(n, nsteps)
    args = tuple(_jax.device_put(a) for a in args)
    _jax.block_until_ready(args)
    t = _timeit(run, *args)
    rate = nsteps / t
    # mandatory HBM traffic per step: each of the 6 single-axis FFT
    # passes (fftn + ifftn, 3 axes each) reads+writes the 2-plane c64
    # state (12 passes), the k-space phase multiply is another r+w pair
    # + expK read, and the ONE fused full-V apply reads state + the 3
    # c64 potential-op arrays and writes state -> 16 state passes total
    state = 8 * n ** 3 * 2            # one pass of the c64 2-state field
    ops_b = 3 * 8 * n ** 3 + 8 * n ** 3
    byt = 16 * state + ops_b
    # FFT flops: 2 ffts x 3 axes x 5 N log2 n x 2 states (complex)
    flops = 2 * 3 * 5 * (n ** 3) * np.log2(n) * 2 + 6 * 8 * n ** 3
    roof = _peaks(flops, byt, rate)
    return rate, err, roof


def bench_spo3_f64_tpu(n=256, nsteps=4, dt=0.004):
    """The SPO3 row at FLOAT64 on the chip, at the SAME >=256^3 x 2
    scale as the f32 row.  complex128 cannot compile on this backend
    AND the f64 FFT is unsupported, so the KEO runs as real-split
    DFT-MATMULS along each axis (the kernel='dft' trick at scale: F psi
    via 4 real f64 MXU matmuls per axis).  Layout note: the 2-state
    axis leads (2, n, n, n) — a trailing size-2 axis gets lane-padded
    2 -> 128 under the f64 emulation (measured 64x HBM expansion, OOM
    at 24 GB), states-first keeps the minormost dims dense.  Parity vs
    the host complex128 NumPy Strang loop at the same shape.  Returns
    (steps_per_sec, rel_err)."""
    import jax
    import jax.numpy as jnp

    v1, v2, c, k2, psi0 = _spo3_model(n)
    u00, u01, u11, expK = _spo3_phase_ops(v1, v2, c, k2, dt)
    j = np.arange(n)
    F = np.exp(-2j * np.pi * np.outer(j, j) / n)
    Fr = np.ascontiguousarray(F.real)
    Fi = np.ascontiguousarray(F.imag)

    with jax.enable_x64(True):

        def dft_axis(pr, pi, Ar, Ai, axis):
            # p (2, n, n, n): transform grid axis in {1, 2, 3} via a
            # LAST-axis matmul (clean (.., n) layouts end to end)
            pr = jnp.moveaxis(pr, axis, -1)
            pi = jnp.moveaxis(pi, axis, -1)
            qr = pr @ Ar.T - pi @ Ai.T
            qi = pr @ Ai.T + pi @ Ar.T
            return (jnp.moveaxis(qr, -1, axis),
                    jnp.moveaxis(qi, -1, axis))

        ops = tuple(np.ascontiguousarray(a, np.float64) for a in
                    (u00.real, u00.imag, u01.real, u01.imag,
                     u11.real, u11.imag, expK.real, expK.imag))

        @jax.jit
        def run(pr, pi, a00r, a00i, a01r, a01i, a11r, a11i, kr, ki):
            def vhalf(pr, pi):
                q0r = (a00r * pr[0] - a00i * pi[0]
                       + a01r * pr[1] - a01i * pi[1])
                q0i = (a00r * pi[0] + a00i * pr[0]
                       + a01r * pi[1] + a01i * pr[1])
                q1r = (a01r * pr[0] - a01i * pi[0]
                       + a11r * pr[1] - a11i * pi[1])
                q1i = (a01r * pi[0] + a01i * pr[0]
                       + a11r * pi[1] + a11i * pr[1])
                return jnp.stack([q0r, q1r]), jnp.stack([q0i, q1i])

            def body(carry, _):
                pr, pi = carry
                pr, pi = vhalf(pr, pi)
                for ax in (1, 2, 3):
                    pr, pi = dft_axis(pr, pi, Fr, Fi, ax)
                qr = kr[None] * pr - ki[None] * pi
                qi = kr[None] * pi + ki[None] * pr
                pr, pi = qr, qi
                for ax in (1, 2, 3):
                    # inverse DFT: F^{-1} = conj(F)/n
                    pr, pi = dft_axis(pr, pi, Fr, -Fi, ax)
                    pr = pr / n
                    pi = pi / n
                pr, pi = vhalf(pr, pi)
                return (pr, pi), jnp.sum(pr[0] ** 2 + pi[0] ** 2)

            p0r = jnp.stack([pr, jnp.zeros_like(pr)])
            p0i = jnp.zeros_like(p0r)
            (pr, pi), pops = jax.lax.scan(body, (p0r, p0i), None,
                                          length=nsteps)
            return pr, pi, pops

        pr0 = np.ascontiguousarray(psi0, np.float64)
        dargs = tuple(jax.device_put(a) for a in
                      (pr0, np.zeros_like(pr0)) + ops)
        jax.block_until_ready(dargs)
        out = run(*dargs)
        dev = (np.asarray(out[0], np.float64)
               + 1j * np.asarray(out[1], np.float64))
        t = _timeit(run, *dargs)

    # host complex128 truth, same shape/steps (states-first layout)
    p = np.zeros((2, n, n, n), np.complex128)
    p[0] = psi0

    def vhalf_np(p):
        q = np.empty_like(p)
        q[0] = u00 * p[0] + u01 * p[1]
        q[1] = u01 * p[0] + u11 * p[1]
        return q

    for _ in range(nsteps):          # truth matches the device scan
        p = vhalf_np(p)
        p = np.fft.ifftn(np.fft.fftn(p, axes=(1, 2, 3))
                         * expK[None], axes=(1, 2, 3))
        p = vhalf_np(p)
    err = float(np.max(np.abs(dev - p)) / np.max(np.abs(p)))
    return nsteps / t, err


def bench_lindblad_batched_tpu(B=4096, nsteps=100000, dt=0.002, nout=50):
    """Config #2 at chip scale: B vibronic dimers propagated at once
    through the SAME folded window propagator (one (n^2, n^2) x
    (n^2, B) MXU matmul per observation window) — the
    non-latency-bound companion VERDICT r4 #2 asked for (the B=1 row
    is RPC/latency-bound at 0.2%% of MXU peak).  Returns
    (traj_steps_per_sec, roofline)."""
    import jax
    import jax.numpy as jnp
    from pyqed_tpu.ops.superoperator import liouvillian
    H, c = _vibronic_dimer()
    n = H.shape[0]
    Hr = H.astype(np.float32)
    cr = c.astype(np.float32)

    @jax.jit
    def build():
        L = liouvillian(jnp.asarray(Hr) + 0j, [jnp.asarray(cr) + 0j])
        X = L * dt
        M = jnp.eye(n * n, dtype=X.dtype)
        term = jnp.eye(n * n, dtype=X.dtype)
        for k in range(1, 5):
            term = (term @ X) / k
            M = M + term
        Mk = jnp.linalg.matrix_power(M, nout)
        return jnp.real(Mk), jnp.imag(Mk)

    Mk_ri = build()
    jax.block_until_ready(Mk_ri)

    @jax.jit
    def run(re, im, Mr, Mi):
        # stacked-rhs complex matmul: TWO f32 MXU matmuls per window
        def body(p, _):
            A = jnp.matmul(Mr, p, precision=jax.lax.Precision.HIGHEST)
            Bm = jnp.matmul(Mi, p, precision=jax.lax.Precision.HIGHEST)
            qr = A[:, :B] - Bm[:, B:]
            qi = A[:, B:] + Bm[:, :B]
            q = jnp.concatenate([qr, qi], axis=1)
            return q, jnp.sum(q[0] ** 2)
        p0 = jnp.concatenate([re, im], axis=1)       # (n^2, 2B)
        pf, tr = jax.lax.scan(body, p0, None, length=nsteps // nout)
        return pf[:, :B], pf[:, B:], tr

    rng = np.random.default_rng(3)
    # B random product states rho = |psi><psi| vectorized
    psis = rng.standard_normal((B, n)).astype(np.float32)
    psis /= np.linalg.norm(psis, axis=1, keepdims=True)
    rhos = np.einsum("bi, bj -> bij", psis, psis).reshape(B, n * n).T
    re = jax.device_put(np.ascontiguousarray(rhos, np.float32))
    im = jax.device_put(np.zeros((n * n, B), np.float32))
    jax.block_until_ready((re, im))
    t = _timeit(run, re, im, *Mk_ri)
    rate = nsteps * B / t
    dim = n * n
    # per window: 2 real (dim, dim) x (dim, 2B) matmuls
    flops = 2.0 * (2 * dim * dim * 2 * B) / nout / B   # per traj fine step
    byt = (2 * 4 * dim * dim + 2 * 4 * dim * 2 * B) / nout / B
    roof = _peaks(flops * B, byt * B, rate / B)
    return rate, roof


def _heom_kernel_parity(candidates, nsteps=200, dt=1e-3, rtol=2e-3,
                        nsite=7, nexp_per_bath=2, lmax=3):
    """On-device parity gate (round-1 advisor finding): propagate nsteps
    with each candidate kernel and compare the full final hierarchy state
    against the matmul/HIGHEST path ON THE CHIP (where the precision flag
    is live — the CPU f64 suite can't see an MXU rounding regression).
    Kernels deviating beyond rtol of the state scale are excluded from
    the headline.  Shape-parametrized: each benched shape runs its OWN
    gate (a kernel bug can be shape-dependent).

    The initial state MUST be non-stationary: |0><0| on the root ADO is
    an exact fixed point of this exciton+projector-bath model (ground
    state decoupled from H and every Q), so a gate started there
    compares constant trajectories and admits ANY kernel (r2's gates
    were vacuous this way). Here: ground/site-1 coherence on the root
    plus small seeded tails on every ADO, and the gate additionally
    asserts the reference trajectory actually moved.

    rtol = 2e-3: the measured 200-step bf16 (Precision.DEFAULT) rounding
    floor on this trajectory is 6.2e-4 at both benched shapes (identical
    for matmul-fast and pallas-fast — it is the precision class, not the
    kernel); the precise Pallas kernel sits at 2e-6. A formulation bug
    (wrong coupling/weight) deviates at O(1), so 3x the rounding floor
    separates cleanly."""
    import jax
    from __graft_entry__ import _heom_setup, _heom_step_fn
    setup = _heom_setup(nsite=nsite, nexp_per_bath=nexp_per_bath,
                        lmax=lmax)

    def init_state(nado, n):
        rng = np.random.default_rng(7)
        psi = np.zeros(n)
        psi[0] = psi[1] = 1 / np.sqrt(2)
        re = 1e-3 * rng.standard_normal((nado, n, n)).astype(np.float32)
        im = 1e-3 * rng.standard_normal((nado, n, n)).astype(np.float32)
        re[0] = np.outer(psi, psi)
        im[0] = 0.0
        return re, im

    def final_state(kernel):
        step, nado, n = _heom_step_fn(*setup, dt=dt, kernel=kernel)

        @jax.jit
        def run(re, im):
            def body(c, _):
                return step(*c), None
            c, _ = jax.lax.scan(body, (re, im), None, length=nsteps)
            return c

        re, im = init_state(nado, n)
        out = run(re, im)
        return (np.asarray(out[0]), np.asarray(out[1])), (re, im)

    (ref_re, ref_im), (re0, im0) = final_state("matmul")
    scale = max(np.max(np.abs(ref_re)), np.max(np.abs(ref_im)), 1e-30)
    moved = max(np.max(np.abs(ref_re - re0)), np.max(np.abs(ref_im - im0)))
    if moved < 1e-6 * scale:
        # stationary reference = vacuous gate: admit nothing fancy
        return {k: False for k in candidates}
    admitted = {}
    for k in candidates:
        (o_re, o_im), _ = final_state(k)
        dev = max(np.max(np.abs(o_re - ref_re)),
                  np.max(np.abs(o_im - ref_im)))
        admitted[k] = bool(dev <= rtol * scale)
    return admitted


def _device_reachable(timeout_s=900):
    """Probe the device in a CHILD process with a hard timeout: a dead
    axon tunnel makes jax.devices() hang forever, which would turn a
    bench run into a silent stall. Returns True when a trivial jitted
    op round-trips within the timeout."""
    import subprocess
    code = ("import numpy as np, jax;"
            "v = np.asarray(jax.jit(lambda a: a + 1)(np.ones(4, np.float32)));"
            "print('ok', v[0])")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _emit(obj):
    """One-JSON-line contract: bench JSON goes STRAIGHT to the real
    stdout handle, bypassing any redirect — so a stray dict-style
    print from exec'd reference code can never forge a bench line
    (ADVICE r4: the old _Tee forwarded anything starting with '{')."""
    sys.__stdout__.write(json.dumps(obj) + "\n")
    sys.__stdout__.flush()


def main():
    if not _device_reachable():
        _emit(({
            "metric": "heom_hierarchy_steps_per_sec",
            "value": 0.0, "unit": "steps/s", "vs_baseline": 0.0,
            "extra": {"error": "device unreachable: no response "
                               f"within {900} s (axon tunnel down/cold) "
                               "— no measurements taken"}}))
        return
    # measure the RPC floor FIRST (before any big program touches the
    # allocator — the HEOM program degrades small programs compiled
    # after it, which would inflate the reported floor)
    rpc_floor = _rpc_floor_ms()
    # Order matters on-device: the HEOM hierarchy program leaves the
    # allocator in a state that degrades VMEM-resident small-matvec
    # programs compiled AFTER it (measured ~200x on the folded
    # propagator benches), so the small configs and the 2DES map run
    # first and the big HEOM program runs last.
    lind, lind_roof = bench_lindblad_tpu()
    pol = bench_polariton_tpu()
    spo, spo_roof = bench_spo_tpu()
    t_2des_tpu = bench_2des_tpu()
    t_2des_amort, tdes_roof = bench_2des_tpu_amortized()
    (t_2des_fact, t_2des_fact_pipe, tdes_fact_err,
     tdes_fact_roof) = bench_2des_factored_tpu()
    # chip-scale companions (VERDICT r4 #2): these rows must stream
    lind_b, lind_b_roof = bench_lindblad_batched_tpu()
    spo3, spo3_err, spo3_roof = bench_spo3_tpu()
    spo3_f64, spo3_f64_err = bench_spo3_f64_tpu()
    # on-device f64 parity rows (VERDICT r4 #3)
    tdes_f64_map, tdes_f64_err = bench_2des_f64_tpu()
    ldr = bench_ldr_tpu(batch=1)
    ldr_b8 = bench_ldr_tpu(batch=8)
    # factored nonadiabatic path (rank-nbasis overlap): parity-gated
    # on-device against the dense U program, then timed at the dense
    # shape and at level 7 (127x127: the dense propagator would be an
    # unmaterializable 8.3 GB — only this path can run it)
    ldr_parity = _ldr_factored_parity()
    # admission gates: the FORMULATION must meet the 1e-8 project gate
    # (factored ≡ dense as operators, f64), and the f32 program must sit
    # at the f32 rounding floor vs the f64 truth (≤1e-4 over 30 steps)
    ldr_fact_ok = (ldr_parity["ldr_formulation_parity_err"] < 1e-8
                   and ldr_parity["ldr_factored_parity_err"] < 1e-4)
    ldr_fact = (bench_ldr_factored_tpu(level=5, nsteps=2000)
                if ldr_fact_ok else 0.0)
    # f64 factored path (real-split stepper: complex128 cannot exist
    # on the chip, so re/im are separate f64 planes through the
    # emulated-f64 pipeline) — the ONE on-chip program that meets the
    # project's 1e-8 parity gate outright
    ldr_f64, ldr_f64_err = bench_ldr_factored_f64_tpu()
    # dense-U f64 row (VERDICT r4 #4: the dense-f32 row fails parity by
    # 7 decades because the f32 BUILD dominates; at f64 the same dense
    # formulation is exact)
    ldr_dense_f64, ldr_dense_f64_err = bench_ldr_dense_f64_tpu()
    if os.environ.get("PYQED_BENCH_NO_LDR7") or not ldr_fact_ok:
        ldr7 = ldr7_b16 = None
    else:
        ldr7 = bench_ldr_factored_tpu(level=7, nsteps=400)
        ldr7_b16 = bench_ldr_factored_tpu(level=7, nsteps=400, batch=16)
    # chip-scale flagship (63x63 grid, 7938^2 propagator — the size the
    # reference cannot run at all): ON by default (two clean runs on
    # v5e: ~1200 steps/s single-trajectory, batching the rhs amortizes
    # the 0.5 GB/step HBM stream: 31.7k traj-steps/s at batch=64);
    # PYQED_BENCH_NO_LDR6=1 skips it (kill-switch for a flaky tunnel)
    if os.environ.get("PYQED_BENCH_NO_LDR6"):
        ldr6 = ldr6_b64 = None
    else:
        # one propagator build shared by both batch sizes
        ldr6, ldr6_b64 = bench_ldr_tpu(level=6, nsteps=200, blocked=True,
                                       batch=(1, 64))

    # on-device parity gate before any fast kernel can set the headline.
    # Pallas RETIRED from the bench path (VERDICT r4 #5, measured r5):
    # after making the level kernels order-aware (select-first plus
    # couplings, equal FLOPs to the XLA levels path) pallas-fast gained
    # +15% at the flagship shape (5841 -> 6703 steps/s) but still loses
    # to levels-fast at BOTH shapes (6703 vs 10581 flagship; 1471 vs
    # 1847 large, same session) — the residual gap is per-level kernel
    # launches + unfused mode-grid dots that XLA's fusion avoids, not
    # redundant compute. Kernels + parity tests stay in the library
    # (ops/pallas_kernels.py, tests/test_pallas.py).
    flagship_kernels = ["matmul-fast", "levels", "levels-fast",
                        "rowcol-fast"]
    fast_ok = _heom_kernel_parity(flagship_kernels)
    heom_matmul = bench_heom_tpu("matmul")
    rates = {"matmul": heom_matmul}
    for k in flagship_kernels:
        rates[k] = bench_heom_tpu(k)
    heom_best = max(r for k, r in rates.items()
                    if k == "matmul" or fast_ok.get(k, False))
    heom_best_kernel = max(
        (k for k in rates if k == "matmul" or fast_ok.get(k, False)),
        key=lambda k: rates[k])

    # large-shape HEOM (10 sites, nado=1771 — the size where r2's
    # stacked-superoperator Pallas kernel LOST to XLA 375 vs 646 and was
    # deleted). Ranking measured here (r3): the order-aware mode-folded
    # XLA levels kernel (heom_rhs_levels_xla_factory) wins — ~2151
    # steps/s vs 658 for the stacked dot and ~1737 for the Pallas grid
    # levels kernel; the rowcol gather kernel loses badly on TPU.
    # Parity-gated AT THIS SHAPE (kernel bugs can be shape-dependent);
    # a failing kernel reports 0.0 rather than an unverified rate.
    large_kernels = ["matmul-fast", "levels-fast"]
    fast_ok_L = _heom_kernel_parity(large_kernels, nsteps=60, nsite=10)
    heom_L = {k: (bench_heom_tpu(k, nsteps=300, nsite=10)
                  if fast_ok_L.get(k, False) else 0.0)
              for k in large_kernels}

    # f64 HEOM north-star gate row, AFTER the big f32 HEOM programs
    heom_f64, heom_f64_err = bench_heom_f64_tpu()

    heom_cpu = bench_heom_cpu()            # C++ reference transcription
    heom_refpy = bench_heom_cpu_refpy()    # actual reference code, no numba
    t_2des_cpu = bench_2des_cpu()
    spo_cpu = bench_spo_cpu()
    lind_cpu = bench_lindblad_cpu()
    pol_cpu = bench_polariton_cpu()
    pol_cpu_batched = bench_polariton_cpu(batched=True)
    ldr_cpu = bench_ldr_cpu()

    _emit(({
        "metric": "heom_hierarchy_steps_per_sec",
        "value": round(heom_best, 2),
        "unit": "steps/s",
        "vs_baseline": round(heom_best / heom_cpu, 2),
        "extra": {
            "axon_rpc_floor_ms": round(rpc_floor, 1),
            "heom_best_kernel": heom_best_kernel,
            "heom_kernel_parity_ok": fast_ok,
            "heom_pallas_note": (
                "pallas retired from the bench path r5: order-aware "
                "select-first kernels reach equal FLOPs to levels-fast "
                "but lose 6703-vs-10581 (flagship) / 1471-vs-1847 "
                "(large) to XLA fusion; parity-tested kernels kept in "
                "ops/pallas_kernels.py"),
            "heom_levels_steps_per_sec": round(rates["levels"], 2),
            "heom_levels_fast_steps_per_sec": round(
                rates["levels-fast"], 2),
            "heom_rowcol_fast_steps_per_sec": round(
                rates["rowcol-fast"], 2),
            "heom_matmul_steps_per_sec": round(heom_matmul, 2),
            "heom_matmul_fast_steps_per_sec": round(rates["matmul-fast"], 2),
            "heom_large_xla_steps_per_sec": round(heom_L["matmul-fast"], 2),
            "heom_large_levels_fast_steps_per_sec": round(
                heom_L["levels-fast"], 2),
            "heom_large_parity_ok": fast_ok_L,
            "heom_cpu_ref_steps_per_sec": round(heom_cpu, 3),
            "heom_cpu_refpy_nonumba_steps_per_sec": round(heom_refpy, 3),
            # HONEST LABEL (VERDICT r4 #9): vs_baseline divides by the
            # single-thread C++ -O3 transcription of the reference DEOM
            # loop, a STRICT UPPER BOUND on the numba-jitted reference
            # (numba is not installed here); the reference AS SHIPPED
            # (pure Python, @njit uncompiled) is the
            # heom_cpu_refpy_nonumba row
            "heom_baseline_note": (
                "vs_baseline = speedup over a C++ -O3 upper bound of "
                "the numba reference; vs the as-shipped pure-Python "
                "reference the ratio is value/"
                "heom_cpu_refpy_nonumba_steps_per_sec"),
            # f64 on the chip (real-split planes): the project 1e-8
            # parity gate measured ON DEVICE vs the complex128 NumPy
            # trajectory of the same operator
            "heom_f64_steps_per_sec": round(heom_f64, 2),
            "heom_f64_parity_err": float(f"{heom_f64_err:.2e}"),
            # roofline accounting (VERDICT r2 #3): fraction of v5e peaks
            "heom_flagship_roofline": _heom_roofline(heom_best,
                                                     heom_best_kernel),
            "heom_large_roofline": {
                k: _heom_roofline(heom_L[k], k, nsite=10)
                for k in heom_L if heom_L[k]},
            # 2DES: single-dispatch time is ~RPC floor + one map; the
            # amortized row (32 maps per dispatch, on-device reduction)
            # is the kernel-throughput number and sets speedup_2des
            "tdes_map_ms": round(t_2des_amort * 1e3, 2),
            "tdes_map_single_dispatch_ms": round(t_2des_tpu * 1e3, 2),
            "tdes_cpu_ref_ms": round(t_2des_cpu * 1e3, 2),
            "speedup_2des": round(t_2des_cpu / t_2des_amort, 2),
            "speedup_2des_single_dispatch": round(
                t_2des_cpu / t_2des_tpu, 2),
            # exact low-rank cube: per-map time for the FULL 256-map
            # cube in one dispatch, parity-gated (HIGHEST precision)
            # vs the vmapped pathway kernel. *_pipelined = 16 queued
            # dispatches / one readback, hiding the RPC floor; the
            # single-dispatch number is floor-dominated and kept only
            # as the latency figure.
            "tdes_cube_map_ms_single_dispatch": round(
                t_2des_fact * 1e3, 4),
            "tdes_cube_map_ms_pipelined": round(
                t_2des_fact_pipe * 1e3, 4),
            "tdes_cube_parity_err": float(f"{tdes_fact_err:.2e}"),
            "tdes_cube_roofline_pipelined_per_dispatch": tdes_fact_roof,
            "speedup_2des_factored": round(
                t_2des_cpu / t_2des_fact_pipe, 1) if tdes_fact_err < 1e-4
                else 0.0,
            # f64 cube on the chip: host complex128 factors, real-split
            # f64 assembly; parity vs the host complex128 assembly
            "tdes_cube_f64_map_ms": round(tdes_f64_map * 1e3, 4),
            "tdes_cube_f64_parity_err": float(f"{tdes_f64_err:.2e}"),
            # LDR rows lead with the EXACT formulations (VERDICT r4
            # #4): factored f32 (same operator as dense, reassociated;
            # parity at the f32 floor), factored f64 and dense f64
            # (both meet the 1e-8 gate on-chip); the dense-f32 row is
            # demoted to last with its measured error inline — its f32
            # BUILD dominates the error (1.7e-2) and it is kept only as
            # the round-1 formulation/parity baseline
            "ldr_factored_steps_per_sec": round(ldr_fact, 1),
            "ldr_factored_vs_cpu_ref": round(ldr_fact / ldr_cpu, 2),
            "ldr_factored_f64_steps_per_sec": round(ldr_f64, 1),
            "ldr_factored_f64_vs_cpu_ref": round(ldr_f64 / ldr_cpu, 2),
            "ldr_factored_f64_parity_err": float(f"{ldr_f64_err:.2e}"),
            "ldr_dense_f64_steps_per_sec": round(ldr_dense_f64, 1),
            "ldr_dense_f64_vs_cpu_ref": round(
                ldr_dense_f64 / ldr_cpu, 2),
            "ldr_dense_f64_parity_err": float(
                f"{ldr_dense_f64_err:.2e}"),
            "ldr_cpu_ref_steps_per_sec": round(ldr_cpu, 3),
            "ldr_dense_f32_steps_per_sec": round(ldr, 1),
            "ldr_dense_f32_vs_cpu_ref": round(ldr / ldr_cpu, 2),
            "ldr_dense_f32_batch8_traj_steps_per_sec": round(ldr_b8, 1),
            **{k: float(f"{v:.2e}") for k, v in ldr_parity.items()},
            **({"ldr_level7_factored_steps_per_sec": round(ldr7, 1),
                "ldr_level7_factored_batch16_traj_steps_per_sec":
                    round(ldr7_b16, 1)}
               if ldr7 is not None else {}),
            **({"ldr_level6_steps_per_sec": round(ldr6, 1),
                "ldr_level6_batch64_traj_steps_per_sec": round(ldr6_b64, 1),
                # speed-of-light accounting: each level-6 step MUST
                # stream Ur+Ui (2 x 7938^2 f32 = 504 MB) from HBM, so
                # achieved HBM bandwidth = steps/s x 504 MB, quoted as a
                # fraction of the v5e peak (819 GB/s). This is a true
                # lower bound on traffic (rhs/activations excluded), so
                # the fraction is conservative.
                "ldr_level6_hbm_gbps": round(
                    ldr6 * 2 * 4 * 7938 ** 2 / 1e9, 1),
                "ldr_level6_hbm_frac_of_peak": round(
                    ldr6 * 2 * 4 * 7938 ** 2 / 819e9, 3)}
               if ldr6 is not None else {}),
            "spo_steps_per_sec": round(spo, 1),
            "spo_vs_cpu": round(spo / spo_cpu, 2),
            "spo_roofline": spo_roof,
            # chip-scale wavepacket companion (VERDICT r4 #2): 256^3 x 2
            # states, full Strang step; the binding kernel is the XLA
            # TPU FFT itself (the standalone fftn+ifftn pair measures
            # ~190 GB/s), so frac_of_hbm_peak is FFT-implementation-
            # bound, not dispatch-bound like the 1024-pt config-#1 row
            "spo3_large_steps_per_sec": round(spo3, 2),
            "spo3_large_parity_err_f32": float(f"{spo3_err:.2e}"),
            "spo3_large_roofline": spo3_roof,
            "spo3_f64_steps_per_sec": round(spo3_f64, 2),
            "spo3_f64_parity_err": float(f"{spo3_f64_err:.2e}"),
            "lindblad_steps_per_sec": round(lind, 1),
            "lindblad_vs_cpu": round(lind / lind_cpu, 2),
            "lindblad_roofline": lind_roof,
            # chip-scale Lindblad companion: 4096 dimers through one
            # folded-propagator MXU matmul per window — MXU-bound where
            # the B=1 row is RPC/latency-bound
            "lindblad_batch4096_traj_steps_per_sec": round(lind_b, 0),
            "lindblad_batch4096_roofline": lind_b_roof,
            "tdes_map_roofline": tdes_roof,
            "polariton_traj_steps_per_sec": round(pol, 1),
            # renamed from polariton_vs_cpu (VERDICT r2 #5): a 512-wide
            # vmapped TPU batch against the reference's SEQUENTIAL CPU
            # drive loop — a throughput ratio, NOT a like-for-like
            # speedup (that is the _batched row below)
            "polariton_throughput_ratio_unbatched_cpu": round(
                pol / pol_cpu, 2),
            "polariton_vs_cpu_batched": round(pol / pol_cpu_batched, 2),
        },
    }))


if __name__ == "__main__":
    # one-JSON-line contract: ALL redirected stdout (stray prints from
    # exec'd reference code, solver chatter) goes to stderr
    # unconditionally; only _emit() writes to the real stdout handle
    import io as _io
    import contextlib as _ctx

    class _ToStderr(_io.StringIO):
        def write(self, s):
            if s.strip():
                sys.stderr.write(s)
            return len(s)

    with _ctx.redirect_stdout(_ToStderr()):
        main()
