"""Driver benchmark: HEOM hierarchy steps/sec on TPU vs the CPU reference.

Workload (BASELINE config #3 scaled up): an FMO-like 7-site exciton system
(n=8 states) with one Drude bath per site, Padé-2 decomposition
(M=14 exponential modes), hierarchy depth lmax=3 → 680 ADOs of 8x8.

TPU path: the batched-tensor HEOM RHS (pyqed_tpu.open.heom design) under
lax.scan, RK4. CPU baseline: a faithful NumPy transcription of the
reference's per-ADO Python-loop RHS (pyqed/heom/deom.py:641-673 ``rem_cal``
structure), single core.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np


def setup(nsite=7, nexp=2, lmax=3):
    sys.path.insert(0, ".")
    from __graft_entry__ import _heom_setup
    return _heom_setup(nsite=nsite, nexp_per_bath=nexp, lmax=lmax)


def bench_tpu(H, keys, plus_idx, minus_idx, Q, cvec, nuvec, nsteps=400,
              dt=1e-3):
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _heom_step_fn

    step, nado, n = _heom_step_fn(H, keys, plus_idx, minus_idx, Q, cvec,
                                  nuvec, dt=dt)

    @jax.jit
    def run(ados_re, ados_im):
        def body(carry, _):
            re, im = carry
            return step(re, im), None
        (re, im), _ = jax.lax.scan(body, (ados_re, ados_im), None,
                                   length=nsteps)
        return re, im

    ados_re = np.zeros((keys.shape[0], n, n), dtype=np.float32)
    ados_re[0, 0, 0] = 1.0
    ados_im = np.zeros_like(ados_re)

    # compile + warmup
    out = run(ados_re, ados_im)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(ados_re, ados_im)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    return nsteps / (t1 - t0)


def bench_cpu_reference(H, keys, plus_idx, minus_idx, Q, cvec, nuvec,
                        nsteps=3, dt=1e-3):
    """Reference-style RHS: Python loop over ADOs and modes, scipy-free
    small matmuls (the reference's DEOM rem_cal loop shape)."""
    nado, M = keys.shape
    n = H.shape[0]
    nu = nuvec
    damp = keys @ nu

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
                    acc = acc - 1j * nk * (cvec[m] * Q[m] @ ados[dn]
                                           - np.conj(cvec[m]) * ados[dn] @ Q[m])
            out[N] = acc
        return out

    ados = np.zeros((nado, n, n), dtype=np.complex64)
    ados[0, 0, 0] = 1.0
    t0 = time.perf_counter()
    for _ in range(nsteps):
        k1 = rhs(ados)
        k2 = rhs(ados + k1 * (dt / 2))
        k3 = rhs(ados + k2 * (dt / 2))
        k4 = rhs(ados + k3 * dt)
        ados = ados + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
    t1 = time.perf_counter()
    return nsteps / (t1 - t0)


def main():
    args = setup()
    tpu_rate = bench_tpu(*args)
    cpu_rate = bench_cpu_reference(*args)
    print(json.dumps({
        "metric": "heom_hierarchy_steps_per_sec",
        "value": round(tpu_rate, 2),
        "unit": "steps/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
