"""Pallas-vs-XLA crossover measurement (round-1 VERDICT weak #3 / next
#6): for each kernel family, measure both paths across workload sizes
and report where (if anywhere) the hand kernel wins. Run ON the TPU:

    python benchmarks/kernel_crossover.py [--quick]

Prints one JSON line: {"heom": [...], "spo": [...]} with rows
(size-descriptor, xla_steps_per_sec, pallas_steps_per_sec, winner).
All timings are readback-synchronized (axon: block_until_ready lies).
"""
import json
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0])


def _timeit(thunk, repeat=3):
    best = np.inf
    for _ in range(repeat):
        t0 = time.perf_counter()
        _force(thunk())
        best = min(best, time.perf_counter() - t0)
    return best


def heom_rate(nsite, nexp, lmax, kernel, nsteps=200):
    from __graft_entry__ import _heom_setup, _heom_step_fn
    setup = _heom_setup(nsite=nsite, nexp_per_bath=nexp, lmax=lmax)
    step, nado, n = _heom_step_fn(*setup, dt=1e-3, kernel=kernel)

    @jax.jit
    def run(re, im):
        def body(c, _):
            return step(*c), None
        c, _ = jax.lax.scan(body, (re, im), None, length=nsteps)
        return c

    re = np.zeros((nado, n, n), np.float32)
    re[0, 0, 0] = 1.0
    im = np.zeros_like(re)
    _force(run(re, im))                      # compile
    t = _timeit(lambda: run(re, im))
    return nsteps / t, nado, n


def spo_rate(npts, ns, kernel, nsteps=400):
    """Strang step built from the two SPO kernels (phase multiply +
    potential apply) vs the plain XLA formulation."""
    import jax.numpy as jnp
    from pyqed_tpu.ops import pallas_kernels as pk
    rng = np.random.default_rng(0)
    expK = np.exp(1j * rng.normal(size=npts)).astype(np.complex64)
    expV = np.exp(1j * rng.normal(size=(npts, ns, ns))).astype(np.complex64)
    eKr = expK.real.astype(np.float32)
    eKi = expK.imag.astype(np.float32)
    eVr = expV.real.astype(np.float32)
    eVi = expV.imag.astype(np.float32)

    use_pallas = kernel == "pallas"

    @jax.jit
    def run(pr, pi, eKr, eKi, eVr, eVi):
        expK = eKr + 1j * eKi
        expV = eVr + 1j * eVi

        def body(p, _):
            psi = p[0] + 1j * p[1]
            if use_pallas:
                psi = pk.spo_phase_multiply(expK, psi)
                psi = pk.spo_potential_apply(expV, psi)
            else:
                psi = expK[:, None] * psi
                psi = jnp.einsum("pab, pb -> pa", expV, psi)
            return (jnp.real(psi), jnp.imag(psi)), None

        p, _ = jax.lax.scan(body, (pr, pi), None, length=nsteps)
        return p

    pr = rng.normal(size=(npts, ns)).astype(np.float32)
    pi = np.zeros_like(pr)
    _force(run(pr, pi, eKr, eKi, eVr, eVi))
    t = _timeit(lambda: run(pr, pi, eKr, eKi, eVr, eVi))
    return nsteps / t


def main():
    quick = "--quick" in sys.argv
    platform = jax.devices()[0].platform
    out = {"platform": platform, "heom": [], "spo": []}
    if platform not in ("tpu", "axon") and "--allow-cpu" not in sys.argv:
        out["error"] = ("refusing to measure on platform "
                        f"{platform!r} (pass --allow-cpu to override)")
        print(json.dumps(out))
        return

    heom_sizes = [(4, 2, 2), (7, 2, 3), (7, 3, 3)]
    if not quick:
        heom_sizes.append((10, 2, 3))
    for nsite, nexp, lmax in heom_sizes:
        try:
            r_x, nado, n = heom_rate(nsite, nexp, lmax, "matmul-fast")
            r_p, _, _ = heom_rate(nsite, nexp, lmax, "pallas-fast")
            out["heom"].append({
                "nsite": nsite, "nexp": nexp, "lmax": lmax,
                "nado": int(nado), "n": int(n),
                "xla_steps_per_sec": round(r_x, 1),
                "pallas_steps_per_sec": round(r_p, 1),
                "winner": "pallas" if r_p > r_x else "xla"})
        except Exception as e:               # noqa: BLE001
            out["heom"].append({"nsite": nsite, "nexp": nexp,
                                "lmax": lmax, "error": str(e)[:200]})

    spo_sizes = [(4096, 2), (65536, 2), (262144, 2)]
    if not quick:
        spo_sizes.append((1048576, 2))
    for npts, ns in spo_sizes:
        try:
            r_x = spo_rate(npts, ns, "xla")
            r_p = spo_rate(npts, ns, "pallas")
            out["spo"].append({
                "npts": npts, "ns": ns,
                "xla_steps_per_sec": round(r_x, 1),
                "pallas_steps_per_sec": round(r_p, 1),
                "winner": "pallas" if r_p > r_x else "xla"})
        except Exception as e:               # noqa: BLE001
            out["spo"].append({"npts": npts, "ns": ns,
                               "error": str(e)[:200]})

    print(json.dumps(out))


if __name__ == "__main__":
    main()
