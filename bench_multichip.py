"""Multi-chip scaling benchmark (VERDICT r4 #6): strong/weak-scaling
curves for the framework's production shardings on ANY mesh.

Run on the virtual CPU mesh today (`python bench_multichip.py`, forces
8 virtual devices) or on a real pod when one is attached (it uses
whatever `jax.devices()` exposes without forcing the CPU backend when
real multi-chip hardware is present).

Measured per device count d in {1, 2, 4, 8}:

* **ADO-sharded HEOM** at pod scale (nsite=10, lmax=4 -> nado=10,626 —
  the >=1e4 hierarchy the verdict names): wall steps/s for the sharded
  RK4 step plus the COMPILED per-device FLOPs and peak-memory numbers
  from XLA's cost/memory analysis.  On the virtual CPU mesh all d
  "devices" share the same physical cores, so wall time is NOT expected
  to scale there — the compile-time per-device columns are the scaling
  evidence (they are exact on a real pod too); on real hardware the
  wall column becomes the headline.
* **Grid-sharded SPO2** through the pencil FFT (parallel/pencil_fft.py)
  on a 512x512x2 wavepacket: same columns, plus the collective pattern
  check (all-to-all present, no all-gather).
* **Grid-sharded factored LDR** (level 6, 63x63x2).

Output: ONE JSON line in the bench.py schema
  {"metric": "multichip_scaling", "value": <ndev_max>, "unit":
   "devices", "vs_baseline": <heom per-device flops ratio 1->max>,
   "extra": {curves...}}.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEVCOUNTS = (1, 2, 4, 8)


def _setup_backend():
    """Force the 8-virtual-device CPU backend unless
    PYQED_MULTICHIP_REAL=1 opts into real multi-device hardware.

    Backend init is sticky: XLA_FLAGS and the platform switch must be
    in place BEFORE the first jax.devices() call, so pod mode is an env
    opt-in rather than auto-detection."""
    global DEVCOUNTS
    if not os.environ.get("PYQED_MULTICHIP_REAL"):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(DEVCOUNTS)}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax
    avail = len(jax.devices())
    DEVCOUNTS = tuple(d for d in DEVCOUNTS if d <= avail)
    assert DEVCOUNTS, "no usable device counts"
    return jax


def _mesh(jax, ndev, name):
    from pyqed_tpu.parallel import make_mesh
    return make_mesh({name: ndev}, devices=jax.devices()[:ndev])


def _time_best(fn, *args, repeat=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _compiled_stats(jitted, *args):
    """Per-device flops + peak memory of the compiled module."""
    comp = jitted.lower(*args).compile()
    out = {}
    try:
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out["per_device_flops"] = float(ca.get("flops", 0.0))
    except Exception:
        out["per_device_flops"] = None
    try:
        ma = comp.memory_analysis()
        out["per_device_bytes"] = int(
            ma.argument_size_in_bytes + ma.output_size_in_bytes
            + ma.temp_size_in_bytes)
    except Exception:
        out["per_device_bytes"] = None
    return out, comp


# ---------------------------------------------------------------- HEOM
def heom_curve(jax, nsteps=2):
    """ADO-sharded HEOM step at nado=10,626 (nsite=10, lmax=4)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from __graft_entry__ import _heom_setup, _heom_step_fn

    H, keys, plus_idx, minus_idx, Q, cvec, nuvec = _heom_setup(
        nsite=10, nexp_per_bath=2, lmax=4)
    step, nado, n = _heom_step_fn(H, keys, plus_idx, minus_idx, Q,
                                  cvec, nuvec, kernel="matmul-fast")
    rows = []
    for ndev in DEVCOUNTS:
        mesh = _mesh(jax, ndev, "ado")
        sh = NamedSharding(mesh, P("ado", None, None))
        pad = (-nado) % ndev

        def padded_step(re, im):
            re = jax.lax.with_sharding_constraint(re, sh)
            im = jax.lax.with_sharding_constraint(im, sh)
            r, i = step(re[:nado], im[:nado])
            if pad:
                r = jnp.concatenate([r, jnp.zeros((pad, n, n), r.dtype)])
                i = jnp.concatenate([i, jnp.zeros((pad, n, n), i.dtype)])
            return (jax.lax.with_sharding_constraint(r, sh),
                    jax.lax.with_sharding_constraint(i, sh))

        @jax.jit
        def run(re, im):
            def body(c, _):
                return padded_step(*c), None
            c, _ = jax.lax.scan(body, (re, im), None, length=nsteps)
            return c

        re = np.zeros((nado + pad, n, n), np.float32)
        re[0, 0, 0] = 1.0
        re = jax.device_put(re, sh)
        im = jax.device_put(np.zeros_like(re), sh)
        stats, _ = _compiled_stats(run, re, im)
        t = _time_best(run, re, im)
        rows.append({"ndev": ndev, "steps_per_sec": round(nsteps / t, 3),
                     **stats})
    return {"nado": int(nado), "n": int(n), "curve": rows}


# ----------------------------------------------------------------- SPO
def spo_curve(jax, n=512, ny=512, nsteps=4):
    """Grid-sharded SPO2 Strang steps through the pencil FFT."""
    import jax.numpy as jnp
    from pyqed_tpu.grid.spo import SPO2

    x = np.linspace(-8, 8, n, endpoint=False)
    y = np.linspace(-8, 8, ny, endpoint=False)
    X, Y = np.meshgrid(x, y, indexing="ij")
    psi0 = np.zeros((n, ny, 2), complex)
    psi0[..., 0] = np.exp(-(X + 1) ** 2 - Y ** 2)
    psi0 /= np.sqrt(np.sum(np.abs(psi0) ** 2) * (x[1] - x[0]) ** 2)

    rows = []
    for ndev in DEVCOUNTS:
        mesh = _mesh(jax, ndev, "grid") if ndev > 1 else None
        s = SPO2(x, y, masses=[1.0, 1.0], nstates=2, mesh=mesh)
        s.set_DPES([0.5 * (X ** 2 + Y ** 2),
                    0.5 * ((X - 1) ** 2 + Y ** 2) + 1.0],
                   [[(0, 1), 0.1 * np.exp(-0.5 * (X ** 2 + Y ** 2))]])
        s.build(0.01)
        keo, peo = s._keo, s._peo
        if mesh is not None:
            from pyqed_tpu.parallel.pencil_fft import make_keo_pencil
            pk = make_keo_pencil(s.shape, s.nstates, s._exp_K_ri, mesh)
            assert pk is not None
            keo = pk

        @jax.jit
        def run(p):
            def body(p, _):
                p = peo(p, half=True)
                p = keo(p)
                p = peo(p, half=True)
                return p, None
            p, _ = jax.lax.scan(body, p, None, length=nsteps)
            return p

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P("grid", None, None))
            p = jax.device_put(psi0, sh)
        else:
            p = jax.device_put(psi0)
        stats, comp = _compiled_stats(run, p)
        hlo = comp.as_text()
        t = _time_best(run, p)
        rows.append({"ndev": ndev, "steps_per_sec": round(nsteps / t, 3),
                     "all_to_all": "all-to-all" in hlo,
                     "all_gather": "all-gather" in hlo, **stats})
    return {"grid": [n, ny], "nstates": 2, "curve": rows}


# ----------------------------------------------------------------- LDR
def ldr_curve(jax, level=6, nsteps=4):
    """Grid-sharded factored LDR (63x63x2)."""
    from pyqed_tpu.grid.ldr import LDRN

    sol = LDRN([(-4.0, 4.0), (-4.0, 4.0)], [level, level], nstates=2)
    X, Y = np.meshgrid(sol.x[0], sol.x[1], indexing="ij")
    sol.apes = np.stack([0.5 * (X ** 2 + Y ** 2),
                         0.5 * (X ** 2 + Y ** 2) + 1.0], axis=-1)
    th = 0.3 * np.exp(-(X ** 2 + Y ** 2))
    S = np.zeros((*sol.nx, 2, 2))
    S[..., 0, 0] = np.cos(th)
    S[..., 1, 1] = np.cos(th)
    S[..., 0, 1] = -np.sin(th)
    S[..., 1, 0] = np.sin(th)
    sol.build_ovlp(S)
    psi0 = (np.exp(-(X ** 2 + Y ** 2))[..., None]
            * np.array([1.0, 0.0])).astype(complex)
    psi0 /= np.linalg.norm(psi0)

    rows = []
    for ndev in DEVCOUNTS:
        mesh = _mesh(jax, ndev, "grid") if ndev > 1 else None
        t0 = time.perf_counter()
        r = sol.run(psi0, dt=0.01, nt=nsteps, nout=nsteps, mesh=mesh,
                    method="factored")
        jax.block_until_ready(r.psi)
        warm = time.perf_counter() - t0
        t1 = time.perf_counter()
        r = sol.run(psi0, dt=0.01, nt=nsteps, nout=nsteps, mesh=mesh,
                    method="factored")
        jax.block_until_ready(r.psi)
        t = time.perf_counter() - t1
        rows.append({"ndev": ndev,
                     "steps_per_sec": round(nsteps / min(t, warm), 3)})
    return {"grid": list(sol.nx), "nstates": 2, "curve": rows}


def main():
    jax = _setup_backend()
    heom = heom_curve(jax)
    spo = spo_curve(jax)
    ldr = ldr_curve(jax)
    f1 = heom["curve"][0]["per_device_flops"]
    fN = heom["curve"][-1]["per_device_flops"]
    ratio = round(f1 / fN, 2) if (f1 and fN) else None
    platform = jax.devices()[0].platform
    print(json.dumps({
        "metric": "multichip_scaling",
        "value": DEVCOUNTS[-1],
        "unit": "devices",
        "vs_baseline": ratio,     # per-device HEOM FLOPs shrink 1 -> 8
        "extra": {
            "platform": platform,
            "note": ("wall steps/s on the virtual CPU mesh shares one "
                     "host's cores across all virtual devices and is "
                     "NOT expected to scale there; per_device_flops / "
                     "per_device_bytes are the compiled per-device "
                     "work+memory and are exact on real hardware too"),
            "heom_ado_sharded": heom,
            "spo2_pencil_fft": spo,
            "ldr_factored": ldr,
        },
    }))


if __name__ == "__main__":
    main()
