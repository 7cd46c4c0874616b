"""Command-line interface.

The reference declares a ``pyqed=pyqed.cli:main`` entry point that does not
exist (reference: setup.py:45-48, no cli.py anywhere — SURVEY.md §1); this
makes it real: info, test, and bench subcommands.
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="pyqed-tpu",
        description="TPU-native molecular QED / quantum dynamics framework")
    sub = parser.add_subparsers(dest="cmd")

    sub.add_parser("info", help="show version, backend, and device info")
    p_bench = sub.add_parser("bench", help="run the HEOM benchmark")
    p_test = sub.add_parser("test", help="run a quick smoke test")
    p_run = sub.add_parser(
        "run", help="run a job described by a JSON spec file")
    p_run.add_argument("job", help="path to the JSON job spec")
    p_run.add_argument("-o", "--output", default=None,
                       help="output .npz path (default: <job>.npz)")

    args = parser.parse_args(argv)

    if args.cmd == "info":
        import jax
        import pyqed_tpu
        print(f"pyqed_tpu {pyqed_tpu.__version__}")
        print(f"jax {jax.__version__}, backend: {jax.default_backend()}")
        for d in jax.devices():
            print(f"  {d}")
        return 0

    if args.cmd == "bench":
        import runpy
        import pathlib
        bench = pathlib.Path(__file__).parent.parent / "bench.py"
        runpy.run_path(str(bench), run_name="__main__")
        return 0

    if args.cmd == "test":
        import numpy as np
        import jax.numpy as jnp
        from pyqed_tpu import SESolver, pauli, basis, ket2dm
        _, sx, _, _ = pauli()
        res = SESolver(0.1 * sx).run(psi0=basis(2, 0), dt=0.01, Nt=500,
                                     e_ops=[ket2dm(basis(2, 1))])
        p1 = np.asarray(res.observables[:, 0]).real
        # H = 0.1 sx -> p1(t) = sin^2(0.1 t)
        err = float(np.max(np.abs(
            p1 - np.sin(0.1 * np.asarray(res.times)) ** 2)))
        ok = err < 1e-6
        print(json.dumps({"smoke_test": "rabi", "max_err": err, "ok": ok}))
        return 0 if ok else 1

    if args.cmd == "run":
        import os
        out = args.output or (os.path.splitext(args.job)[0] + ".npz")
        run_job(args.job, out)
        return 0

    parser.print_help()
    return 0


def run_job(job_path, out_path):
    """Execute a JSON job spec and dump the Result to NPZ.

    Spec format (all matrices as nested lists; with "complex_pairs":
    true, trailing [re, im] pairs are read as complex entries):

        {"task": "sesolve" | "lindblad" | "heom" | "spo",
         "H": [[...]], "psi0"/"rho0": [...], "dt": 0.01, "nt": 1000,
         "nout": 10, "e_ops": [[[...]]], "c_ops": [...],      # lindblad
         "bath": {"temperature": .., "cutoff": .., "reorg": ..},  # heom
         "grid": {"xmin": .., "xmax": .., "n": ..}, "mass": ..,
         "potential": "0.5*x**2"}                              # spo

    Bigger workflows belong in Python; this covers the canonical
    single-solver runs so a result is one shell command away.
    """
    import numpy as np
    import jax.numpy as jnp

    with open(job_path) as fh:
        spec = json.load(fh)

    def arr(x):
        a = np.asarray(x)
        if a.ndim and a.shape[-1] == 2 and spec.get("complex_pairs"):
            a = a[..., 0] + 1j * a[..., 1]
        return jnp.asarray(a)

    task = spec["task"]
    dt = float(spec.get("dt", 0.01))
    nt = int(spec.get("nt", 100))
    nout = int(spec.get("nout", 1))
    e_ops = [arr(o).astype(complex) for o in spec.get("e_ops", [])]

    if task == "sesolve":
        from .models.mol import SESolver
        res = SESolver(arr(spec["H"]).astype(complex)).run(
            psi0=arr(spec["psi0"]).astype(complex), dt=dt, Nt=nt,
            nout=nout, e_ops=e_ops)
    elif task == "lindblad":
        from .open.lindblad import LindbladSolver
        c_ops = [arr(c).astype(complex) for c in spec.get("c_ops", [])]
        res = LindbladSolver(arr(spec["H"]).astype(complex),
                             c_ops=c_ops).run(
            arr(spec["rho0"]).astype(complex), dt=dt, Nt=nt, nout=nout,
            e_ops=e_ops)
    elif task == "heom":
        from .open.heom import HEOMSolver
        from .open.bath import DrudeBath
        b = spec["bath"]
        bath = DrudeBath(temperature=float(b["temperature"]),
                         cutoff=float(b["cutoff"]),
                         reorg=float(b["reorg"]))
        bath.set_bath_ops([arr(spec["coupling"]).astype(complex)])
        sol = HEOMSolver(arr(spec["H"]).astype(complex), bath=bath,
                         lmax=int(spec.get("lmax", 4)),
                         nexp=int(spec.get("nexp", 2)))
        res = sol.run(arr(spec["rho0"]).astype(complex), dt=dt, nt=nt,
                      nout=nout, e_ops=e_ops)
    elif task == "spo":
        from .grid.spo import SPON
        g = spec["grid"]
        x = np.linspace(float(g["xmin"]), float(g["xmax"]), int(g["n"]),
                        endpoint=False)
        sol = SPON([x], masses=[float(spec.get("mass", 1.0))], nstates=1)
        # expression strings are math only — no builtins, just np and x
        env = {"__builtins__": {}, "np": np, "x": x}
        v = eval(spec["potential"], env)
        sol.set_dpes(jnp.asarray(v))
        psi0 = eval(spec["psi0"], env)
        psi0 = np.asarray(psi0, complex)
        psi0 /= np.sqrt(np.sum(np.abs(psi0) ** 2) * (x[1] - x[0]))
        res = sol.run(jnp.asarray(psi0)[:, None], dt=dt, nt=nt,
                      nout=nout)
    else:
        raise SystemExit(f"unknown task {task!r}")

    res.dump(out_path)
    print(json.dumps({"task": task, "output": out_path,
                      "times": int(np.asarray(res.times).shape[0])}))
    return res


if __name__ == "__main__":
    sys.exit(main())
