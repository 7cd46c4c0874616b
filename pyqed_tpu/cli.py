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

    parser.print_help()
    return 0


if __name__ == "__main__":
    sys.exit(main())
