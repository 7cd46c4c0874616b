"""CLI `run` subcommand: JSON job spec -> solver -> NPZ result.

(The reference's declared pyqed.cli entry point does not exist in its
tree; ours is real — here the job-spec runner is pinned against the
analytic Lindblad decay.)
"""
import json
import numpy as np

from pyqed_tpu.cli import main


def test_cli_run_lindblad_analytic(tmp_path):
    job = {"task": "lindblad",
           "H": [[0.5, 0.0], [0.0, -0.5]],
           "rho0": [[0.0, 0.0], [0.0, 1.0]],
           "c_ops": [[[0.0, 0.4472135954999579], [0.0, 0.0]]],
           "e_ops": [[[0.0, 0.0], [0.0, 1.0]]],
           "dt": 0.01, "nt": 500, "nout": 10}
    jp = tmp_path / "lind.json"
    jp.write_text(json.dumps(job))
    out = tmp_path / "res.npz"
    assert main(["run", str(jp), "-o", str(out)]) == 0
    d = np.load(out, allow_pickle=True)
    p1 = np.real(d["observables"][:, 0])
    t = d["times"]
    assert np.max(np.abs(p1 - np.exp(-0.2 * t))) < 1e-10


def test_cli_run_spo(tmp_path):
    job = {"task": "spo",
           "grid": {"xmin": -10.0, "xmax": 10.0, "n": 128},
           "mass": 1.0,
           "potential": "0.5*x**2",
           "psi0": "np.exp(-(x-1.0)**2/2)",
           "dt": 0.01, "nt": 200, "nout": 20}
    jp = tmp_path / "spo.json"
    jp.write_text(json.dumps(job))
    assert main(["run", str(jp)]) == 0
    d = np.load(tmp_path / "spo.npz", allow_pickle=True)
    assert d["times"].shape[0] == 11


def test_cli_run_sesolve_rabi(tmp_path):
    # regression: sesolve task imported SESolver from the wrong module
    job = {"task": "sesolve",
           "H": [[0.0, 0.05], [0.05, 0.0]],
           "psi0": [1.0, 0.0],
           "e_ops": [[[0.0, 0.0], [0.0, 1.0]]],
           "dt": 0.01, "nt": 500, "nout": 10}
    jp = tmp_path / "se.json"
    jp.write_text(json.dumps(job))
    assert main(["run", str(jp)]) == 0
    d = np.load(tmp_path / "se.npz", allow_pickle=True)
    p1 = np.real(d["observables"][:, 0])
    t = d["times"]
    # H = 0.05 sx -> p1(t) = sin^2(0.05 t)
    assert np.max(np.abs(p1 - np.sin(0.05 * t) ** 2)) < 1e-8
