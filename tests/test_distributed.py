"""Multi-host hook (parallel/distributed.py, SURVEY §5.8): a real
2-process jax.distributed run on the CPU backend — each process
contributes its local device to one global mesh and a psum over the
mesh sees both processes' data."""
import os
import subprocess
import sys
import socket
import textwrap
from pathlib import Path

import pytest

ROOT = Path(__file__).parent.parent

_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["PYQED_ROOT"])
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pyqed_tpu.parallel.distributed import (ensure_distributed,
                                                process_info, global_mesh)
    started = ensure_distributed()
    assert started, "distributed runtime did not start"
    pid, nproc, nloc, nglob = process_info()
    assert nproc == 2, nproc
    assert nglob == 2 * nloc, (nglob, nloc)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = global_mesh("data")
    # every process owns one shard; a global sum must see all shards
    x_local = np.full((jax.local_device_count(),), float(pid + 1))
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), x_local)
    total = jax.jit(lambda a: jnp.sum(a),
                    out_shardings=NamedSharding(mesh, P()))(arr)
    # process 0 contributes 1 per device, process 1 contributes 2
    expect = 1.0 * nloc + 2.0 * nloc
    got = float(jax.device_get(total))
    assert abs(got - expect) < 1e-12, (got, expect)
    print(f"proc {pid}: global psum ok ({got})")
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(PYQED_ROOT=str(ROOT),
                   PYQED_COORDINATOR=f"127.0.0.1:{port}",
                   PYQED_NUM_PROCS="2",
                   PYQED_PROC_ID=str(pid),
                   JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)    # one local CPU device per process
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err}"
        assert "global psum ok" in out
