"""Tracing/profiling hooks, NaN-debug toggles, and mid-run solver
checkpoints — the auxiliary subsystems of SURVEY.md §5.1/§5.2/§5.4.

The reference has none of these (its only instrumentation is
``time.time()`` prints and tqdm bars, e.g. pyqed/heom/deom.py:1104;
its only persistence is whole-Result pickles, pyqed/mol.py:146).
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------------- tracing

@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed block; view with
    TensorBoard or Perfetto (xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step-timing hook for solver loops.

    >>> timer = StepTimer()
    >>> with timer.step():
    ...     out = step_fn(state); jax.block_until_ready(out)
    >>> timer.summary()   # {'steps': n, 'mean_s': ..., 'p50_s': ...}
    """

    def __init__(self):
        self.samples = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples.append(time.perf_counter() - t0)

    def summary(self):
        if not self.samples:
            return {"steps": 0}
        s = np.asarray(self.samples)
        return {"steps": len(s), "mean_s": float(s.mean()),
                "p50_s": float(np.percentile(s, 50)),
                "p95_s": float(np.percentile(s, 95)),
                "total_s": float(s.sum())}


def benchmark(fn: Callable, *args, repeat: int = 3, **kw):
    """Compile + time a jittable callable; returns seconds/call."""
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeat):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeat


# ------------------------------------------------------- debug toggles

@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Enable jax_debug_nans inside the block: any NaN produced by a
    primitive raises immediately with the offending jaxpr."""
    old = bool(jax.config.jax_debug_nans)
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def check_finite(tree: Any, name: str = "state"):
    """Host-side finiteness assertion on a pytree (call between solver
    windows; cheap compared to a propagation window)."""
    leaves = jax.tree_util.tree_leaves(tree)
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        if not np.all(np.isfinite(a)):
            bad = int(np.sum(~np.isfinite(a)))
            raise FloatingPointError(
                f"{name}: leaf {i} has {bad} non-finite entries "
                f"(shape {a.shape}, dtype {a.dtype})")
    return tree


# ---------------------------------------------------------- checkpoint

def save_checkpoint(path: str, step: int, state: Any, **metadata):
    """Persist (step, pytree state, metadata) as a single .npz —
    complex-safe, no pickle (unlike the reference's Result.dump)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["__step__"] = np.asarray(step)
    payload["__nleaves__"] = np.asarray(len(leaves))
    for k, v in metadata.items():
        payload[f"meta_{k}"] = np.asarray(v)
    np.savez(path, **payload)
    return path


def load_checkpoint(path: str, like: Any = None):
    """Returns (step, state, metadata). ``like`` (a pytree prototype)
    restores the original tree structure; otherwise a list of leaves."""
    with np.load(path if str(path).endswith(".npz") else path + ".npz",
                 allow_pickle=False) as z:
        nl = int(z["__nleaves__"])
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(nl)]
        step = int(z["__step__"])
        meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        return step, jax.tree_util.tree_unflatten(treedef, leaves), meta
    return step, leaves, meta
