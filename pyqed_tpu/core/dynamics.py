"""Generic scan-based propagation drivers.

This is the single time-loop engine shared by every solver (SESolver,
Lindblad, Redfield, HEOM, SPO, LDR, ...), replacing the reference's
per-solver Python ``for`` loops (e.g. pyqed/mol.py:1656-1660,
pyqed/oqs.py:1682-1690) with one ``lax.scan`` pattern:

    outer scan over nt//nout sampling windows
      inner fori_loop of nout fine steps
    -> stacked observables/states, computed on-device, no host sync.

``step_fn`` is any pure ``(state, t) -> state`` update for one ``dt``;
``e_ops`` are applied through ``expect_fn`` at each sampling point.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from .result import Result


def _stack_eops(e_ops):
    """Stack a list of same-shape operators into one (k, n, n) tensor so the
    per-sample expectation is a single batched matmul."""
    if e_ops is None or len(e_ops) == 0:
        return None
    return jnp.stack([jnp.asarray(op) for op in e_ops])


def expect_ket(eops_tensor, psi):
    """<psi|O_k|psi> for all k at once."""
    return jnp.einsum("i, kij, j -> k", psi.conj(), eops_tensor, psi)


def expect_dm(eops_tensor, rho):
    """Tr[O_k rho] for all k at once."""
    return jnp.einsum("kij, ji -> k", eops_tensor, rho)


@partial(jax.jit, static_argnames=("step_fn", "expect_fn", "nt", "nout", "store_states"))
def propagate(step_fn: Callable, y0, t0, dt, nt: int, nout: int = 1,
              eops_tensor=None, expect_fn: Callable = expect_ket,
              store_states: bool = False):
    """Run ``nt`` steps of ``step_fn``, sampling every ``nout`` steps.

    Returns (times, observables, states, y_final):
      times        (ns+1,) with ns = nt // nout
      observables  (ns+1, k) or None
      states       (ns+1, ...) or None
      y_final      state after nt steps (the last full sampling window)

    Requires nout | nt: a remainder would be silently dropped while the
    requested nt is still reported, truncating sampled trajectories.
    """
    if nt % nout != 0:
        raise ValueError(
            f"nt={nt} must be divisible by nout={nout} "
            f"(the trailing {nt % nout} steps would be silently dropped)")
    ns = nt // nout

    def obs_of(y):
        if eops_tensor is None:
            return jnp.zeros((0,), dtype=jnp.result_type(y, 1j))
        return expect_fn(eops_tensor, y)

    def window(carry, k):
        y, t = carry

        def fine(i, yt):
            y, t = yt
            y = step_fn(y, t)
            return (y, t + dt)

        y, t = jax.lax.fori_loop(0, nout, fine, (y, t))
        out = (obs_of(y), y) if store_states else (obs_of(y), None)
        return (y, t), out

    (yf, tf), (obs, states) = jax.lax.scan(
        window, (y0, jnp.asarray(t0, dtype=jnp.result_type(dt))),
        jnp.arange(ns))

    obs0 = obs_of(y0)
    observables = jnp.concatenate([obs0[None], obs], axis=0)
    if store_states:
        states = jnp.concatenate([y0[None], states], axis=0)

    times = t0 + jnp.arange(ns + 1) * dt * nout
    return times, observables, states, yf


def run_solver(step_fn, y0, dt, nt, e_ops: Optional[Sequence] = None,
               nout: int = 1, t0: float = 0.0, store_states: bool = False,
               expect_fn=expect_ket, is_dm: Optional[bool] = None) -> Result:
    """High-level wrapper returning a :class:`Result`."""
    y0 = jnp.asarray(y0)
    if is_dm is None:
        is_dm = y0.ndim == 2
    if is_dm and expect_fn is expect_ket:
        expect_fn = expect_dm
    eops_tensor = _stack_eops(e_ops)
    times, observables, states, yf = propagate(
        step_fn, y0, t0, dt, nt, nout=nout, eops_tensor=eops_tensor,
        expect_fn=expect_fn, store_states=store_states)
    if e_ops is None or len(e_ops) == 0:
        observables = None
    res = Result(times=times, observables=observables, states=states,
                 dt=dt, nt=nt, nout=nout)
    if is_dm:
        res.rho0, res.rho = y0, yf
    else:
        res.psi0, res.psi = y0, yf
    return res


def rk4_step(rhs: Callable):
    """Lift a time-independent RHS f(y) into a (y, t) -> y RK4 stepper.
    The returned closure captures dt at call time via partial application in
    the solvers (reference integrator: pyqed/phys.py:1051).
    """
    def step(y, t, dt):
        dt2 = dt / 2.0
        k1 = rhs(y)
        k2 = rhs(y + k1 * dt2)
        k3 = rhs(y + k2 * dt2)
        k4 = rhs(y + k3 * dt)
        return y + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
    return step


def rk4_step_t(rhs: Callable):
    """Same for an explicitly time-dependent RHS f(y, t)."""
    def step(y, t, dt):
        dt2 = dt / 2.0
        k1 = rhs(y, t)
        k2 = rhs(y + k1 * dt2, t + dt2)
        k3 = rhs(y + k2 * dt2, t + dt2)
        k4 = rhs(y + k3 * dt, t + dt)
        return y + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
    return step
