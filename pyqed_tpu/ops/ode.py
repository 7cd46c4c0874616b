"""Adaptive ODE integration (RKF45) — jit-compatible.

The reference ships an RKF45 test driver (reference:
examples/rkf45_test.py, importing the pre-rename ``lime.rkf45`` module
that no longer exists in the tree) — the integrator itself is rebuilt
here TPU-native: the embedded Runge-Kutta-Fehlberg 4(5) pair with
proportional step control runs entirely inside ``lax.while_loop`` (no
data-dependent Python control flow), so it jits, vmaps over initial
conditions, and differentiates.

For sampled output use :func:`rkf45_sample`, which scans the adaptive
integrator over the requested time segments.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# Fehlberg 4(5) tableau
_A = np.array([
    [0, 0, 0, 0, 0],
    [1 / 4, 0, 0, 0, 0],
    [3 / 32, 9 / 32, 0, 0, 0],
    [1932 / 2197, -7200 / 2197, 7296 / 2197, 0, 0],
    [439 / 216, -8, 3680 / 513, -845 / 4104, 0],
    [-8 / 27, 2, -3544 / 2565, 1859 / 4104, -11 / 40],
])
_C = np.array([0.0, 1 / 4, 3 / 8, 12 / 13, 1.0, 1 / 2])
_B5 = np.array([16 / 135, 0, 6656 / 12825, 28561 / 56430, -9 / 50, 2 / 55])
_B4 = np.array([25 / 216, 0, 1408 / 2565, 2197 / 4104, -1 / 5, 0])


def _rkf_step(f, t, y, h):
    """One embedded step: returns (y5, err_norm_input) with y5 the
    5th-order solution and the 4/5 difference as the error estimate."""
    k = []
    for i in range(6):
        yi = y
        for j in range(i):
            yi = yi + h * _A[i][j] * k[j]
        k.append(f(t + _C[i] * h, yi))
    ks = jnp.stack(k)
    y5 = y + h * jnp.tensordot(jnp.asarray(_B5), ks, axes=1)
    y4 = y + h * jnp.tensordot(jnp.asarray(_B4), ks, axes=1)
    return y5, y5 - y4


@partial(jax.jit, static_argnums=(0,))
def rkf45(f, y0, t0, t1, rtol=1e-6, atol=1e-9, h0=None, max_steps=100000,
          safety=0.9):
    """Integrate dy/dt = f(t, y) from t0 to t1 with adaptive RKF45.

    f must be jax-traceable; y may be any complex/real array. Returns
    (y(t1), stats) with stats = {'naccept', 'nreject', 'h_final'}.
    """
    y0 = jnp.asarray(y0)
    t0 = jnp.asarray(t0, dtype=float)
    t1 = jnp.asarray(t1, dtype=float)
    if h0 is None:
        h0 = (t1 - t0) / 100.0

    def err_norm(e, y, ynew):
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(ynew))
        return jnp.sqrt(jnp.mean(jnp.abs(e / scale) ** 2))

    def cond(state):
        t, y, h, na, nr, done = state
        return (~done) & (na + nr < max_steps)

    def body(state):
        t, y, h, na, nr, done = state
        h = jnp.minimum(h, t1 - t)
        ynew, e = _rkf_step(f, t, y, h)
        r = err_norm(e, y, ynew)
        accept = r <= 1.0
        # PI-free proportional controller, 5th-order error -> exponent 1/5
        fac = jnp.clip(safety * r ** (-0.2), 0.1, 5.0)
        hnew = h * fac
        t = jnp.where(accept, t + h, t)
        y = jnp.where(accept, ynew, y)
        na = na + accept.astype(jnp.int32)
        nr = nr + (~accept).astype(jnp.int32)
        done = t >= t1 - 1e-14 * jnp.abs(t1 - t0)
        return t, y, hnew, na, nr, done

    t, y, h, na, nr, _ = jax.lax.while_loop(
        cond, body,
        (t0, y0, jnp.asarray(h0, dtype=float),
         jnp.int32(0), jnp.int32(0), jnp.asarray(False)))
    return y, {"naccept": na, "nreject": nr, "h_final": h}


def rkf45_sample(f, y0, ts, rtol=1e-6, atol=1e-9, max_steps=100000):
    """Adaptive integration sampled at the times ``ts`` (ascending,
    ts[0] = start). Returns ys with ys[0] = y0, shape (len(ts),) + y0."""
    ts = jnp.asarray(ts, dtype=float)

    def seg(carry, t_next):
        y, t = carry
        ynew, _ = rkf45(f, y, t, t_next, rtol=rtol, atol=atol,
                        max_steps=max_steps)
        return (ynew, t_next), ynew

    (_, _), ys = jax.lax.scan(seg, (jnp.asarray(y0), ts[0]), ts[1:])
    return jnp.concatenate([jnp.asarray(y0)[None], ys], axis=0)
