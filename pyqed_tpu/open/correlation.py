"""Generic quantum-regression correlation drivers with pluggable RHS.

TPU-native counterpart of the reference's top-level correlation module
(reference: pyqed/correlation.py:17 ``correlation_3p_1t`` — a Python RK4
file-writing loop over a user-supplied ``dyn`` right-hand side; and the
empty ``correlation_4p_2t:13``). Here the same quantum-regression
contraction runs as a ``lax.scan`` and returns arrays; any Liouville
right-hand side ``dyn(rho, H, c_ops) -> drho/dt`` works, including the
solver-specific ones the dedicated classes in ``open/`` expose.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _default_dyn(rho, H, c_ops):
    """Lindblad RHS: -i[H, rho] + sum_l l rho l+ - 1/2 {l+ l, rho}."""
    out = -1j * (H @ rho - rho @ H)
    for l in c_ops:
        ld = jnp.conj(l.T)
        out = out + l @ rho @ ld - 0.5 * (ld @ l @ rho + rho @ ld @ l)
    return out


def correlation_3p_1t(H, rho0, ops, c_ops=(), tlist=None, dyn=None,
                      dt=None, nt=None):
    """<A B(t) C> = Tr[A U(t)[C rho0 A... ] — quantum regression theorem
    (reference: pyqed/correlation.py:17; the reference evolves
    rho' = C rho0 A and traces B rho'(t)).

    ops = (A, B, C). Returns (times, corr) with corr[k] = Tr[B rho'(t_k)].
    """
    A, B, C = (jnp.asarray(o) for o in ops)
    H = jnp.asarray(H)
    c_ops = [jnp.asarray(c) for c in c_ops]
    if dyn is None:
        dyn = _default_dyn
    if tlist is not None:
        tlist = jnp.asarray(tlist)
        dt = tlist[1] - tlist[0]
        nt = len(tlist)
    else:
        tlist = jnp.arange(1, nt + 1) * dt

    rho = C @ jnp.asarray(rho0) @ A

    def step(rho, _):
        k1 = dyn(rho, H, c_ops)
        k2 = dyn(rho + 0.5 * dt * k1, H, c_ops)
        k3 = dyn(rho + 0.5 * dt * k2, H, c_ops)
        k4 = dyn(rho + dt * k3, H, c_ops)
        rho = rho + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        return rho, jnp.trace(B @ rho)

    _, corr = jax.lax.scan(step, rho.astype(jnp.result_type(rho, 1j)),
                           None, length=int(nt))
    return tlist, corr


def correlation_4p_2t(H, rho0, ops, c_ops=(), dt=0.01, nt1=100, nt2=100,
                      dyn=None):
    """<A(t1+t2) B(t1+t2) C(t1) D> two-time correlation map by nested
    quantum regression (the reference's correlation_4p_2t is an empty
    stub, pyqed/correlation.py:13). Returns (nt1, nt2) array
    C[i, j] = Tr[A B(t2_j) applied to U(t2)[C U(t1_i)[D rho0] ...]].
    """
    A, B, C, D = (jnp.asarray(o) for o in ops)
    H = jnp.asarray(H)
    c_ops = [jnp.asarray(c) for c in c_ops]
    if dyn is None:
        dyn = _default_dyn

    def rk4(rho):
        k1 = dyn(rho, H, c_ops)
        k2 = dyn(rho + 0.5 * dt * k1, H, c_ops)
        k3 = dyn(rho + 0.5 * dt * k2, H, c_ops)
        k4 = dyn(rho + dt * k3, H, c_ops)
        return rho + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    rho1 = (D @ jnp.asarray(rho0)).astype(jnp.result_type(rho0, 1j))

    def outer(rho1, _):
        rho2 = C @ rho1

        def inner(r, _):
            r = rk4(r)
            return r, jnp.trace(A @ B @ r)

        _, row = jax.lax.scan(inner, rho2, None, length=int(nt2))
        return rk4(rho1), row

    _, cmat = jax.lax.scan(outer, rho1, None, length=int(nt1))
    return cmat


def g2_coherence(H, rho0, a, c_ops=(), dt=0.01, nt=500, dyn=None):
    """Normalized second-order optical coherence

        g2(tau) = <a+(0) a+(tau) a(tau) a(0)> / (<n>(0) <n>(tau))

    by the quantum regression theorem: the numerator is
    Tr[n U(tau)[a rho0 a+]] (the reference ships this workflow only as
    qutip scripts, examples/g2_qutip.py and optical_coherence.py; its
    own ``Biphoton.g2`` at pyqed/optics.py:672 is a ``pass`` stub).

    Returns (times, g2) as arrays.  ``rho0`` should be the (steady)
    state of interest; for a coherent state g2 = 1, for thermal light
    g2(0) = 2 with g2(tau) = 1 + |g1(tau)|^2.
    """
    a = jnp.asarray(a)
    ad = jnp.conj(a.T)
    n_op = ad @ a
    rho0 = jnp.asarray(rho0)
    tlist, num = correlation_3p_1t(H, rho0, (ad, n_op, a), c_ops=c_ops,
                                  dt=dt, nt=nt, dyn=dyn)
    # <n>(tau) from the plain evolution of rho0 (constant in steady
    # state, but computed honestly for any input state) — the SAME
    # quantum-regression driver with A = C = 1 so the two time grids
    # and steppers can never desynchronize
    eye = jnp.eye(rho0.shape[0], dtype=rho0.dtype)
    _, nbar_t = correlation_3p_1t(H, rho0, (eye, n_op, eye), c_ops=c_ops,
                                  dt=dt, nt=nt, dyn=dyn)
    nbar0 = jnp.trace(n_op @ rho0)
    return tlist, jnp.real(num) / jnp.real(nbar0 * nbar_t)
