"""Quantum (Bohmian) trajectory dynamics with the linearized quantum force.

TPU-native counterpart of the reference quantum-trajectory layer
(reference: pyqed/qt/qt.py — ``QT:24`` (ensemble + quantum force ``run:108``),
``NAQT:165``; pyqed/qt/lqf.py — ``LQF:349`` least-squares linear quantum
force, ``qpot:405``).

All trajectories propagate as one batched array under ``lax.scan``; the
LQF fit is a single (ndim+1)x(ndim+1) weighted least squares per step —
the reference's per-trajectory Python loops become einsums.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.result import Result


def lqf(x, w, mass):
    """Linearized quantum force (reference: pyqed/qt/lqf.py:349).

    Fits r(x) = C^T [x, 1] to the derivative-log-density via the moment
    matrix S = sum_i w_i f_i f_i^T; returns (r (ntraj, ndim),
    quantum force (ntraj, ndim), quantum potential energy).
    """
    ntraj, ndim = x.shape
    f = jnp.concatenate([x, jnp.ones((ntraj, 1), dtype=x.dtype)], axis=1)
    S = jnp.einsum("i, im, in -> mn", w, f, f)
    C = jnp.zeros((ndim + 1, ndim)).at[jnp.arange(ndim), jnp.arange(ndim)] \
        .set(-0.5)
    c = jnp.linalg.solve(S, C)                    # (ndim+1, ndim)
    r = f @ c                                     # (ntraj, ndim)
    dr = c[:ndim, :]                              # d r_k / d x_j  (j, k)
    mass = jnp.asarray(mass)
    # quantum force F_q = -grad(Q) = + sum_k r_ik dr_jk / m_k for the
    # linear fit (reference qpot: fq = (2 r dr + ddr)/2m,
    # pyqed/qt/lqf.py:462; the reference LQF's `du` is grad(Q) = -F_q)
    fq = jnp.einsum("ik, jk -> ij", r, dr / mass[None, :])
    # quantum potential energy: Eu = -1/2m <r^2 + dr>
    Eu = -jnp.sum((jnp.einsum("i, ik -> k", w, r**2)
                   + jnp.diagonal(dr)) / (2.0 * mass))
    return r, fq, Eu


class ResultQT(Result):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.x = None
        self.p = None
        self.xAve = None


class QT:
    """Bohmian trajectory ensemble (reference: pyqed/qt/qt.py:24)."""

    def __init__(self, ntraj, ndim, mass=None):
        self.ntraj = ntraj
        self.ndim = ndim
        self.mass = np.asarray(mass if mass is not None else [1.0] * ndim,
                               dtype=float)
        self.x = None
        self.p = None
        self.w = None
        self.force = None

    def sample(self, key=None, x0=None, p0=None, sigma=None):
        """Gaussian ensemble sampling (reference: pyqed/qt/qt.py:40)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        x0 = np.zeros(self.ndim) if x0 is None else np.asarray(x0)
        p0 = np.zeros(self.ndim) if p0 is None else np.asarray(p0)
        sigma = np.ones(self.ndim) / np.sqrt(2.0) if sigma is None \
            else np.asarray(sigma)
        self.x = (jax.random.normal(key, (self.ntraj, self.ndim))
                  * sigma[None, :] + x0[None, :])
        self.p = jnp.tile(jnp.asarray(p0), (self.ntraj, 1))
        self.w = jnp.ones(self.ntraj) / self.ntraj
        return self.x

    def set_force(self, force: Callable):
        """Classical force F(x) acting on each trajectory."""
        self.force = force

    def run(self, dt, nt, nout=1, friction=0.0) -> ResultQT:
        """Velocity-Verlet-like propagation with LQF quantum force
        (reference loop: pyqed/qt/qt.py:108)."""
        mass = jnp.asarray(self.mass)
        w = self.w
        force = self.force
        if force is None:
            raise ValueError("set_force(F) before run()")

        def total_force(x, p):
            r, fq, Eu = lqf(x, w, mass)
            return force(x) + fq - friction * p, Eu

        def step(carry, _):
            x, p = carry
            F, Eu = total_force(x, p)
            p_half = p + 0.5 * dt * F
            x_new = x + dt * p_half / mass[None, :]
            F2, Eu2 = total_force(x_new, p_half)
            p_new = p_half + 0.5 * dt * F2
            xave = jnp.einsum("i, ij -> j", w, x_new)
            energy = (jnp.sum(jnp.einsum("i, ij -> j", w, p_new**2)
                              / (2 * mass)) + Eu2)
            return (x_new, p_new), (xave, energy)

        ns = nt // nout

        @jax.jit
        def evolve(x, p):
            def window(carry, _):
                carry, outs = jax.lax.scan(step, carry, None, length=nout)
                return carry, (outs[0][-1], outs[1][-1])
            return jax.lax.scan(window, (x, p), None, length=ns)

        (xf, pf), (xave, energy) = evolve(self.x, self.p)
        r = ResultQT(dt=dt, nt=nt, nout=nout)
        r.times = np.arange(1, ns + 1) * dt * nout
        r.x, r.p = xf, pf
        r.xAve = xave
        r.observables = energy[:, None]
        self.x, self.p = xf, pf
        return r


class NAQT:
    """Nonadiabatic quantum trajectories: Ehrenfest mean-field forces +
    the LQF quantum force, with per-trajectory electronic coefficients.

    WORKING implementation of the reference's NAQT whose run loop is
    fully commented out (reference: pyqed/qt/lqf.py:473 ``NAQT`` and
    qt/qt.py:165 — the sys-bath state is an ensemble (x, p, c) with
    LQF on the nuclear sector; pyqed/qt/README.md scheme).

    Parameters
    ----------
    dpes : callable x (ntraj, ndim) -> V (ntraj, ns, ns) diabatic matrix
        (vectorized); forces from jax.jacrev-free finite-difference-free
        analytic grad via jax.vmap(jax.jacobian) of a pointwise dpes1.
    dpes1 : callable x (ndim,) -> (ns, ns) pointwise version (for grads).
    """

    def __init__(self, ntraj, ndim, nstates, dpes1: Callable, mass=None):
        self.ntraj = ntraj
        self.ndim = ndim
        self.nstates = nstates
        self.dpes1 = dpes1
        self.mass = jnp.asarray(mass if mass is not None
                                else np.ones(ndim), dtype=float)
        self.w = jnp.full(ntraj, 1.0 / ntraj)
        self._V = jax.vmap(dpes1)
        self._dV = jax.vmap(jax.jacobian(dpes1))   # (ntraj, ns, ns, ndim)

    def sample(self, a, x0, state=0, key=0):
        """Gaussian cloud matching psi0 ~ exp(-a (x-x0)^2 / ...); the
        width convention matches the reference sample (lqf.py:491)."""
        key = jax.random.PRNGKey(key) if isinstance(key, int) else key
        a = jnp.atleast_1d(jnp.asarray(a, dtype=float))
        x0 = jnp.atleast_1d(jnp.asarray(x0, dtype=float))
        x = (jax.random.normal(key, (self.ntraj, self.ndim))
             / jnp.sqrt(2.0 * a)[None, :] + x0[None, :])
        p = jnp.zeros((self.ntraj, self.ndim))
        c = jnp.zeros((self.ntraj, self.nstates), dtype=complex)
        c = c.at[:, state].set(1.0)
        return x, p, c

    def run(self, x, p, c, dt, nt, nout=1):
        """Velocity-Verlet nuclei + RK4 electronic coefficients; returns
        ResultQT with populations (ns_steps+1, nstates) and positions."""
        mass = self.mass
        w = self.w
        V = self._V
        dV = self._dV

        def forces(x, c):
            # Ehrenfest: F = -<c| dV |c> per trajectory
            dv = dV(x)                                   # (N, ns, ns, D)
            F_cl = -jnp.real(jnp.einsum("na, nabd, nb -> nd",
                                        jnp.conj(c), dv, c)
                             / jnp.sum(jnp.abs(c) ** 2, axis=1)[:, None])
            r, F_q, _ = lqf(x, w, mass)
            return F_cl + F_q

        def cdot(x, c):
            v = V(x)
            return -1j * jnp.einsum("nab, nb -> na", v, c)

        def step(carry, _):
            x, p, c = carry
            F = forces(x, c)
            p = p + 0.5 * dt * F
            x = x + dt * p / mass[None, :]
            # RK4 on c with the new positions
            k1 = cdot(x, c)
            k2 = cdot(x, c + 0.5 * dt * k1)
            k3 = cdot(x, c + 0.5 * dt * k2)
            k4 = cdot(x, c + dt * k3)
            c = c + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
            c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
            F = forces(x, c)
            p = p + 0.5 * dt * F
            return (x, p, c), None

        def observe(x, p, c):
            pops = jnp.einsum("n, na -> a", w, jnp.abs(c) ** 2)
            xave = jnp.einsum("n, nd -> d", w, x)
            return pops, xave

        ns_steps = nt // nout

        @jax.jit
        def evolve(x, p, c):
            def window(carry, _):
                carry, _ = jax.lax.scan(step, carry, None, length=nout)
                return carry, observe(*carry)
            return jax.lax.scan(window, (x, p, c), None, length=ns_steps)

        (xf, pf, cf), (pops, xave) = evolve(x, p, c)
        p0, x0 = observe(x, p, c)
        r = ResultQT(dt=dt, nt=nt, nout=nout)
        r.times = np.arange(ns_steps + 1) * dt * nout
        r.population = np.concatenate([np.asarray(p0)[None],
                                       np.asarray(pops)], axis=0)
        r.xave = np.concatenate([np.asarray(x0)[None],
                                 np.asarray(xave)], axis=0)
        r.x, r.p, r.c = xf, pf, cf
        return r


def qpot(x, p, r, w, mass=1.0):
    """Linear quantum force WITH friction (the dissipative AQP variant):
    weighted linear fits of both the momentum field p(x) and the
    derivative-log-amplitude r(x) over the trajectory ensemble
    (reference: pyqed/qt/lqf.py:405 ``qpot`` — 1D only there, with its
    ndim>1 branch ``pass``; vectorized for ndim here).

    Returns (Eu, fq, fr): quantum potential energy, quantum force, and
    friction force fr = -(2 r dp + ddp)/2m (linear fit -> ddp = 0).
    """
    x = jnp.atleast_2d(jnp.asarray(x).T).T      # (ntraj, ndim)
    p = jnp.atleast_2d(jnp.asarray(p).T).T
    r = jnp.atleast_2d(jnp.asarray(r).T).T
    w = jnp.asarray(w)
    ntraj, ndim = x.shape
    mass = jnp.broadcast_to(jnp.asarray(mass, dtype=x.dtype), (ndim,))
    f = jnp.concatenate([x, jnp.ones((ntraj, 1), dtype=x.dtype)], axis=1)
    S = jnp.einsum("i, im, in -> mn", w, f, f)
    bp = jnp.einsum("i, im, ik -> mk", w, f, p)
    br = jnp.einsum("i, im, ik -> mk", w, f, r)
    cp = jnp.linalg.solve(S, bp)                # (ndim+1, ndim)
    cr = jnp.linalg.solve(S, br)
    dp = cp[:ndim, :]                           # d p_k / d x_j
    dr = cr[:ndim, :]
    fq = jnp.einsum("ik, jk -> ij", r, dr / mass[None, :])
    fr = -jnp.einsum("ik, jk -> ij", r, dp / mass[None, :])
    Eu = -jnp.sum((jnp.einsum("i, ik -> k", w, r ** 2)
                   + jnp.diagonal(dr)) / (2.0 * mass))
    return Eu, fq, fr


class QTF:
    """Quantum trajectories with friction (AQP ground-state relaxation;
    reference: pyqed/qt/1D/QTF_1D.py and qt/1D/HigherOrder_1D.py — the
    Bohmian ensemble (x, p, r) with the approximate quantum potential
    from a polynomial fit and a friction constant; with friction on, the
    total energy relaxes to the ground-state energy).

    The reference scripts are 1D with a hard-coded cubic basis and a
    Python time loop; here the ensemble propagates as one ``lax.scan``
    with ``qpot_poly(order=...)`` (order=1 = the linear LQF limit).
    """

    def __init__(self, ntraj, mass=1.0, order=3, friction=0.0,
                 qpot=None):
        self.ntraj = ntraj
        self.mass = float(mass)
        self.order = order
        self.friction = friction
        #: qpot: optional custom quantum-force model
        #: (x, p, r, w, mass) -> (Eu, fq, fr); e.g.
        #: functools.partial(qpot_domains, xdom=[0.0]) for the
        #: domain-decomposed double-well variant. Default: qpot_poly
        #: with ``order``.
        self.qpot = qpot

    def sample(self, a0, x0=0.0, key=None):
        """Trajectory ensemble for psi0 ~ exp(-a0 (x-x0)^2 / 2): the
        log-derivative field is r = -a0 (x-x0) and the density is
        rho ~ exp(-a0 (x-x0)^2), sigma^2 = 1/(2 a0)
        (reference: QTF_1D.py:121-133, which Monte-Carlo samples).

        Default is DETERMINISTIC quadrature: a uniform grid over
        x0 +- 6 sigma with weights w_i ~ rho(x_i). Exact moments make
        the LQF energy identity (<2 r^2> = <-dr>, i.e. c sigma^2 = 1/2
        for a Gaussian) hold to quadrature precision, so the
        no-friction ensemble conserves energy; Monte-Carlo sampling
        (pass ``key``) breaks it at O(1/sqrt(ntraj)).

        Returns (x, p, r, w)."""
        sig = 1.0 / jnp.sqrt(2.0 * a0)
        if key is None:
            x = x0 + jnp.linspace(-6.0, 6.0, self.ntraj) * sig
            w = jnp.exp(-a0 * (x - x0) ** 2)
            w = w / jnp.sum(w)
        else:
            key = (jax.random.PRNGKey(key) if isinstance(key, int)
                   else key)
            x = x0 + sig * jax.random.normal(key, (self.ntraj,))
            w = jnp.full(self.ntraj, 1.0 / self.ntraj)
        p = jnp.zeros(self.ntraj)
        r = -a0 * (x - x0)
        return x, p, r, w

    def run(self, x, p, r, w, derivs: Callable, dt, nt, nout=10):
        """Propagate the ensemble ODE

            dx/dt = p/m,  dp/dt = -dV + fq - gamma p,  dr/dt = fr

        (the reference's loop at QTF_1D.py:157-176 is a first-order
        split because fq/fr depend on (p, r) themselves; here a
        vectorized classic RK4 on the full (x, p, r) state, which
        conserves the LQF energy to O(dt^4)).
        ``derivs(x) -> (V, dV)`` vectorized.

        Returns ResultQT with observables columns
        (E_kinetic, E_potential, E_quantum, E_total)."""
        am = self.mass
        gam = self.friction
        order = self.order
        qp = (self.qpot if self.qpot is not None
              else (lambda x, p, r, w, mass: qpot_poly(
                  x, p, r, w, mass=mass, order=order)))

        def rhs(state):
            x, p, r = state
            _, fq, fr = qp(x, p, r, w, mass=am)
            _, dv = derivs(x)
            return (p / am, -dv + fq - gam * p, fr)

        def step(carry, _):
            k1 = rhs(carry)
            k2 = rhs(tuple(c + dt / 2 * k for c, k in zip(carry, k1)))
            k3 = rhs(tuple(c + dt / 2 * k for c, k in zip(carry, k2)))
            k4 = rhs(tuple(c + dt * k for c, k in zip(carry, k3)))
            x, p, r = tuple(
                c + dt / 6 * (a + 2 * b + 2 * cc + d)
                for c, a, b, cc, d in zip(carry, k1, k2, k3, k4))
            Eu, _, _ = qp(x, p, r, w, mass=am)
            v0, _ = derivs(x)
            Ek = jnp.dot(p * p, w) / (2 * am)
            Ev = jnp.dot(v0, w)
            return (x, p, r), (Ek, Ev, Eu)

        ns = nt // nout

        @jax.jit
        def evolve(x, p, r):
            def window(carry, _):
                carry, outs = jax.lax.scan(step, carry, None,
                                           length=nout)
                return carry, tuple(o[-1] for o in outs)
            return jax.lax.scan(window, (x, p, r), None, length=ns)

        (xf, pf, rf), (Ek, Ev, Eu) = evolve(jnp.asarray(x),
                                            jnp.asarray(p),
                                            jnp.asarray(r))
        res = ResultQT(dt=dt, nt=nt, nout=nout)
        res.times = np.arange(1, ns + 1) * dt * nout
        res.x, res.p, res.r = xf, pf, rf
        Ek, Ev, Eu = (np.asarray(v) for v in (Ek, Ev, Eu))
        res.observables = np.stack([Ek, Ev, Eu, Ek + Ev + Eu], axis=1)
        return res


def qpot_poly(x, p, r, w, mass=1.0, order=5):
    """Higher-order (polynomial) quantum/friction forces for 1D
    trajectory ensembles (reference: pyqed/qt/1D/HigherOrder_1D.py:81
    ``qpot`` — hard-coded Nb=6 monomial basis there; order is a
    parameter here, order=1 reproducing the linear ``qpot``).

    Weighted least-squares fit of p(x) and r(x) in the monomial basis
    {1, x, ..., x^order}; returns (Eu, fq, fr) with
    fq = (2 r dr + ddr)/2m,  fr = -(2 r dp + ddp)/2m,
    Eu = -<r^2 + dr>/2m.
    """
    x = jnp.asarray(x).reshape(-1)
    p = jnp.asarray(p).reshape(-1)
    r = jnp.asarray(r).reshape(-1)
    w = jnp.asarray(w).reshape(-1)
    nb = order + 1
    powers = jnp.arange(nb)
    # fit in centered/scaled coordinates: the raw monomial Gram matrix
    # is numerically singular once the ensemble narrows or drifts off
    # the origin (the reference's Nb=4 raw-x solve blows up there);
    # derivatives chain back with 1/sigma factors
    xm = jnp.dot(w, x)
    sig = jnp.sqrt(jnp.dot(w, (x - xm) ** 2) + 1e-30)
    u = (x - xm) / sig
    F = u[:, None] ** powers[None, :]               # (ntraj, nb)
    S = jnp.einsum("i, im, in -> mn", w, F, F)
    bp = jnp.einsum("i, im, i -> m", w, F, p)
    br = jnp.einsum("i, im, i -> m", w, F, r)
    cp = jnp.linalg.solve(S, bp)
    cr = jnp.linalg.solve(S, br)
    # derivative bases (in u, then chain rule d/dx = (1/sig) d/du)
    D1 = jnp.where(powers[None, :] >= 1,
                   powers[None, :] * u[:, None]
                   ** jnp.maximum(powers[None, :] - 1, 0), 0.0)
    D2 = jnp.where(powers[None, :] >= 2,
                   powers[None, :] * (powers[None, :] - 1)
                   * u[:, None] ** jnp.maximum(powers[None, :] - 2, 0),
                   0.0)
    dr = (D1 @ cr) / sig
    dp = (D1 @ cp) / sig
    ddr = (D2 @ cr) / sig ** 2
    ddp = (D2 @ cp) / sig ** 2
    fq = (2.0 * r * dr + ddr) / (2.0 * mass)
    fr = -(2.0 * r * dp + ddp) / (2.0 * mass)
    Eu = -jnp.dot(w, r ** 2 + dr) / (2.0 * mass)
    return Eu, fq, fr


def qpot_domains(x, p, r, w, xdom, mass=1.0, sharp=8.0):
    """Domain-decomposed LQF: the nonclassical momentum r(x) and the
    momentum p(x) are fit LINEARLY inside each spatial domain and
    blended with smooth tanh partition functions

        theta_0 = (1 - tanh d(x - x_0))/2,
        theta_k = (tanh d(x - x_{k-1}) - tanh d(x - x_k))/2,
        theta_K = (1 + tanh d(x - x_{K-1}))/2,

    which lets a GLOBALLY nonlinear r(x) (double wells!) be captured by
    piecewise-linear fits (reference: pyqed/qt/1D/domain/{main,fit}.py
    — half-finished scripts whose domain loop is vestigial; completed
    here with the full product-rule forces).

    xdom: sorted interior domain edges (K edges -> K+1 domains).
    Returns (Eu, fq, fr) like :func:`qpot_poly`.
    """
    x = jnp.asarray(x).reshape(-1)
    p = jnp.asarray(p).reshape(-1)
    r = jnp.asarray(r).reshape(-1)
    w = jnp.asarray(w).reshape(-1)
    xdom = jnp.atleast_1d(jnp.asarray(xdom, dtype=x.dtype))
    d = sharp
    K = xdom.shape[0]

    ts = [jnp.tanh(d * (x - xe)) for xe in xdom]
    sech2 = [1.0 - t ** 2 for t in ts]
    thetas = [0.5 * (1.0 - ts[0])]
    dthetas = [-0.5 * d * sech2[0]]
    ddthetas = [d * d * ts[0] * sech2[0]]
    for k in range(K - 1):
        thetas.append(0.5 * (ts[k] - ts[k + 1]))
        dthetas.append(0.5 * d * (sech2[k] - sech2[k + 1]))
        ddthetas.append(-d * d * (ts[k] * sech2[k]
                                  - ts[k + 1] * sech2[k + 1]))
    thetas.append(0.5 * (1.0 + ts[-1]))
    dthetas.append(0.5 * d * sech2[-1])
    ddthetas.append(-d * d * ts[-1] * sech2[-1])

    def blend(y):
        """Domain-wise weighted linear fits of y(x), blended:
        returns (yhat, dyhat, ddyhat)."""
        yh = jnp.zeros_like(x)
        dyh = jnp.zeros_like(x)
        ddyh = jnp.zeros_like(x)
        for th, dth, ddth in zip(thetas, dthetas, ddthetas):
            wk = w * th
            s0 = jnp.sum(wk)
            s1 = jnp.dot(wk, x)
            s2 = jnp.dot(wk, x * x)
            b0 = jnp.dot(wk, y)
            b1 = jnp.dot(wk, x * y)
            det = s0 * s2 - s1 * s1 + 1e-300
            a0 = (s2 * b0 - s1 * b1) / det
            a1 = (s0 * b1 - s1 * b0) / det
            yk = a0 + a1 * x
            yh = yh + th * yk
            dyh = dyh + dth * yk + th * a1
            ddyh = ddyh + ddth * yk + 2.0 * dth * a1
        return yh, dyh, ddyh

    rh, drh, ddrh = blend(r)
    ph, dph, ddph = blend(p)
    fq = (2.0 * rh * drh + ddrh) / (2.0 * mass)
    fr = -(2.0 * r * dph + ddph) / (2.0 * mass)
    Eu = -jnp.dot(w, rh ** 2 + drh) / (2.0 * mass)
    return Eu, fq, fr


def vpot_ph2(r):
    """para-H2 dimer Morse/long-range (MLR) potential, Eh vs bohr
    (reference: pyqed/qt/1D/pH2.py — numba scripts; vectorized jnp
    here). Depth 24.2288 cm^-1 at re = 3.47005 Angstrom; the long-range
    tail is the damped C6/C8/C10 dispersion."""
    bohr_angstrom = 0.52917721092
    hartree_wavenumber = 219474.63
    Vmin = -24.2288
    bcoef = jnp.asarray([-6.631e-02, 1.346e-01, -3.300e-02, 6e0,
                         -1.4e01, -1.193e02, 2.290e02, 1.110e03,
                         -1.850e03, -3.5e03, 6.0e03])
    re = 3.47005
    De = 24.2288
    r = jnp.asarray(r) * bohr_angstrom      # to Angstrom

    def damp(r, n):
        den = 1.10
        return (1.0 - jnp.exp(-3.30 * den * r / n
                              - 0.423 * (den * r) ** 2
                              / np.sqrt(float(n)))) ** (n - 1)

    def u_LR(r):
        C6, C8, C10 = 5.820364e04, 2.87052154e05, 1.80757343e06
        return (damp(r, 6) * C6 / r ** 6 + damp(r, 8) * C8 / r ** 8
                + damp(r, 10) * C10 / r ** 10)

    def y_ref(r, n):
        r_ref = 4.60
        return (r ** n - r_ref ** n) / (r ** n + r_ref ** n)

    def y_eq(r, n):
        return (r ** n - re ** n) / (r ** n + re ** n)

    beta_inf = jnp.log(2.0 * De / u_LR(re))
    s = sum(bcoef[j] * y_ref(r, 1) ** j for j in range(11))
    beta = y_ref(r, 6) * beta_inf + (1.0 - y_ref(r, 6)) * s
    v = De * (1.0 - u_LR(r) / u_LR(re) * jnp.exp(-beta * y_eq(r, 6))) ** 2
    return (v + Vmin) / hartree_wavenumber
