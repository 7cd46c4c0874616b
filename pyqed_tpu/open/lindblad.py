"""Lindblad quantum master equation solvers.

TPU-native counterpart of the reference's two Lindblad paths
(reference: pyqed/oqs.py — ``LindbladSolver:1114``, ``_lindblad:1596``,
``_lindblad_driven:1699``, ``steady_state:1146``; pyqed/superoperator.py —
``Lindblad_solver:455`` eigendecomposition path).

- :class:`LindbladSolver` — time stepping of the matrix-free Liouvillian
  (N x N matmuls per RK4 stage on the MXU, ``lax.scan`` loop) replacing the
  reference's per-step sparse matmul chain (pyqed/oqs.py:1682-1690).
- :class:`LiouvilleSolver` — dense N^2 x N^2 Liouvillian, one host eig, then
  all time/frequency evaluations are batched contractions on-device
  (reference: pyqed/superoperator.py:524,565,603,638,702).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.linalg import dag
from ..ops.superoperator import (
    liouvillian, liouvillian_action, dm2vec, vec2dm, left, obs_vec,
    operator_to_vector,
)
from ..core.result import Result
from ..core.dynamics import run_solver, rk4_step, rk4_step_t, expect_dm


class LindbladSolver:
    """Time-domain Lindblad QME solver (reference: pyqed/oqs.py:1114)."""

    def __init__(self, H=None, c_ops=None, e_ops=None):
        self.H = H
        self.c_ops = c_ops
        self.e_ops = e_ops

    def setH(self, H):
        self.H = H

    def set_c_ops(self, c_ops):
        self.c_ops = c_ops

    def set_e_ops(self, e_ops):
        self.e_ops = e_ops

    def configure(self, c_ops, e_ops):
        self.c_ops = c_ops
        self.e_ops = e_ops

    def liouvillian(self):
        return liouvillian(jnp.asarray(self.H), self.c_ops)

    # ------------------------------------------------------------------ run
    def run(self, rho0, dt, Nt=None, t0=0.0, e_ops=None, nout=1,
            store_states=False, method="rk4", nt=None) -> Result:
        """Propagate rho(t). ``H`` may be a matrix (time-independent) or the
        reference's QuTiP-style list [H0, [H1, f1(t)]] meaning
        H(t) = H0 − f1(t) H1 (reference: pyqed/oqs.py:1726-1732).

        method='propagator' (time-independent H only): build the dense
        Liouvillian once, form the RK4 step polynomial
        M = sum_k (L dt)^k / k!  (bitwise the same stepping as
        method='rk4'), compose M^nout by squaring, and advance one
        HBM-bound matvec per observation window — the TPU-fast path
        for small/medium Liouville dimensions."""
        if Nt is None:
            Nt = nt
        if Nt is None:
            raise TypeError("run() needs Nt (or nt)")
        if e_ops is None:
            e_ops = self.e_ops
        if method == "propagator" and not isinstance(self.H, (list, tuple)):
            return self._run_propagator(rho0, dt, Nt, t0=t0, e_ops=e_ops,
                                        nout=nout,
                                        store_states=store_states)
        rho0 = jnp.asarray(rho0)
        cdtype = jnp.result_type(rho0, 1j)
        rho0 = rho0.astype(cdtype)
        c_ops = [jnp.asarray(c).astype(cdtype) for c in (self.c_ops or [])]

        if isinstance(self.H, (list, tuple)):
            H0 = jnp.asarray(self.H[0]).astype(cdtype)
            drives = [(jnp.asarray(term[0]).astype(cdtype), term[1])
                      for term in self.H[1:]]
            cdags = [dag(c) for c in c_ops]
            ldls = [cd @ c for c, cd in zip(c_ops, cdags)]

            def rhs(rho, t):
                Ht = H0
                for (H1, f) in drives:
                    Ht = Ht - f(t) * H1
                out = -1j * (Ht @ rho - rho @ Ht)
                for c, cd, ldl in zip(c_ops, cdags, ldls):
                    out = out + c @ rho @ cd - 0.5 * (ldl @ rho + rho @ ldl)
                return out

            step = rk4_step_t(rhs)
            def stepper(y, t):
                return step(y, t, dt)
        else:
            H = jnp.asarray(self.H).astype(cdtype)
            L = liouvillian_action(H, c_ops)
            step = rk4_step(L)
            def stepper(y, t):
                return step(y, t, dt)

        return run_solver(stepper, rho0, dt, Nt, e_ops=e_ops, nout=nout,
                          t0=t0, store_states=store_states, is_dm=True)

    evolve = run

    def _run_propagator(self, rho0, dt, Nt, t0=0.0, e_ops=None, nout=1,
                        store_states=False) -> Result:
        rho0 = jnp.asarray(rho0)
        cdtype = jnp.result_type(rho0, 1j)
        n = rho0.shape[0]
        e_ops = [jnp.asarray(e).astype(cdtype) for e in (e_ops or [])]
        ns = Nt // nout
        Lm = self.liouvillian().astype(cdtype)

        @jax.jit
        def evolve(rho0):
            X = Lm * dt
            M = jnp.eye(n * n, dtype=cdtype)
            term = jnp.eye(n * n, dtype=cdtype)
            for k in range(1, 5):
                term = (term @ X) / k
                M = M + term
            Mk = jnp.linalg.matrix_power(M, nout)

            def window(v, _):
                v = Mk @ v
                rho = v.reshape(n, n)
                obs = jnp.stack([jnp.trace(e @ rho) for e in e_ops]) \
                    if e_ops else jnp.zeros((0,), cdtype)
                return v, (obs, rho if store_states else
                           jnp.zeros((0,), cdtype))

            v, (obs, states) = jax.lax.scan(window, rho0.astype(cdtype)
                                            .reshape(-1), None, length=ns)
            return v.reshape(n, n), obs, states

        rho_f, obs, states = evolve(rho0)
        if e_ops:
            obs0 = jnp.stack([jnp.trace(e @ rho0.astype(cdtype))
                              for e in e_ops])[None]
            obs = jnp.concatenate([obs0, obs], axis=0)
        r = Result(dt=dt, nt=Nt, nout=nout,
                   times=t0 + dt * nout * jnp.arange(ns + 1))
        r.rho = rho_f
        r.observables = obs
        if store_states:
            r.states = states
        return r

    # --------------------------------------------------------- steady state
    def steady_state(self):
        """Null vector of the dense Liouvillian, normalized to unit trace."""
        L = np.asarray(self.liouvillian())
        n = int(round(np.sqrt(L.shape[0])))
        # smallest singular vector
        _, s, Vh = np.linalg.svd(L)
        rho = Vh[-1].conj().reshape(n, n)
        rho = (rho + rho.conj().T) / 2
        return jnp.asarray(rho / np.trace(rho))

    # --------------------------------------------------- correlation suite
    def correlation_3op_1t(self, rho0, oplist, dt=0.005, Nt=1):
        """<A B(t) C> = Tr[B U(t)(C rho0 A)]
        (reference: pyqed/oqs.py:1225)."""
        a_op, b_op, c_op = [jnp.asarray(o) for o in oplist]
        res = self.run(c_op @ jnp.asarray(rho0) @ a_op, dt=dt, Nt=Nt,
                       e_ops=[b_op])
        return res.observables[:, 0]

    def correlation_2op_1t(self, rho0, a_op, b_op, dt, Nt):
        """<A(t) B> (reference: pyqed/oqs.py:1195)."""
        eye = jnp.eye(jnp.asarray(rho0).shape[0])
        return self.correlation_3op_1t(rho0, [eye, a_op, b_op], dt=dt, Nt=Nt)

    def correlation_4op_1t(self, rho0, oplist, dt=0.005, Nt=1):
        a, b, c, d = oplist
        return self.correlation_3op_1t(rho0, [a, b @ c, d], dt=dt, Nt=Nt)

    def correlation_3op_2t(self, rho0, ops, dt, Nt, Ntau):
        """<A(t) B(t+tau) C(t)> (reference: pyqed/oqs.py:1264).

        The reference's outer Python loop over t is replaced by a vmap over
        the stored trajectory: one batched propagation of all
        C rho(t) A seeds along tau.
        """
        a_op, b_op, c_op = [jnp.asarray(o) for o in ops]
        rho_t = self.run(jnp.asarray(rho0), dt=dt, Nt=Nt,
                         store_states=True).states[:Nt]

        def one(rho):
            return self.run(c_op @ rho @ a_op, dt=dt, Nt=Ntau,
                            e_ops=[b_op]).observables[:Ntau, 0]

        return jax.lax.map(one, rho_t)

    def correlation_4op_2t(self, rho0, ops, dt, nt, ntau):
        a, b, c, d = ops
        return self.correlation_3op_2t(rho0, [a, b @ c, d], dt, nt, ntau)


class LiouvilleSolver:
    """Liouville-space solver by diagonalization of L
    (reference: pyqed/superoperator.py:455 ``Lindblad_solver``).

    The (non-Hermitian) eig runs on host LAPACK once — there is no TPU eig —
    after which every time/frequency-domain quantity is a batched on-device
    contraction over eigenmodes (SURVEY.md §7 'hard parts': host-eig escape
    hatch, device contraction).
    """

    def __init__(self, H, c_ops=None):
        self.H = H
        self.c_ops = c_ops
        self.dim = H.shape[-1] ** 2
        self.n = H.shape[-1]
        self.L = None
        self.eigvals = None
        self.right_eigvecs = None
        self.left_eigvecs = None
        self.norm = None
        self.idv = dm2vec(jnp.eye(self.n))

    def liouvillian(self):
        self.L = liouvillian(jnp.asarray(self.H), self.c_ops)
        return self.L

    def eigenstates(self):
        import scipy.linalg
        if self.L is None:
            self.liouvillian()
        w, vl, vr = scipy.linalg.eig(np.asarray(self.L), left=True, right=True)
        self.eigvals = jnp.asarray(w)
        self.left_eigvecs = jnp.asarray(vl)
        self.right_eigvecs = jnp.asarray(vr)
        # complex biorthogonal norm <vl_n|vr_n> (the reference truncates to
        # .real at pyqed/superoperator.py:508, losing ~1e-3 reconstruction
        # accuracy; keep it complex for exact mode expansion)
        self.norm = jnp.einsum("in, in -> n", vl.conj(), vr)
        return w, vr, vl

    def _ensure_eig(self):
        if self.eigvals is None:
            self.eigenstates()

    def evolve(self, rho0, tlist, e_ops) -> Result:
        """rho(t) = sum_n U1_n e^{lambda_n t} <U2_n|rho0>/norm_n
        (reference: pyqed/superoperator.py:524)."""
        self._ensure_eig()
        tlist = jnp.asarray(tlist)
        rv = dm2vec(jnp.asarray(rho0))
        coeff = jnp.einsum("in, i -> n", self.left_eigvecs.conj(), rv) / self.norm
        modes = jnp.exp(jnp.outer(tlist, self.eigvals))           # (T, n2)
        rho_t = jnp.einsum("tn, n, in -> ti", modes, coeff, self.right_eigvecs)
        # Tr[op rho] = <vec(op^dag), vec(rho)> for all ops/times at once
        bras = jnp.stack([jnp.conj(dm2vec(dag(op))) for op in e_ops])
        obs = jnp.einsum("ki, ti -> tk", bras, rho_t)
        return Result(times=tlist, observables=obs)

    def correlation_2op_1t(self, rho0, ops, tlist):
        """<A(t) B> (reference: pyqed/superoperator.py:565)."""
        a, b = [jnp.asarray(o) for o in ops]
        self._ensure_eig()
        rv = dm2vec(b @ jnp.asarray(rho0))
        coeff = (jnp.einsum("i, in -> n", jnp.conj(self.idv),
                            left(a) @ self.right_eigvecs)
                 * jnp.einsum("in, i -> n", self.left_eigvecs.conj(), rv)
                 / self.norm)
        return jnp.exp(jnp.outer(jnp.asarray(tlist), self.eigvals)) @ coeff

    def correlation_2op_1w(self, rho0, ops, w):
        """S(w) = int_0^inf <A(t)B> e^{iwt} dt
        (reference: pyqed/superoperator.py:603)."""
        a, b = [jnp.asarray(o) for o in ops]
        self._ensure_eig()
        rv = dm2vec(b @ jnp.asarray(rho0))
        coeff = (jnp.einsum("i, in -> n", jnp.conj(self.idv),
                            left(a) @ self.right_eigvecs)
                 * jnp.einsum("in, i -> n", self.left_eigvecs.conj(), rv)
                 / self.norm)
        W = -1.0 / (self.eigvals[None, :] + 1j * jnp.asarray(w)[:, None])
        return W @ coeff

    def correlation_3op_1t(self, rho0, ops, t):
        """<...> with seed C rho0 A (reference: pyqed/superoperator.py:638)."""
        a, b, c = [jnp.asarray(o) for o in ops]
        self._ensure_eig()
        rv = dm2vec(c @ jnp.asarray(rho0) @ a)
        coeff = (jnp.einsum("i, in -> n", jnp.conj(self.idv),
                            left(b) @ self.right_eigvecs)
                 * jnp.einsum("in, i -> n", self.left_eigvecs.conj(), rv)
                 / self.norm)
        return jnp.exp(jnp.outer(jnp.asarray(t), self.eigvals)) @ coeff

    def correlation_3op_1w(self, rho0, ops, w):
        a, b, c = [jnp.asarray(o) for o in ops]
        self._ensure_eig()
        rv = dm2vec(c @ jnp.asarray(rho0) @ a)
        coeff = (jnp.einsum("i, in -> n", jnp.conj(self.idv),
                            left(b) @ self.right_eigvecs)
                 * jnp.einsum("in, i -> n", self.left_eigvecs.conj(), rv)
                 / self.norm)
        W = -1.0 / (self.eigvals[None, :] + 1j * jnp.asarray(w)[:, None])
        return W @ coeff

    def correlation_3op_2t(self, rho0, ops, tlist, taulist):
        """<A(t) B(t+tau) C(t)> via the double eigenmode contraction
        (reference: pyqed/superoperator.py:702-751), fully vectorized."""
        from ..ops.superoperator import right
        a, b, c = [jnp.asarray(o) for o in ops]
        self._ensure_eig()
        rv = dm2vec(jnp.asarray(rho0))
        U1, U2, norm = self.right_eigvecs, self.left_eigvecs, self.norm
        lamb = self.eigvals
        lb = jnp.einsum("i, im -> m", jnp.conj(self.idv), left(b) @ U1)
        mid = jnp.einsum("im, ij, jn -> mn", U2.conj(), right(a) @ left(c), U1)
        w0 = jnp.einsum("in, i -> n", U2.conj(), rv) / norm
        coeff = (lb / norm)[:, None] * mid * w0[None, :]
        tmp1 = jnp.exp(jnp.outer(lamb, jnp.asarray(taulist)))   # (m, Ntau)
        tmp2 = jnp.exp(jnp.outer(lamb, jnp.asarray(tlist)))     # (n, Nt)
        return jnp.einsum("mj, mn, nt -> jt", tmp1, coeff, tmp2).T

    def correlation_4op_2t(self, rho0, ops, tlist, taulist):
        a, b, c, d = ops
        return self.correlation_3op_2t(rho0, [a, b @ c, d], tlist, taulist)


# Reference-compatible alias (pyqed/superoperator.py:455)
Lindblad_solver = LiouvilleSolver


def driven_dissipative_dynamics(ham, dip, rho0, pulse, c_ops=(),
                                dt=0.001, Nt=1, obs_ops=None, nout=1):
    """Laser-driven Lindblad dynamics, H(t) = H0 - E(t) mu (reference:
    pyqed/phys.py:1464 ``driven_dissipative_dynamics`` — an empty
    ``return`` stub there; here the time-dependent LindbladSolver)."""
    sol = LindbladSolver([ham, [dip, pulse.efield]], c_ops=list(c_ops))
    return sol.run(rho0, dt=dt, Nt=Nt, e_ops=obs_ops, nout=nout)


def absorption_eseries(omegas, L, edip, rho0, ntrans=None):
    """Absorption from the eigen-series of the Liouvillian (reference:
    pyqed/signal/liouville.py:27 — sparse ARPACK eigs there; full
    host-LAPACK eig here, then the frequency sweep is one batched
    contraction):

        S(w) = int_0^inf dt e^{i w t} Tr[mu e^{Lt}(mu rho0)]
             = - sum_n <mu, U_n> (U^{-1} mu rho0)_n / (lam_n + i w)

    with U the right eigenvectors of L (our convention: rho(t) =
    e^{Lt} rho0, so a transition at +w0 appears as Im lam = -w0 and the
    pole sits at w = w0; the reference's 1/(w - lam) assumes the
    opposite sign of L).  ``ntrans`` keeps the modes with the largest
    |amplitude| (None = all)."""
    L = np.asarray(L)
    lam, U = np.linalg.eig(L)
    # left eigenvectors = rows of U^{-1} (exactly biorthogonal to the
    # right ones — no sort-and-pair fragility for clustered eigenvalues)
    W = np.linalg.inv(U)
    mu = np.asarray(edip).flatten()
    src = (np.asarray(edip) @ np.asarray(rho0)).flatten()
    amp = (mu.conj() @ U) * (W @ src)
    if ntrans is not None:
        keep = np.argsort(-np.abs(amp))[:ntrans]
        amp, lam = amp[keep], lam[keep]
    om = jnp.asarray(omegas)
    return -jnp.sum(jnp.asarray(amp)[None, :]
                    / (jnp.asarray(lam)[None, :] + 1j * om[:, None]),
                    axis=1)
