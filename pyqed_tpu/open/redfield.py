"""Redfield quantum master equation.

TPU-native counterpart of the reference Redfield stack
(reference: pyqed/oqs.py — ``RedfieldSolver:30``, ``redfield_tensor:519``,
``_redfield:364``, ``getG:465``, ``correlation_4op_3t:268``).

The Redfield tensor is built in the eigenbasis of H with the bath spectral
functions evaluated at all transition frequencies at once (one vectorized
call per bath instead of the reference's N^2 Python loop, pyqed/oqs.py:546-549),
then  R = -i*op2sop(diag(E)) - sum_k  op2sop(A_k)(left(L_k) - right(L_k^dag)),
identical to pyqed/oqs.py:556-570. Propagation is RK4-on-vec under
``lax.scan`` or the eigen-series path (host eig, device contraction).
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.linalg import dag, transform, isherm
from ..ops.superoperator import (
    operator_to_superoperator, left, right, dm2vec, vec2dm,
)
from ..core.result import Result
from ..core.dynamics import run_solver, rk4_step


def redfield_tensor(H, a_ops, spectra, secular=False, sec_cutoff=1e-9):
    """Build (R, evecs) with i d/dt vec(rho) = i R vec(rho) conventions of
    the reference (pyqed/oqs.py:519): returns R such that
    d rho/dt = R rho in the eigenbasis of H.

    ``spectra`` convention: each callable is the HALF-Fourier transform
    Gamma(w) = int_0^inf C(t) e^{iwt} dt of the bath correlation (so the
    secular population rate is 2 Re Gamma |A_ab|^2 = S(w) |A_ab|^2, and a
    complex return value carries the Lamb shift). A real-valued callable
    is Re Gamma = S(w)/2. See ``DrudeBath.redfield_spectrum``."""
    H = jnp.asarray(H)
    for a in a_ops:
        if not isherm(jnp.asarray(a)):
            raise TypeError("Operators in a_ops must be Hermitian.")
    evals, evecs = jnp.linalg.eigh(H)
    W = jnp.real(evals[:, None] - evals[None, :])

    R = 0.0
    for a, spectrum in zip(a_ops, spectra):
        A = transform(jnp.asarray(a), evecs)
        C = jnp.asarray(spectrum(np.asarray(-W)))  # elementwise, host or jnp
        Lk = C * A
        R = R + operator_to_superoperator(A) @ (left(Lk) - right(dag(Lk)))

    Rtot = -1j * operator_to_superoperator(jnp.diag(evals).astype(R.dtype)) - R

    if secular:
        # keep only secular terms: |W_ab - W_cd| < sec_cutoff, an ABSOLUTE
        # frequency threshold (the physical criterion is smallness vs the
        # relaxation rate; jnp.isclose's relative tolerance would merge
        # near-degenerate transitions scale-dependently)
        Wv = jnp.reshape(W, (-1,))
        mask = jnp.abs(Wv[:, None] - Wv[None, :]) < sec_cutoff
        Rtot = jnp.where(mask, Rtot, 0.0)
    return Rtot, evecs


class RedfieldSolver:
    """(reference: pyqed/oqs.py:30)."""

    def __init__(self, H, c_ops=None, spectra=None, e_ops=None,
                 a_ops=None, sec_cutoff=None):
        self.H = jnp.asarray(H)
        self.c_ops = c_ops
        self.spectra = spectra
        if a_ops is not None:
            # (op, bath-or-spectrum) pairs: bath objects contribute their
            # half-Fourier Gamma(w) (DrudeBath.redfield_spectrum); bare
            # callables are used as the spectrum directly
            self.c_ops = [jnp.asarray(op) for op, _ in a_ops]
            self.spectra = [b.redfield_spectrum()
                            if hasattr(b, "redfield_spectrum") else b
                            for _, b in a_ops]
        self.sec_cutoff = sec_cutoff   # not-None => secular by default
        self.R = None
        self.evecs = None
        self.dim = H.shape[0]
        self.U = None
        self.G = None
        self.e_ops = e_ops

    def idm(self):
        return dm2vec(jnp.eye(self.dim))

    def configure(self, H, c_ops, e_ops):
        self.H, self.c_ops, self.e_ops = H, c_ops, e_ops

    def redfield_tensor(self, secular=None, sec_cutoff=None):
        if self.spectra is None:
            raise TypeError("Specify the bath spectral function.")
        if sec_cutoff is None:
            sec_cutoff = self.sec_cutoff
        if secular is None:
            secular = sec_cutoff is not None
        R, evecs = redfield_tensor(
            self.H, self.c_ops, self.spectra, secular,
            sec_cutoff=1e-9 if sec_cutoff is None else sec_cutoff)
        self.R, self.evecs = R, evecs
        return R, evecs

    def steady_state(self, secular=False):
        """Stationary state of the Redfield generator: the null vector of
        R, Hermitized and trace-normalized, returned in the SITE basis
        (reference: pyqed/oqs.py RedfieldSolver.steady_state — a ``pass``
        stub there)."""
        if self.R is None:
            self.redfield_tensor(secular=secular)
        R = np.asarray(self.R)
        n = int(round(np.sqrt(R.shape[0])))
        _, s, Vh = np.linalg.svd(R)
        rho_eig = Vh[-1].conj().reshape(n, n)
        rho_eig = (rho_eig + rho_eig.conj().T) / 2
        rho_eig = rho_eig / np.trace(rho_eig)
        U = np.asarray(self.evecs)
        return jnp.asarray(U @ rho_eig @ U.conj().T)

    def run(self, rho0, dt, Nt=None, e_ops=None, t0=0.0, nout=1,
            store_states=False, nt=None) -> Result:
        """Alias of :meth:`evolve` (every solver answers ``run``)."""
        return self.evolve(rho0, dt, Nt=Nt, e_ops=e_ops, t0=t0, nout=nout,
                           store_states=store_states, nt=nt)

    # ---------------------------------------------------------------- evolve
    def evolve(self, rho0, dt, Nt=None, e_ops=None, t0=0.0, nout=1,
               store_states=False, nt=None) -> Result:
        """RK4 propagation of vec(rho) in the eigenbasis
        (reference: pyqed/oqs.py:364 ``_redfield``). Observables are
        transformed into the eigenbasis so the returned expectation values
        refer to the original (site) operators."""
        if Nt is None:
            Nt = nt
        if self.R is None:
            self.redfield_tensor()
        R, evecs = self.R, self.evecs
        if e_ops is None:
            e_ops = self.e_ops or []
        rho0_eb = transform(jnp.asarray(rho0), evecs)
        eops_eb = [transform(jnp.asarray(e), evecs) for e in e_ops]

        v0 = dm2vec(rho0_eb).astype(R.dtype)
        step = rk4_step(lambda v: R @ v)

        n = self.dim
        eops_vec = [jnp.conj(dm2vec(dag(e))) for e in eops_eb]

        def expect_fn(bras, v):
            return jnp.einsum("ki, i -> k", bras, v)

        res = run_solver(lambda v, t: step(v, t, dt), v0, dt, Nt,
                         e_ops=eops_vec, nout=nout, t0=t0,
                         store_states=store_states, expect_fn=expect_fn,
                         is_dm=False)
        if store_states and res.states is not None:
            # back to site basis, matrix form
            Ts = jax.vmap(lambda v: evecs @ vec2dm(v, n) @ dag(evecs))(res.states)
            res.states = Ts
        res.rho = evecs @ vec2dm(res.psi, n) @ dag(evecs)
        res.psi = None
        res.rho0 = jnp.asarray(rho0)
        return res

    run = evolve

    # ------------------------------------------------------------ propagator
    def propagator(self, t, method="eseries"):
        """U(t) stack over times (reference: pyqed/oqs.py:160), via host eig
        + device contraction. Returns U with shape (n2, n2, nt)."""
        import scipy.linalg
        if self.R is None:
            self.redfield_tensor()
        w, V = scipy.linalg.eig(np.asarray(self.R))
        Vinv = scipy.linalg.inv(V)
        w, V, Vinv = jnp.asarray(w), jnp.asarray(V), jnp.asarray(Vinv)
        E = jnp.exp(w[:, None] * jnp.asarray(t)[None, :])
        self.U = jnp.einsum("aj, jk, jb -> abk", V, E, Vinv)
        self.G = -1j * self.U
        return self.U

    def gf(self, t, secular=False):
        """Green's function G(t) = -i U(t) (reference: pyqed/oqs.py:136)."""
        self.propagator(jnp.atleast_1d(t))
        return self.G

    def expect(self, rho0, e_ops):
        """(reference: pyqed/oqs.py:215)."""
        evecs = self.evecs
        rho0_eb = dm2vec(transform(jnp.asarray(rho0), evecs))
        eops_eb = [transform(jnp.asarray(e), evecs) for e in e_ops]
        rho_t = jnp.einsum("abk, b -> ak", self.U, rho0_eb)
        return jnp.stack(
            [jnp.einsum("i, ik -> k", jnp.conj(dm2vec(dag(e))), rho_t)
             for e in eops_eb], axis=-1)

    # ---------------------------------------------------- correlation funcs
    def correlation_2op_1t(self, rho0, a, b, tau):
        """<<I|a G(tau) b|rho0>> (reference: pyqed/oqs.py:246).

        a, b must already be superoperators (e.g. left(x)) or matrices in
        the eigenbasis Liouville space."""
        if self.G is None:
            self.propagator(jnp.atleast_1d(tau))
        G = self.G
        idm = self.idm()
        r = jnp.asarray(rho0)
        if r.ndim == 2:
            r = dm2vec(r)
        seeded = jnp.einsum("abk, b -> ak", G, b @ r)
        return jnp.einsum("a, ab, bk -> k", idm, a, seeded)

    def correlation_4op_3t(self, rho0, oplist, signature, tau):
        """<<I| A G B G C G D |rho0>> (reference: pyqed/oqs.py:268).

        All operators must be in the eigenbasis. ``signature`` chooses the
        left/right/commutator lift per operator ('l', 'r', '-', '+').
        Returns a (nt, nt, nt) cube over (tau3, tau2, tau1).
        """
        if len(oplist) != 4:
            raise ValueError("Number of operators is not 4.")
        A, B, C, D = [operator_to_superoperator(jnp.asarray(op), s)
                      for op, s in zip(oplist, signature)]
        if self.G is None:
            self.propagator(jnp.atleast_1d(tau))
        G = self.G
        idm = self.idm()
        r = jnp.asarray(rho0)
        if r.ndim == 2:
            r = dm2vec(r)
        rho = D @ r
        tmp = jnp.tensordot(G, rho, axes=((1,), (0,)))        # (a, k1)
        tmp = C @ tmp
        tmp = jnp.tensordot(G, tmp, axes=((1,), (0,)))        # (a, k2, k1)
        tmp = jnp.tensordot(B, tmp, axes=((1,), (0,)))
        tmp = jnp.tensordot(G, tmp, axes=((1,), (0,)))        # (a, k3, k2, k1)
        return jnp.einsum("a, ab, bijk -> ijk", idm, A, tmp)
