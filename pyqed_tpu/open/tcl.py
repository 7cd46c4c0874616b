"""Second-order time-convolutionless (TCL2 / time-dependent Redfield)
master equation.

TPU-native counterpart of the reference TCL2 machinery
(reference: pyqed/oqs.py — ``make_lambda:990`` builds
Lambda(t) = int_0^t dtau C(tau) S(-tau) by quadrature; the commented
``tcl2``/``redfield`` drivers :689).

  d rho/dt = -i[H, rho] - [S, Lambda(t) rho - rho Lambda(t)^dag]

Lambda on the full time grid is one cumulative sum over precomputed
interaction-picture operators (no per-step quadrature loop).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.linalg import dag
from ..core.result import Result
from .bath import DrudeBath


class TCL2Solver:
    """(reference: pyqed/oqs.py:990 + the tcl2 driver stubs)."""

    def __init__(self, H, c_op, bath: DrudeBath = None, corr: Callable = None):
        """corr(t): bath correlation function C(t); or pass a DrudeBath."""
        self.H = jnp.asarray(H)
        self.S = jnp.asarray(c_op)
        if corr is None:
            if bath is None:
                raise ValueError("need bath or corr")
            c, nu = bath.matsubara(100)
            corr = lambda t: np.sum(c[:, None]
                                    * np.exp(-np.outer(nu, np.atleast_1d(t))),
                                    axis=0)
        self.corr = corr

    def lambda_op(self, tgrid):
        """Lambda(t_k) for every grid time — interaction-picture S and a
        cumulative trapezoid over tau (reference: pyqed/oqs.py:990)."""
        H, S = self.H, self.S
        w, V = jnp.linalg.eigh(H)
        tgrid = np.asarray(tgrid)
        dt = tgrid[1] - tgrid[0]
        Ct = jnp.asarray(self.corr(tgrid))                    # (nt,)
        # S(-tau) = e^{-iH tau} S e^{iH tau} in the H eigenbasis
        phases = jnp.exp(-1j * w[None, :] * jnp.asarray(tgrid)[:, None])
        Seb = dag(V) @ S @ V
        Smt = jnp.einsum("tn, nm, tm -> tnm", phases, Seb,
                         jnp.conj(phases))                    # S(-t) in eb
        integrand = Ct[:, None, None] * Smt
        # cumulative trapezoid
        csum = jnp.cumsum((integrand[1:] + integrand[:-1]) / 2 * dt, axis=0)
        lam_eb = jnp.concatenate([jnp.zeros((1, *Seb.shape)), csum], axis=0)
        # back to site basis
        return jnp.einsum("an, tnm, bm -> tab", V, lam_eb, V.conj())

    def run(self, rho0, dt, nt, e_ops=None, nout=1) -> Result:
        tgrid = np.arange(nt + 1) * dt
        lams = self.lambda_op(tgrid)
        H, S = self.H, self.S
        rho0 = jnp.asarray(rho0, dtype=complex)
        eops = (jnp.stack([jnp.asarray(e, dtype=complex) for e in e_ops])
                if e_ops else None)

        def rhs(rho, lam):
            comm = H @ rho - rho @ H
            X = lam @ rho - rho @ dag(lam)
            return -1j * comm - (S @ X - X @ S)

        def step(carry, k):
            rho = carry
            lam = lams[k]
            lam_mid = (lams[k] + lams[k + 1]) / 2
            k1 = rhs(rho, lam)
            k2 = rhs(rho + k1 * dt / 2, lam_mid)
            k3 = rhs(rho + k2 * dt / 2, lam_mid)
            k4 = rhs(rho + k3 * dt, lams[k + 1])
            rho = rho + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            obs = (jnp.einsum("kij, ji -> k", eops, rho)
                   if eops is not None else jnp.zeros(0, dtype=complex))
            return rho, obs

        rho_f, obs = jax.lax.scan(step, rho0, jnp.arange(nt))
        res = Result(times=jnp.asarray(tgrid), dt=dt, nt=nt)
        if eops is not None:
            obs0 = jnp.einsum("kij, ji -> k", eops, rho0)
            res.observables = jnp.concatenate([obs0[None], obs], axis=0)
        res.rho = rho_f
        res.rho0 = rho0
        return res
