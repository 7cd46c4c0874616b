"""Krotov's method for quantum optimal control, TPU-native.

Beyond-parity (no reference counterpart).  Unlike GRAPE's concurrent
gradient step, Krotov's method [Reich, Ndong & Koch, JCP 136, 104103
(2012)] updates the pulse SEQUENTIALLY in time inside one forward sweep,
using the costate from a backward sweep of the previous iteration:

    du(t) = S(t)/lambda * Im < chi(t) | dH/du | psi(t) >

with psi propagated under the ALREADY-UPDATED pulse — which makes the
fidelity monotonically non-decreasing for any lambda > 0 (first-order
Krotov with J_T = 1 - |<tgt|psi(T)>|^2).

TPU mapping: the backward sweep is a vmapped expm batch + lax.scan (the
costate uses the frozen previous pulse), and the forward update sweep is
ONE lax.scan whose carry is (psi, running pulse) — the sequential
structure XLA compiles as a single fused loop.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import default_complex, default_real

__all__ = ["Krotov"]


class Krotov:
    """First-order Krotov state-transfer optimization.

    H(t) = H0 + sum_j u_j(t) Hc_j, piecewise constant on n_steps slices.
    ``lam`` is the Krotov step-size parameter (larger = smaller, safer
    updates); ``shape`` an optional (n_steps,) update-shape function S(t)
    in [0, 1] (default: sin^2 ramp keeping the pulse ends pinned).
    """

    def __init__(self, H0, Hc: Sequence, dt: float, n_steps: int,
                 lam: float = 1.0, shape=None):
        self.H0 = jnp.asarray(H0, dtype=default_complex())
        self.Hc = jnp.stack([jnp.asarray(h, dtype=default_complex())
                             for h in Hc])
        self.dt = float(dt)
        self.n_steps = int(n_steps)
        self.lam = float(lam)
        if shape is None:
            tmid = (np.arange(n_steps) + 0.5) / n_steps
            shape = np.sin(np.pi * tmid) ** 2
        self.shape = jnp.asarray(shape, dtype=default_real())

    def _u_step(self, u_k):
        """exp(-i (H0 + u_k . Hc) dt) for one slice."""
        H = self.H0 + jnp.einsum("j, jab -> ab",
                                 u_k.astype(self.Hc.dtype), self.Hc)
        return jax.scipy.linalg.expm(-1j * H * self.dt)

    def _forward(self, u, psi0):
        Us = jax.vmap(self._u_step)(u)
        def step(psi, U):
            nxt = U @ psi
            return nxt, nxt
        psiT, traj = lax.scan(step, psi0, Us)
        return psiT, traj

    def fidelity(self, u, psi0, target):
        psi0 = jnp.asarray(psi0, dtype=default_complex())
        psi0 = psi0 / jnp.linalg.norm(psi0)       # same normalization as
        target = jnp.asarray(target, dtype=default_complex())
        target = target / jnp.linalg.norm(target)  # optimize_state_transfer
        psiT, _ = self._forward(jnp.asarray(u), psi0)
        return jnp.abs(jnp.vdot(target, psiT)) ** 2

    def _iteration(self, u, psi0, target):
        """One Krotov iteration: backward costate sweep (frozen pulse),
        then the sequential forward update sweep.  The expm batch of the
        frozen pulse is built ONCE and reused for both the forward pass
        (psi(T)) and the backward costate sweep; the fidelity of the
        updated pulse falls out of the update sweep's final carry.
        Returns (u_new, fidelity(u_new))."""
        Us = jax.vmap(self._u_step)(u)
        def fstep(psi, U):
            return U @ psi, None
        psiT, _ = lax.scan(fstep, psi0, Us)
        chiT = jnp.vdot(target, psiT) * target          # dJ/d<psi(T)|

        # backward: chi(t_k) for k = n-1 .. 0 under the frozen pulse.
        def back(chi, U):
            prev = U.conj().T @ chi                     # U^dag chi
            return prev, prev
        _, chis_rev = lax.scan(back, chiT, Us[::-1])
        chis = chis_rev[::-1]                           # chi at slice k

        # forward update: at slice k use chi(t_k) and the CURRENT psi
        def fwd(psi, xs):
            u_k, chi_k, s_k = xs
            # du_j = S/lam * Im <chi | Hc_j | psi>
            du = (s_k / self.lam) * jnp.imag(
                jnp.einsum("i, jik, k -> j", jnp.conj(chi_k),
                           self.Hc, psi))
            u_new = u_k + du
            psi = self._u_step(u_new) @ psi
            return psi, u_new
        psi_new, u_new = lax.scan(fwd, psi0, (u, chis, self.shape))
        fid = jnp.abs(jnp.vdot(target, psi_new)) ** 2
        return u_new, fid

    def optimize_state_transfer(self, psi0, target, u0=None,
                                iters: int = 50):
        """Returns (u_opt, fidelities) — fidelities monotone
        non-decreasing in ``iters`` (first-order Krotov guarantee)."""
        psi0 = jnp.asarray(psi0, dtype=default_complex())
        psi0 = psi0 / jnp.linalg.norm(psi0)
        target = jnp.asarray(target, dtype=default_complex())
        target = target / jnp.linalg.norm(target)
        if u0 is None:
            u0 = 1e-2 * np.ones((self.n_steps, self.Hc.shape[0]))
        u = jnp.asarray(u0, dtype=default_real())

        @jax.jit
        def run(u):
            def body(u, _):
                u, fid = self._iteration(u, psi0, target)
                return u, fid
            return lax.scan(body, u, None, length=iters)

        u, fids = run(u)
        return u, fids
