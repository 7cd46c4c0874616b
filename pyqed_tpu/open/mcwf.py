"""Monte-Carlo wave function (quantum-jump) unraveling of the Lindblad
equation, TPU-native.

Beyond-parity: the reference integrates only the density matrix
(pyqed/oqs.py LindbladSolver); it has no stochastic unraveling.  MCWF
[Dalibard, Castin & Molmer, PRL 68, 580 (1992)] propagates PURE states —
memory n instead of n^2 — whose ensemble average reproduces the Lindblad
density matrix exactly as ntraj -> inf.

TPU design: the no-jump evolution is the EXACT effective propagator
U_eff = exp(-i H_eff dt) with H_eff = H - (i/2) sum c_k^dag c_k, built
once (time-independent H) and applied as a batched matvec; the jump test,
channel selection, and collapse are branch-free ``jnp.where`` arithmetic;
the stochastic ENSEMBLE is one ``vmap`` over per-trajectory PRNG keys —
thousands of trajectories advance in lock step as one compiled scan.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.result import Result


class MCWFSolver:
    """Quantum-jump unraveling of  drho/dt = -i[H, rho] + sum_k D[c_k].

    Algorithm per step (first order in the jump probability, exact
    no-jump propagation):  phi = U_eff psi; with probability
    1 - ||phi||^2 a jump occurs — channel k chosen with weight
    ||c_k psi||^2, psi -> c_k psi / ||c_k psi|| — else
    psi -> phi/||phi||.
    """

    def __init__(self, H, c_ops: Sequence = ()):
        self.H = jnp.asarray(H, dtype=complex)
        self.c_ops = jnp.stack([jnp.asarray(c, dtype=complex)
                                for c in c_ops]) if len(c_ops) else None
        self.n = self.H.shape[0]

    def _u_eff(self, dt):
        Heff = self.H
        if self.c_ops is not None:
            Heff = Heff - 0.5j * jnp.einsum("kij, kil -> jl",
                                            jnp.conj(self.c_ops),
                                            self.c_ops)
        return jax.scipy.linalg.expm(-1j * Heff * dt)

    def run(self, psi0, dt=0.01, nt=100, ntraj=500, nout=1, key=0,
            e_ops: Optional[Sequence] = None) -> Result:
        """Propagate ``ntraj`` stochastic trajectories from psi0.

        Result: .observables (nsnap, n_e_ops) = trajectory-averaged
        <psi|A|psi>, .observables_std (complex MC standard error:
        std(Re) + i std(Im), each / sqrt(ntraj)), .njumps
        (nsnap, ntraj) cumulative jump counts.
        """
        psi0 = jnp.asarray(psi0, dtype=complex)
        psi0 = psi0 / jnp.linalg.norm(psi0)
        U = self._u_eff(dt)
        cs = self.c_ops
        e_ops = [jnp.asarray(a, dtype=complex) for a in (e_ops or [])]
        A = jnp.stack(e_ops) if e_ops else None
        ns_steps = nt // nout
        if isinstance(key, (int, np.integer)):
            key = jax.random.PRNGKey(int(key))
        keys = jax.random.split(key, ntraj)

        def step(carry, kk):
            psi, nj = carry
            phi = U @ psi
            p_nojump = jnp.real(jnp.vdot(phi, phi))
            r = jax.random.uniform(kk)
            if cs is None:
                return (phi / jnp.sqrt(p_nojump), nj), None
            cpsi = jnp.einsum("kij, j -> ki", cs, psi)       # (nc, n)
            w = jnp.real(jnp.einsum("ki, ki -> k", jnp.conj(cpsi), cpsi))
            wsum = jnp.sum(w)
            kk2 = jax.random.fold_in(kk, 1)
            ch = jax.random.choice(kk2, w.shape[0],
                                   p=w / jnp.maximum(wsum, 1e-300))
            collapsed = cpsi[ch] / jnp.maximum(
                jnp.sqrt(w[ch]), 1e-150)
            # dark state (every c_k psi = 0): p_nojump = 1 analytically,
            # but expm rounding could still fire the jump branch with an
            # all-zero weight vector -> zero state; never jump there
            jump = jnp.logical_and(r > p_nojump, wsum > 0.0)
            psi_new = jnp.where(jump, collapsed,
                                phi / jnp.sqrt(p_nojump))
            return (psi_new, nj + jump.astype(jnp.int32)), None

        def one_traj(k):
            ks = jax.random.split(k, ns_steps * nout).reshape(
                (ns_steps, nout) + k.shape)

            def window(carry, kw):
                carry, _ = lax.scan(step, carry, kw)
                psi, nj = carry
                if A is not None:
                    obs = jnp.einsum("i, aij, j -> a", jnp.conj(psi),
                                     A, psi)
                else:
                    obs = jnp.zeros((0,), dtype=complex)
                return carry, (obs, nj)
            _, (obs, njs) = lax.scan(window, (psi0, jnp.int32(0)), ks)
            return obs, njs

        obs, njumps = jax.jit(jax.vmap(one_traj))(keys)   # (ntraj, nsnap, .)
        r = Result(dt=dt, nt=nt, nout=nout)
        r.times = np.arange(1, ns_steps + 1) * dt * nout
        if A is not None:
            r.observables = jnp.mean(obs, axis=0)
            # complex-valued MC standard error (non-Hermitian e_ops have
            # scatter in both quadratures): std of re + i*std of im
            r.observables_std = ((jnp.std(jnp.real(obs), axis=0)
                                  + 1j * jnp.std(jnp.imag(obs), axis=0))
                                 / np.sqrt(ntraj))
        r.njumps = jnp.swapaxes(njumps, 0, 1)
        return r


# qutip-style convenience name
def mcsolve(H, psi0, c_ops=(), e_ops=(), dt=0.01, nt=100, ntraj=500,
            nout=1, key=0):
    return MCWFSolver(H, c_ops).run(psi0, dt=dt, nt=nt, ntraj=ntraj,
                                    nout=nout, key=key, e_ops=list(e_ops))
