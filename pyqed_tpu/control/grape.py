"""GRAPE / CRAB pulse optimization, TPU-native.

Beyond-parity (no counterpart in the reference): gradient-ascent pulse
engineering [Khaneja et al., J. Magn. Reson. 172, 296 (2005)] implemented
as a pure JAX program — the propagation is a ``vmap``-batched matrix
exponential per time slice followed by a ``lax.scan`` product, and the
gradient of the fidelity with respect to every control amplitude is one
reverse-mode sweep through that scan (no analytic gradient bookkeeping,
exact to machine precision rather than first order in dt).

Closed system:   U_k = exp(-i (H0 + sum_j u[k,j] Hc_j) dt)
Open system:     P_k = exp((L0 + sum_j u[k,j] Lc_j) dt)   in Liouville space

The optimizer loop is an ``optax`` gradient descent wrapped in one jitted
``lax.scan`` — the whole optimization (propagation, backprop, parameter
update, all iterations) is a single XLA program.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.superoperator import liouvillian
from ..ops.linalg import dag
from ..config import default_complex, default_real
from .fit import fit

__all__ = ["GRAPE", "OpenGRAPE", "CRAB",
           "amplitude_penalty", "smoothness_penalty"]


def _scan_apply(Us, x0):
    """x_N = U_{N-1} ... U_1 U_0 x0 via lax.scan (x0: vector or matrix)."""
    def step(x, U):
        return U @ x, None
    xN, _ = lax.scan(step, x0, Us)
    return xN


def amplitude_penalty(u, weight=1e-3):
    """Mean-square amplitude penalty (keeps pulses physical)."""
    return weight * jnp.mean(jnp.abs(u) ** 2)


def smoothness_penalty(u, weight=1e-3):
    """Mean-square slew-rate penalty on the piecewise-constant amplitudes."""
    return weight * jnp.mean(jnp.abs(jnp.diff(u, axis=0)) ** 2)


class GRAPE:
    """Closed-system GRAPE: H(t) = H0 + sum_j u_j(t) Hc_j, piecewise constant.

    Parameters
    ----------
    H0 : (n, n) drift Hamiltonian.
    Hc : sequence of (n, n) control Hamiltonians.
    dt : time-slice length; n_steps slices of equal length.
    """

    def __init__(self, H0, Hc: Sequence, dt: float, n_steps: int):
        self.H0 = jnp.asarray(H0, dtype=default_complex())
        self.Hc = jnp.stack([jnp.asarray(h, dtype=default_complex()) for h in Hc])
        self.dt = float(dt)
        self.n_steps = int(n_steps)
        self.n = self.H0.shape[0]

    # -- propagation -------------------------------------------------
    def step_propagators(self, u):
        """All slice propagators at once: vmapped expm over the time axis.

        u : (n_steps, n_ctrl) real control amplitudes.
        """
        u = jnp.asarray(u)
        H = self.H0[None] + jnp.einsum("kj, jab -> kab",
                                       u.astype(self.Hc.dtype), self.Hc)
        return jax.vmap(lambda h: jax.scipy.linalg.expm(-1j * h * self.dt))(H)

    def evolve(self, u, psi0):
        """Final state after the full pulse."""
        return _scan_apply(self.step_propagators(u),
                           jnp.asarray(psi0, dtype=default_complex()))

    def total_propagator(self, u):
        return _scan_apply(self.step_propagators(u),
                           jnp.eye(self.n, dtype=default_complex()))

    def trajectory(self, u, psi0):
        """All intermediate states, shape (n_steps+1, n)."""
        Us = self.step_propagators(u)
        def step(psi, U):
            nxt = U @ psi
            return nxt, nxt
        psi0 = jnp.asarray(psi0, dtype=default_complex())
        _, traj = lax.scan(step, psi0, Us)
        return jnp.concatenate([psi0[None], traj], axis=0)

    # -- fidelities ---------------------------------------------------
    def fidelity_state(self, u, psi0, target):
        """|<target|U(T)|psi0>|^2 (phase-insensitive state transfer)."""
        psiT = self.evolve(u, psi0)
        return jnp.abs(jnp.vdot(jnp.asarray(target, dtype=default_complex()),
                                psiT)) ** 2

    def fidelity_gate(self, u, U_target):
        """|Tr(U_target^dag U(T))|^2 / n^2 (global-phase-insensitive)."""
        U = self.total_propagator(u)
        tgt = jnp.asarray(U_target, dtype=default_complex())
        return jnp.abs(jnp.trace(dag(tgt) @ U)) ** 2 / self.n ** 2

    # -- optimization -------------------------------------------------
    def optimize(self, loss_fn: Callable, u0, iters: int = 200,
                 learning_rate: float = 0.05, optimizer=None,
                 has_aux: bool = False):
        """Minimize ``loss_fn(u)`` from ``u0``; the full loop is one jitted scan.

        Returns (u_opt, losses) with losses of shape (iters,)
        (``has_aux`` as in :func:`control.fit`).
        """
        # one jitted optax/scan loop, shared with control.fit
        return fit(loss_fn, jnp.asarray(u0, dtype=default_real()),
                   iters=iters, learning_rate=learning_rate,
                   optimizer=optimizer, has_aux=has_aux)

    def optimize_state_transfer(self, psi0, target, u0=None, iters=200,
                                learning_rate=0.05, penalty=0.0):
        """Convenience: maximize state-transfer fidelity.

        Returns (u_opt, fidelities) — the TRUE per-iteration fidelity,
        tracked as an aux output so a nonzero amplitude penalty cannot
        bias the reported history."""
        if u0 is None:
            u0 = 1e-2 * np.ones((self.n_steps, self.Hc.shape[0]))
        def loss(u):
            f = self.fidelity_state(u, psi0, target)
            return 1.0 - f + amplitude_penalty(u, penalty), f
        u, (_, fids) = self.optimize(loss, u0, iters, learning_rate,
                                     has_aux=True)
        return u, fids

    def optimize_gate(self, U_target, u0=None, iters=300,
                      learning_rate=0.05, penalty=0.0):
        """Convenience: maximize gate fidelity (returns the true
        fidelity history; see optimize_state_transfer)."""
        if u0 is None:
            u0 = 1e-2 * np.ones((self.n_steps, self.Hc.shape[0]))
        def loss(u):
            f = self.fidelity_gate(u, U_target)
            return 1.0 - f + amplitude_penalty(u, penalty), f
        u, (_, fids) = self.optimize(loss, u0, iters, learning_rate,
                                     has_aux=True)
        return u, fids


class OpenGRAPE(GRAPE):
    """Open-system GRAPE in Liouville space with Lindblad dissipation.

    The drift is L0 = -i[H0, .] + sum_k D[c_k]; each control enters as the
    coherent superoperator -i[Hc_j, .].  Propagation is a vmapped expm of
    the (n^2, n^2) Liouvillian per slice — exact for piecewise-constant
    controls, and still fully differentiable.
    """

    def __init__(self, H0, Hc: Sequence, dt: float, n_steps: int, c_ops=()):
        super().__init__(H0, Hc, dt, n_steps)
        self.L0 = liouvillian(self.H0, list(c_ops))
        self.Lc = jnp.stack([liouvillian(h, []) for h in self.Hc])

    def step_propagators(self, u):
        u = jnp.asarray(u)
        L = self.L0[None] + jnp.einsum("kj, jab -> kab",
                                       u.astype(self.Lc.dtype), self.Lc)
        return jax.vmap(lambda l: jax.scipy.linalg.expm(l * self.dt))(L)

    def evolve(self, u, rho0):
        """Final density matrix after the full pulse."""
        rho0 = jnp.asarray(rho0, dtype=default_complex())
        v = _scan_apply(self.step_propagators(u), rho0.reshape(-1))
        return v.reshape(self.n, self.n)

    def total_propagator(self, u):
        """Full (n^2, n^2) Liouville-space propagator of the pulse."""
        return _scan_apply(self.step_propagators(u),
                           jnp.eye(self.n ** 2, dtype=default_complex()))

    def trajectory(self, u, rho0):
        """All intermediate density matrices, shape (n_steps+1, n, n)."""
        Us = self.step_propagators(u)
        rho0 = jnp.asarray(rho0, dtype=default_complex())
        def step(v, U):
            nxt = U @ v
            return nxt, nxt
        _, traj = lax.scan(step, rho0.reshape(-1), Us)
        traj = jnp.concatenate([rho0.reshape(1, -1), traj], axis=0)
        return traj.reshape(-1, self.n, self.n)

    def fidelity_gate(self, u, U_target):
        """Process fidelity vs a TARGET UNITARY:  F = Re Tr(S_tgt^dag
        S(T)) / n^2  with S_tgt = U (x) conj(U) (row-major vec), the
        superoperator of rho -> U rho U^dag.  F = 1 iff the channel
        equals the unitary (for a dissipative channel F < 1)."""
        S = self.total_propagator(u)
        tgt = jnp.asarray(U_target, dtype=default_complex())
        S_tgt = jnp.kron(tgt, jnp.conj(tgt))
        return jnp.real(jnp.trace(dag(S_tgt) @ S)) / self.n ** 2

    def fidelity_state(self, u, rho0, target):
        """Tr(rho_target rho(T)) for a pure target (overlap fidelity)."""
        rhoT = self.evolve(u, rho0)
        tgt = jnp.asarray(target, dtype=default_complex())
        if tgt.ndim == 1:
            return jnp.real(jnp.vdot(tgt, rhoT @ tgt))
        return jnp.real(jnp.trace(dag(tgt) @ rhoT))

    def expect_final(self, u, rho0, op):
        rhoT = self.evolve(u, rho0)
        return jnp.real(jnp.trace(jnp.asarray(op) @ rhoT))


class CRAB(GRAPE):
    """Chopped-random-basis control: u_j(t) = env(t) sum_n [a_n sin(w_n t)
    + b_n cos(w_n t)]  [Caneva, Calarco, Montangero, PRA 84, 022326 (2011)].

    Optimizes the (n_modes, 2, n_ctrl) Fourier coefficients instead of the
    per-slice amplitudes — far fewer parameters, intrinsically smooth
    pulses.  Reuses all GRAPE propagation/fidelity machinery through
    ``coeffs_to_u``.
    """

    def __init__(self, H0, Hc: Sequence, dt: float, n_steps: int,
                 frequencies=None, n_modes: int = 5, envelope=None):
        super().__init__(H0, Hc, dt, n_steps)
        T = dt * n_steps
        if frequencies is None:
            # principal harmonics of the pulse window
            frequencies = 2.0 * np.pi * np.arange(1, n_modes + 1) / T
        self.frequencies = jnp.asarray(frequencies, dtype=default_real())
        self.t = (jnp.arange(n_steps) + 0.5) * dt
        if envelope is None:
            envelope = jnp.sin(jnp.pi * self.t / T) ** 2   # smooth on/off
        elif callable(envelope):
            envelope = jnp.asarray(envelope(np.asarray(self.t)))
        else:                       # precomputed (n_steps,) array
            envelope = jnp.asarray(envelope, dtype=default_real())
            assert envelope.shape == (n_steps,), \
                f"envelope shape {envelope.shape} != ({n_steps},)"
        self.envelope = envelope

    def coeffs_to_u(self, coeffs):
        """coeffs: (n_modes, 2, n_ctrl) -> u: (n_steps, n_ctrl)."""
        coeffs = jnp.asarray(coeffs)
        ph = jnp.outer(self.t, self.frequencies)            # (n_steps, n_modes)
        u = (jnp.sin(ph) @ coeffs[:, 0, :]
             + jnp.cos(ph) @ coeffs[:, 1, :])
        return self.envelope[:, None] * u

    def optimize_state_transfer(self, psi0, target, c0=None, iters=300,
                                learning_rate=0.1, penalty=0.0):
        n_ctrl = self.Hc.shape[0]
        if c0 is None:
            c0 = 1e-1 * np.ones((len(self.frequencies), 2, n_ctrl))
        def loss(c):
            u = self.coeffs_to_u(c)
            f = self.fidelity_state(u, psi0, target)
            return 1.0 - f + amplitude_penalty(u, penalty), f
        c, (_, fids) = self.optimize(loss, c0, iters, learning_rate,
                                     has_aux=True)
        return c, fids

    def optimize_gate(self, U_target, c0=None, iters=300,
                      learning_rate=0.1, penalty=0.0):
        """Gate optimization IN the chopped Fourier basis (without this
        override the inherited GRAPE.optimize_gate would silently
        optimize raw per-slice amplitudes)."""
        n_ctrl = self.Hc.shape[0]
        if c0 is None:
            c0 = 1e-1 * np.ones((len(self.frequencies), 2, n_ctrl))
        def loss(c):
            u = self.coeffs_to_u(c)
            f = self.fidelity_gate(u, U_target)
            return 1.0 - f + amplitude_penalty(u, penalty), f
        c, (_, fids) = self.optimize(loss, c0, iters, learning_rate,
                                     has_aux=True)
        return c, fids
