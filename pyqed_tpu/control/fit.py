"""Differentiable parameter fitting through pyqed_tpu dynamics.

Beyond-parity (no counterpart in the reference): because every solver here
is a pure JAX program, any scalar built from one — a spectrum, a population
trace, a correlation function — is differentiable with respect to the model
parameters that produced it.  ``fit`` is the generic gradient loop (pytree
parameters, optax optimizer, the whole loop one jitted ``lax.scan``);
``fit_exponential_decay`` is the canonical example: recover a Lindblad
decay rate from a simulated trace by backpropagating through the actual
``LindbladSolver`` propagation.
"""
from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import optax

__all__ = ["fit", "fit_exponential_decay"]


def fit(loss_fn: Callable, p0, iters: int = 300, learning_rate: float = 0.05,
        optimizer=None, has_aux: bool = False):
    """Minimize ``loss_fn(params)`` over a pytree of parameters.

    The full optimization (forward model, reverse-mode gradient, optax
    update, all ``iters`` iterations) compiles to one XLA program.

    Returns (params_opt, losses) with losses of shape (iters,).  With
    ``has_aux=True`` the loss function returns (loss, aux) and fit
    returns (params_opt, (losses, auxs)) — e.g. track the true fidelity
    alongside a penalized loss.
    """
    opt = optimizer if optimizer is not None else optax.adam(learning_rate)
    p0 = jax.tree_util.tree_map(jnp.asarray, p0)

    @jax.jit
    def run(p0):
        state0 = opt.init(p0)
        def step(carry, _):
            p, st = carry
            val, g = jax.value_and_grad(loss_fn, has_aux=has_aux)(p)
            upd, st = opt.update(g, st, p)
            return (optax.apply_updates(p, upd), st), val
        (p, _), losses = lax.scan(step, (p0, state0), None, length=iters)
        return p, losses

    return run(p0)


def fit_exponential_decay(t, y, gamma0=0.1, iters=400, learning_rate=0.05):
    """Fit y(t) ~ exp(-gamma t) for the decay rate gamma (log-parametrized
    so the rate stays positive).  Returns (gamma, losses)."""
    t = jnp.asarray(t)
    y = jnp.asarray(y)

    def loss(log_gamma):
        pred = jnp.exp(-jnp.exp(log_gamma) * t)
        return jnp.mean((pred - y) ** 2)

    lg, losses = fit(loss, jnp.log(jnp.asarray(gamma0)), iters, learning_rate)
    return float(np.exp(lg)), losses
