"""Small neural-network utilities for PES fitting.

TPU-native counterpart of the reference ML layer
(reference: pyqed/ml/nn.py — a NumPy MLP (``init_params:91``,
``forward_prop:108``) and a torch variant; here one JAX MLP with autodiff
training serves both roles — fitting potential-energy surfaces from
samples is the package's actual ML use case).
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp


def init_params(key, layer_dims: Sequence[int], scale=None):
    """(reference: pyqed/ml/nn.py:91)."""
    params = []
    keys = jax.random.split(key, len(layer_dims) - 1)
    for k, (din, dout) in zip(keys, zip(layer_dims[:-1], layer_dims[1:])):
        s = scale if scale is not None else jnp.sqrt(2.0 / din)
        W = jax.random.normal(k, (din, dout)) * s
        b = jnp.zeros(dout)
        params.append((W, b))
    return params


def forward(params, x, activation=jnp.tanh):
    """MLP forward pass (reference: pyqed/ml/nn.py:108)."""
    h = x
    for (W, b) in params[:-1]:
        h = activation(h @ W + b)
    W, b = params[-1]
    return h @ W + b


def mse(params, x, y):
    pred = forward(params, x)
    return jnp.mean((pred - y) ** 2)


class MLP:
    """Train an MLP regressor (e.g. PES fit) with Adam."""

    def __init__(self, layer_dims, key=None, activation=jnp.tanh):
        key = key if key is not None else jax.random.PRNGKey(0)
        self.params = init_params(key, layer_dims)
        self.activation = activation

    def fit(self, x, y, lr=1e-3, epochs=2000, verbose=False):
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        act = self.activation

        def loss(p):
            return jnp.mean((forward(p, x, act) - y) ** 2)

        grad = jax.jit(jax.value_and_grad(loss))
        # Adam
        m = jax.tree.map(jnp.zeros_like, self.params)
        v = jax.tree.map(jnp.zeros_like, self.params)
        b1, b2, eps = 0.9, 0.999, 1e-8
        p = self.params
        for t in range(1, epochs + 1):
            L, g = grad(p)
            m = jax.tree.map(lambda a, b: b1 * a + (1 - b1) * b, m, g)
            v = jax.tree.map(lambda a, b: b2 * a + (1 - b2) * b**2, v, g)
            mhat = jax.tree.map(lambda a: a / (1 - b1**t), m)
            vhat = jax.tree.map(lambda a: a / (1 - b2**t), v)
            p = jax.tree.map(lambda pp, mm, vv: pp - lr * mm / (jnp.sqrt(vv) + eps),
                             p, mhat, vhat)
        self.params = p
        self.loss_ = float(L)
        return self

    def predict(self, x):
        return forward(self.params, jnp.asarray(x), self.activation)

NeuralNetwork = MLP         # reference drop-in name (pyqed/ml)
