"""Tensor-train decomposition (TT-SVD) and ALS refinement.

TPU-native counterpart of the reference's TT tooling
(reference: pyqed/ldr/tt_als.py — a teneva demo script, no library
code). Supplies the capability the LDR toolkit wants: compress a
high-dimensional PES/wavefunction tensor into a train of 3-way cores
and refine against the full tensor with ALS sweeps; contraction and
evaluation are einsums.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax.numpy as jnp


def tt_svd(T, max_rank=16, eps=1e-12):
    """TT cores [G_k (r_{k-1}, n_k, r_k)] of a full tensor by sequential
    SVD (the TT-SVD algorithm)."""
    T = np.asarray(T)
    dims = T.shape
    d = len(dims)
    cores = []
    M = T.reshape(dims[0], -1)
    r_prev = 1
    for k in range(d - 1):
        M = M.reshape(r_prev * dims[k], -1)
        U, S, Vh = np.linalg.svd(M, full_matrices=False)
        r = min(max_rank, int(np.sum(S > eps * S[0])))
        r = max(r, 1)
        cores.append(U[:, :r].reshape(r_prev, dims[k], r))
        M = (S[:r, None] * Vh[:r])
        r_prev = r
    cores.append(M.reshape(r_prev, dims[-1], 1))
    return cores


def tt_to_dense(cores):
    out = np.asarray(cores[0])
    for G in cores[1:]:
        out = np.einsum("...a, anb -> ...nb", out, np.asarray(G))
    return out.reshape([G.shape[1] for G in cores])


def tt_eval(cores, idx):
    """Evaluate entries: idx (m, d) integer indices -> (m,) values."""
    idx = np.atleast_2d(idx)
    v = np.asarray(cores[0])[:, idx[:, 0], :]         # (1, m, r)
    out = np.moveaxis(v, 0, 1)                        # (m, 1, r)
    for k, G in enumerate(cores[1:], 1):
        Gk = np.asarray(G)[:, idx[:, k], :]           # (r, m, r')
        out = np.einsum("mab, bmc -> mac", out, Gk)
    return out[:, 0, 0]


def tt_als(T, cores, sweeps=4):
    """ALS refinement of TT cores against the FULL tensor T: each core
    is solved in closed form (least squares) with the others fixed."""
    T = np.asarray(T)
    d = len(cores)
    cores = [np.asarray(G).copy() for G in cores]
    for _ in range(sweeps):
        for k in range(d):
            # environment: contract everything except core k
            left = np.ones((1, 1))                    # (prefix, r)
            for G in cores[:k]:
                left = np.einsum("pa, anb -> pnb", left, G).reshape(
                    -1, G.shape[2])
            right = np.ones((1, 1))                   # (r', suffix)
            for G in reversed(cores[k + 1:]):
                right = np.einsum("anb, bq -> anq", G, right).reshape(
                    G.shape[0], -1)
            rl = left.shape[1]
            rr = right.shape[0]
            nk = cores[k].shape[1]
            # T reshaped (prefix, n_k, suffix)
            Tm = T.reshape(left.shape[0], nk, right.shape[1])
            # solve min || left G right - T ||: G = pinv(left) T pinv(right)
            Lp = np.linalg.pinv(left)
            Rp = np.linalg.pinv(right)
            G = np.einsum("ap, pnq, qb -> anb", Lp, Tm, Rp)
            cores[k] = G
    return cores


def tt_rank(cores):
    return [G.shape[2] for G in cores[:-1]]
