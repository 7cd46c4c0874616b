"""ncon — network contractor with the standard index-label convention.

TPU-native counterpart of the reference contraction helper
(reference: pyqed/mps/ncon.py:14 — a vendored numpy implementation with
hand-rolled pairwise tensordots).  Here the label specification is
translated ONCE into a single ``jnp.einsum`` expression, so the whole
network is handed to XLA's contraction-order optimizer and runs on the
MXU as batched matmuls.

Convention: positive labels are contracted (equal labels connect legs),
negative labels are open output legs ordered as [-1, -2, ...]
(or ``forder``).
"""
from __future__ import annotations

import string
from typing import Optional, Sequence

import jax.numpy as jnp

_SYMS = string.ascii_lowercase + string.ascii_uppercase


def ncon(tensors, labels, order=None, forder: Optional[Sequence] = None):
    """Contract a tensor network.

    tensors : list of arrays (or one array).
    labels : per-tensor index label lists; positive = contracted,
        negative = open.
    forder : output ordering of the negative labels
        (default [-1, -2, ...]).
    """
    if hasattr(tensors, "shape"):
        tensors = [tensors]
    tensors = [jnp.asarray(t) for t in tensors]
    labels = [list(l) for l in labels]
    if len(labels) and not isinstance(labels[0], list):
        labels = [labels]
    assert len(tensors) == len(labels)
    for t, l in zip(tensors, labels):
        if t.ndim != len(l):
            raise ValueError(f"tensor with {t.ndim} legs got labels {l}")

    all_labels = sorted({x for l in labels for x in l})
    pos = [x for x in all_labels if x > 0]
    neg = [x for x in all_labels if x < 0]
    if forder is None:
        forder = sorted(neg, reverse=True)          # -1, -2, ...
    if len(pos) + len(neg) > len(_SYMS):
        raise ValueError("too many distinct labels for einsum")
    sym = {lab: _SYMS[i] for i, lab in enumerate(pos + list(forder))}

    # each positive label must appear exactly twice (pairwise contraction)
    for lab in pos:
        cnt = sum(l.count(lab) for l in labels)
        if cnt != 2:
            raise ValueError(f"contracted label {lab} appears {cnt} times")

    subs = []
    for l in labels:
        subs.append("".join(sym[x] for x in l))
    out = "".join(sym[x] for x in forder)
    expr = ",".join(subs) + "->" + out
    return jnp.einsum(expr, *tensors, optimize=True)
