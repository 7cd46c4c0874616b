"""Quasi-Monte Carlo: Sobol low-discrepancy sequences.

TPU-native counterpart of the reference's vendored Fortran Sobol
generator (reference: pyqed/qmc/MC_exchange/quasiMC/sobol/ — ~2k LoC
of F77 direction-number tables).  scipy's generator supplies the
points; integration is one vmapped device evaluation.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from scipy.stats import qmc


def sobol_sequence(n, dim, scramble=True, seed=0):
    """First n points of a (scrambled) Sobol sequence in [0, 1)^dim."""
    eng = qmc.Sobol(d=dim, scramble=scramble, seed=seed)
    m = int(np.ceil(np.log2(max(n, 1))))
    pts = eng.random_base2(m=m) if n > 1 else eng.random(1)
    return pts[:n]


def qmc_integrate(f: Callable, bounds: Sequence, n=4096, scramble=True,
                  seed=0):
    """Integrate f over a box with a Sobol rule; f maps (dim,) -> scalar
    (jax-traceable; evaluated as one vmapped batch)."""
    lo = np.array([b[0] for b in bounds], float)
    hi = np.array([b[1] for b in bounds], float)
    pts = sobol_sequence(n, len(bounds), scramble, seed)
    x = jnp.asarray(lo + pts * (hi - lo))
    vol = float(np.prod(hi - lo))
    return float(jnp.mean(jax.vmap(f)(x)) * vol)
