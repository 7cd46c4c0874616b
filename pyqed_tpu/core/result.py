"""Result container for all solvers.

TPU-native counterpart of the reference ``Result`` (reference:
pyqed/mol.py:98-183 — ``dump:146``, ``save:170``, ``load_result:173``).

Differences by design: states come back as one stacked device array
(`(nsteps+1, ...)`) rather than a Python list of matrices, serialization is
NPZ (portable, no pickle-of-class), and the object is a pytree so it can be
returned straight out of jitted drivers.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Result:
    times: Optional[jnp.ndarray] = None
    observables: Optional[jnp.ndarray] = None  # (nsteps+1, n_e_ops)
    states: Optional[jnp.ndarray] = None       # (nsteps+1, ...) stacked
    psi0: Optional[jnp.ndarray] = None
    rho0: Optional[jnp.ndarray] = None
    psi: Optional[jnp.ndarray] = None          # final state
    rho: Optional[jnp.ndarray] = None
    dt: Any = dataclasses.field(default=None, metadata=dict(static=True))
    nt: Any = dataclasses.field(default=None, metadata=dict(static=True))
    nout: Any = dataclasses.field(default=1, metadata=dict(static=True))
    description: Any = dataclasses.field(default=None, metadata=dict(static=True))

    # -- reference-compatible views ------------------------------------
    @property
    def psilist(self):
        """List of states, reference-style (pyqed/mol.py:107)."""
        if self.states is None:
            return None
        return list(self.states)

    @property
    def rholist(self):
        if self.states is None:
            return None
        return list(self.states)

    def expect(self):
        return self.observables

    # -- serialization -------------------------------------------------
    def dump(self, fname):
        """Save to NPZ (reference pickles the object: pyqed/mol.py:146).

        Serializes the dataclass fields AND any extra public array/scalar
        attributes a solver attached (e.g. FSSH's ``population``/``active``,
        RPMD's ``centroid``, MCWF's ``observables_std``/``njumps``)."""
        field_names = {f.name for f in dataclasses.fields(self)}
        payload = {}
        items = [(f, getattr(self, f)) for f in field_names]
        items += [(k, v) for k, v in vars(self).items()
                  if k not in field_names and not k.startswith("_")]
        for name, v in items:
            if v is None:
                continue
            if isinstance(v, (jnp.ndarray, np.ndarray)):
                payload[name] = np.asarray(v)
            elif isinstance(v, (int, float, complex, str)):
                payload[name] = np.asarray(v)
        np.savez(fname, **payload)

    def save(self, fname):
        self.dump(fname)


def load_result(fname) -> Result:
    """Load a Result saved with :meth:`Result.dump`
    (reference: pyqed/mol.py:173)."""
    if not str(fname).endswith(".npz"):
        try:
            data = np.load(str(fname) + ".npz", allow_pickle=False)
        except FileNotFoundError:
            data = np.load(fname, allow_pickle=False)
    else:
        data = np.load(fname, allow_pickle=False)
    field_names = {f.name for f in dataclasses.fields(Result)}
    kwargs, extras = {}, {}
    for key in data.files:
        v = data[key]
        if v.ndim == 0:
            v = v.item()
        (kwargs if key in field_names else extras)[key] = v
    r = Result(**kwargs)
    for k, v in extras.items():
        setattr(r, k, v)
    return r
