"""Device-mesh and sharding utilities.

The reference has no distributed compute path beyond the Fortran/MPI QMC
farm (SURVEY.md §2.9); this module IS the TPU-native communication backend:
single-controller JAX, a named ``jax.sharding.Mesh``, and
``NamedSharding`` annotations that let XLA insert ICI collectives.

Framework-wide axis conventions:
  'ado'   — HEOM/DEOM hierarchy axis (the (nado, n, n) ADO stack)
  'grid'  — first nuclear-grid axis of wavepacket states (SPO/LDR)
  'omega' — frequency/delay batch axis of spectroscopy maps
  'walker'— QMC walker/trajectory axis
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Optional[dict] = None, devices=None) -> Mesh:
    """Create a mesh from {axis_name: size}. Sizes must multiply to the
    device count; a single axis may be -1 to absorb the remainder."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {"ado": n}
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh sizes {sizes} do not multiply to {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=names)


def shard_along(mesh: Mesh, axis_name: str, ndim: int, array_axis: int = 0):
    """NamedSharding placing ``array_axis`` on ``axis_name``, rest replicated."""
    spec = [None] * ndim
    spec[array_axis] = axis_name
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh, ndim: int):
    return NamedSharding(mesh, P(*([None] * ndim)))


def with_sharding(x, mesh: Mesh, axis_name: str, array_axis: int = 0):
    """Constrain a traced array's sharding inside jit."""
    return jax.lax.with_sharding_constraint(
        x, shard_along(mesh, axis_name, x.ndim, array_axis))


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Zero-pad ``axis`` to a multiple (sharded axes must divide evenly)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    import jax.numpy as jnp
    return jnp.pad(x, pad), n
