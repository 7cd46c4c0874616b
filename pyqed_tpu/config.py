"""Global numeric configuration for pyqed_tpu.

The reference operates entirely in NumPy float64/complex128. On TPU the fast
path is float32/complex64 (the MXU has no native f64), so pyqed_tpu makes the
working precision explicit instead of global:

- ``use_x64()``: opt into float64/complex128 (CPU parity mode; required for
  the 1e-8 golden tests against the SciPy reference).
- ``default_complex()`` / ``default_real()``: the widest precision currently
  enabled, used when a solver must choose a dtype and the inputs do not
  already pin one.

Solvers otherwise follow the dtype of their inputs (functional JAX style).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def use_x64(enable: bool = True) -> None:
    """Enable (or disable) 64-bit precision globally.

    Must be called before the first traced computation. Parity tests call
    this from ``tests/conftest.py``.
    """
    jax.config.update("jax_enable_x64", enable)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_real() -> jnp.dtype:
    return jnp.dtype(jnp.float64) if x64_enabled() else jnp.dtype(jnp.float32)


def default_complex() -> jnp.dtype:
    return jnp.dtype(jnp.complex128) if x64_enabled() else jnp.dtype(jnp.complex64)


def complex_dtype_for(*arrays) -> jnp.dtype:
    """Widest complex dtype implied by ``arrays`` (or the default)."""
    dt = jnp.result_type(*(a for a in arrays if a is not None))
    if dt in (jnp.complex128, jnp.float64):
        return jnp.dtype(jnp.complex128) if x64_enabled() else jnp.dtype(jnp.complex64)
    return jnp.dtype(jnp.complex64) if dt in (jnp.complex64, jnp.float32, jnp.bfloat16, jnp.float16) \
        else default_complex()


def on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except RuntimeError:
        return False
