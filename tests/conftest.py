"""Test configuration: CPU backend, 8 virtual devices, float64.

Parity tests against the NumPy/SciPy reference require complex128
(BASELINE.md: 1e-8 gate); multi-device sharding tests run on a virtual CPU
mesh (SURVEY.md §4: the TPU stand-in for multi-chip without a cluster).
"""
import os

# Hard-override: the session environment pins JAX_PLATFORMS=axon (TPU);
# parity tests must run on CPU in float64. The axon plugin ignores the env
# var once imported, so also force it through jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
