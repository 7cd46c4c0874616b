"""Vector polarization optics: radial vector beam through a q-plate and
polarizer chain, with per-pixel Stokes/ellipse analysis
(reference: pyqed/beam/vector_{sources,masks,fields}_XY.py — the
vendored-diffractio vector layer, rebuilt as einsum Jones calculus).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.beam import (VectorSourceXY, VectorMaskXY,
                            polarization_ellipse)

lam = 0.6328                                   # HeNe, um
n = 96 if os.environ.get("PYQED_EXAMPLES_FAST") else 192
xy = np.linspace(-60, 60, n)
env = np.exp(-(xy[:, None] ** 2 + xy[None, :] ** 2) / 25 ** 2)

# 1. radial ("doughnut") vector beam
src = VectorSourceXY(xy, xy, lam).radial_wave(env)
P0 = float(jnp.sum(src.intensity()))

# 2. any linear polarizer passes exactly half of a radial beam
half = VectorMaskXY(xy, xy, lam).polarizer_linear(np.pi / 5) * src
print(f"radial beam through a linear polarizer: "
      f"{float(jnp.sum(half.intensity())) / P0:.4f} of the power (exact: 0.5)")

# 3. q-plate (q = 1/2) converts radial -> uniform linear polarization
qp = VectorMaskXY(xy, xy, lam).q_plate(q=0.5)
out = qp * src
A, B, theta, h = polarization_ellipse(out)
c = n // 2 + n // 8
print(f"after q=1/2 plate: ellipticity B/A = "
      f"{float(B[c, c] / A[c, c]):.2e} (linear), "
      f"orientation spread = {float(jnp.std(theta[jnp.asarray(env) > 0.1])):.2e} rad")

# 4. propagate and check the free-space vector diffraction
out.propagate(150.0)
I = np.asarray(out.intensity())
print(f"propagated 150 um: total power ratio "
      f"{I.sum() / float(jnp.sum(src.intensity())):.4f} (energy conserved)")
