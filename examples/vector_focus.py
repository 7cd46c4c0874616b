"""Needle of longitudinal light: focusing a radially polarized doughnut
(Dorn-Quabis-Leuchs physics) with the vector volume propagator.

The reference's vendored diffractio stops at the transverse vector plane
(pyqed/beam/vector_fields_XY.py); VectorFieldXYZ propagates (Ex, Ey, Ez)
through the whole focal volume in one batched angular-spectrum kernel.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.beam import VectorFieldXYZ
from pyqed_tpu.beam.vector import VectorSourceXY

fast = bool(os.environ.get("PYQED_EXAMPLES_FAST"))
n = 96 if fast else 160
nz = 9 if fast else 33

wl, f, L = 1.0, 60.0, 60.0
x = np.linspace(-L / 2, L / 2, n, endpoint=False)
X, Y = np.meshgrid(x, x, indexing="ij")
r2 = X**2 + Y**2
doughnut = np.sqrt(r2) / 6.0 * np.exp(-r2 / 36.0)
lens = np.exp(-1j * np.pi / (wl * f) * r2)

src = VectorSourceXY(x, x, wl)
src.radial_wave(u=doughnut)

vol = VectorFieldXYZ(x, x, np.linspace(0.5 * f, 1.3 * f, nz), wl)
vol.incident_field(np.asarray(src.Ex) * lens, np.asarray(src.Ey) * lens)
vol.propagate()

It, Iz = (np.asarray(a) for a in vol.on_axis())
kpk = int(np.argmax(Iz))
print(f"on-axis |Ez|^2 peak {Iz.max():.4f} at z = {vol.z[kpk]:.1f} "
      f"(transverse on-axis intensity {It.max():.2e})")
assert Iz.max() > 1e3 * It.max()

# azimuthal polarization: dark focus (no on-axis Ez)
src2 = VectorSourceXY(x, x, wl)
src2.azimuthal_wave(u=doughnut)
vol2 = VectorFieldXYZ(x, x, vol.z, wl)
vol2.incident_field(np.asarray(src2.Ex) * lens, np.asarray(src2.Ey) * lens)
vol2.propagate()
_, Iz2 = (np.asarray(a) for a in vol2.on_axis())
print(f"azimuthal on-axis |Ez|^2: {Iz2.max():.2e} (dark focus)")
assert Iz2.max() < 1e-6 * Iz.max()
print("OK")
