"""Fourier-optics: vortex beam through a fork grating, angular-spectrum
propagation (reference: the vendored diffractio fork, pyqed/beam/).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.beam import ScalarFieldXY
from pyqed_tpu.beam.masks import gauss_beam, forked_grating, circle

lam = 0.6328     # HeNe, um
n = 256
x = np.linspace(-300, 300, n)
f = ScalarFieldXY(x, x, lam)
X, Y = np.meshgrid(x, x, indexing="ij")
f.u = gauss_beam(X, Y, lam, w0=120.0)
f.u = f.u * forked_grating(X, Y, period=30.0, l=1)
f.angular_spectrum(2.0e4)              # 20 mm
I = np.abs(np.asarray(f.u)) ** 2
print(f"propagated field: peak {I.max():.3e}, total {I.sum():.3e}")
print("first diffraction order carries an optical vortex (l=1)")
