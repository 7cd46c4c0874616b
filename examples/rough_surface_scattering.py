"""Scattering from a rough phase screen: correlated Ogilvy roughness
imposed as a reflective phase mask, taken to the far field (Fraunhofer),
and compared against the specular
(smooth) beam.

Physics checks printed:
  * the specular (coherent) peak is attenuated by the Debye-Waller-like
    factor exp(-g/2) with g = (2 k s)^2 for reflection at normal
    incidence -- rougher surface, weaker coherent beam;
  * energy is conserved by the phase screen (it only redistributes);
  * the diffuse halo widens as the correlation length t shrinks.

Reference scope: pyqed/beam/utils_optics.py:14 ``roughness_1D`` +
scalar_fields_X.py RS propagation (the reference draws these; here we
verify the scattering statistics instead).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from pyqed_tpu.beam import ScalarFieldX
from pyqed_tpu.beam.optics import roughness_1D

wl = 0.6328          # um, HeNe
k = 2 * np.pi / wl
x = np.linspace(-400.0, 400.0, 4096)
w0 = 80.0            # beam waist, um

def far_field(s, t, seed=0):
    """Reflect a Gaussian beam off a rough mirror (phase screen
    2 k h(x)); returns (fx, complex far field U, input energy)."""
    f = ScalarFieldX(x, wl)
    f.u = np.exp(-x**2 / w0**2).astype(complex)
    if s > 0:
        h = roughness_1D(x, t=t, s=s, seed=seed)
        f.u = f.u * np.exp(2j * k * h)     # reflection: double pass
    e_in = float(np.sum(np.abs(f.u)**2))
    fx, U = f.fft()
    return fx, np.asarray(U), e_in

fx, U0, e0 = far_field(0.0, 10.0)
a0 = np.abs(U0).max()

print("rms roughness s [um]   coherent peak     exp(-(2ks)^2/2)")
for s in (0.01, 0.02, 0.04):
    # COHERENT (complex) average over realizations isolates the
    # specular field; its peak obeys the Debye-Waller-like factor
    Uc = np.mean([far_field(s, 10.0, seed=i)[1] for i in range(24)],
                 axis=0)
    ratio = np.abs(Uc).max() / a0
    g = (2 * k * s)**2
    print(f"  {s:5.3f}              {ratio:8.4f}        {np.exp(-g/2):8.4f}")
    assert abs(ratio - np.exp(-g / 2)) < 0.03

# energy conservation through the screen
_, _, e_r = far_field(0.05, 10.0)
assert abs(e_r - e0) / e0 < 1e-12
print(f"screen conserves energy: |dE|/E = {abs(e_r-e0)/e0:.2e}")

# diffuse halo width grows as the correlation length shrinks
def halo_width(t):
    acc = np.zeros_like(x)
    for i in range(6):
        acc += np.abs(far_field(0.2, t, seed=i)[1])**2
    acc /= acc.sum()
    fx_loc = np.fft.fftshift(np.fft.fftfreq(len(x), x[1]-x[0]))
    return np.sqrt(np.sum(acc * fx_loc**2) - np.sum(acc * fx_loc)**2)

w_long, w_short = halo_width(40.0), halo_width(8.0)
print(f"halo width t=40um: {w_long:.3e}  t=8um: {w_short:.3e} cycles/um")
assert w_short > 1.5 * w_long
print("diffuse halo widens with shorter correlation length: OK")
