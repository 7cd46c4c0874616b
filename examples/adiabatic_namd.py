"""Nonadiabatic wavepacket dynamics in the adiabatic representation.

A Gaussian wavepacket crosses an avoided crossing twice — once propagated
diabatically with the split-operator method, once adiabatically with the
NAMD propagator (full transformed kinetic operator, Hellmann-Feynman
derivative couplings).  The two routes are unitarily equivalent; the
printed population mismatch is the discretization floor.

(reference: pyqed/namd/adiabatic.py — first-order truncation, hard-coded
mass, matplotlib-in-the-loop there.)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.grid import SPO, NAMD, diabatic_to_adiabatic_1d

FAST = bool(os.environ.get("PYQED_EXAMPLES_FAST"))

# -- two-state avoided crossing ------------------------------------------
nx = 128 if FAST else 256
x = np.linspace(-12, 12, nx, endpoint=False)
mass = 1000.0
e1 = 0.01 * np.tanh(x / 2.0)
c = 0.005 * np.exp(-(x**2) / 8.0)
dpes = np.zeros((nx, 2, 2))
dpes[:, 0, 0], dpes[:, 1, 1] = e1, -e1
dpes[:, 0, 1] = dpes[:, 1, 0] = c
# analytic diabatic gradients -> Hellmann-Feynman NACs (no FD floor)
ddpes = np.zeros((nx, 2, 2))
ddpes[:, 0, 0] = 0.01 / 2.0 / np.cosh(x / 2.0) ** 2
ddpes[:, 1, 1] = -ddpes[:, 0, 0]
ddpes[:, 0, 1] = ddpes[:, 1, 0] = -x / 4.0 * c

v, U, nac = diabatic_to_adiabatic_1d(x, dpes, ddpes=ddpes)
print(f"adiabatic gap at crossing: {float((v[:, 1] - v[:, 0]).min()):.5f}")
print(f"peak |NAC|: {float(np.abs(nac).max()):.3f}")

# -- initial wavepacket on the lower adiabatic surface, moving right ------
x0, k0, a = -5.0, 12.0, 1.0
g = (1 / (np.pi * a)) ** 0.25 * np.exp(-(x - x0) ** 2 / (2 * a)
                                       + 1j * k0 * (x - x0))
psi0_ad = np.zeros((nx, 2), complex)
psi0_ad[:, 0] = g
psi0_dia = np.einsum("xab, xb -> xa", U, psi0_ad)

dt = 0.25
nt = 1000 if FAST else 4000

# -- route 1: diabatic split-operator -------------------------------------
spo = SPO(x, mass=mass, nstates=2)
spo.set_dpes(dpes)
r_dia = spo.run(jnp.asarray(psi0_dia), dt=dt, nt=nt,
                return_states=False, nout=nt)
psi_ad_from_dia = np.einsum("xba, xb -> xa", U, np.asarray(r_dia.psi))
pop_dia = np.sum(np.abs(psi_ad_from_dia) ** 2, axis=0) * (x[1] - x[0])

# -- route 2: adiabatic NAMD (full kinetic operator) ----------------------
namd = NAMD(x, v, nac, mass=mass, order=2)
r_ad = namd.run(jnp.asarray(psi0_ad), dt=dt, nt=nt, nout=nt)
pop_ad = np.asarray(namd.population(r_ad.psi))

print(f"populations (diabatic route) : {pop_dia}")
print(f"populations (adiabatic route): {pop_ad}")
err = float(np.max(np.abs(pop_dia - pop_ad)))
print(f"route mismatch: {err:.2e}")
assert err < 5e-4, err

# the reference's first-order truncation: close, but not norm-conserving
namd1 = NAMD(x, v, nac, mass=mass, order=1)
r1 = namd1.run(jnp.asarray(psi0_ad), dt=dt, nt=nt, nout=nt)
print(f"order-1 norm drift (reference truncation): "
      f"{abs(float(namd1.norm(r1.psi)) - 1.0):.2e}")
print("OK")
