"""Flagship LDR (local diabatic representation) nonadiabatic dynamics
on the Shin-Metiu proton-coupled electron-transfer model.

The full pipeline: batched electronic-structure eigensolve over the
nuclear grid -> Born-Oppenheimer surfaces + electronic overlap matrix ->
LDR propagation of a proton wavepacket across the avoided crossing
(reference chain: pyqed/models/ShinMetiu.py -> pyqed/ldr/ldr.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.models.vibronic import ShinMetiu
from pyqed_tpu.grid.ldr import LDRN

# nuclear grid for the proton
nstates = 2
ldr = LDRN([(-3.5, 3.5)], [5], nstates=nstates, mass=[1836.0])
R = ldr.x[0]

# electronic structure along the proton coordinate
model = ShinMetiu(nstates=nstates)
model.create_grid(96)
E, states = model.pes(R)
E = np.asarray(E)[:, :nstates]
A = model.overlap_matrix(np.asarray(states))        # (R a, R' b)

ldr.set_apes(E - E.min())
ldr.build_ovlp(None)
ldr.A = jnp.asarray(A).reshape(len(R), nstates, len(R), nstates)
ldr._diabatic = False

# proton wavepacket on the lower adiabat, displaced to the left well
psi0 = np.zeros((len(R), nstates), complex)
psi0[:, 0] = np.exp(-8.0 * (R + 1.2) ** 2 + 12.0j * R)
psi0 /= np.linalg.norm(psi0)

dt, nt = 2.0, 800
res = ldr.run(jnp.asarray(psi0), dt, nt, nout=80)

print("Shin-Metiu LDR dynamics on", len(R), "grid points x", nstates,
      "states")
for k, t in enumerate(np.asarray(res.times)):
    psi = np.asarray(res.states)[k]
    pops = np.sum(np.abs(psi) ** 2, axis=0)
    xave = float(np.sum(R[:, None] * np.abs(psi) ** 2) / pops.sum())
    print(f"  t = {t*0.02419:6.1f} fs   P0 = {pops[0]:.4f}  "
          f"P1 = {pops[1]:.4f}  <R> = {xave:+.2f} bohr")
