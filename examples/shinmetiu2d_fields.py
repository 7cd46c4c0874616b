"""2D Shin-Metiu PCET: batched APES scan + field control of the
proton-transfer barrier (reference: pyqed/models/ShinMetiu.py:289,
706, 871). The whole Born-Oppenheimer scan is ONE vmapped dense eigh."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from pyqed_tpu.models import (ShinMetiu2D, ShinMetiu2DElectric,
                              ShinMetiu2DMagnetic)

FAST = os.environ.get("PYQED_EXAMPLES_FAST")
npts = 9 if FAST else 31
nscan = 5 if FAST else 25
DOM = [[-6.0, 6.0], [-6.0, 6.0]]

# field-free proton-transfer path: R_x scan at fixed R_y
sm = ShinMetiu2D(nstates=3)
sm.create_grid(DOM, npts)
Rs = np.stack([np.linspace(-0.9, 0.9, nscan), np.full(nscan, 0.3)], axis=1)
E, U = sm.pes(Rs)
barrier = E[:, 0].max() - E[:, 0].min()
print(f"field-free ground APES: barrier along path = {barrier:.6f} au")

# NACs peak near the avoided crossing at the transition state
i_ts = int(np.argmax(E[:, 0]))
w, u = sm.single_point(Rs[i_ts])
F = sm.nonadiabatic_coupling(w, u, Rs[i_ts])
print(f"NAC |F_01| at the barrier top: {np.linalg.norm(F[0, 1]):.4f}")

# an in-plane electric field tilts the double well (breaks R -> -R)
smE = ShinMetiu2DElectric(nstates=1, E=[0.05, 0.0])
smE.create_grid(DOM, npts)
EE, _ = smE.pes(Rs)
asym = EE[-1, 0] - EE[0, 0]
print(f"E-field endpoint asymmetry: {asym:+.6f} au")

# an out-of-plane magnetic field (Landau gauge) shifts the levels
smB = ShinMetiu2DMagnetic(nstates=2, B=5e4)   # Tesla
smB.create_grid(DOM, npts)
EB, _ = smB.pes(Rs[:: max(1, nscan // 3)])
print(f"B-field ground energies: {np.round(EB[:, 0], 6)}")
