"""FMO complex exciton transfer with per-site Drude baths (multi-bath
HEOM; Ishizaki & Fleming, PNAS 106, 17255 (2009) — beyond parity, the
reference ships no FMO model).

Seven sites, seven independent baths -> one flattened hierarchy; the
whole RHS is a few batched einsums on the MXU.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")   # parity surface
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.models.named import FMO
from pyqed_tpu.units import au2fs

FAST = os.environ.get("PYQED_EXAMPLES_FAST") == "1"

m = FMO()                                    # Adolphs-Renger Hamiltonian
sol = m.heom(temperature=300.0, lmax=3, nexp=0)

dt = 10.0                                    # au
t_final_fs = 200.0 if FAST else 1000.0
nt = int(t_final_fs / au2fs / dt)
res = sol.run(m.initial_state(site=0), dt=dt, nt=nt, nout=max(nt // 100, 1),
              e_ops=m.site_projectors())

t_fs = np.asarray(res.times) * au2fs
pops = np.real(np.asarray(res.observables))
print("      t[fs]   p1      p2      p3      p4..7")
for i in range(0, len(t_fs), max(len(t_fs) // 10, 1)):
    print(f"{t_fs[i]:10.1f} {pops[i,0]:.4f}  {pops[i,1]:.4f}  "
          f"{pops[i,2]:.4f}  {pops[i,3:].sum():.4f}")
print("trace error:", float(np.max(np.abs(pops.sum(axis=1) - 1.0))))
