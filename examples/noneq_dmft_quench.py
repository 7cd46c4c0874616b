"""Interaction quench in nonequilibrium DMFT (Bethe lattice).

U: 0 -> 2 at t = 0 from the free THERMAL state, solved on the full
three-branch Kadanoff-Baym contour (Matsubara branch + left-mixing G
carried through the causal march).  The double occupancy relaxes from
its uncorrelated 1/4 and partially revives — the Eckstein-Werner
quench phenomenology (PRB 81, 115131 (2010)) — while the density
stays pinned at half filling and the total energy is conserved.

The reference's pyqed/gw/dmft.py noneq section is untranslated C++
pseudocode; this runs.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.negf import NoneqDMFTThermal

U, v, beta = 2.0, 0.5, 8.0
d = NoneqDMFTThermal(U, v=v, nt=48, dt=0.08, beta=beta, ntau=64,
                     solver="2b")
d.run(niter=12, mix=0.6)

ts = np.arange(d.nt) * d.dt
n = d.density()
docc = d.double_occupancy()
Ek = d.kinetic_energy()
Et = d.total_energy()

print(f"quench U: 0 -> {U} from the beta = {beta} free thermal state")
print(f"{'t':>6} {'n':>8} {'docc':>8} {'E_kin':>8} {'E_tot':>8}")
for k in range(0, d.nt, 6):
    print(f"{ts[k]:6.2f} {n[k]:8.4f} {docc[k]:8.4f} "
          f"{Ek[k]:8.4f} {Et[k]:8.4f}")

assert abs(docc[0] - 0.25) < 5e-3, "uncorrelated start"
assert docc.min() < 0.17, "relaxation happened"
assert np.max(np.abs(n - 0.5)) < 2e-3, "half filling pinned"
print("\nd(0) = %.4f -> min d = %.4f at t = %.2f (revival to %.4f)"
      % (docc[0], docc.min(), ts[int(np.argmin(docc))], docc[-1]))
