"""Ab initio -> model Hamiltonian -> quantum dynamics, end to end.

The bridge the reference sketches in pyqed/qchem/vibronic.py (LVC_DFT,
a skeleton there): optimize LiH at RHF/STO-3G, build the linear
vibronic coupling model from the Hessian normal mode + TDA excitations
+ finite-difference vibronic couplings, then propagate a Franck-Condon
excitation on the coupled surfaces.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.qchem import GeometryOptimizer, LVCBuilder
from pyqed_tpu.units import au2wavenumber, au2ev

fast = bool(os.environ.get("PYQED_EXAMPLES_FAST"))

opt = GeometryOptimizer([("Li", (0, 0, 0)), ("H", (0, 0, 3.0))],
                        basis="sto-3g", gtol=1e-4 if fast else 1e-5).run()
re = np.linalg.norm(opt.atoms_opt[1][1] - opt.atoms_opt[0][1])
print(f"optimized r(Li-H) = {re:.4f} bohr")

b = LVCBuilder(opt.atoms_opt, nstates=3, dq=0.05, truncate=6)
lvc = b.run()
print(f"stretch: {b.omegas[0] * au2wavenumber:.0f} cm^-1; vertical "
      f"excitations: {lvc.e_fc[1] * au2ev:.2f}, {lvc.e_fc[2] * au2ev:.2f} eV")
print(f"kappa (S1, S2): {b.kappa[0, 1]:+.4f}, {b.kappa[0, 2]:+.4f} "
      f"(Sigma-Pi lambda = {b.lam[0, 1, 2]:.1e}, zero by symmetry)")

# Franck-Condon excitation to S1: vibrational ground state on surface 1
H = np.asarray(lvc.buildH())
nvib = lvc.nvib
psi0 = np.zeros(H.shape[0], complex)
psi0[1 * nvib + 0] = 1.0       # |S1, v=0>
nt = 40 if fast else 400
# method='expm': one exact eigendecomposition step — RK4 at dt = 10 au
# sits beyond its stability bound for this spectral radius
res = lvc.run(psi0=psi0, dt=10.0, nt=nt, nout=10, method="expm",
              e_ops=[np.asarray(lvc.buildop(1))])
pop1 = np.real(np.asarray(res.observables)[:, 0])
print(f"S1 population: starts {pop1[0]:.3f}, after {nt * 10} au "
      f"-> {pop1[-1]:.3f} (no interstate coupling: stays 1)")
assert np.max(np.abs(pop1 - 1.0)) < 1e-8
print("OK")
