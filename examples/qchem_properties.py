"""Molecular property pipeline: analytic-gradient optimization ->
bonding analysis (IBO/IAO) -> TDDFT spectrum -> CPHF polarizability.

(reference workflow: pyqed/qchem/mol.py:1374 scan_pes, :1445
intrinsic_orbitals (pyscf.lo there), grad.py:9 (empty skeleton there);
everything below is in-house and analytic.)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.qchem import (Molecule, RHF, RKS, TDA, GeometryOptimizer,
                             rhf_gradient, ibo, iao_charges,
                             orbital_centers, polarizability_cphf)
from pyqed_tpu.units import au2ev

FAST = os.environ.get("PYQED_EXAMPLES_FAST")
basis = "sto-3g" if FAST else "6-31g"

atoms = [("O", (0.0, 0.0, 0.3)),
         ("H", (0.0, 1.5, -0.8)),
         ("H", (0.0, -1.5, -0.8))]

# 1. optimize the geometry on the ANALYTIC RHF gradient surface
opt = GeometryOptimizer(atoms, basis=basis, gtol=1e-5,
                        conv_tol=1e-11).run()
mf = RHF(Molecule(opt.atoms_opt, basis=basis), conv_tol=1e-11).run()
print(f"E(RHF/{basis}) = {mf.e_tot:.6f} Ha  "
      f"({opt.niter} BFGS steps, |g| = "
      f"{np.max(np.abs(rhf_gradient(mf))):.1e})")

# 2. bonding analysis: intrinsic bond orbitals + IAO partial charges
centers = np.asarray(orbital_centers(mf, ibo(mf)))
q = iao_charges(mf)
print("IAO charges:", np.round(q, 3))
print("IBO centers (bohr):")
for c in centers:
    print("   ", np.round(c, 3))

# 3. TDDFT excitation spectrum (autodiff LDA kernel)
ks = RKS(Molecule(opt.atoms_opt, basis=basis), xc="svwn",
         conv_tol=1e-10).run()
td = TDA(ks)
e = td.run(nroots=3)
f = td.oscillator_strength()
for k in range(3):
    print(f"  TDA-LDA S{k+1}: {e[k]*au2ev:7.3f} eV   f = {f[k]:.4f}")

# 4. analytic CPHF dipole polarizability
alpha = polarizability_cphf(mf)
print("alpha (CPHF, a.u.):", np.round(np.diag(alpha), 3),
      " iso:", round(float(np.trace(alpha)) / 3, 3))
