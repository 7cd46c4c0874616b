"""Geometry optimization + harmonic frequency from the in-house RHF
(reference: pyqed/qchem/grad.py — an empty skeleton there; this is the
working pipeline: analytic nuclear gradients -> BFGS -> Hessian).

Optimizes H2 at RHF/STO-3G (literature re = 1.346 bohr = 0.712 A) and
computes the harmonic stretch frequency at the optimum, then repeats
the optimization at DFT (RKS/SVWN) with ANALYTIC Kohn-Sham gradients —
derivative integrals for the HF-like core plus jax.grad through the
Becke grid for the XC + grid-weight terms (the reference delegates DFT
gradients to pyscf: pyqed/qchem/mol.py:817)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.qchem import GeometryOptimizer
from pyqed_tpu.qchem.hessian import Hessian

fast = bool(os.environ.get("PYQED_EXAMPLES_FAST"))

atoms0 = [("H", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 1.8))]
opt = GeometryOptimizer(atoms0, basis="sto-3g",
                        gtol=1e-4 if fast else 1e-5).run()
re = np.linalg.norm(np.asarray(opt.atoms_opt[1][1])
                    - np.asarray(opt.atoms_opt[0][1]))
print(f"optimized r(H-H) = {re:.4f} bohr ({re * 0.529177:.4f} A), "
      f"E = {opt.e_tot:.6f} Eh in {opt.niter} BFGS steps")
assert abs(re - 1.346) < 1e-2

if not fast:
    freqs = Hessian(opt.atoms_opt, basis="sto-3g").vibrational_frequencies(
        linear=True)
    print("harmonic stretch (cm^-1):", np.round(np.asarray(freqs), 1))
    # RHF/STO-3G H2 harmonic frequency ~ 5481 cm^-1 (std result)
    assert abs(float(np.max(freqs)) - 5481) < 150

# ---- DFT with analytic Kohn-Sham gradients (ks_gradient) ----
opt_ks = GeometryOptimizer(atoms0, basis="sto-3g", method="RKS",
                           xc="svwn", gtol=1e-4).run()
re_ks = np.linalg.norm(np.asarray(opt_ks.atoms_opt[1][1])
                       - np.asarray(opt_ks.atoms_opt[0][1]))
print(f"RKS/SVWN optimized r(H-H) = {re_ks:.4f} bohr "
      f"(E = {opt_ks.e_tot:.6f} Eh, analytic KS gradient)")
assert abs(re_ks - 1.39) < 2e-2          # SVWN/STO-3G overbinds vs HF
print("OK")
