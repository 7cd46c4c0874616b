"""CASSCF orbital optimization on H2/6-31G by autodiff.

The whole CASCI energy functional (integral transforms, Slater-Condon
CI matrix, eigensolve) is one differentiable jitted function; jax.grad
supplies the exact orbital gradient and L-BFGS drives the rotation."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pyqed_tpu.qchem import Molecule, RHF, FCI, CASCI
from pyqed_tpu.qchem.ci import CASSCF

mol = Molecule([("H", (0, 0, 0)), ("H", (0, 0, 1.4))], basis="6-31g")
mf = RHF(mol)
mf.run()
print(f"RHF        {mf.e_tot:.6f} Eh")
print(f"CASCI(2,2) {float(CASCI(mf, 2, 2).run()[0]):.6f} Eh  (RHF orbitals)")
mc = CASSCF(mf, 2, 2)
e = mc.run()
print(f"CASSCF(2,2) {e:.6f} Eh  (optimized orbitals, converged={mc.converged})")
print(f"FCI        {float(FCI(mf).run()[0]):.6f} Eh  (exact in basis)")
