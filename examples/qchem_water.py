"""GTO electronic structure pipeline: RHF -> LDA DFT -> TDA -> O K-edge.

(reference workflow: pyqed/qchem/mol.py:817, hf/rhf.py, core.py:444)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.qchem import Molecule, RKS, RXS
from pyqed_tpu.qchem.tdscf import TDA
from pyqed_tpu.units import au2ev

atoms = [("O", (0.0, 0.0, 0.0)),
         ("H", (0.0, -1.43, 1.11)),
         ("H", (0.0, 1.43, 1.11))]
mol = Molecule(atoms, basis="6-31g")
mf = mol.RHF().run()
print(f"E(RHF/6-31G)  = {float(mf.e_tot):.6f} Ha")

ks = RKS(Molecule(atoms, basis="sto-3g")).run()
print(f"E(LDA/STO-3G) = {float(ks.e_tot):.6f} Ha")

td = TDA(mf)
e = td.run(nroots=4)
f = td.oscillator_strength()
for k in range(4):
    print(f"  S{k+1}: {e[k]*au2ev:7.3f} eV   f = {f[k]:.4f}")

rxs = RXS(mf, occidx=[0])          # O 1s core window
w, _ = rxs.core_excitation(nstates=3)
print("O K-edge (core-valence separation):",
      np.round(w * au2ev, 1), "eV")
