"""Helium atom: RHF and Kohn-Sham DFT with the in-house GTO engine.

The reference carries He study scripts (pyqed/qchem/DFT/Helium.py,
pyqed/gw/Helium.py) that lean on pyscf; this runs the same physics on
the framework's own McMurchie-Davidson integrals, SCF, SVWN DFT, and
CI layers."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pyqed_tpu.qchem import Molecule, RHF, RKS, FCI

mol = Molecule([("He", (0.0, 0.0, 0.0))], basis="6-31g")

mf = RHF(mol)
mf.run()
print(f"RHF/6-31G      {mf.e_tot:.6f} Eh   (literature -2.85516)")

ks = RKS(mol)
ks.run()
print(f"SVWN/6-31G     {ks.e_tot:.6f} Eh")

fci = FCI(mf)
efci = float(fci.run()[0])
print(f"FCI/6-31G      {efci:.6f} Eh   (exact nonrel. -2.90372)")
print(f"correlation    {efci - mf.e_tot:.6f} Eh")
