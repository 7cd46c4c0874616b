"""Ab initio DMRG on the full electronic Hamiltonian.

Builds the exact compressed MPO of
H = sum h_pq a+_p a_q + 1/4 sum <pq||rs> a+_p a+_q a_s a_r
from this package's own SCF/MO integrals and runs two-site DMRG,
recovering FCI for H4/STO-3G.

Reference workflow: pyqed/qchem/dmrg.py:834 ``DMRG(mf, D)`` (pyscf
integrals + renormalized complementary-operator blocks there).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.qchem import Molecule
from pyqed_tpu.qchem.scf import RHF
from pyqed_tpu.qchem.ci import FCI
from pyqed_tpu.tn import DMRGQC

mol = Molecule([("H", (0.0, 0.0, 1.8 * i)) for i in range(4)],
               basis="sto-3g", unit="bohr")
mf = RHF(mol)
mf.run()
print(f"RHF   E = {mf.e_tot:.10f}")

fci = FCI(mf)
e_fci = fci.run()[0]
print(f"FCI   E = {e_fci:.10f}")

dmrg = DMRGQC(mf, D=32)
e = dmrg.run()
dims = [int(W.shape[1]) for W in dmrg.mpo.Ws]
print(f"DMRG  E = {e:.10f}   (MPO bond profile {dims})")
print(f"|E_DMRG - E_FCI| = {abs(e - e_fci):.2e}")
assert abs(e - e_fci) < 1e-8
