"""Two-site DMRG + TDVP quench on the transverse-field Ising chain.

Mirrors the reference's tensor-network workflow
(reference: pyqed/mps/mps.py two_site_dmrg:1200, TDVP:1463).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.tn import MPS, mpo_tfim, two_site_dmrg
from pyqed_tpu.tn.tdvp import TDVP

L = 10
mpo = mpo_tfim(L, J=1.0, h=1.0)            # critical point
mps = MPS.from_product_state([[1.0, 0.0]] * L)
energies, gs = two_site_dmrg(mpo, mps, chi_max=32, sweeps=8)
print(f"TFIM L={L} ground-state energy: {energies[-1]:.10f}")

# quench: evolve the DMRG ground state under a different field
mpo_q = mpo_tfim(L, J=1.0, h=2.0)
tdvp = TDVP(mpo_q, gs)
tdvp.run(0.05, 10)
E = tdvp.expect_mpo().real
print(f"energy under quenched H (conserved by TDVP): {E:.8f}")
