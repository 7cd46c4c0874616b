"""Analytic excited-state and correlated forces (qchem.tdgrad).

One engine, four theories: CIS/TDA, TDHF/RPA, MP2, CCSD — the orbital
Lagrangian, the CPHF operator, and (for CCSD) even the Lambda
multipliers come from jax autodiff; one Z-vector solve per theory.
The reference has no excited-state or correlated forces at all (its
gradients delegate to pyscf, ground state only).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.qchem.mol import Molecule
from pyqed_tpu.qchem.tdscf import TDA, TDHF
from pyqed_tpu.qchem.cc import CCSD
from pyqed_tpu.qchem import (cis_gradient, tdhf_gradient, mp2_gradient,
                             ccsd_gradient, mp2_dipole, cis_dipole,
                             ccsd_dipole)

lih = [("Li", (0, 0, 0.0)), ("H", (0, 0, 3.0))]
mf = Molecule(lih, basis="sto-3g").RHF().run()

td = TDA(mf)
td.run(nroots=3)
g_cis = cis_gradient(td, state=1)

rp = TDHF(mf)
rp.run(nroots=3)
g_rpa = tdhf_gradient(rp, state=1)

from pyqed_tpu.qchem.mp import MP2
mp = MP2(mf)
mp.run()
g_mp2 = mp2_gradient(mf)
cc = CCSD(mf).run()
g_cc = ccsd_gradient(cc)
mu = mp2_dipole(mf)

print("LiH @ R = 3.0 bohr, sto-3g  (z-component of the H force, Eh/bohr)")
print(f"  CIS/TDA state 1 : {g_cis[1, 2]:+.6f}   (omega = {td.e[0]:.4f})")
print(f"  TDHF/RPA state 1: {g_rpa[1, 2]:+.6f}   (omega = {rp.e[0]:.4f})")
print(f"  MP2 ground state: {g_mp2[1, 2]:+.6f}   (E2 = {mp.e_corr:.6f})")
print(f"  CCSD ground state: {g_cc[1, 2]:+.6f}   (E_corr = {cc.e_corr:.6f})")
print(f"  relaxed MP2 dipole (a.u.): {mu}")
mu_exc = cis_dipole(td, state=1)
mu_cc = ccsd_dipole(cc)
print(f"  relaxed CCSD dipole z: {mu_cc[2]:+.4f}")
print(f"  EXCITED-state dipole z: {mu_exc[2]:+.4f}  (ground: "
      f"{mu[2]:+.4f} — the LiH A-state dipole reversal)")
assert mu_exc[2] * mu[2] < 0

for name, g in [("CIS", g_cis), ("RPA", g_rpa), ("MP2", g_mp2),
                ("CCSD", g_cc)]:
    assert np.max(np.abs(g.sum(axis=0))) < 1e-8, name  # translational
print("all four force fields translationally invariant")
