"""Pure-spherical basis SCF and excited-state analysis artifacts.

Water in 6-31G* with 5d (pure) functions, then TDA excited-state
density, MO cube files, and an .xyz export — the orbital-viewing
workflow of the reference (pyqed/qchem/mol.py:1544 ``view_mo``,
core.py:840 ``tda_denisty_matrix``, hessian.py:441 ``save_to_xyz``)
driven entirely by the native AO engine.
"""
import os, sys, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.qchem import Molecule
from pyqed_tpu.qchem.tdscf import TDA, tda_density_matrix
from pyqed_tpu.qchem.density import write_mo_cube, write_density_cube
from pyqed_tpu.qchem.geometry import save_to_xyz
from pyqed_tpu.units import au2ev

atoms = [("O", (0.0, 0.0, 0.22140)),
         ("H", (0.0, 1.43052, -0.88560)),
         ("H", (0.0, -1.43052, -0.88560))]

m_cart = Molecule(atoms, basis="6-31g*")
m_sph = Molecule(atoms, basis="6-31g*", spherical=True)
e_cart = float(m_cart.RHF().run().e_tot)
mf = m_sph.RHF(); res = mf.run()
print(f"RHF/6-31G* (6d, {m_cart.nao} AOs): {e_cart:.6f} Ha")
print(f"RHF/6-31G* (5d, {m_sph.nao} AOs): {float(res.e_tot):.6f} Ha "
      f"(+{(float(res.e_tot) - e_cart) * 1e3:.3f} mHa, variational)")

td = TDA(mf)
e = td.run(nroots=3)
print("TDA excitations (eV):", np.round(np.asarray(e) * au2ev, 3))

out = tempfile.mkdtemp(prefix="qchem_analysis_")
S = np.asarray(m_sph.intor()[0])
D1 = tda_density_matrix(td, 0)
print(f"tr(D1 S) = {np.trace(D1 @ S):.6f} (electrons, expect "
      f"{m_sph.nelec})")
write_density_cube(os.path.join(out, "rho_S1.cube"), m_sph.atoms,
                   m_sph.bfs,
                   # density cube evaluates in the Cartesian AO basis:
                   # back-transform the spherical density matrix
                   m_sph.csph.T @ D1 @ m_sph.csph, nx=24, ny=24, nz=24)
write_mo_cube(os.path.join(out, "homo.cube"), m_sph,
              np.asarray(mf.mo_coeff)[:, mf.nocc - 1], nx=24, ny=24,
              nz=24)
save_to_xyz(m_sph, os.path.join(out, "water.xyz"))
print("wrote:", sorted(os.listdir(out)))
