"""QSATS: variational Monte Carlo of a solid-helium-like fcc crystal
with pair-product trial function and permutation-exchange moves —
JAX walker batch vs the native C++ chain (reference counterpart:
pyqed/qmc/MC_exchange/permute3d Fortran+MPI QSATS v1.0)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from pyqed_tpu.qmc import QSATS, fcc_lattice, qsats_vmc_native

FAST = os.environ.get("PYQED_EXAMPLES_FAST") == "1"

# 32-atom fcc supercell at a solid-He-like density (r_nn ~ 5.3 bohr)
sites, box = fcc_lattice((2, 2, 2), density=4.0 / 7.5 ** 3)
sol = QSATS(sites, box, a=0.06, b=5.0)
print(f"{sol.natoms} atoms, {sol.ipairs.shape[0]} directed pairs, "
      f"r_nn = {sol.rnn:.3f} bohr")

out = sol.run(0, nwalkers=32 if FAST else 64,
              nsweeps=300 if FAST else 600,
              nequil=150 if FAST else 300,
              step=0.5, exchange_prob=0.2)
print(f"JAX VMC:  E = {out['energy']:.2f} +- {out['error']:.2f} K/atom "
      f"(acceptance {out['acceptance']:.2f}, "
      f"{out['exchange_acceptance']:.0f} exchanges accepted)")

q0 = 0.3 * np.random.default_rng(1).normal(size=(sol.natoms, 3)) \
    / np.sqrt(4 * sol.a)
E, trace, qf = qsats_vmc_native(q0, sol.ipairs, sol.vpvec, sol.a, sol.b,
                                sol.mass, nsweeps=1500 if FAST else 4000,
                                nequil=600 if FAST else 1500, step=0.5)
print(f"C++ VMC:  E = {E:.2f} K/atom")
assert abs(out["energy"] - E) < 8.0     # statistical agreement window
