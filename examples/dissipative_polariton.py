"""Dissipative cavity polariton: Lindblad dynamics with cavity leak.

A two-level molecule strongly coupled to a leaky cavity mode — vacuum
Rabi oscillations damped at kappa/2 and emission trapped/released by
the polariton splitting (the physics of pyqed/polariton/exact.py's
study scripts, as one framework-native script)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.models.cavity import Cavity, Polariton
from pyqed_tpu.models.mol import Mol
from pyqed_tpu.open import LindbladSolver

# molecule (TLS) x cavity
wm, wc, g, kappa = 1.0, 1.0, 0.05, 0.02
mol = Mol(np.diag([0.0, wm]), np.array([[0.0, 1.0], [1.0, 0.0]]))
cav = Cavity(freq=wc, n_cav=4)
pol = Polariton(mol, cav, g=g)
H = np.asarray(pol.getH(RWA=True))

# cavity leak collapse operator: sqrt(kappa) * a (promoted to mol x cav)
a = np.kron(np.eye(2), np.asarray(cav.annihilate()))
c_ops = [np.sqrt(kappa) * a]

# start in |excited molecule, 0 photons>
n = H.shape[0]
rho0 = np.zeros((n, n), complex)
idx = 1 * cav.ncav + 0          # molecular excited, photon vacuum
rho0[idx, idx] = 1.0

num_mol = np.kron(np.diag([0.0, 1.0]), np.eye(cav.ncav))
num_ph = np.kron(np.eye(2), np.diag(np.arange(cav.ncav, dtype=float)))

sol = LindbladSolver(jnp.asarray(H), c_ops=[jnp.asarray(c) for c in c_ops])
res = sol.run(jnp.asarray(rho0), dt=0.05, Nt=4000, nout=40,
              e_ops=[jnp.asarray(num_mol), jnp.asarray(num_ph)])

obs = np.asarray(res.observables).real
t = np.asarray(res.times)
print("vacuum-Rabi half-period (expected ~ pi/2g = %.1f):" % (np.pi / (2 * g)))
# first revival of molecular population
pm = obs[:, 0]
mins = np.where((pm[1:-1] < pm[:-2]) & (pm[1:-1] < pm[2:]))[0] + 1
rebound = t[mins]
print("  first minimum at t =", round(float(rebound[0]), 1) if len(rebound) else "n/a")
print("final molecular population:", round(float(pm[-1]), 4))
print("total excitation decays:", round(float(obs[0, 0] + obs[0, 1]), 3),
      "->", round(float(obs[-1, 0] + obs[-1, 1]), 3))
