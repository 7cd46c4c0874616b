"""Fewest-switches surface hopping on Tully model I.

Beyond-parity method (the reference's trajectory nonadiabatic layer is an
unfinished Ehrenfest sketch, pyqed/namd/ehrenfest.py). The stochastic
ensemble is ONE vmapped lax.scan — here 500 trajectories — and the result
is checked against exact quantum wavepacket dynamics (independent SPO
path): at k0 = 20 the surface populations agree to ~0.01.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.grid import FSSH, SPON, tully_i

FAST = bool(os.environ.get("PYQED_EXAMPLES_FAST"))
v = tully_i()
m, k0, sig = 2000.0, 20.0, 1.0

# FSSH ensemble: one vmapped scan over 500 stochastic trajectories
sol = FSSH(v, mass=m, nstates=2, ndim=1)
ntraj = 200 if FAST else 500
rng = np.random.default_rng(3)
x0 = rng.normal(-8.0, sig, (ntraj, 1))
p0 = rng.normal(k0, 1.0 / (2 * sig), (ntraj, 1))   # Wigner-matched spread
res = sol.run(x0, p0, active0=0, dt=2.0, nt=4000, nout=400, key=7)
pop = np.asarray(res.population)[-1]
print(f"FSSH  ({ntraj} traj): P(lower) = {pop[0]:.3f}, P(upper) = {pop[1]:.3f}")
e = np.asarray(res.energy)
print(f"energy conserved through hops: max drift {np.max(np.abs(e - e[0:1])):.2e}")

# exact quantum reference: SPO wavepacket, adiabatic projection
x = np.linspace(-25, 35, 512, endpoint=False)
spo = SPON([x], masses=[m], nstates=2)
V = np.asarray(jnp.stack([v(jnp.array([xi])) for xi in x]))
spo.set_dpes(V)
dx = x[1] - x[0]
g = np.exp(-(x + 8.0) ** 2 / (4 * sig ** 2) + 1j * k0 * (x + 8.0))
psi0 = np.zeros((512, 2), complex)
psi0[:, 0] = g / np.sqrt(np.sum(np.abs(g) ** 2) * dx)
rq = spo.run(jnp.asarray(psi0), dt=1.0, nt=2600, nout=2600,
             return_states=True)
psiT = np.asarray(rq.psilist[-1])
_, Us = np.linalg.eigh(V)
pop_exact = np.sum(np.abs(np.einsum("xia, xi -> xa", Us, psiT)) ** 2,
                   axis=0) * dx
print(f"exact (SPO):          P(lower) = {pop_exact[0]:.3f}, "
      f"P(upper) = {pop_exact[1]:.3f}")
assert np.max(np.abs(pop - pop_exact)) < 0.08
print("ok")
