"""Redfield relaxation of a vibronic dimer (BASELINE config #2;
reference: examples/redfield.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")   # parity surface; the
# TPU path (re/im-split jit boundaries) is exercised by bench.py
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from pyqed_tpu.open import RedfieldSolver

E = np.array([0.0, 1.0, 1.1])
H = np.diag(E) + 0.05 * (np.eye(3, k=1) + np.eye(3, k=-1)) * (E > 0)
H = (H + H.T) / 2
a_op = np.diag([0.0, 1.0, -1.0])
beta = 5.0
spectrum = lambda w: 0.05 * np.where(w > 0, 1.0, np.exp(beta * w))
solver = RedfieldSolver(jnp.asarray(H), c_ops=[jnp.asarray(a_op)], spectra=[spectrum])
rho0 = np.zeros((3, 3), complex); rho0[2, 2] = 1
res = solver.evolve(jnp.asarray(rho0), dt=0.05, nt=4000,
                    e_ops=[jnp.asarray(np.diag([0, 1.0, 0]))])
print("P1(t) end:", float(np.asarray(res.observables[-1, 0]).real))
