"""Optimal control: GRAPE pulse design for a qubit, closed and open.

Beyond-parity example — the reference has no optimal-control layer; its
numpy/torch solvers are not differentiable.  Here the propagation is a
pure JAX program, so the gradient of the fidelity with respect to every
pulse amplitude is one reverse-mode sweep, and the whole optimization
loop compiles to a single XLA program.

1. Closed system: design a pi pulse (|0> -> |1>) and a NOT gate.
2. Open system: drive toward |1> against sigma_- decay (Lindblad).
3. Inverse problem: recover a decay rate by backprop through the
   LindbladSolver.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from pyqed_tpu import pauli
from pyqed_tpu.control import GRAPE, OpenGRAPE, fit

_, sx, sy, sz = [np.asarray(p) for p in pauli()]

# 1a. state transfer ---------------------------------------------------
g = GRAPE(H0=0.5 * sz, Hc=[sx], dt=0.2, n_steps=40)
psi0 = np.array([1.0, 0.0], complex)
target = np.array([0.0, 1.0], complex)
u, fids = g.optimize_state_transfer(psi0, target, iters=300,
                                    learning_rate=0.08)
print(f"state transfer |0> -> |1>: fidelity {float(fids[-1]):.6f}")
assert float(fids[-1]) > 0.999

# 1b. NOT-gate synthesis with two controls -----------------------------
g2 = GRAPE(H0=0.3 * sz, Hc=[sx, sy], dt=0.25, n_steps=30)
u2, fids2 = g2.optimize_gate(sx, iters=400, learning_rate=0.08)
print(f"NOT-gate synthesis:        fidelity {float(fids2[-1]):.6f}")
assert float(fids2[-1]) > 0.999

# 2. open-system GRAPE against decay -----------------------------------
sm = np.array([[0.0, 1.0], [0.0, 0.0]], complex)
og = OpenGRAPE(H0=0.5 * sz, Hc=[sx], dt=0.2, n_steps=30, c_ops=[0.3 * sm])
rho0 = np.diag([1.0, 0.0]).astype(complex)
e1 = np.array([0.0, 1.0], complex)
uo, losses = og.optimize(lambda u: 1.0 - og.fidelity_state(u, rho0, e1),
                         1e-2 * np.ones((30, 1)), iters=250,
                         learning_rate=0.08)
p_driven = float(og.fidelity_state(uo, rho0, e1))
p_free = float(og.fidelity_state(jnp.zeros((30, 1)), rho0, e1))
print(f"open-system drive:  P(|1>) driven {p_driven:.4f} vs free {p_free:.4f}")
assert p_driven > p_free + 0.5

# 3. Hamiltonian/bath learning through the solver ----------------------
from pyqed_tpu.open.lindblad import LindbladSolver
gamma_true = 0.25
proj1 = np.diag([0.0, 1.0]).astype(complex)

def trace_of(gamma):
    sol = LindbladSolver(0.5 * jnp.asarray(sz),
                         c_ops=[jnp.sqrt(gamma) * jnp.asarray(sm)])
    res = sol.run(np.diag([0.0, 1.0]).astype(complex), dt=0.05, Nt=120,
                  e_ops=[proj1], nout=4)
    return jnp.real(jnp.asarray(res.observables)[:, 0])

y = trace_of(jnp.asarray(gamma_true))
lg, _ = fit(lambda lg: jnp.mean((trace_of(jnp.exp(lg)) - y) ** 2),
            jnp.log(0.05), iters=150, learning_rate=0.1)
gamma_fit = float(jnp.exp(lg))
print(f"bath-rate recovery: gamma_true {gamma_true}, fitted {gamma_fit:.5f}")
assert abs(gamma_fit - gamma_true) < 5e-3
print("ok")
