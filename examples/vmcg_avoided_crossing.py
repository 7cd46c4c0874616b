"""Variational moving-basis Gaussian (vMCG-style) nonadiabatic dynamics
on a two-state avoided crossing, validated against split-operator
(reference counterpart: pyqed/moving_gaussian.py NAWPD +
pyqed/ldr/gwp.py complex-GWP machinery, unfinished there)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from pyqed_tpu.grid import VMCG, SPON

FAST = os.environ.get("PYQED_EXAMPLES_FAST") == "1"
nt = 200 if FAST else 400
c, gap, dt = 0.15, 0.3, 0.01

V = lambda x: jnp.array([[0.5 * (x[0] + 1.) ** 2, c],
                         [c, 0.5 * (x[0] - 1.) ** 2 + gap]])

# moving-basis dynamics: 24 frozen Gaussians on Ehrenfest trajectories,
# amplitudes fully variational in the nonorthogonal basis
sol = VMCG(V, mass=1.0, nstates=2, ndim=1, motion="ehrenfest")
N = 24
qs = np.linspace(-3.5, 2.5, N)[:, None]
ps = np.zeros((N, 1))
al = np.ones((N, 1), complex)
C0 = sol.project(qs, ps, al, np.array([-1.0]), np.array([0.0]),
                 np.array([1.0 + 0j]), state=0)
out = sol.run(qs, ps, al, C0, dt, nt, nout=nt)
pops = np.asarray(out["populations"][-1])

# split-operator reference on a grid
xg = np.linspace(-8, 8, 256)
spo = SPON([xg], masses=1.0, nstates=2)
v = np.zeros((256, 2, 2))
v[:, 0, 0] = 0.5 * (xg + 1.) ** 2
v[:, 1, 1] = 0.5 * (xg - 1.) ** 2 + gap
v[:, 0, 1] = v[:, 1, 0] = c
spo.set_dpes(v)
psi0 = np.zeros((256, 2), complex)
psi0[:, 0] = np.exp(-0.5 * (xg + 1.0) ** 2)
psi0 /= np.sqrt((np.abs(psi0) ** 2).sum() * (xg[1] - xg[0]))
res = spo.run(psi0, dt=dt, nt=nt, nout=nt)
psiT = np.asarray(res.states[-1]).reshape(256, 2)
pops_spo = (np.abs(psiT) ** 2).sum(0) * (xg[1] - xg[0])

print("vMCG populations:", np.round(pops, 8))
print("SPO  populations:", np.round(pops_spo, 8))
err = np.abs(pops - pops_spo).max()
print("max |dP| =", err)
assert err < 1e-5
