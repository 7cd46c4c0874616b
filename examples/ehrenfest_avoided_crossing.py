"""Ehrenfest trajectory ensemble through an avoided crossing.

A Tully-I-style single avoided crossing: a vmapped batch of mean-field
trajectories with momenta sampled around k0 crosses the coupling region;
transmission populations come out per trajectory
(reference: pyqed/namd/ehrenfest.py is unfinished; this is the working
capability)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.grid import Ehrenfest

A, B, C, D = 0.01, 1.6, 0.005, 1.0


def v(x):
    d = x[0]
    v11 = jnp.where(d >= 0, A * (1 - jnp.exp(-B * d)),
                    -A * (1 - jnp.exp(B * d)))
    v12 = C * jnp.exp(-D * d ** 2)
    return jnp.array([[v11, v12], [v12, -v11]])


mass = 2000.0
sol = Ehrenfest(v, mass=mass, nstates=2, ndim=1)

ntraj = 32
rng = np.random.default_rng(0)
k0 = 15.0
x0 = np.full((ntraj, 1), -6.0)
p0 = rng.normal(k0, 0.5, (ntraj, 1))
c0 = np.tile(np.array([1.0, 0.0], complex), (ntraj, 1))

dt = 0.5
nt = 6000
r = sol.run(x0, p0, c0, dt=dt, nt=nt, nout=200)

xf = np.asarray(r.x)[-1, :, 0]
popf = np.asarray(r.population)[-1]
e = np.asarray(r.energy)
print(f"{ntraj} trajectories, k0={k0}")
print("all transmitted:", bool(np.all(xf > 0)))
print("mean final pops:", np.round(popf.mean(0), 4))
print("max energy drift:", float(np.max(np.abs(e - e[0][None]))))
