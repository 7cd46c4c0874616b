"""Ring-polymer MD: quantum statistics and Kubo correlation functions.

Beyond-parity method (the reference's MD is classical LJ only).  RPMD is
exact for the harmonic oscillator, so everything here has a closed form:
at beta*omega = 8 the bead-averaged <x^2> is 0.5*coth(4) ~ 0.50 — four
times the classical 1/(beta m omega^2) = 0.125 — and the Kubo position
autocorrelation is cos(omega t)/(beta m omega^2).  The 4000-trajectory,
32-bead ensemble propagates as ONE vmapped lax.scan with the free ring
polymer advanced EXACTLY in normal modes (two matmuls per step).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.md import RPMD, kubo_harmonic_xx

FAST = bool(os.environ.get("PYQED_EXAMPLES_FAST"))
omega, beta, m = 1.0, 8.0, 1.0
ntraj = 1000 if FAST else 4000

rp = RPMD(lambda x: 0.5 * m * omega ** 2 * jnp.sum(x ** 2),
          beta=beta, nbeads=32, mass=m)

x0, p0 = rp.sample_harmonic(0, ntraj, omega)
x2 = float(jnp.mean(jnp.sum(x0 ** 2, axis=-1)))
exact = 0.5 / (m * omega) / np.tanh(beta * omega / 2)
print(f"bead-averaged <x^2> = {x2:.4f} (quantum {exact:.4f}, "
      f"classical {1/(beta*m*omega**2):.4f})")
assert abs(x2 - exact) / exact < 0.05

t, C = rp.position_tcf(x0, p0, dt=0.05, nt=200, nout=4)
Cex = kubo_harmonic_xx(t, omega, beta, m)
err = np.max(np.abs(C - Cex))
print(f"Kubo C_xx(t) vs closed form: max err {err:.2e} "
      f"(amplitude {Cex[0]:.3f})")
assert err < (0.08 if FAST else 0.03) * Cex[0]   # MC error ~ 1/sqrt(ntraj)

# PILE-thermostatted sampling from a cold start (generic potentials)
x, p = rp.thermalize(jnp.zeros((256, 32, 1)), jnp.zeros((256, 32, 1)),
                     key=2, dt=0.05, nsteps=1500 if FAST else 3000)
x2t = float(jnp.mean(jnp.sum(x ** 2, axis=-1)))
print(f"T-RPMD (PILE) thermalized <x^2> = {x2t:.4f}")
assert abs(x2t - exact) / exact < 0.15
print("ok")
