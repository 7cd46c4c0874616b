"""Driven dissipative dynamics: a pulsed two-level system in a Drude
bath via HEOM (reference workflow: pyqed/heom/propagator.py with
set_pulse_system_func; here `run(edip=, pulse=)`).

A resonant Gaussian pi-ish pulse partially inverts the TLS; the bath
damps the coherence afterwards.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from pyqed_tpu import pauli, DrudeBath, HEOMSolver

_, sx, _, sz = pauli()
omega0 = 1.0
H = 0.5 * omega0 * np.asarray(sz)

bath = DrudeBath(temperature=0.2, cutoff=0.5, reorg=0.02)
bath.set_bath_ops([jnp.asarray(sz)])
sol = HEOMSolver(jnp.asarray(H, dtype=complex), bath=bath, lmax=3,
                 decomposition="pade", nexp=2)

t_c, tau, E0 = 12.0, 4.0, 0.25


def pulse(t):
    """Resonant Gaussian pulse E(t) = E0 exp(-(t-tc)^2/2tau^2) cos(w t)."""
    return E0 * jnp.exp(-((t - t_c) ** 2) / (2 * tau ** 2)) \
        * jnp.cos(omega0 * t)


rho0 = np.array([[1.0, 0.0], [0.0, 0.0]], complex)   # ground state
res = sol.run(jnp.asarray(rho0), dt=0.004, nt=15000, nout=50,
              e_ops=[jnp.asarray(np.asarray(sz), dtype=complex),
                     jnp.asarray(np.asarray(sx), dtype=complex)],
              edip=jnp.asarray(np.asarray(sx), dtype=complex),
              pulse=pulse)

t = np.asarray(res.times)
szt = np.asarray(res.observables[:, 0].real)
p_exc = (1.0 - szt) / 2.0
print(f"excited-state population: start {p_exc[0]:.4f}, "
      f"peak {p_exc.max():.4f} at t = {t[np.argmax(p_exc)]:.1f}, "
      f"final {p_exc[-1]:.4f}")
assert p_exc[0] < 1e-6 and p_exc.max() > 0.2, "pulse should excite"
tr = np.trace(np.asarray(res.rho)).real
print(f"trace(rho) = {tr:.8f}")
assert abs(tr - 1.0) < 1e-8
