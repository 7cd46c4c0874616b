"""Driven Rice-Mele chain: topology + Floquet quasienergy dynamics.

Ports the reference's Floquet example pair (reference:
examples/floquet/RiceMele.py — builds a RiceMele(0.22, 0.2, 18) chain
and runs its dipole-driven Floquet problem; examples/floquet/
two_level_system.py — cross-checks Floquet against direct propagation
for a driven two-level Mol), with quantitative asserts instead of
print statements:

1. The SSH/Rice-Mele open chain hosts two exponentially-split
   mid-gap edge modes exactly when the INTER-cell hopping dominates
   (|w| > |v|), and none in the trivial phase — checked on both sides
   of the transition.
2. The dipole-driven chain's Floquet (Sambe-space) evolution equals
   direct time-ordered propagation of H(t) = H0 − E0 cos(ωt) μ at
   non-stroboscopic times.
3. The analytic two-band dispersion ±|v + w e^{ik}| matches the bulk
   eigenvalues of a long periodic chain.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")   # parity surface
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from pyqed_tpu.models.lattice import RiceMele
from pyqed_tpu.floquet.floquet import Floquet

# ---- 1. edge modes across the topological transition ----------------
v, w, n = 0.2, 0.35, 18                  # |w| > |v|: topological
topo = RiceMele(v, w, n)
e_topo = np.sort(np.abs(np.linalg.eigvalsh(np.asarray(topo.buildH()))))
triv = RiceMele(w, v, n)                 # swapped: trivial
e_triv = np.sort(np.abs(np.linalg.eigvalsh(np.asarray(triv.buildH()))))

gap = abs(w - v)
n_edge_topo = int(np.sum(e_topo < gap / 2))
n_edge_triv = int(np.sum(e_triv < gap / 2))
print(f"mid-gap modes: topological = {n_edge_topo}, "
      f"trivial = {n_edge_triv}")
assert n_edge_topo == 2 and n_edge_triv == 0
# the edge pair is exponentially split: far below the bulk gap
assert e_topo[0] < 0.05 * gap

# ---- 2. Floquet evolution == direct propagation ---------------------
model = RiceMele(0.22, 0.2, n)           # the reference's parameters
H0 = np.asarray(model.buildH())
mu = np.asarray(model.position())
omegad, E0 = 0.1, 0.3
# nt = 121 Sambe blocks: this drive is STRONG (E0 max|mu| / omegad = 30,
# far beyond perturbative), so the photon ladder must span well past
# the drive amplitude — 61 blocks leaves a 4e-3 truncation tail, 121 is
# converged to 1e-8 (checked against 201)
fl = Floquet(H0, mu, omegad=omegad, E0=E0, nt=121)

quasi = np.sort(np.asarray(fl.quasienergies()))
print(f"first-BZ quasienergies in [{quasi.min():.4f}, {quasi.max():.4f}]")
assert quasi.min() >= -omegad / 2 - 1e-12
assert quasi.max() <= omegad / 2 + 1e-12

psi0 = np.zeros(n, complex)
psi0[0] = 1.0                            # left edge orbital
times = np.array([7.3, 15.1])            # non-stroboscopic
psi_fl = np.asarray(fl.run(jnp.asarray(psi0), jnp.asarray(times)))

# direct time-ordered propagation, fine expm steps
dt = 2e-3
nt = int(times[-1] / dt)
psi = psi0.copy()
out = []
import scipy.linalg as sla
for k in range(nt + 1):
    t = k * dt
    for tt in times:
        if abs(t - tt) < dt / 2:
            out.append(psi.copy())
    Ht = H0 - E0 * np.cos(omegad * (t + dt / 2)) * mu
    psi = sla.expm(-1j * Ht * dt) @ psi
err = max(np.max(np.abs(p - q)) for p, q in zip(out, psi_fl))
print(f"Floquet vs direct propagation: max dev = {err:.2e}")
assert err < 1e-6

# ---- 3. analytic two-band dispersion vs long periodic chain ---------
k = np.linspace(-np.pi, np.pi, 64, endpoint=False)
bands = np.asarray(model.band_structure(k))          # (nk, 2)
# periodic ring built explicitly (RiceMele.buildH is open-chain only)
nn = 256
Hr = np.zeros((nn, nn))
for i in range(0, nn - 1, 2):
    Hr[i, i + 1] = Hr[i + 1, i] = 0.22
for i in range(1, nn - 1, 2):
    Hr[i, i + 1] = Hr[i + 1, i] = 0.2
Hr[0, nn - 1] = Hr[nn - 1, 0] = 0.2                  # close the ring
e_ring = np.sort(np.linalg.eigvalsh(Hr))
e_analytic = np.sort(bands.ravel())
# same spectral range and gap
assert abs(e_ring.max() - e_analytic.max()) < 1e-2
pos = e_ring[e_ring > 0]
assert abs(pos.min() - abs(0.22 - 0.2)) < 1e-2       # direct gap = |v-w|
print("analytic dispersion matches the periodic chain "
      f"(bandwidth {e_ring.max():.4f}, gap {2 * pos.min():.4f})")
print("OK rice_mele_floquet")
