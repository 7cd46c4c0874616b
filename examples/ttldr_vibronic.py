"""TT/MPS-compressed nonadiabatic wavepacket dynamics (TT-LDR).

A 2D two-state vibronic model propagated in tensor-train format with a
bounded bond rank, compared against the dense LDRN flagship — the
rank-compressed route past the O(N^d) memory wall
(reference sketch: pyqed/mps/namd.py:147 TT_LDR)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.tn import TT_LDR
from pyqed_tpu.tn.ttspo import tt_to_dense
from pyqed_tpu.grid import LDRN

domains, levels, ns = [(-5, 5), (-5, 5)], [4, 4], 2
ldr = LDRN(domains, levels, nstates=ns, mass=[1.0, 1.0])
X, Y = np.meshgrid(ldr.x[0], ldr.x[1], indexing="ij")

# two coupled harmonic surfaces; rotating local states -> overlap matrix
v = np.stack([0.5 * (X**2 + Y**2),
              0.5 * ((X - 1)**2 + Y**2) + 1.0], axis=-1)
theta = 0.25 * np.arctan2(Y, X + 0.1)
states = np.stack([np.stack([np.cos(theta), np.sin(theta)], -1),
                   np.stack([-np.sin(theta), np.cos(theta)], -1)], -2)

psi0 = np.zeros((*X.shape, ns), complex)
psi0[..., 0] = np.exp(-(X - 1.0)**2 - Y**2)
psi0 /= np.linalg.norm(psi0)

ldr.set_apes(v)
A = np.asarray(ldr.build_ovlp(states))

dt, nt = 0.02, 20
tt = TT_LDR(domains, levels, nstates=ns, mass=[1.0, 1.0])
tt.set_apes(v)
tt.set_ovlp(A)
out = tt.run(psi0, dt, nt, rank_state=24, rank_pes=24, rank_ovlp=96)

# dense reference trajectory
U = np.asarray(ldr.short_time_propagator(dt))
psi = psi0.reshape(-1)
for _ in range(nt):
    psi = U @ psi
psi_dense = psi.reshape(*ldr.nx, ns)

psi_tt = np.asarray(tt_to_dense(out["cores_list"][-1]))
print("state rank 24, overlap-MPO rank 96 | grid:", ldr.nx, " states:", ns)
print("pop (TT):   ", np.round(np.diag(out["rdm_el"][-1]).real, 6))
rho = np.einsum("ija, ijb -> ab", psi_dense.conj(), psi_dense)
print("pop (dense):", np.round(np.diag(rho).real, 6))
print("max |psi_TT - psi_dense|:", float(np.max(np.abs(psi_tt - psi_dense))))
