"""Cavity-polariton dynamics (BASELINE config #5;
reference: examples/test_cavity.py, pyqed/polariton/cavity.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")   # parity surface; the
# TPU path (re/im-split jit boundaries) is exercised by bench.py
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from pyqed_tpu import Mol, SESolver, pauli, sigmam, basis
from pyqed_tpu.models.cavity import Cavity, Polariton

mol = Mol(jnp.diag(jnp.array([0.0, 1.0])), edip=pauli()[1], lowering=sigmam())
cav = Cavity(freq=1.0, n_cav=6)
pol = Polariton(mol, cav, g=0.08)
H = pol.getH(RWA=False)
evals, evecs, nph = pol.eigenstates()
print("polariton levels:", np.round(np.asarray(evals[:4]), 4))
psi0 = jnp.kron(basis(2, 1), basis(6, 0))
res = SESolver(H).run(psi0=psi0, dt=0.1, Nt=2000, method="expm",
                      e_ops=[pol.promote_op(cav.num(), kind="cav")])
print("<n_ph> max:", float(np.asarray(res.observables[:, 0]).real.max()))
