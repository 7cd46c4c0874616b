"""Spin-boson HEOM hierarchy (BASELINE config #3;
reference: examples/heom.py, examples/deom.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")   # parity surface; the
# TPU path (re/im-split jit boundaries) is exercised by bench.py
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from pyqed_tpu import pauli
from pyqed_tpu.open import HEOMSolver, DrudeBath

_, sx, _, sz = pauli()
H = 0.5 * sz + 0.5 * sx
bath = DrudeBath(temperature=0.5, cutoff=0.5, reorg=0.05)
bath.set_bath_ops([sz])
solver = HEOMSolver(H, bath=bath, lmax=4, decomposition="pade", nexp=3)
res = solver.run(jnp.asarray(np.diag([1., 0.]).astype(complex)),
                 dt=0.01, nt=2000, e_ops=[sz])
print("<sz>(T):", float(np.asarray(res.observables[-1, 0]).real))
