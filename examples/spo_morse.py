"""1D split-operator wavepacket on a Morse potential (BASELINE config #1;
reference: examples/spo.py, pyqed/spo/SPO_1D.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")   # parity surface; the
# TPU path (re/im-split jit boundaries) is exercised by bench.py
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from pyqed_tpu import gwp
from pyqed_tpu.grid import SPO

x = np.linspace(-3, 12, 512, endpoint=False)
D, a, m = 2.0, 0.5, 20.0
spo = SPO(x, mass=m)
spo.set_potential(D * (1 - np.exp(-a * (x - 1.0)))**2)
psi0 = np.asarray(gwp(jnp.asarray(x), a=np.sqrt(2 * D * a * a * m), x0=0.3))
res = spo.run(psi0, dt=0.02, nt=10000, nout=100)
print("norm drift:", abs(float(np.asarray(res.population)[-1].sum()) - 1))
print("final <x>:", float(np.sum(x * np.abs(np.asarray(res.psi)[:, 0])**2) * (x[1]-x[0])))
