"""2DES photon-echo response map of an excitonic dimer (BASELINE config #4;
reference: examples/2DES.py, pyqed/signal/sos.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")   # parity surface; the
# TPU path (re/im-split jit boundaries) is exercised by bench.py
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from pyqed_tpu import Mol, au2ev, au2mev
from pyqed_tpu.signal import photon_echo

E = np.array([0.0, 1.0, 1.1, 2.08]) / au2ev
dip = np.zeros((4, 4))
dip[0, 1] = dip[1, 0] = 1.0; dip[0, 2] = dip[2, 0] = 0.7
dip[1, 3] = dip[3, 1] = 0.8; dip[2, 3] = dip[3, 2] = 1.1
mol = Mol(jnp.diag(jnp.asarray(E)), edip_rms=jnp.asarray(dip))
mol.set_decay_for_all(20 / au2mev)
pump = np.linspace(0.85, 1.25, 256) / au2ev
S = photon_echo(mol, pump, pump, t2=50.0, e_idx=[1, 2], f_idx=[3])
print("2DES map:", S.shape, "max |S|:", float(np.abs(np.asarray(S)).max()))
