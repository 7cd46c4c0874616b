"""Floquet topology: SSH winding numbers through the driven band structure.

(reference: pyqed/floquet/Floquet.py FloquetBloch:384, winding_number:869)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.floquet import FloquetBloch

def ssh_bloch(v, w):
    def Hk(k, E0=None):
        h = v + w * np.exp(-1j * k)
        return np.array([[0.0, h], [np.conj(h), 0.0]])
    return Hk

for v, w, name in ((1.5, 1.0, "trivial"), (1.0, 1.5, "topological")):
    Hk = ssh_bloch(v, w)
    ks = np.linspace(-np.pi, np.pi, 100, endpoint=False)
    states = []
    for k in ks:
        _, u = np.linalg.eigh(Hk(k))
        states.append(u[:, 0])
    fb = FloquetBloch(lambda k, E: None, 1.0, 1, 2)
    # Zak phase of the lower band in units of pi (= SSH winding number)
    nu = fb.winding_number(0, states=[np.asarray(states)])
    print(f"SSH v={v} w={w} ({name}): winding = {int(round(nu))}")
