"""Path-integral Monte Carlo: harmonic oscillator at finite temperature.

Walker-parallel PIMC (reference: pyqed/qmc/PIMC/pimc.py:138); the
virial/thermodynamic estimators converge to E = (w/2) coth(beta w / 2).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from pyqed_tpu.qmc.pimc import PIMC

beta = 2.0
pimc = PIMC(lambda x: 0.5 * x ** 2, beta=beta, nbeads=64)
ev, et, acc, _ = pimc.run(0, npaths=2048, nsweeps=1200, ntherm=500)
E_exact = 0.5 / np.tanh(0.5 * beta)
print(f"PIMC virial estimator:  {ev:.4f}")
print(f"PIMC thermo estimator:  {et:.4f}")
print(f"exact (coth formula):   {E_exact:.4f}   acceptance {acc:.2f}")
