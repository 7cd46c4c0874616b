"""Optimal control and differentiable parameter fitting.

Beyond-parity module: the reference (ShuoyiHU/pyqed) has no optimal-control
or inverse-design layer — its numpy/torch solvers are not differentiable.
Every pyqed_tpu solver is a pure JAX program, so gradients of any dynamical
observable with respect to pulse shapes, Hamiltonian parameters, or bath
parameters come for free.  This package turns that into user-facing tools:

- ``GRAPE``       — piecewise-constant pulse optimization (closed system:
                    state transfer and gate synthesis).
- ``OpenGRAPE``   — the same in Liouville space (Lindblad dissipation).
- ``CRAB``        — chopped-random-basis parametrization (few Fourier
                    coefficients instead of per-step amplitudes).
- ``fit``         — generic gradient fit of any scalar loss built from
                    pyqed_tpu dynamics (spectroscopy fitting, Hamiltonian
                    learning, bath-parameter extraction).
"""
from .grape import GRAPE, OpenGRAPE, CRAB, amplitude_penalty, smoothness_penalty
from .krotov import Krotov
from .fit import fit, fit_exponential_decay
