"""pyqed_tpu — a TPU-native framework for molecular quantum electrodynamics,
quantum dynamics, and nonlinear spectroscopy.

Built from scratch in JAX/XLA/Pallas with the capabilities of the pyqed
reference (see SURVEY.md). The public surface deliberately mirrors the
reference's flat namespace (reference: pyqed/__init__.py:1-15 star-imports)
but with explicit exports.
"""

__version__ = "0.1.0"

from . import units
from .units import *  # noqa: F401,F403 — constants namespace, like the reference
from .config import use_x64, default_complex, default_real

from .ops import *  # noqa: F401,F403
from .core import Result, load_result
from .models import (
    Mol, SESolver, mls, tdse,
    Pulse, GaussianPulse, ChirpedPulse, Biphoton, intensity_to_field,
)
from .models.cavity import Cavity, Composite, Polariton
from .models.lvc import LVC
from .grid import SPO, SPO2, SPO3, SPON, LDRN
from .grid import SincDVR, SineDVR, HermiteDVR, ExponentialDVR
from .ops.linalg import sort_eig as sort   # reference: pyqed/phys.py:554
from .open import (
    LindbladSolver, LiouvilleSolver, RedfieldSolver, HEOMSolver,
    HEOMSolverDrude, DrudeBath, OhmicBath, OQS,
)
from . import signal
from . import floquet
from . import parallel
from . import utils
from . import qchem
from . import qmc
from . import negf
from . import tn
from . import md
from . import ml
from . import beam
from . import control

# reference top-level drop-ins (`from pyqed import X` surface): plotting
# helpers (pyqed/style.py), pulse/biphoton utilities (pyqed/optics.py),
# phys.py conveniences — all real implementations living in their
# natural submodules, re-exported here for name parity
from .utils.style import (
    set_style, subplots, curve, matplot, imshow, level_scheme,
    two_scales, surf, plot_surface, plot_surfaces, export, read_result,
)
from .models.pulse import (
    Analyser, schmidt_decompose, schmidt_number, hom_schmidt,
    field_to_intensity, fwhm_to_std, std_to_fwhm,
)
from .models.mol import quantum_dynamics, driven_dynamics
from .models.named import Frenkel, Frenkel2, Frenkel2s, Frenkel2_s
from .models.cavity import QRM
from .ops.operators import (
    lowering, raising, multi_spin, norm2, is_positive_def,
    direct_product, jacobi_anger, propagator, propagator_H_const,
)
from .ops.superoperator import liouvillian
from .open.lindblad import driven_dissipative_dynamics
from .grid import ChebDVR
