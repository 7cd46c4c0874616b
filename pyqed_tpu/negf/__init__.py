from .keldysh import (
    NEGF, green_from_H_const, green_from_H, hartree, fock_exchange,
    second_born, KBSolver, volterra_int, fermi, bose,
)
from .gw import G0W0, g0w0, rpa_modes
from .kb2t import KBSolver2T
from .contour import (
    ContourGF, green_equilibrium, green_equilibrium_H, semicircle_dos,
    DOS, volterra_intdiff,
)
from .gwbse import GWBSE
from .rt_tdhf import RTTDHF
from .dmft import DMFT, NoneqDMFT, NoneqDMFTThermal
from . import eph
