from .spo import SPO, SPO2, SPO3, SPON, ResultSPO
from .dvr import (
    SincDVR, SineDVR, HermiteDVR, ExponentialDVR, DVRN, DVR2, kinetic,
)
from .ldr import LDRN, LDR2, ResultLDR
from .scattering import LippmannSchwingerSolver, LippmannSchwinger2DSolver
from .qtraj import QT, lqf, ResultQT
