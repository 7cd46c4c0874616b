from .mol import Molecule
from .scf import RHF, UHF
from .ci import FCI, CISD, CASCI, slater_condon, spinorb_ints
from .tdscf import TDA, TDHF, CIS
from . import basis
from .dvr import (MoleculeDVR, RHF1D, RHF2D, RKS1D, CASCIDVR,
                  soft_coulomb, exact_2e)
