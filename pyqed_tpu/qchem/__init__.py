from .mol import Molecule
from .scf import RHF, UHF
from .ci import FCI, CISD, CASCI, slater_condon, spinorb_ints
from .tdscf import TDA, TDHF, CIS
from .dft import RKS, UKS, becke_grid, lda_exc_vxc
from .soc import soc_integrals, soc_matrix, soc_mo
from . import basis
from .dvr import (MoleculeDVR, RHF1D, RHF2D, RKS1D, CASCIDVR,
                  soft_coulomb, exact_2e)
