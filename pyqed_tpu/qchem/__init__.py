from .mol import Molecule
from .scf import RHF
from .ci import FCI, CISD, CASCI, slater_condon, spinorb_ints
from .tdscf import TDA, TDHF, CIS
from . import basis
from .scf import UHF
