from .mps import (
    MPS, MPO, DMRG, two_site_dmrg, tebd,
    mpo_nearest_neighbor, mpo_tfim, mpo_heisenberg,
)
from .tdvp import TDVP, TDVP2
from .autompo import (autoMPO, autompo_fermion, hubbard_mpo,
                      spinful_to_sites, DMRGElectronicDVR)
from .chemps import (mpo_from_product_terms, qc_mpo, spin_orbital_terms,
                     number_mpo, DMRGQC)
from .vibronic import VibronicMPS, lvc_mpo
from .ttals import tt_svd, tt_als, tt_to_dense, tt_eval, tt_rank
from .ttspo import TT_LDR, tt_compress, tt_norm, tt_inner, hadamard_apply, \
    mpo_apply
from .ncon import ncon
