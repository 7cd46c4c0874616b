from .mps import (
    MPS, MPO, DMRG, two_site_dmrg, tebd,
    mpo_nearest_neighbor, mpo_tfim, mpo_heisenberg,
)
