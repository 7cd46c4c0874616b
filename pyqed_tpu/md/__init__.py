from .md import LJMD, lj_forces, fcc_lattice
