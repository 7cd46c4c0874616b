from .qip import (
    reduce_dm, vn_entropy, mutual_info, purity, concurrence, tracedist,
    hilbert_dist, fidelity, hadamard,
)
from .noise import cnoise, autocorrelation
from .wigner import wigner, spectrogram, wvd
from .nonherm import eig as nonherm_eig, diabatic_to_adiabatic
from .io import write_cube, read_cube
from . import style
