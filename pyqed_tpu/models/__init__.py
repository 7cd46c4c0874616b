from .mol import Mol, SESolver, mls, tdse
from .pulse import (
    Pulse, GaussianPulse, ChirpedPulse, Biphoton, intensity_to_field,
    std_to_fwhm, jsa, jta, rdm, hom,
)
