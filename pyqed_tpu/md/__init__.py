from .md import LJMD, lj_forces, fcc_lattice
from .rpmd import RPMD, kubo_harmonic_xx

# reference drop-in names (pyqed/md/measure.py:18-48 — that file's
# Measurements/MinimizeEnergy/MonteCarlo/MolecularDynamics are empty
# class skeletons; LJMD carries the real run/minimize/monte_carlo/rdf)
MolecularDynamics = LJMD
MonteCarlo = LJMD
MinimizeEnergy = LJMD
Measurements = LJMD
