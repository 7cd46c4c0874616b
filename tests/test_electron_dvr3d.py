"""3D real-space one-electron molecular solver (qchem/dvr.py::ElectronDVR3D).

Reference: pyqed/qchem/sg.py:40 DVRn (scipy-sparse 3D Hamiltonian +
Lanczos); ours is matrix-free Davidson over per-dimension tensordots.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from pyqed_tpu.qchem.dvr import ElectronDVR3D


@pytest.mark.slow
def test_davidson_matches_dense_small_grid():
    sol = ElectronDVR3D([(1.0, (0, 0, 0))], [(-6, 6)] * 3, [13] * 3,
                        soft=0.5)
    E = sol.run(neig=1, tol=1e-9)
    Hd = np.asarray(sol.grid.hamiltonian_dense(np.asarray(sol.Vg)))
    w = np.linalg.eigvalsh(Hd)[0]
    assert abs(float(E[0]) - w) < 1e-8


@pytest.mark.slow
def test_hydrogen_soft_coulomb_ground_state():
    """H atom, soft Coulomb: bound ground state near -0.5 hartree."""
    sol = ElectronDVR3D([(1.0, (0, 0, 0))], [(-9, 9)] * 3, [27] * 3,
                        soft=0.3)
    E = sol.run(neig=1, tol=1e-7)
    assert -0.55 < float(E[0]) < -0.30


def test_h2plus_binding():
    """H2+ at R=2: total energy below the H-atom energy (chemical bond)."""
    grid = dict(domains=[(-9, 9)] * 3, nxs=[27] * 3, soft=0.3)
    h = ElectronDVR3D([(1.0, (0, 0, 0))], **grid)
    Eh = float(h.run(neig=1, tol=1e-7)[0])
    R = 2.0
    h2p = ElectronDVR3D([(1.0, (-R / 2, 0, 0)), (1.0, (R / 2, 0, 0))],
                        **grid)
    E2 = float(h2p.run(neig=1, tol=1e-7)[0]) + 1.0 / R
    assert E2 < Eh                      # bonding
    assert h2p.energy_nuc() == 1.0 / R
    # gerade symmetry of the ground state
    psi = np.asarray(h2p.mo_coeff[:, 0]).reshape(27, 27, 27)
    assert np.max(np.abs(psi - psi[::-1])) < 1e-4 * np.max(np.abs(psi))


@pytest.mark.slow
def test_total_energy_aufbau():
    sol = ElectronDVR3D([(2.0, (0, 0, 0))], [(-6, 6)] * 3, [15] * 3,
                        soft=0.5)
    sol.run(neig=1, tol=1e-8)
    e1 = sol.total_energy(nelec=1)
    e2 = sol.total_energy(nelec=2)
    assert abs(e2 - 2 * e1) < 1e-10    # independent electrons, same orbital


def test_vibrational_dvr3d_anisotropic_ho():
    """3-mode vibrational solver (reference Triatomic shell made real):
    anisotropic HO levels to 1e-3."""
    from pyqed_tpu.grid.nusol import VibrationalDVR3D

    def pes(x, y, z):
        return 0.5 * (x ** 2 + 1.5 ** 2 * y ** 2 + 2.0 ** 2 * z ** 2)

    sol = VibrationalDVR3D(pes, [1.0, 1.0, 1.0], [(-7, 7)] * 3, [21] * 3)
    E = np.asarray(sol.run(neig=4))
    exact = np.array([2.25, 3.25, 3.75, 4.25])
    assert np.max(np.abs(E - exact)) < 1e-3


def test_vibrational_dvr3d_coupled_modes():
    """Bilinear mode coupling: exact normal-mode ZPE from the coupled
    Hessian eigenfrequencies."""
    from pyqed_tpu.grid.nusol import VibrationalDVR3D

    k = 0.3

    def pes(x, y, z):
        return 0.5 * (x ** 2 + y ** 2 + z ** 2) + k * x * y

    sol = VibrationalDVR3D(pes, [1.0, 1.0, 1.0], [(-8, 8)] * 3, [21] * 3)
    E0 = float(np.asarray(sol.run(neig=1))[0])
    # normal modes: omega^2 = 1 +- k, 1
    zpe = 0.5 * (np.sqrt(1 + k) + np.sqrt(1 - k) + 1.0)
    assert abs(E0 - zpe) < 1e-3
