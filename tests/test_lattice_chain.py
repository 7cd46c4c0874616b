"""Real-space tight-binding chains (models/lattice.py additions).

Reference: pyqed/lattice/chain.py (its gf/gf_surface are pass stubs —
ours are pinned against closed-form semi-infinite-chain results).
"""
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.models.lattice import (Chain, RiceMele, Lattice2D,
                                      green_renormalization)


def test_chain_spectrum_open():
    """Open chain eigenvalues: E_k = e0 + 2t cos(k pi/(N+1))."""
    N, t, e0 = 12, 0.7, 0.3
    c = Chain(N, e0, t)
    evals, _ = c.run()
    k = np.arange(1, N + 1)
    exact = np.sort(e0 + 2 * t * np.cos(k * np.pi / (N + 1)))
    assert np.allclose(np.asarray(evals), exact, atol=1e-12)


def test_chain_spectrum_periodic():
    N, t = 10, 1.0
    c = Chain(N, 0.0, t, boundary_condition="periodic")
    evals, _ = c.run()
    k = 2 * np.pi * np.arange(N) / N
    exact = np.sort(2 * t * np.cos(k))
    assert np.allclose(np.asarray(evals), exact, atol=1e-12)


def test_surface_gf_semicircle():
    """Sancho-Rubio surface/bulk GF vs closed forms for the 1D chain:
    g_bulk = 1/sqrt((w+i0)^2-4t^2), Im g_surf = -sqrt(4t^2-w^2)/2t^2."""
    t = 1.0
    c = Chain(4, 0.0, t)
    # delta ~ eps_mach^(1/3): the decimation's optimal broadening — smaller
    # delta amplifies roundoff ~ eps/delta^2 at the band center
    for w in (0.0, 0.5, 1.4):
        gb, gs = c.gf_surface(energy=w, delta=1e-5, max_iter=80)
        exact_s = -np.sqrt(4 * t ** 2 - w ** 2) / (2 * t ** 2)
        exact_b = -1.0 / np.sqrt(4 * t ** 2 - w ** 2)
        assert abs(float(gs[0, 0].imag) - exact_s) < 1e-4
        assert abs(float(gb[0, 0].imag) - exact_b) < 1e-4


def test_chain_ldos_matches_gf():
    c = Chain(8, 0.0, 1.0)
    w = np.linspace(-3, 3, 11)
    G = c.gf(w, eta=0.05)
    ld = c.ldos(w, eta=0.05, site=0)
    assert np.allclose(np.asarray(ld),
                       -np.asarray(G)[:, 0, 0].imag / np.pi, atol=1e-12)
    # sum rule: integral of full DOS = N states
    wfine = np.linspace(-6, 6, 2001)
    Gf = np.asarray(c.gf(wfine, eta=0.05))
    dos = -np.trace(Gf.imag, axis1=1, axis2=2) / np.pi
    assert abs(np.trapezoid(dos, wfine) - c.size) < 0.1  # Lorentzian tails


def test_ricemele_ssh_edge_states():
    """Topological SSH limit (v < w): two midgap edge modes."""
    m = RiceMele(0.2, 1.0, nsites=40)
    m.buildH()
    evals = np.linalg.eigvalsh(np.asarray(m.H))
    n_midgap = int(np.sum(np.abs(evals) < 0.1))
    assert n_midgap == 2
    # trivial limit: no midgap states
    m2 = RiceMele(1.0, 0.2, nsites=40)
    m2.buildH()
    evals2 = np.linalg.eigvalsh(np.asarray(m2.H))
    assert int(np.sum(np.abs(evals2) < 0.1)) == 0
    # band structure closed form
    bands = np.asarray(m.band_structure(np.array([0.0, np.pi / 2])))
    assert abs(bands[0, 1] - abs(0.2 + 1.0)) < 1e-12


def test_lattice2d_square_spectrum():
    """Periodic square lattice == 2D cosine band."""
    nx = ny = 6
    lat = Lattice2D(size=(nx, ny), norb=1)
    lat.set_hop(1.0, 0, 0, [1, 0], boundary_condition="periodic")
    lat.set_hop(1.0, 0, 0, [0, 1], boundary_condition="periodic")
    evals, _ = lat.solve()
    kx = 2 * np.pi * np.arange(nx) / nx
    ky = 2 * np.pi * np.arange(ny) / ny
    KX, KY = np.meshgrid(kx, ky)
    exact = np.sort((2 * np.cos(KX) + 2 * np.cos(KY)).ravel())
    assert np.allclose(np.sort(np.asarray(evals)), exact, atol=1e-10)


def test_ricemele_position_shape():
    """Regression: position() must match the Hamiltonian dimension."""
    m = RiceMele(0.2, 1.0, nsites=10)
    m.buildH()
    P = np.asarray(m.position())
    assert P.shape == np.asarray(m.H).shape
    assert np.allclose(np.diag(P), np.arange(10) // 2 + 1)


def test_lattice2d_periodic_two_cell_guard():
    """Regression: 2-cell periodic wrap must not double the bond
    (Chain's nsite > 2 convention)."""
    lat = Lattice2D(size=(2, 1), norb=1)
    lat.set_hop(1.0, 0, 0, [1, 0], boundary_condition="periodic")
    H = np.asarray(lat.buildH())
    assert abs(H[0, 1] - 1.0) < 1e-14
