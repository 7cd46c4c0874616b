"""Frenkel2 (two excited states per site) and Laguerre-Gauss source.

References: pyqed/models/exciton.py:33, beam scalar sources.
"""
import numpy as np
import jax.numpy as jnp

from pyqed_tpu.models.named import Frenkel2
from pyqed_tpu.beam.beam import ScalarFieldXY, laguerre_gauss_beam


def test_frenkel2_single_site_limit():
    """One site: spectrum of the 3-level H with |1>-|2> coupling."""
    e1, e2, j = 1.0, 1.4, 0.2
    m = Frenkel2([e1, e2], [j, 0.0], nsites=1)
    w = np.sort(np.linalg.eigvalsh(np.asarray(m.H)))
    hm = np.array([[e1, j], [j, e2]])
    exact = np.sort(np.concatenate([[0.0], np.linalg.eigvalsh(hm)]))
    assert np.allclose(w, exact, atol=1e-12)


def test_frenkel2_dimer_excitation_number_conserved():
    """H commutes with the total excitation number (no J-coupling to
    ground): single-excitation block reproduces the 4x4 site model."""
    e1, e2, inter, intra = 1.0, 1.3, 0.15, 0.1
    m = Frenkel2([e1, e2], [inter, intra], nsites=2)
    H = np.asarray(m.H)
    # total number operator
    N = sum(np.asarray(l.conj().T @ l) for l in m.lowering_ops)
    assert np.max(np.abs(H @ N - N @ H)) < 1e-12
    # single-excitation subspace: states |1>_i, |2>_i, i=1,2
    evals = np.linalg.eigvalsh(H)
    h1 = np.array([
        [e1, inter, 0.0, intra],
        [inter, e2, 0.0, 0.0],
        [0.0, 0.0, e1, inter],
        [intra, 0.0, inter, e2]])
    ex1 = np.linalg.eigvalsh(h1)
    for e in ex1:
        assert np.min(np.abs(evals - e)) < 1e-10


def test_laguerre_gauss_orbital_angular_momentum():
    """LG_{0,l}: phase winds 2 pi l around the axis; intensity has a
    null at the center (vortex core)."""
    n = 129   # odd: grid contains the axis point x = y = 0
    x = np.linspace(-4, 4, n)
    f = ScalarFieldXY(x, x, wavelength=0.6)
    for l in (1, 2):
        laguerre_gauss_beam(f, w0=1.0, l=l)
        u = np.asarray(f.u)
        # vortex core dark
        assert abs(u[n // 2, n // 2]) < 1e-10
        # phase winding on a ring
        theta = np.linspace(0, 2 * np.pi, 200, endpoint=False)
        ix = np.clip(((1.0 * np.cos(theta) + 4) / 8 * (n - 1)).astype(int),
                     0, n - 1)
        iy = np.clip(((1.0 * np.sin(theta) + 4) / 8 * (n - 1)).astype(int),
                     0, n - 1)
        ph = np.unwrap(np.angle(u[ix, iy]))
        winding = (ph[-1] - ph[0] + (ph[1] - ph[0])) / (2 * np.pi)
        assert abs(winding - l) < 0.1


def test_frenkel2s_matches_full_single_excitation_block():
    """Frenkel2s (single-excitation sector, dim 2n+1; reference
    pyqed/models/exciton.py:100) reproduces the one-exciton eigenvalues
    of the full 3^n-dimensional Frenkel2 Hamiltonian."""
    from pyqed_tpu.models.named import Frenkel2s
    e1, e2, inter, intra = 1.0, 1.3, 0.15, 0.1
    n = 3
    full = Frenkel2([e1, e2], [inter, intra], nsites=n)
    sect = Frenkel2s([e1, e2], [inter, intra], nsites=n)
    assert np.asarray(sect.H).shape == (2 * n + 1, 2 * n + 1)

    Hf = np.asarray(full.H)
    N = sum(np.asarray(l.conj().T @ l) for l in full.lowering_ops)
    w, v = np.linalg.eigh(Hf)
    nexc = np.einsum("ia, ij, ja -> a", v.conj(), N, v).real
    one_exc = np.sort(w[np.abs(nexc - 1.0) < 1e-8])

    ws = np.sort(np.linalg.eigvalsh(np.asarray(sect.H)))
    # drop the ground state (0) from the sector spectrum
    assert np.allclose(ws[1:], one_exc, atol=1e-10)
    # scalar args broadcast like the reference
    m1 = Frenkel2s(1.0, 0.2, nsites=2)
    assert np.allclose(np.asarray(m1.H), np.asarray(m1.H).T)
