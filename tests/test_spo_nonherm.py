"""Non-Hermitian split-operator (grid/spo.py::SPO2NH, SPON nonherm=True).

Reference: pyqed/wpd.py:921 SPO2NH (per-point biorthogonal eig); ours
builds exp(-iV dt) by vmapped expm — pinned against a NumPy/SciPy
transcription of the reference algorithm and against the Hermitian path.
"""
import numpy as np
import scipy.linalg
import jax.numpy as jnp

from pyqed_tpu.grid.spo import SPO2, SPO2NH


def _grids(n=24):
    x = np.linspace(-6, 6, n, endpoint=False)
    y = np.linspace(-6, 6, n, endpoint=False)
    return x, y


def _vmat(X, Y, gamma):
    ns = 2
    v = np.zeros((*X.shape, ns, ns), complex)
    v[..., 0, 0] = 0.5 * (X ** 2 + Y ** 2)
    v[..., 1, 1] = 0.5 * ((X - 0.5) ** 2 + Y ** 2) + 1.0 - 1j * gamma
    v[..., 0, 1] = v[..., 1, 0] = 0.2 * np.exp(-(X ** 2 + Y ** 2))
    return v


def _psi0(X, Y, dvol=1.0):
    psi = np.zeros((*X.shape, 2), complex)
    psi[..., 1] = np.exp(-(X - 0.5) ** 2 - Y ** 2)
    psi /= np.linalg.norm(psi) * np.sqrt(dvol)
    return psi


def _np_reference(x, y, v, psi0, dt, nt, masses=(1.0, 1.0)):
    """Reference-shaped Strang loop with pointwise scipy expm."""
    nx, ny = len(x), len(y)
    kx = 2 * np.pi * np.fft.fftfreq(nx, x[1] - x[0])
    ky = 2 * np.pi * np.fft.fftfreq(ny, y[1] - y[0])
    KX, KY = np.meshgrid(kx, ky, indexing="ij")
    expK = np.exp(-1j * (KX ** 2 / (2 * masses[0])
                         + KY ** 2 / (2 * masses[1])) * dt)
    expV2 = np.zeros_like(v)
    for i in range(nx):
        for j in range(ny):
            expV2[i, j] = scipy.linalg.expm(-0.5j * dt * v[i, j])
    psi = psi0.copy()
    for _ in range(nt):
        psi = np.einsum("ijab, ijb -> ija", expV2, psi)
        psik = np.fft.fft2(psi, axes=(0, 1))
        psi = np.fft.ifft2(expK[..., None] * psik, axes=(0, 1))
        psi = np.einsum("ijab, ijb -> ija", expV2, psi)
    return psi


def test_spo2nh_matches_reference_loop():
    x, y = _grids()
    X, Y = np.meshgrid(x, y, indexing="ij")
    v = _vmat(X, Y, gamma=0.4)
    psi0 = _psi0(X, Y)
    dt, nt = 0.02, 10

    sol = SPO2NH(x, y, masses=[1.0, 1.0], nstates=2)
    psi0 = _psi0(X, Y, dvol=sol.dvol)
    sol.set_dpes(v)
    r = sol.run(jnp.asarray(psi0), dt=dt, nt=nt, nout=nt)
    ref = _np_reference(x, y, v, psi0, dt, nt)
    assert np.max(np.abs(np.asarray(r.psi) - ref)) < 1e-9
    # norm decays with the resonance width
    assert sol.norm(r.psi) < 1.0 - 1e-4


def test_spo2nh_hermitian_limit_equals_spo2():
    x, y = _grids()
    X, Y = np.meshgrid(x, y, indexing="ij")
    v = _vmat(X, Y, gamma=0.0).real
    psi0 = _psi0(X, Y)
    dt, nt = 0.02, 8

    nh = SPO2NH(x, y, masses=[1.0, 1.0], nstates=2)
    psi0 = _psi0(X, Y, dvol=nh.dvol)
    nh.set_dpes(v.astype(complex))
    r1 = nh.run(jnp.asarray(psi0), dt=dt, nt=nt, nout=nt)

    h = SPO2(x, y, masses=[1.0, 1.0], nstates=2)
    h.set_dpes(v)
    r2 = h.run(jnp.asarray(psi0), dt=dt, nt=nt, nout=nt)
    assert np.max(np.abs(np.asarray(r1.psi) - np.asarray(r2.psi))) < 1e-10
    assert abs(nh.norm(r1.psi) - 1.0) < 1e-10
