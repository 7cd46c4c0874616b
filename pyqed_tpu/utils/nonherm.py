"""Non-Hermitian eigen-decompositions and representations.

TPU-native counterpart of the reference non-Hermitian utilities
(reference: pyqed/nonherm.py — ``eig:26`` (biorthogonal left/right),
``diabatic_to_adiabatic:129``; pyqed/signal/nonhermitian.py —
``linear_absorption:23``).

The non-Hermitian ``eig`` runs on host LAPACK (no TPU eig); everything
downstream is device contractions.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def eig(a, norm=False):
    """Biorthogonal eigen-decomposition A R_n = E_n R_n with L_m R_n =
    delta_mn via inversion (reference: pyqed/nonherm.py:26).

    Returns (evals, U1, U2) with U2 = U1^{-1} (rows are left eigvecs)."""
    import scipy.linalg
    evals, U1 = scipy.linalg.eig(np.asarray(a))
    idx = np.argsort(evals.real)
    evals, U1 = evals[idx], U1[:, idx]
    U2 = scipy.linalg.inv(U1)
    if norm:
        nrm = np.einsum("na, an -> n", U2, U1)
        return jnp.asarray(evals), jnp.asarray(U1), jnp.asarray(U2), \
            jnp.asarray(nrm)
    return jnp.asarray(evals), jnp.asarray(U1), jnp.asarray(U2)


def diabatic_to_adiabatic(v, ndim=1):
    """Pointwise diagonalization of a (possibly complex-symmetric) diabatic
    potential matrix stack (reference: pyqed/nonherm.py:129).

    v: (..., ns, ns). Returns (apes (..., ns), U (..., ns, ns)).
    Hermitian input uses batched eigh on-device; complex non-Hermitian
    falls back to host eig per point.
    """
    v = np.asarray(v)
    shape = v.shape[:-2]
    ns = v.shape[-1]
    vflat = v.reshape(-1, ns, ns)
    if np.allclose(vflat, np.conj(np.swapaxes(vflat, -1, -2))):
        w, u = jnp.linalg.eigh(jnp.asarray(vflat))
        return (jnp.reshape(w, shape + (ns,)),
                jnp.reshape(u, shape + (ns, ns)))
    import scipy.linalg
    ws, us = [], []
    for m in vflat:
        w, u = scipy.linalg.eig(m)
        idx = np.argsort(w.real)
        ws.append(w[idx])
        us.append(u[:, idx])
    return (jnp.asarray(np.array(ws)).reshape(shape + (ns,)),
            jnp.asarray(np.array(us)).reshape(shape + (ns, ns)))


def linear_absorption(omegas, mol=None, evals=None, dip=None, psi0_weight=None):
    """Absorption from a non-Hermitian Hamiltonian's complex eigenvalues
    (reference: pyqed/signal/nonhermitian.py:23):

    S(w) = -Im sum_n |mu_n0|^2 / (w - E_n),  Im E_n < 0.
    """
    if mol is not None:
        H = mol.get_nonhermH()
        evals, U1, U2 = eig(H)
        mu = mol.edip_rms
        # transition moments in biorthogonal basis
        dip = jnp.einsum("a, an -> n", jnp.asarray(mu)[0, :], U1) \
            * jnp.einsum("na, a -> n", U2, jnp.asarray(mu)[:, 0])
    omegas = jnp.asarray(omegas)
    evals = jnp.asarray(evals)
    amp = jnp.asarray(dip)
    denom = omegas[:, None] - evals[None, :]
    return -jnp.imag(jnp.sum(amp[None, :] / denom, axis=1))
