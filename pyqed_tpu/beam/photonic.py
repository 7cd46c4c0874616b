"""Photonic structure tools: transfer matrices, quasinormal modes, and
1D dyadic Green's functions of layered media.

TPU-native counterpart of the reference photonics stubs
(reference: pyqed/qnm.py:10-73 — transfer-matrix quasinormal modes
(``propagation``, ``interface``, ``single_layer``, ``resonance``);
pyqed/dgf/propagator.py:199-365 — multilayer dyadic Green's function via
the Dyson equation; both are partially implemented there and completed
here).

Transfer matrices batch over frequency with vmap; the Dyson equation is a
dense linear solve on the MXU.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


# --------------------------------------------------------- transfer matrix

def propagation(omega, n, l, c=1.0):
    """Phase propagation matrix through thickness l of index n
    (reference: pyqed/qnm.py:15). For complex omega (QNM search) the
    backward wave uses 1/phase, which equals conj(phase) on the real axis.
    """
    # e^{-i omega t} time convention: rightward wave e^{+i k z}; with this
    # sign the transmission poles (QNMs) sit in the lower half plane
    phase = jnp.exp(1j * omega * l * n / c)
    z = jnp.zeros_like(phase)
    return jnp.stack([jnp.stack([phase, z]), jnp.stack([z, 1.0 / phase])])


def interface(n1, n2):
    """Fresnel interface matrix (normal incidence)
    (reference: pyqed/qnm.py:24)."""
    eta = n1 / n2
    return 0.5 * jnp.array([[1.0 + eta, 1.0 - eta],
                            [1.0 - eta, 1.0 + eta]])


def transfer_matrix(omega, ns: Sequence, ls: Sequence, n_in=1.0, n_out=1.0,
                    c=1.0):
    """Total transfer matrix of a stack: n_in | n1(l1) | ... | n_out."""
    M = jnp.eye(2, dtype=complex)
    prev = n_in
    for n, l in zip(ns, ls):
        M = propagation(omega, n, l, c) @ interface(prev, n) @ M
        prev = n
    M = interface(prev, n_out) @ M
    return M


def rt_coefficients(omega, ns, ls, n_in=1.0, n_out=1.0, c=1.0):
    """(r, t) amplitude coefficients from the transfer matrix."""
    M = transfer_matrix(omega, ns, ls, n_in, n_out, c)
    # fields (E+, E-): out = M in; no backward wave on output side
    t = M[0, 0] - M[0, 1] * M[1, 0] / M[1, 1]
    r = -M[1, 0] / M[1, 1]
    return r, t


def transmittance_spectrum(omegas, ns, ls, n_in=1.0, n_out=1.0, c=1.0):
    """|t|^2 over a frequency grid — one vmap."""
    def one(w):
        r, t = rt_coefficients(w, ns, ls, n_in, n_out, c)
        return jnp.abs(t) ** 2
    return jax.vmap(one)(jnp.asarray(omegas, dtype=complex))


def quasinormal_modes(ns, ls, omega_guesses, n_in=1.0, n_out=1.0, c=1.0,
                      maxiter=60):
    """Complex QNM frequencies: zeros of 1/t(omega) (poles of transmission)
    by Newton iteration from real-frequency guesses
    (reference: pyqed/qnm.py:55 ``resonance``).

    Returns complex omegas with Im < 0 (decaying modes)."""
    def inv_t(w):
        M = transfer_matrix(w, ns, ls, n_in, n_out, c)
        return M[1, 1]   # 1/t ~ M11 for unit input

    f = lambda w: inv_t(w)
    df = jax.grad(lambda w: jnp.real(inv_t(w)), holomorphic=False)

    out = []
    for w0 in np.atleast_1d(omega_guesses):
        w = complex(w0)
        for _ in range(maxiter):
            fw = complex(f(jnp.asarray(w)))
            # numeric derivative (complex step not valid for nonholo jax grad)
            h = 1e-6
            dfw = (complex(f(jnp.asarray(w + h))) - fw) / h
            step = fw / dfw
            w = w - step
            if abs(step) < 1e-12:
                break
        out.append(w)
    return np.array(out)


# ---------------------------------------------------- 1D Green's functions

def helmholtz_g0(z1, z2, k):
    """Free 1D Helmholtz Green's function g0 = e^{ik|z-z'|}/(2ik)
    (reference: pyqed/dgf/propagator.py helmholtz)."""
    return jnp.exp(1j * k * jnp.abs(z1 - z2)) / (2j * k)


class Multilayer:
    """1D layered-medium Green's function via the Dyson equation
    (reference: pyqed/dgf/propagator.py:211 ``Multilayer``):

    G = G0 + G0 k^2 chi G  ->  (I - G0 k^2 chi dz) G = G0
    """

    def __init__(self, z, eps, eps0=1.0):
        self.z = np.asarray(z)
        self.nz = len(self.z)
        self.dz = self.z[1] - self.z[0]
        self.eps = jnp.asarray(eps)        # eps(z) profile
        self.eps0 = eps0
        self.chi = self.eps - eps0

    def green0(self, k):
        k0 = k * np.sqrt(self.eps0)
        Z1, Z2 = jnp.meshgrid(jnp.asarray(self.z), jnp.asarray(self.z),
                              indexing="ij")
        return helmholtz_g0(Z1, Z2, k0)

    def G(self, k):
        """Full Green's function by a dense Dyson solve."""
        g0 = self.green0(k)
        A = (jnp.eye(self.nz, dtype=complex)
             - g0 * (k**2 * self.chi)[None, :] * self.dz)
        return jnp.linalg.solve(A, g0)

    def ldos(self, k):
        """Relative local density of states Im G(z, z) / Im G0(z, z)."""
        G = self.G(k)
        g0 = self.green0(k)
        return jnp.imag(jnp.diagonal(G)) / jnp.imag(jnp.diagonal(g0))


# ------------------------------------------------ free-space dyadic GF

def dyadic_G0(R1, R2, lam, eps=1.0):
    """Free-space dyadic Green tensor G(R1, R2) (3, 3), broadcastable
    over leading batch axes of R1/R2 (reference:
    pyqed/dgf/propagator.py:33 ``G0`` — per-pair scalar math there; the
    standard normalization with 1/(4 pi) is used here):

    G = e^{ikr}/(4 pi r) [ (1 + (ikr-1)/(kr)^2) I
                           + (3 - 3ikr - (kr)^2)/(kr)^2  r̂ r̂ ].
    """
    R1 = jnp.asarray(R1, dtype=float)
    R2 = jnp.asarray(R2, dtype=float)
    k = 2 * jnp.pi / lam * jnp.sqrt(eps)
    d = R1 - R2
    r = jnp.sqrt(jnp.sum(d ** 2, axis=-1))[..., None, None]
    rhat = d / jnp.sqrt(jnp.sum(d ** 2, axis=-1))[..., None]
    rr = rhat[..., :, None] * rhat[..., None, :]
    I = jnp.eye(3)
    kr = k * r
    pref = jnp.exp(1j * kr) / (4 * jnp.pi * r)
    A = 1 + (1j * kr - 1) / kr ** 2
    B = (3 - 3j * kr - kr ** 2) / kr ** 2
    return pref * (A * I + B * rr)


def dyadic_Gs_interface(R1, R2, lam, eps1=1.0, eps2=1.0):
    """Quasi-static image-dipole surface Green function for an
    interface at z=0 (observation/source in medium 1, z>0)
    (reference: pyqed/dgf/propagator.py:117 ``Gs123`` image
    construction, reduced to a single interface):
    G_s(R1, R2) = q G0(R1, R2*) M, with R2* the image of the source,
    q = (eps2-eps1)/(eps2+eps1) and M = diag(1, 1, -1) flipping the
    image dipole's z component... applied on the source index."""
    R2 = jnp.asarray(R2, dtype=float)
    img = R2 * jnp.asarray([1.0, 1.0, -1.0])
    q = (eps2 - eps1) / (eps2 + eps1)
    M = jnp.diag(jnp.asarray([1.0, 1.0, -1.0]))
    # image dipole: p* = M p, and the field picks a mirror flip
    return q * dyadic_G0(R1, img, lam, eps1) @ (-M)


def purcell_factor(G_scatt, lam, eps=1.0, orientation=2):
    """Relative decay rate Gamma/Gamma0 = 1 + Im[G_s,nn] / Im[G0,nn(0)]
    with Im G0_nn(r->r) = k/(6 pi) (the standard LDOS identity)."""
    k = 2 * np.pi / lam * np.sqrt(eps)
    g0 = k / (6 * np.pi)
    return 1.0 + float(jnp.imag(G_scatt[orientation, orientation])) / g0


def dyadic_Gs_slab(R1, R2, lam, eps1=1.0, eps2=1.0, eps3=1.0, spacing=1.0,
                   retarded=False):
    """Surface dyadic Green function for a 1-2-3 slab (source and
    observer inside medium 2, interfaces at z = 0 and z = spacing) by
    the method of image dipoles, one reflection per interface
    (reference: pyqed/dgf/propagator.py:117 ``Gs123`` — near-field
    electrostatic images; here written as one batched tensor expression,
    with an optional retarded variant using the full free-space dyadic).

    Static image tensor per interface: S = c_delta * [-(3 rr - I)/r^3] M
    with M = diag(1, 1, -1) acting on the source index, r the vector
    from the image source to the observer, and
    c_delta = (eps_out - eps2)/(eps_out + eps2).
    """
    R1 = jnp.asarray(R1, dtype=float)
    R2 = jnp.asarray(R2, dtype=float)
    cd12 = (eps1 - eps2) / (eps1 + eps2)
    cd23 = (eps3 - eps2) / (eps3 + eps2)
    M = jnp.diag(jnp.asarray([1.0, 1.0, -1.0]))
    flipz = jnp.asarray([1.0, 1.0, -1.0])
    img12 = R2 * flipz                                   # mirror at z=0
    img23 = R2 * flipz + jnp.asarray([0.0, 0.0, 2.0 * spacing])

    if retarded:
        return (cd12 * dyadic_G0(R1, img12, lam, eps2)
                + cd23 * dyadic_G0(R1, img23, lam, eps2)) @ M

    def static(Rimg, cd):
        d = R1 - Rimg
        r2 = jnp.sum(d ** 2, axis=-1)[..., None, None]
        dd = d[..., :, None] * d[..., None, :]
        I = jnp.eye(3)
        S = -(3.0 * dd - I * r2) / r2 ** 2.5
        return cd * S @ M

    return static(img12, cd12) + static(img23, cd23)


def dyadic_G_slab(R1, R2, lam, eps1=1.0, eps2=1.0, eps3=1.0, spacing=1.0,
                  retarded=False):
    """Total near-field dyadic GF inside the slab: homogeneous bulk +
    the two image reflections (reference: pyqed/dgf/propagator.py:165
    ``G``)."""
    return (dyadic_G0(R1, R2, lam, eps2)
            + dyadic_Gs_slab(R1, R2, lam, eps1, eps2, eps3, spacing,
                             retarded=retarded))


class ChiralMultilayer:
    """1D Green's functions of a bi-isotropic (Pasteur) chiral layered
    medium (reference: pyqed/dgf/propagator.py:302 ``ChiralMultilayer``
    — an empty stub there (green0/green are ``pass``); implemented here
    for real).

    Constitutive relations D = eps0 eps E + i kappa/c H,
    B = mu0 mu H - i kappa/c E make the two circular polarizations
    exact eigenmodes with refractive indices n± = sqrt(eps mu) ± kappa;
    in 1D they decouple, so the Green function is diagonal in the
    circular basis with per-handedness Helmholtz kernels, and a
    chirality/permittivity profile enters through a per-handedness
    Dyson solve (same scheme as :class:`Multilayer`).
    """

    def __init__(self, z, eps, kappa, mu=1.0, eps0=1.0, kappa0=0.0):
        self.z = np.asarray(z)
        self.nz = len(self.z)
        self.dz = self.z[1] - self.z[0]
        eps = jnp.broadcast_to(jnp.asarray(eps, dtype=complex), (self.nz,))
        kap = jnp.broadcast_to(jnp.asarray(kappa, dtype=complex), (self.nz,))
        self.n = jnp.stack([jnp.sqrt(eps * mu) + kap,
                            jnp.sqrt(eps * mu) - kap])      # (2, nz): +,-
        self.n0 = (np.sqrt(eps0 * mu) + kappa0,
                   np.sqrt(eps0 * mu) - kappa0)

    def green0(self, k):
        """(2, nz, nz): circular-basis background kernels g±."""
        Z1, Z2 = jnp.meshgrid(jnp.asarray(self.z), jnp.asarray(self.z),
                              indexing="ij")
        return jnp.stack([helmholtz_g0(Z1, Z2, k * self.n0[0]),
                          helmholtz_g0(Z1, Z2, k * self.n0[1])])

    def green(self, k):
        """Full (2, nz, nz) Green function: per-handedness Dyson solve
        with susceptibility chi± = n±(z)^2 - n0±^2."""
        g0 = self.green0(k)
        out = []
        for s in range(2):
            chi = self.n[s] ** 2 - self.n0[s] ** 2
            A = (jnp.eye(self.nz, dtype=complex)
                 - g0[s] * (k ** 2 * chi)[None, :] * self.dz)
            out.append(jnp.linalg.solve(A, g0[s]))
        return jnp.stack(out)

    G = green

    def optical_rotation(self, k, L=None):
        """Polarization-plane rotation across the slab,
        theta = k * integral (n+ - n-)/2 dz (homogeneous limit:
        k (n+ - n-) L / 2)."""
        dn = jnp.real(self.n[0] - self.n[1])
        return float(0.5 * k * jnp.sum(dn) * self.dz)
