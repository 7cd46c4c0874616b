"""Discrete variable representations (DVR).

TPU-native counterpart of the reference DVR family
(reference: pyqed/dvr/dvr_1d.py — ``DVR:142`` base with analytic test suite,
``SincDVR:328``, ``ExponentialDVR:443``, ``SineDVR:556`` (``t:632``,
``expT:683``, ``fbr2dvr:712``), ``HermiteDVR:797``, ``BesselDVR:868``;
pyqed/dvr/dvr_2d.py — ``DVRN:32``).

Kinetic matrices are built with vectorized index algebra (the reference's
formulas, identically); eigenproblems are dense ``eigh`` on the MXU. The
N-dimensional direct-product ``DVRN`` applies per-dimension kinetic matrices
as batched tensor contractions instead of forming the full product-space
Hamiltonian when used for dynamics.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


class DVRBase:
    """Shared machinery (reference: pyqed/dvr/dvr_1d.py:142)."""

    x: np.ndarray
    npts: int

    def v(self, V):
        vx = V(self.x) if callable(V) else np.asarray(V)
        return jnp.diag(jnp.asarray(vx))

    def h(self, V):
        return jnp.asarray(self.t()) + self.v(V)

    def run(self, V=None, num_eigs=5, **kwargs):
        """Eigenvalues/vectors of T + V (reference: pyqed/dvr/dvr_1d.py:196).

        Always dense eigh (MXU); num_eigs selects the lowest subset.
        """
        if V is None:
            V = self.potential
        H = self.h(V)
        E, U = jnp.linalg.eigh(H)
        self.eigvals, self.eigvecs = E, U
        self.potential = V
        if num_eigs is not None and num_eigs < H.shape[0]:
            return E[:num_eigs], U[:, :num_eigs]
        return E, U

    def dvr2fbr(self, A, T):
        return T @ A @ T.T

    def fbr2dvr_mat(self, A, T):
        return T.T @ A @ T

    # ---- analytic self-tests (reference: pyqed/dvr/dvr_1d.py:240-327) ----
    def sho_test(self, k=1.0, num_eigs=5):
        E, _ = self.run(lambda x: 0.5 * k * x**2, num_eigs=num_eigs)
        exact = np.sqrt(k) * (np.arange(num_eigs) + 0.5)
        return np.asarray(E[:num_eigs]), exact

    def morse_test(self, D=3.0, a=0.5, num_eigs=5):
        E, _ = self.run(lambda x: D * (1 - np.exp(-a * x)) ** 2 - 0 * x,
                        num_eigs=num_eigs)
        w0 = a * np.sqrt(2 * D)
        n = np.arange(num_eigs)
        exact = w0 * (n + 0.5) - (w0 * (n + 0.5)) ** 2 / (4 * D)
        return np.asarray(E[:num_eigs]), exact


class SincDVR(DVRBase):
    """Sinc DVR on x0 ± L/2 (reference: pyqed/dvr/dvr_1d.py:328)."""

    def __init__(self, L, npts, x0=0.0, mass=1.0):
        self.npts = npts
        self.L = L
        self.a = self.dx = L / npts
        self.x0 = x0
        self.n = np.arange(npts)
        self.x = x0 + self.n * self.a - L / 2.0
        self.w = np.ones(npts) * self.a
        self.k_max = np.pi / self.a
        self.mass = mass
        self.potential = None

    def t(self, hc=1.0, mc2=None):
        mc2 = mc2 if mc2 is not None else self.mass
        m = self.n[:, None]
        n = self.n[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            T = 2.0 * (-1.0) ** (m - n) / (m - n) ** 2 / self.a**2
        T[self.n, self.n] = np.pi**2 / 3.0 / self.a**2
        return jnp.asarray(T * 0.5 * hc**2 / mc2)

    def ip(self, hbar=1.0):
        """i*hbar d/dx matrix (reference: pyqed/dvr/dvr_1d.py:383)."""
        m = self.n[:, None]
        n = self.n[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            iP = (-1.0) ** (m - n) / (m - n) / self.a
        iP[self.n, self.n] = 0.0
        return jnp.asarray(iP * hbar)

    def momentum(self):
        return -1j * self.ip()

    def f(self, x=None):
        xm = (self.x if x is None else np.asarray(x))[:, None]
        xn = self.x[None, :]
        return jnp.asarray(np.sinc((xm - xn) / self.a) / np.sqrt(self.a))

    def expT(self, dt):
        """e^{-i T dt} via eigh of the kinetic matrix."""
        T = self.t()
        w, U = jnp.linalg.eigh(T)
        return (U * jnp.exp(-1j * w * dt)) @ U.conj().T


class SineDVR(DVRBase):
    """Sine (particle-in-a-box FBR) DVR on [xmin, xmax]
    (reference: pyqed/dvr/dvr_1d.py:556)."""

    def __init__(self, xmin, xmax, npts, mass=1.0):
        self.npts = npts
        self.xmin, self.xmax = xmin, xmax
        self.L = float(xmax - xmin)
        self.dx = self.L / (npts + 1)
        self.n = np.arange(1, npts + 1)
        self.x = float(xmin) + self.dx * self.n
        self.mass = mass
        self.potential = None
        self.U = None

    def t_fbr(self):
        """FBR kinetic eigenvalues (pi n / L)^2 / 2m
        (reference: pyqed/dvr/dvr_1d.py:625)."""
        return (0.5 / self.mass) * (np.pi / self.L) ** 2 * self.n**2

    def t(self, hc=1.0, mc2=None):
        """(reference: pyqed/dvr/dvr_1d.py:632)."""
        mc2 = mc2 if mc2 is not None else self.mass
        i = self.n[:, None]
        j = self.n[None, :]
        m = self.npts + 1
        with np.errstate(divide="ignore", invalid="ignore"):
            T = ((-1.0) ** (i - j)
                 * (1.0 / np.square(np.sin(np.pi / (2.0 * m) * (i - j)))
                    - 1.0 / np.square(np.sin(np.pi / (2.0 * m) * (i + j)))))
        T[self.n - 1, self.n - 1] = 0.0
        T += np.diag((2.0 * m**2 + 1.0) / 3.0
                     - 1.0 / np.square(np.sin(np.pi * self.n / m)))
        T *= np.pi**2 / 2.0 / self.L**2
        T *= 0.5 * hc**2 / mc2
        return jnp.asarray(T)

    def fbr2dvr(self):
        """U_{j alpha} = sqrt(2/(n+1)) sin(j alpha pi/(n+1))
        (reference: pyqed/dvr/dvr_1d.py:712)."""
        n = self.npts
        U = np.sin(np.outer(self.n, self.n) * np.pi / (n + 1)) * np.sqrt(2.0 / (n + 1))
        self.U = jnp.asarray(U)
        return self.U

    def expT(self, dt):
        """Exact kinetic propagator via the analytic FBR spectrum
        (reference: pyqed/dvr/dvr_1d.py:683)."""
        U = self.fbr2dvr()
        phases = jnp.exp(-1j * dt / (2 * self.mass)
                         * jnp.asarray(self.n) ** 2 * np.pi**2 / self.L**2)
        return jnp.einsum("ia, i, ib -> ab", U.conj(), phases, U)

    def momentum(self):
        """(reference: pyqed/dvr/dvr_1d.py:657)."""
        if self.U is None:
            self.fbr2dvr()
        n = self.n
        with np.errstate(divide="ignore", invalid="ignore"):
            p = ((np.subtract.outer(n, n) % 2)
                 * np.outer(n, n)
                 / np.subtract.outer(n.astype(float) ** 2, n.astype(float) ** 2))
        p[np.isnan(p)] = 0.0
        p = p * (-4j) / self.L
        return jnp.einsum("ia, ij, jb -> ab", self.U.conj(), jnp.asarray(p), self.U)


class HermiteDVR(DVRBase):
    """Gauss-Hermite DVR (reference: pyqed/dvr/dvr_1d.py:797)."""

    def __init__(self, npts, xmax=None, x0=0.0, mass=1.0):
        assert npts < 269, "npts < 269 for stable Hermite roots"
        self.npts = npts
        self.x0 = float(x0)
        self.n = np.arange(npts)
        c = np.zeros(npts + 1)
        c[-1] = 1.0
        self.x = np.polynomial.hermite.hermroots(c)
        self.gamma = 1.0
        self.x = self.x0 + self.x / self.gamma
        self.w = np.exp(-np.square(self.x))
        self.L = self.x.max() - self.x.min()
        self.mass = mass
        self.potential = None

    def t(self, hc=1.0, mc2=None):
        mc2 = mc2 if mc2 is not None else self.mass
        i = self.n[:, None]
        j = self.n[None, :]
        xi = self.x[:, None]
        xj = self.x[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            T = 2.0 * (-1.0) ** (i - j) / (xi - xj) ** 2
        T[self.n, self.n] = 0.0
        T += np.diag((2.0 * self.npts + 1.0 - np.square(self.x)) / 3.0)
        T *= self.gamma
        return jnp.asarray(T * 0.5 * hc**2 / mc2)

    def expT(self, dt):
        T = self.t()
        w, U = jnp.linalg.eigh(T)
        return (U * jnp.exp(-1j * w * dt)) @ U.conj().T


class ExponentialDVR(DVRBase):
    """Periodic (exponential/plane-wave) DVR with N = 2n+1 points
    (reference: pyqed/dvr/dvr_1d.py:443)."""

    def __init__(self, n, L=1.0, x0=0.0, mass=1.0):
        self.npts = self.N = 2 * n + 1
        self.L = L
        self.n = np.arange(self.npts)
        self.x0 = x0
        self.a = L / self.npts
        self.x = x0 + self.n * self.a - L / 2.0
        self.kx = (self.n - n) * 2 * np.pi / L
        self.mass = mass
        self.potential = None

    def t(self, hc=1.0, mc2=None):
        mc2 = mc2 if mc2 is not None else self.mass
        m = self.n[:, None]
        n = self.n[None, :]
        arg = np.pi * (m - n) / self.npts
        with np.errstate(divide="ignore", invalid="ignore"):
            T = 2.0 * (-1.0) ** (m - n) * np.cos(arg) / np.sin(arg) ** 2
        T[self.n, self.n] = (self.npts**2 - 1.0) / 3.0
        T *= (np.pi / self.L) ** 2
        return jnp.asarray(T * 0.5 * hc**2 / mc2)

    def expT(self, dt):
        T = self.t()
        w, U = jnp.linalg.eigh(T)
        return (U * jnp.exp(-1j * w * dt)) @ U.conj().T


def kinetic(x, mass=1.0, dvr="sine"):
    """Kinetic matrix for a uniform grid in the chosen DVR
    (reference: pyqed/dvr helpers)."""
    x = np.asarray(x)
    npts = len(x)
    if dvr == "sine":
        dx = x[1] - x[0]
        d = SineDVR(x[0] - dx, x[-1] + dx, npts, mass=mass)
        return d.t()
    elif dvr == "sinc":
        L = (x[-1] - x[0]) + (x[1] - x[0])
        d = SincDVR(L, npts, x0=(x[0] + x[-1]) / 2, mass=mass)
        return d.t()
    raise ValueError(dvr)


class DVRN:
    """N-dimensional direct-product DVR (reference: pyqed/dvr/dvr_2d.py:32).

    Dynamics/eigen problems use per-dimension kinetic matrices applied as
    batched tensor contractions — the full product Hamiltonian is never
    materialized unless ``dense=True``.
    """

    def __init__(self, dvrs: Sequence):
        self.dvrs = list(dvrs)
        self.ndim = len(dvrs)
        self.nx = [d.npts for d in dvrs]
        self.x = [np.asarray(d.x) for d in dvrs]
        self.ntot = int(np.prod(self.nx))
        self.potential = None

    def hamiltonian_dense(self, V):
        """Full H for eigen-solving (small grids)."""
        Vg = V(*np.meshgrid(*self.x, indexing="ij")) if callable(V) else np.asarray(V)
        H = jnp.diag(jnp.asarray(Vg).reshape(-1))
        for d in range(self.ndim):
            T = jnp.asarray(self.dvrs[d].t())
            eyes = [jnp.eye(n) for n in self.nx]
            eyes[d] = T
            M = eyes[0]
            for e in eyes[1:]:
                M = jnp.kron(M, e)
            H = H + M
        return H

    def run(self, V, num_eigs=5):
        H = self.hamiltonian_dense(V)
        E, U = jnp.linalg.eigh(H)
        self.eigvals, self.eigvecs = E, U
        return E[:num_eigs], U[:, :num_eigs]

    def apply_H(self, psi, Vg):
        """H psi with psi of grid shape — per-dimension contractions."""
        out = jnp.asarray(Vg) * psi
        for d in range(self.ndim):
            T = jnp.asarray(self.dvrs[d].t())
            out = out + jnp.moveaxis(
                jnp.tensordot(T, jnp.moveaxis(psi, d, 0), axes=1), 0, d)
        return out


class DVR2(DVRN):
    """2D convenience wrapper (reference: pyqed/dvr/dvr_2d.py:347)."""

    def __init__(self, dvr_x, dvr_y):
        super().__init__([dvr_x, dvr_y])


def _bessel_zeros(nu, n):
    """First n positive zeros of J_nu for arbitrary real order: integer
    orders via scipy.jn_zeros, nu=1/2 analytically (k pi), otherwise
    Newton from the McMahon asymptotic guess."""
    import scipy.special as sp
    import scipy.optimize
    if float(nu).is_integer():
        return sp.jn_zeros(int(nu), n)
    if abs(nu - 0.5) < 1e-12:
        return np.pi * np.arange(1, n + 1)
    zeros = []
    for k in range(1, n + 1):
        beta = (k + 0.5 * nu - 0.25) * np.pi      # McMahon
        mu = 4 * nu ** 2
        guess = beta - (mu - 1) / (8 * beta)
        z = scipy.optimize.newton(lambda x: sp.jv(nu, x), guess,
                                  fprime=lambda x: sp.jvp(nu, x))
        zeros.append(z)
    return np.asarray(zeros)


class BesselDVR(DVRBase):
    """Bessel (Fourier-Bessel) DVR for radial problems on [0, R] in
    ``dim`` spatial dimensions with angular momentum l
    (reference: pyqed/dvr/dvr_1d.py:868 ``BesselDVR``; note the
    reference's LaguerreDVR/ChebDVR at :1004/:1028 are empty stubs).

    Grid points are scaled zeros of J_nu with nu = l + dim/2 - 1; the
    kinetic matrix is the standard closed form.
    """

    def __init__(self, npts, R, l=0, dim=2, mass=1.0):
        import scipy.special
        assert dim > 1, "dim must be 2 or more"
        self.npts = npts
        self.n = np.arange(npts)
        self.R = R
        self.dim = dim
        self.l = l
        self.mass = mass
        nu = l + dim / 2.0 - 1.0
        self.nu = nu
        self.z = _bessel_zeros(nu, npts)
        self.K = self.z[-1] / R
        self.x = self.z / self.K
        self.potential = None

    def t(self, hc=1.0, mc2=None):
        """(reference: pyqed/dvr/dvr_1d.py:940)."""
        mc2 = mc2 if mc2 is not None else self.mass
        K = self.K
        zi = self.z[:, None]
        zj = self.z[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            T = (8.0 * K ** 2 * (-1.0) ** (self.n[:, None] - self.n[None, :])
                 * zi * zj / (zi ** 2 - zj ** 2) ** 2)
        T[self.n, self.n] = 0.0
        T += np.diag(K ** 2 / 3.0
                     * (1.0 + 2.0 * (self.nu ** 2 - 1.0) / self.z ** 2))
        T *= 0.5 * hc ** 2 / mc2
        return jnp.asarray(T)


class LaguerreDVR(DVRBase):
    """Generalized-Laguerre DVR for radial / half-line problems on
    [0, inf) (reference: pyqed/dvr/dvr_1d.py:1004 ``LaguerreDVR`` — an
    empty ``pass`` stub there; implemented here for real).

    FBR basis: orthonormal Laguerre functions
        chi_n(x) = N_n x^(alpha/2) e^(-x/2) L_n^alpha(x),  n = 0..N-1,
    grid = scaled Gauss-Laguerre-alpha nodes. The DVR unitary
    U_in = sqrt(w_i) N_n L_n^alpha(x_i) is EXACTLY orthogonal (Gauss
    quadrature integrates the degree-(2N-2) products exactly), and the
    kinetic quadratic form T_nm = (1/2m) \\int chi_n' chi_m' dx is also
    evaluated by exact quadrature — no closed-form transcription risk.

    ``alpha=0``: half-line problems with a natural (Neumann-type)
    boundary at 0. ``alpha=2`` (recommended for radial u(r) equations):
    basis vanishes ~x at the origin, enforcing the regular r->0
    behavior of u = r*R. ``scale`` maps the dimensionless mesh to
    physical coordinates, r = scale * x.
    """

    def __init__(self, npts, alpha=0, scale=1.0, mass=1.0):
        import scipy.special as sp
        if not (alpha == 0 or alpha >= 2):
            raise ValueError(
                "alpha must be 0 or >= 2: for 0 < alpha < 2 the kinetic "
                "quadratic form of the Laguerre functions diverges")
        self.npts = N = int(npts)
        self.alpha = float(alpha)
        self.scale = float(scale)
        self.mass = mass
        x, w = sp.roots_genlaguerre(N, self.alpha)
        self._x0 = x                      # dimensionless nodes
        self.x = self.scale * x           # physical grid
        self.w = w
        n = np.arange(N)
        # N_n = sqrt(n! / Gamma(n + alpha + 1)), in log space for stability
        logNn = 0.5 * (sp.gammaln(n + 1) - sp.gammaln(n + self.alpha + 1))
        Nn = np.exp(logNn)
        # DVR transform: U[i, n] = sqrt(w_i) N_n L_n^alpha(x_i)
        L = np.stack([sp.eval_genlaguerre(k, self.alpha, x) for k in n],
                     axis=1)              # (N, N): L[i, k] = L_k(x_i)
        self.U = np.sqrt(w)[:, None] * Nn[None, :] * L
        self.potential = None

    def t(self, hc=1.0, mc2=None):
        import scipy.special as sp
        mc2 = mc2 if mc2 is not None else self.mass
        N, a = self.npts, self.alpha
        n = np.arange(N)
        # quadrature exact for x^(a-2) e^{-x} * poly(deg <= 2N+2):
        M = N + 4
        beta = a - 2.0 if a >= 2 else 0.0
        xq, wq = sp.roots_genlaguerre(M, beta)
        logNn = 0.5 * (sp.gammaln(n + 1) - sp.gammaln(n + a + 1))
        Nn = np.exp(logNn)
        L = np.stack([sp.eval_genlaguerre(k, a, xq) for k in n], axis=0)
        # dL_n^a/dx = -L_{n-1}^{a+1}
        dL = np.stack(
            [np.zeros_like(xq) if k == 0
             else -sp.eval_genlaguerre(k - 1, a + 1, xq) for k in n],
            axis=0)
        if a == 0:
            # chi_n' = N_n e^{-x/2} (L' - L/2); weight folded = e^{-x}
            G = Nn[:, None] * (dL - 0.5 * L)       # (N, M)
            Tfbr = np.einsum("m, nm, km -> nk", wq, G, G)
        else:
            # chi_n' = N_n e^{-x/2} x^{a/2 - 1} [ (a/2) L + x (L' - L/2) ]
            # product = x^{a-2} e^{-x} * P_n(x) P_k(x); weight = x^{a-2} e^{-x}
            P = Nn[:, None] * (0.5 * a * L + xq[None, :] * (dL - 0.5 * L))
            Tfbr = np.einsum("m, nm, km -> nk", wq, P, P)
        Tfbr *= 0.5 * hc ** 2 / (mc2 * self.scale ** 2)
        T = self.U @ Tfbr @ self.U.T
        return jnp.asarray(0.5 * (T + T.T))


class ChebyshevDVR(DVRBase):
    """Chebyshev (second-kind) DVR on y = cos(theta) in [-1, 1]
    (reference: pyqed/dvr/dvr_1d.py:1028 ``ChebDVR`` — an empty ``pass``
    stub there; implemented here for real).

    Grid = Gauss-Chebyshev-II nodes y_i = cos(i pi/(N+1)); FBR basis =
    sin(n theta), n = 1..N (Chebyshev-U polynomials times the half-power
    weight, seen from y). The kinetic operator this DVR represents
    EXACTLY (diagonal in the FBR) is the theta-box operator

        T = -1/(2 I) d^2/dtheta^2,   theta in (0, pi), Dirichlet,

    i.e. a hindered/planar rotor in the angle with potential V(y(theta))
    — eigenvalues n^2/(2 I) for V = 0. ``mass`` is the moment of
    inertia I.
    """

    def __init__(self, npts, mass=1.0):
        N = int(npts)
        self.npts = N
        self.mass = mass        # moment of inertia I
        i = np.arange(1, N + 1)
        self.theta = i * np.pi / (N + 1)
        self.x = np.cos(self.theta)       # grid in y, descending
        n = np.arange(1, N + 1)
        # sine-DVR unitary on the uniform theta grid
        self.U = (np.sqrt(2.0 / (N + 1))
                  * np.sin(np.outer(self.theta, n)))
        self.potential = None

    def t(self, hc=1.0, mc2=None):
        I = mc2 if mc2 is not None else self.mass
        n = np.arange(1, self.npts + 1)
        Tfbr = np.diag(n.astype(float) ** 2)   # exact: -d^2/dtheta^2
        T = self.U @ Tfbr @ self.U.T * (0.5 * hc ** 2 / I)
        return jnp.asarray(0.5 * (T + T.T))


class LegendreDVR(DVRBase):
    """Gauss-Legendre angular DVR on y = cos(gamma) in [-1, 1] for the
    m = 0 bending/angular kinetic operator

        j^2 = -d/dy [ (1 - y^2) d/dy ],

    the operator entering triatomic Jacobi Hamiltonians (see ``SPO3``
    jacobi). FBR basis = orthonormal Legendre polynomials, in which j^2
    is EXACTLY diagonal with eigenvalues l(l+1); grid = Gauss-Legendre
    nodes, so the DVR unitary U_il = sqrt(w_i) P~_l(y_i) is exactly
    orthogonal (quadrature exact to degree 2N-1). ``mass`` is the
    moment of inertia I; ``t()`` returns j^2/(2 I).

    (No reference counterpart — the reference's angular grids go through
    Gauss-Hermite only; this completes the DVR family for bending
    coordinates.)
    """

    def __init__(self, npts, mass=1.0):
        import scipy.special as sp
        N = int(npts)
        self.npts = N
        self.mass = mass
        y, w = np.polynomial.legendre.leggauss(N)
        self.x = y
        self.w = w
        ls = np.arange(N)
        # orthonormal Legendre: P~_l = sqrt((2l+1)/2) P_l
        P = np.stack([np.sqrt((2 * l + 1) / 2.0) * sp.eval_legendre(l, y)
                      for l in ls], axis=1)       # (N, N)
        self.U = np.sqrt(w)[:, None] * P
        self.ls = ls
        self.potential = None

    def j2(self):
        J = self.U @ np.diag((self.ls * (self.ls + 1)).astype(float)) \
            @ self.U.T
        return 0.5 * (J + J.T)

    def t(self, hc=1.0, mc2=None):
        I = mc2 if mc2 is not None else self.mass
        return jnp.asarray(self.j2() * (0.5 * hc ** 2 / I))

ChebDVR = ChebyshevDVR     # reference drop-in name (pyqed/dvr/dvr_1d.py:1028)
SincDVR_PBC = ExponentialDVR   # periodic sinc == exponential DVR (pyqed/dvr/dvr_1d.py)
