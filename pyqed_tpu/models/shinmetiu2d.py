"""2D Shin-Metiu model for proton-coupled electron transfer (PCET).

TPU-native counterpart of the reference's 2D one-electron Shin-Metiu
family (reference: pyqed/models/ShinMetiu.py:289 ``ShinMetiu2``,
``:706`` ``ShinMetiu2InMagneticField``, ``:871``
``ShinMetiu2InElectricField``): one electron on an (x, y) sine-DVR
grid, a mobile proton at 2D position R between two fixed ions at
(±L/2, 0), softened Coulomb interactions V_en = −1/sqrt(a + |r−R|²),
V_nn = 1/sqrt(b + |R1−R2|²) and a (|R|/R0)^4 bounding term.

The reference builds V(x, y) in a per-grid-point double Python loop and
diagonalizes point-by-point with sparse Lanczos; here the potential is
one broadcast meshgrid evaluation and a Born-Oppenheimer scan is ONE
vmapped dense ``eigh`` over the batch of proton positions — the batched
eigendecomposition is where the MXU time goes.

Field variants follow the reference conventions exactly:

- magnetic (Landau gauge, B ∥ z): hcore = T + B·(X ⊗ P_y) and the
  diamagnetic ½B²x² added to the potential
  (reference: pyqed/models/ShinMetiu.py:760-815);
- electric (length gauge, E in the x-y plane): hcore = T + Ex·X + Ey·Y
  with the reference's +(Ex²+Ey²)/2 energy offset
  (reference: pyqed/models/ShinMetiu.py:918-996).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..units import au2tesla
from ..grid.dvr import SineDVR


class ShinMetiu2D:
    """2D Shin-Metiu PCET model (reference: pyqed/models/ShinMetiu.py:289).

    Electron on an (x, y) grid; proton coordinate R = (Rx, Ry).
    """

    def __init__(self, nstates=3, method=None, dvr_type="sine"):
        # method is accepted for reference-signature compatibility
        # (scipy/davidson/exact all map to the one dense-eigh path);
        # a positional reference-style call ShinMetiu2('exact', 3)
        # passes the method string first — shift it over
        if isinstance(nstates, str):
            method, nstates = nstates, (3 if method is None else method)
        if dvr_type != "sine":
            raise NotImplementedError("only dvr_type='sine' (as the "
                                      "reference classes use)")
        self.a = 0.5
        self.b = 10.0
        self.R0 = 3.5
        self.L = 4.0 * np.sqrt(3.0) / 5.0
        self.left = np.array([-self.L / 2.0, 0.0])
        self.right = np.array([+self.L / 2.0, 0.0])
        self.nstates = nstates
        self.x = None
        self.u = None        # adiabatic-state stack set by pes()
        self._T = None       # kinetic (kron) matrix, cached
        self._hcore = None   # field terms beyond T (subclasses)

    # ------------------------------------------------------------- grid
    def create_grid(self, domains, npts=None):
        """domains: [(x0, x1), (y0, y1)]; npts: points per dim (int or
        pair). The grid matches the reference's ``discretize(...,
        endpoints=False)`` (interior sine-DVR points). Also accepts the
        reference argument order ``create_grid(level, domains)`` with
        npts = 2**level - 1 per dim (pyqed/models/ShinMetiu.py:342)."""
        if np.isscalar(domains):            # reference order: (level, domains)
            level, domains = int(domains), npts
            npts = 2 ** level - 1
        if npts is None:
            raise TypeError("create_grid(domains, npts) or "
                            "create_grid(level, domains)")
        if np.isscalar(npts):
            npts = (int(npts), int(npts))
        self.dvr_x = SineDVR(*domains[0], npts[0])
        self.dvr_y = SineDVR(*domains[1], npts[1])
        self.x = np.asarray(self.dvr_x.x)
        self.y = np.asarray(self.dvr_y.x)
        self.nx, self.ny = npts
        self.domains = domains
        self._T = None
        self._hcore = None
        return self.x, self.y

    # ------------------------------------------------------- potentials
    def v_en(self, d2):
        """−1/sqrt(a + |r−R|²), broadcast over squared distances."""
        return -1.0 / jnp.sqrt(self.a + d2)

    def v_nn(self, R1, R2):
        return 1.0 / jnp.sqrt(self.b + jnp.sum((jnp.asarray(R1)
                                                - jnp.asarray(R2)) ** 2))

    def potential_grid(self, R):
        """V(x, y; R) on the full grid in one broadcast evaluation
        (reference loops per point: pyqed/models/ShinMetiu.py:534)."""
        R = jnp.asarray(R, dtype=jnp.float64)
        X = jnp.asarray(self.x)[:, None]
        Y = jnp.asarray(self.y)[None, :]

        def d2(Rc):
            return (X - Rc[0]) ** 2 + (Y - Rc[1]) ** 2

        v = (self.v_en(d2(jnp.asarray(self.left)))
             + self.v_en(d2(jnp.asarray(self.right)))
             + self.v_en(d2(R)))
        v = v + (self.v_nn(R, self.left) + self.v_nn(R, self.right)
                 + self.v_nn(self.left, self.right))
        v = v + (jnp.linalg.norm(R) / self.R0) ** 4
        return v + self._extra_potential(X, Y)

    def _extra_potential(self, X, Y):
        return jnp.zeros(())

    # ------------------------------------------------------ Hamiltonian
    # The reference's base class builds T with ldr.ldr:kinetic(x,
    # dvr='sine'), which uses L = x[-1] - x[0] — the span of the
    # INTERIOR points, not the sine-DVR box length (reference:
    # pyqed/ldr/ldr.py:122 vs dvr_1d.py:556). The field subclasses use
    # the proper SineDVR.t(). Parity mirrors each convention.
    _kinetic_box = False

    def _t1d(self, dvr):
        T = np.asarray(dvr.t())
        if not self._kinetic_box:
            span = dvr.x[-1] - dvr.x[0]          # = L (npts-1)/(npts+1)
            T = T * (dvr.L / span) ** 2
        return T

    def _kinetic(self):
        if self._T is None:
            tx = self._t1d(self.dvr_x)
            ty = self._t1d(self.dvr_y)
            self._T = (np.kron(tx, np.eye(self.ny))
                       + np.kron(np.eye(self.nx), ty))
        return self._T

    def _field_hcore(self):
        """Field terms added to T by subclasses; None for the base."""
        return None

    def hamiltonian(self, R):
        """Dense H(R) on the flattened (x, y) grid."""
        H = jnp.asarray(self._kinetic())
        hf = self._field_hcore()
        if hf is not None:
            H = H + jnp.asarray(hf)
        return H + jnp.diag(self.potential_grid(R).ravel())

    def _energy_offset(self):
        return 0.0

    # ------------------------------------------------------ solvers
    def single_point(self, R, num_eigs=None):
        """BO energies/states at proton position R via dense eigh
        (reference: pyqed/models/ShinMetiu.py:360 per-point Lanczos)."""
        if self.x is None:
            raise ValueError("call create_grid(domains, npts) first")
        w, u = jnp.linalg.eigh(self.hamiltonian(R))
        k = num_eigs or self.nstates
        return (np.asarray(w[:k]) + self._energy_offset(),
                np.asarray(u[:, :k]))

    def pes(self, Rs, num_eigs=None):
        """Batched APES over proton positions: ONE vmapped dense eigh
        (the reference scans a tqdm double loop,
        pyqed/models/ShinMetiu.py:836-860). Returns (E, U) with
        E: (npoints, k), U: (npoints, nx*ny, k)."""
        if self.x is None:
            raise ValueError("call create_grid(domains, npts) first")
        k = num_eigs or self.nstates
        Rs = jnp.asarray(Rs, dtype=jnp.float64)
        self._kinetic()          # build caches eagerly (outside trace)
        self._field_hcore()

        def point(R):
            w, u = jnp.linalg.eigh(self.hamiltonian(R))
            return w[:k], u[:, :k]

        E, U = jax.lax.map(jax.jit(point), Rs, batch_size=8)
        self.u = np.asarray(U)
        return np.asarray(E) + self._energy_offset(), np.asarray(U)

    # ------------------------------------------- derivative couplings
    def dH(self, R):
        """∂H/∂R_mu on the grid (diagonal in r): (a + |r−R|²)^(−3/2)
        (R−r)_mu (reference: pyqed/models/ShinMetiu.py:427)."""
        R = jnp.asarray(R, dtype=jnp.float64)
        X = jnp.asarray(self.x)[:, None]
        Y = jnp.asarray(self.y)[None, :]
        d2 = (X - R[0]) ** 2 + (Y - R[1]) ** 2
        pref = (self.a + d2) ** (-1.5)
        return jnp.stack([pref * (R[0] - X), pref * (R[1] - Y)], axis=-1)

    def nonadiabatic_coupling(self, w, u, R):
        """First-order NACs F_mu^{ba} = <b|∂_mu H|a> / (E_a − E_b)
        (reference: pyqed/models/ShinMetiu.py:460). Returns
        (k, k, 2) with zeros on the diagonal."""
        dv = self.dH(R).reshape(-1, 2)
        u = jnp.asarray(u)
        me = jnp.einsum("ib, im, ia -> bam", u.conj(), dv, u)
        w = jnp.asarray(w)
        dE = w[None, :] - w[:, None]       # E_a - E_b
        safe = jnp.where(jnp.abs(dE) < 1e-12, jnp.inf, dE)
        return np.asarray(me / safe[:, :, None])

    def parallel_transport(self, points):
        """APES + sign-fixed adiabatic states along a path
        (reference: pyqed/models/ShinMetiu.py:553)."""
        wold, uold = self.single_point(points[0])
        E, U = [wold], [uold]
        for point in points[1:]:
            w, u = self.single_point(point)
            # full U(1) phase transport: rotate each eigencolumn so
            # <u_old|u> is real positive (reduces to the reference's
            # sign flip for real states; needed for the complex
            # magnetic-field eigenvectors)
            ov = np.einsum("ij, ij -> j", uold.conj(), u)
            mag = np.abs(ov)
            phase = np.where(mag > 1e-14, ov / np.where(mag > 1e-14,
                                                        mag, 1.0), 1.0)
            u = u * phase.conj()[None, :]
            wold, uold = w, u
            E.append(w)
            U.append(u)
        return np.stack(E), np.stack(U)

    def electronic_overlap(self):
        """A[a, m, c, n] = <u_am | u_cn> between scan points
        (reference: pyqed/models/ShinMetiu.py:580)."""
        if self.u is None:
            raise ValueError("call pes(Rs) first (fills the "
                             "adiabatic-state stack)")
        U = jnp.asarray(self.u)
        return np.asarray(jnp.einsum("aim, cin -> amcn", U.conj(), U))


class ShinMetiu2DMagnetic(ShinMetiu2D):
    """2D Shin-Metiu in a static out-of-plane magnetic field, Landau
    gauge (reference: pyqed/models/ShinMetiu.py:706): the paramagnetic
    B·x·p_y enters hcore, the diamagnetic ½B²x² the potential.

    B is given in Tesla (converted with au2tesla, reference :735)."""

    _kinetic_box = True     # field variants use the true SineDVR box T

    def __init__(self, nstates=3, B=0.0, gauge="landau", method=None,
                 dvr_type="sine"):
        super().__init__(nstates=nstates, method=method,
                         dvr_type=dvr_type)
        if gauge != "landau":
            raise NotImplementedError("only the Landau gauge is "
                                      "implemented (as the reference)")
        self.B = B / au2tesla
        self.gauge = gauge

    @property
    def B(self):
        return self._B

    @B.setter
    def B(self, value):
        """Setting B invalidates the cached field hcore."""
        self._B = float(value)
        self._hcore = None

    def _field_hcore(self):
        if self._hcore is None:
            Py = np.asarray(self.dvr_y.momentum())
            X = np.diag(self.x)
            self._hcore = self.B * np.kron(X, Py)
        return self._hcore

    def _extra_potential(self, X, Y):
        return 0.5 * self.B**2 * X**2 + jnp.zeros_like(Y)


class ShinMetiu2DElectric(ShinMetiu2D):
    """2D Shin-Metiu in a static in-plane electric field, length gauge
    (reference: pyqed/models/ShinMetiu.py:871): hcore += Ex·X + Ey·Y;
    eigenvalues carry the reference's +(Ex²+Ey²)/2 offset
    (reference :996). E = [Ex, Ey] in atomic units (the reference's
    V/Å conversion is commented out; parity keeps au)."""

    _kinetic_box = True     # field variants use the true SineDVR box T

    def __init__(self, nstates=3, E=(0.0, 0.0), method=None,
                 dvr_type="sine"):
        super().__init__(nstates=nstates, method=method,
                         dvr_type=dvr_type)
        self.E = E

    @property
    def E(self):
        return self._E

    @E.setter
    def E(self, value):
        """Setting E invalidates the cached field hcore."""
        self._E = tuple(float(e) for e in value)
        self._hcore = None

    def _field_hcore(self):
        if self._hcore is None:
            Ex, Ey = self.E
            X = np.diag(self.x)
            Y = np.diag(self.y)
            self._hcore = (Ex * np.kron(X, np.eye(self.ny))
                           + Ey * np.kron(np.eye(self.nx), Y))
        return self._hcore

    def _energy_offset(self):
        Ex, Ey = self.E
        return (Ex**2 + Ey**2) / 2.0


# reference drop-in names (pyqed/models/ShinMetiu.py:289,706,871)
ShinMetiu2 = ShinMetiu2D
ShinMetiu2InMagneticField = ShinMetiu2DMagnetic
ShinMetiu2InElectricField = ShinMetiu2DElectric
