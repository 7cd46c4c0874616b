"""Named vibronic / conical-intersection models.

TPU-native counterpart of the reference model zoo
(reference: pyqed/models/pyrazine.py — ``Pyrazine:212`` 2-mode 3-state CI
model with the standard Schneider-Domcke parameters (``buildV:255``);
pyqed/models/ShinMetiu.py — ``ShinMetiu:76`` proton-coupled electron
transfer with soft-Coulomb pseudopotentials; Jahn-Teller E(x)e from
pyqed/models/vibronic.py).

Every per-grid-point eigensolve (APES/BO surfaces) is a batched
``vmap``-eigh instead of the reference's Python loops.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import erf

from ..units import wavenum2au, au2angstrom
from ..grid.dvr import SineDVR


class Pyrazine:
    """S0/S1/S2 pyrazine conical intersection, 2 modes (coupling 10a,
    tuning 6a) (reference: pyqed/models/pyrazine.py:212).

    Coordinates: x = coupling mode, y = tuning mode (dimensionless).
    """

    freq_vc = 952.0 * wavenum2au
    freq_vt = 597.0 * wavenum2au
    Eshift = np.array([31800.0, 39000.0]) * wavenum2au
    kappa = np.array([-847.0, 1202.0]) * wavenum2au
    lam = 2110.0 * wavenum2au

    def __init__(self, x=None, y=None):
        self.x = np.asarray(x) if x is not None else None
        self.y = np.asarray(y) if y is not None else None
        if x is not None:
            self.nx, self.ny = len(x), len(y)
        self.nstates = 3
        self.edip = np.zeros((3, 3))
        self.edip[0, 2] = self.edip[2, 0] = 1.0
        self.mass = [1.0 / self.freq_vc, 1.0 / self.freq_vt]
        self.v = None

    def dpes(self, x, y):
        """Diabatic potential matrix at a point
        (reference: pyqed/models/pyrazine.py:295)."""
        vg = self.freq_vc * x**2 / 2 + self.freq_vt * y**2 / 2
        v0 = vg + self.kappa[0] * y + self.Eshift[0]
        v1 = vg + self.kappa[1] * y + self.Eshift[1]
        c = self.lam * x
        return jnp.array([[vg, 0.0, 0.0], [0.0, v0, c], [0.0, c, v1]])

    def buildV(self):
        """(reference: pyqed/models/pyrazine.py:255)."""
        X, Y = np.meshgrid(self.x, self.y, indexing="ij")
        vg = self.freq_vc * X**2 / 2 + self.freq_vt * Y**2 / 2
        v0 = vg + self.kappa[0] * Y + self.Eshift[0]
        v1 = vg + self.kappa[1] * Y + self.Eshift[1]
        c = self.lam * X
        v = np.zeros((self.nx, self.ny, 3, 3))
        v[..., 0, 0] = vg
        v[..., 1, 1] = v0
        v[..., 2, 2] = v1
        v[..., 1, 2] = v[..., 2, 1] = c
        self.v = jnp.asarray(v)
        return self.v

    def apes(self):
        """Batched adiabatic surfaces."""
        if self.v is None:
            self.buildV()
        return jnp.linalg.eigvalsh(self.v)

    def spo(self):
        """SPO2 solver preloaded with this model."""
        from ..grid import SPO2
        solver = SPO2(self.x, self.y, masses=self.mass, nstates=3)
        solver.set_dpes(self.buildV())
        return solver


class JahnTeller:
    """Linear E (x) e Jahn-Teller model: two degenerate electronic states
    coupled to two degenerate modes (reference: pyqed/models/vibronic.py).

    V = omega(x^2+y^2)/2 I + k [[x, y], [y, -x]] (+ Delta sz)
    """

    def __init__(self, omega=1.0, kappa=0.5, delta=0.0):
        self.omega = omega
        self.kappa = kappa
        self.delta = delta
        self.nstates = 2

    def dpes(self, x, y):
        w, k = self.omega, self.kappa
        vg = w * (x**2 + y**2) / 2
        return jnp.array([[vg + k * x + self.delta, k * y],
                          [k * y, vg - k * x - self.delta]])

    def buildV(self, x, y):
        X, Y = np.meshgrid(x, y, indexing="ij")
        vg = self.omega * (X**2 + Y**2) / 2
        v = np.zeros((len(x), len(y), 2, 2))
        v[..., 0, 0] = vg + self.kappa * X + self.delta
        v[..., 1, 1] = vg - self.kappa * X - self.delta
        v[..., 0, 1] = v[..., 1, 0] = self.kappa * Y
        return jnp.asarray(v)

    def apes(self, x, y):
        """Mexican-hat adiabatic surfaces (analytic):
        V± = w r^2/2 ± sqrt(k^2 r^2 + delta^2) for delta-shifted JT."""
        X, Y = np.meshgrid(x, y, indexing="ij")
        vg = self.omega * (X**2 + Y**2) / 2
        gap = np.sqrt((self.kappa * X + self.delta) ** 2
                      + (self.kappa * Y) ** 2)
        return jnp.asarray(np.stack([vg - gap, vg + gap], axis=-1))

    def geometric_phase(self, n=0, r=1.0, center=(0.0, 0.0), npts=400):
        """Discrete Berry phase of adiabatic state ``n`` around a circle of
        radius ``r`` about ``center``: pi when the loop encloses the conical
        intersection at (-delta/kappa, 0), 0 otherwise.

        (reference: pyqed/models/jahn_teller.py:410 ``geometric_phase`` — a
        dangling plotting script importing proplot there.)
        """
        thetas = np.linspace(0, 2 * np.pi, npts, endpoint=False)
        x = center[0] + r * np.cos(thetas)
        y = center[1] + r * np.sin(thetas)
        # batched 2x2 diabatic matrices in pure numpy (one eigh, no
        # per-point device dispatch)
        w_, k_ = self.omega, self.kappa
        vg = w_ * (x**2 + y**2) / 2
        v = np.zeros((npts, 2, 2))
        v[:, 0, 0] = vg + k_ * x + self.delta
        v[:, 1, 1] = vg - k_ * x - self.delta
        v[:, 0, 1] = v[:, 1, 0] = k_ * y
        _, u = np.linalg.eigh(v)
        un = u[:, :, n]                                   # (npts, 2)
        ov = np.einsum("ki, ki -> k", un, np.roll(un, -1, axis=0))
        return abs(np.angle(np.prod(ov + 0j)))


class ShinMetiu:
    """1D Shin-Metiu proton-coupled electron transfer
    (reference: pyqed/models/ShinMetiu.py:76).

    One electron (coordinate r) + one proton (R) between fixed ions at
    +-L/2; soft-Coulomb interactions with cutoff Rc. BO surfaces from a
    batched electron-grid eigensolve over the nuclear grid.
    """

    def __init__(self, Rc=None, L=None, mass=1836.0, nstates=3):
        self.Rc = Rc if Rc is not None else 1.5 / au2angstrom
        self.L = L if L is not None else 10.0 / au2angstrom
        self.mass = mass
        self.nstates = nstates
        self.x = None

    def create_grid(self, nx=128, frac=0.45):
        lim = self.L * frac
        dvr = SineDVR(-lim, lim, nx)
        self.x = np.asarray(dvr.x)
        self.Te = np.asarray(dvr.t())
        return self.x

    def V_en(self, r, R):
        """Soft Coulomb -erf(|r-R|/Rc)/|r-R|
        (reference: pyqed/models/ShinMetiu.py:189)."""
        d = np.abs(r - R)
        with np.errstate(divide="ignore", invalid="ignore"):
            v = -erf(d / self.Rc) / d
        v = np.where(d < 1e-12, -2.0 / (self.Rc * np.sqrt(np.pi)), v)
        return v

    def electron_hamiltonian(self, R):
        """H_e(R) on the electron grid."""
        x = self.x
        V = (self.V_en(x, -self.L / 2) + self.V_en(x, self.L / 2)
             + self.V_en(x, R))
        return jnp.asarray(self.Te + np.diag(V))

    def energy_nuc(self, R):
        return 1.0 / abs(R + self.L / 2) + 1.0 / abs(self.L / 2 - R)

    def pes(self, Rgrid):
        """BO surfaces E_n(R) + electronic states — one batched eigh over
        the nuclear grid (the reference loops in Python with per-point
        eigsh, pyqed/models/ShinMetiu.py:125-170)."""
        if self.x is None:
            self.create_grid()
        Hs = jnp.stack([self.electron_hamiltonian(R) for R in np.asarray(Rgrid)])
        w, u = jnp.linalg.eigh(Hs)
        enuc = jnp.asarray([self.energy_nuc(R) for R in np.asarray(Rgrid)])
        E = w[:, :self.nstates] + enuc[:, None]
        return E, u[:, :, :self.nstates]

    def overlap_matrix(self, states):
        """Electronic overlap A[m a, n b] = <phi_a(R_m)|phi_b(R_n)> for the
        LDR propagator.

        ``pes`` returns DISCRETE-normalized eigenvectors (unit columns of
        ``eigh``), so the plain dot product IS the physical overlap —
        scaling by dx here (as a continuum-normalized basis would need)
        makes A's diagonal dx instead of 1 and silently damps any LDR
        propagation built on it."""
        return jnp.einsum("mia, nib -> manb", jnp.conj(states), states)



class ShinMetiuInField(ShinMetiu):
    """1D Shin-Metiu model in a static electric field, length gauge
    (reference: pyqed/models/ShinMetiu.py:871 ``ShinMetiu2InElectricField``
    — the 2D analogue; the field couples as +E.r for the electron
    (charge -1, H += E x) and -E.R for the proton (charge +1)).
    """

    def __init__(self, E=0.0, **kwargs):
        super().__init__(**kwargs)
        self.E = float(E)

    def electron_hamiltonian(self, R):
        H = super().electron_hamiltonian(R)
        return H + jnp.diag(jnp.asarray(self.E * self.x))

    def energy_nuc(self, R):
        return super().energy_nuc(R) - self.E * R

class Pyrazine4:
    """Four-mode pyrazine S0/S1/S2 vibronic-coupling model
    (reference: pyqed/models/pyrazine_4Dimension_SparseGrid.py:1350
    ``dpes`` — modes nu_1, nu_6a, nu_9a (tuning) and nu_10a (coupling),
    first- plus second-order couplings).

    Provides both the grid ``dpes(x, y, z, q)`` and the LVC export
    (H_el, omegas, couplings) consumed by tn.VibronicMPS / lvc_mpo —
    the MPS route is how the 4D model is propagated here (the
    reference's 4D sparse-grid LDR script is its counterpart).
    """

    def __init__(self, second_order=True):
        from ..units import au2ev, wavenumber
        w2au = wavenumber
        self.omegas = np.array([1015.0, 596.0, 1230.0, 919.0]) * w2au
        self.Eshift = np.array([0.0, 3.94, 4.89]) / au2ev
        self.kappa1 = np.array([-0.0470, -0.0964, 0.1594]) / au2ev
        self.kappa2 = np.array([-0.2012, 0.1193, 0.0484]) / au2ev
        self.lam = 0.1825 / au2ev
        self.gamma = (-0.018 / au2ev) if second_order else 0.0
        self.nstates = 3
        self.ndim = 4

    def dpes(self, x, y, z, q):
        """(3, 3) diabatic matrix at dimensionless coordinates."""
        w = self.omegas
        vg = 0.5 * (w[0] * x ** 2 + w[1] * y ** 2 + w[2] * z ** 2
                    + w[3] * q ** 2)
        k1, k2 = self.kappa1, self.kappa2
        v1 = (vg + k1[0] * x + k1[1] * y + k1[2] * z
              + self.Eshift[1] + self.gamma * q ** 2)
        v2 = (vg + k2[0] * x + k2[1] * y + k2[2] * z
              + self.Eshift[2] + self.gamma * q ** 2)
        h = jnp.zeros((3, 3))
        h = h.at[0, 0].set(vg)
        h = h.at[1, 1].set(v1)
        h = h.at[2, 2].set(v2)
        h = h.at[1, 2].set(self.lam * q)
        h = h.at[2, 1].set(self.lam * q)
        return h

    def lvc(self):
        """(H_el, omegas, couplings) for tn.vibronic.lvc_mpo: linear
        kappa/lambda terms exactly; the quadratic gamma q^2 term is
        dropped in this export (state-independent to first order)."""
        H_el = np.diag(self.Eshift)
        Vs = []
        for m in range(3):        # tuning modes 1, 6a, 9a
            Vs.append(np.diag([0.0, self.kappa1[m], self.kappa2[m]]))
        V10a = np.zeros((3, 3))
        V10a[1, 2] = V10a[2, 1] = self.lam
        Vs.append(V10a)
        return H_el, self.omegas, Vs

    def spectral_dynamics(self, nb=8, chi_max=32, dt=None, nt=60,
                          nout=10):
        """S2 photoexcitation population dynamics via TDVP on the MPS
        chain (the standard 4-mode pyrazine benchmark)."""
        from ..tn.vibronic import VibronicMPS
        from ..units import au2fs
        H_el, omegas, Vs = self.lvc()
        vm = VibronicMPS(H_el, omegas, Vs, nb=nb, chi_max=chi_max)
        if dt is None:
            dt = 0.25 / au2fs
        return vm.run(el_state=2, dt=dt, nt=nt, nout=nout)


class SpinVibronic:
    """Spin-orbit vibronic coupling in a 2Pi state of a linear molecule
    (Poluyanov & Domcke, Chem. Phys. 301, 111 (2004)): one unpaired
    electron, doubly degenerate bending mode (x, y), four spin-orbital
    states |Lambda, Sigma> ordered (+1,+1/2), (-1,+1/2), (+1,-1/2),
    (-1,-1/2).

    H(x, y) = omega/2 (x^2 + y^2) I
              + (e_so/2) diag(+1, -1, -1, +1)        [A Lambda Sigma]
              + kappa rho e^{+i phi} (SO-induced LINEAR coupling)
              + (g/2) rho^2 e^{+2i phi} (Renner-Teller quadratic coupling)

    with rho e^{i phi} = x + i y. The complex Hermitian 4x4 commutes with
    the rotation diag(1, e^{-i d}, e^{-2i d}, e^{-3i d}) sending
    phi -> phi + d, so the adiabatic surfaces are exactly cylindrical.

    (reference: pyqed/models/vibronic.py:314 ``SpinVibronic`` — a broken
    sketch there: declared ``def``, never Hermitized (its
    ``h[2,0] = h[2,0].conj()`` is a no-op), no kinetic energy/solver.
    Real and propagatable here; SPON's batched complex eigh handles the
    complex Hermitian diabatic blocks exactly.)
    """

    def __init__(self, omega=1.0, e_so=0.2, kappa=0.1, g=0.2,
                 nstates=4, mass=None):
        assert nstates == 4
        self.omega = omega
        self.e_so = e_so
        self.kappa = kappa
        self.g = g
        self.nstates = 4
        self.mass = [1.0, 1.0] if mass is None else mass

    def single_point(self, x, y):
        """Complex Hermitian H(x, y) (4, 4)."""
        xp = x + 1j * y
        e = self.e_so
        h = jnp.diag(jnp.array([e / 2, -e / 2, -e / 2, e / 2],
                               dtype=complex))
        k, g = self.kappa, self.g
        h = h.at[0, 1].set(k * xp).at[2, 3].set(k * xp)
        h = h.at[0, 2].set(g / 2 * xp**2).at[1, 3].set(-g / 2 * xp**2)
        h = h + jnp.conj(h.T) - jnp.diag(jnp.diag(h))
        return h + jnp.eye(4) * self.omega / 2 * (x**2 + y**2)

    def buildV(self, x, y):
        """Diabatic PES on the grid: (nx, ny, 4, 4) complex Hermitian."""
        X, Y = np.meshgrid(x, y, indexing="ij")
        XP = X + 1j * Y
        nx, ny = len(x), len(y)
        v = np.zeros((nx, ny, 4, 4), dtype=complex)
        e, k, g = self.e_so, self.kappa, self.g
        v[..., 0, 0] = v[..., 3, 3] = e / 2
        v[..., 1, 1] = v[..., 2, 2] = -e / 2
        v[..., 0, 1] = v[..., 2, 3] = k * XP
        v[..., 1, 0] = v[..., 3, 2] = np.conj(k * XP)
        v[..., 0, 2] = g / 2 * XP**2
        v[..., 2, 0] = np.conj(g / 2 * XP**2)
        v[..., 1, 3] = -g / 2 * XP**2
        v[..., 3, 1] = np.conj(-g / 2 * XP**2)
        vg = self.omega / 2 * (X**2 + Y**2)
        v += np.eye(4) * vg[..., None, None]
        return jnp.asarray(v)

    def apes(self, x, y):
        """Adiabatic (spin-vibronic) surfaces: (nx, ny, 4), cylindrical."""
        return jnp.linalg.eigvalsh(self.buildV(x, y))

    def spo(self, x, y):
        """4-state SPON on the bending plane, preloaded with the model."""
        from ..grid import SPON
        solver = SPON((x, y), masses=self.mass, nstates=4)
        solver.set_dpes(self.buildV(x, y))
        return solver


class Triazine:
    """Complex E⊗e Jahn-Teller model of triazine: two degenerate excited
    states with complex linear coupling 2.2ω(X ∓ iY)
    (reference: pyqed/models/triazine.py:17; wilson_loop:76,
    berry_phase:97).
    """

    def __init__(self, x=None, y=None, mass=(1.0, 1.0), nstates=3):
        from ..units import wavenumber
        self.omega = 660.0 * wavenumber
        self.x, self.y = x, y
        self.mass = list(mass)
        self.nstates = nstates
        self.coupling = 2.2
        self.eshift = 7.0 / 27.2114
        self.v = None

    def dpes(self, xy):
        """(3, 3) complex diabatic matrix at a point."""
        x, y = xy
        w = self.omega
        h = jnp.zeros((3, 3), dtype=complex)
        vg = w * (x ** 2 + y ** 2) / 2.0
        h = h.at[0, 0].set(vg)
        h = h.at[1, 1].set(vg + self.eshift)
        h = h.at[2, 2].set(vg + self.eshift)
        h = h.at[1, 2].set(self.coupling * w * (x - 1j * y))
        h = h.at[2, 1].set(self.coupling * w * (x + 1j * y))
        return h

    def dpes_global(self):
        """(reference: triazine.py:39)."""
        X, Y = np.meshgrid(self.x, self.y, indexing="ij")
        w = self.omega
        nx, ny = len(self.x), len(self.y)
        v = np.zeros((nx, ny, 3, 3), dtype=complex)
        vg = w * (X ** 2 + Y ** 2) / 2.0
        v[..., 0, 0] = vg
        v[..., 1, 1] = vg + self.eshift
        v[..., 2, 2] = vg + self.eshift
        v[..., 1, 2] = self.coupling * w * (X - 1j * Y)
        v[..., 2, 1] = self.coupling * w * (X + 1j * Y)
        self.v = jnp.asarray(v)
        return self.v

    def apes(self, xy):
        return jnp.linalg.eigh(self.dpes(xy))

    def berry_phase(self, n=1, r=1.0, npts=200):
        """Discrete Berry phase of adiabatic state n around a loop of
        radius r (reference: triazine.py:97): the complex JT coupling
        gives ∓2π winding on the degenerate pair (not just a sign)."""
        thetas = np.linspace(0, 2 * np.pi, npts, endpoint=False)
        us = []
        for th in thetas:
            w, u = self.apes((r * np.cos(th), r * np.sin(th)))
            us.append(np.asarray(u[:, n]))
        z = 1.0 + 0j
        for k in range(npts):
            z *= np.vdot(us[k], us[(k + 1) % npts])
        return -np.angle(z)

    def wilson_loop(self, n=1, r=1.0, npts=200):
        """|Tr Π P_n| along the loop (reference: triazine.py:76)."""
        thetas = np.linspace(0, 2 * np.pi, npts, endpoint=False)
        L = np.eye(3, dtype=complex)
        for th in thetas:
            w, u = self.apes((r * np.cos(th), r * np.sin(th)))
            un = np.asarray(u[:, n])
            L = L @ np.outer(un, un.conj())
        return np.trace(L)


class VibronicAdiabatic:
    """1D vibronic model in the adiabatic representation: adiabatic surfaces
    v_a(x) + derivative couplings D_ab(x) on a grid, with dipoles.

    (reference: pyqed/models/vibronic.py:598 — a holder whose dynamics/
    buildH bodies are commented out; here ``run`` dispatches to the live
    adiabatic NAMD propagator in :mod:`pyqed_tpu.grid.namd`.)
    """

    def __init__(self, x=None, v=None, nac=None, mass=1.0, nstates=2,
                 edip=None, mdip=None, equad=None):
        self.x = np.asarray(x) if x is not None else None
        self.nx = self.x.size if x is not None else None
        self.mass = mass
        self.nel = self.nstates = nstates
        self._v = np.asarray(v) if v is not None else None
        self.nac = np.asarray(nac) if nac is not None else None
        self.edip = edip
        self.mdip = mdip
        self.equad = equad

    @property
    def v(self):
        return self._v

    @v.setter
    def v(self, value):
        self._v = np.asarray(value)

    def set_nac(self, nac):
        self.nac = np.asarray(nac)

    @classmethod
    def from_diabatic(cls, x, dpes, mass=1.0, ddpes=None, **kwargs):
        """Build from a diabatic PES matrix field (diagonalized with a
        smooth gauge; NACs by Hellmann-Feynman when ``ddpes`` is given)."""
        from ..grid.namd import diabatic_to_adiabatic_1d
        v, u, nac = diabatic_to_adiabatic_1d(x, dpes, ddpes=ddpes)
        obj = cls(x=x, v=v, nac=nac, mass=mass, nstates=v.shape[1], **kwargs)
        obj.U = u
        return obj

    def run(self, psi0, dt, nt, nout=1, e_ops=None, order=2):
        from ..grid.namd import NAMD
        solver = NAMD(self.x, self._v, self.nac, mass=self.mass, order=order)
        return solver.run(psi0, dt, nt, nout=nout, e_ops=e_ops)
