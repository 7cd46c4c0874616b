"""Grid-based vibronic polaritons and vibrational strong coupling.

TPU-native counterpart of the reference grid-polariton layer
(reference: pyqed/polariton/cavity.py — ``VibronicPolariton:936`` (1D
vibronic model ⊗ cavity: ``dpes:969``, ``ppes:1035``, ``run:1090`` via
SPO), ``VibronicPolariton2:1111`` (2D, with Berry curvature ``:1324``);
pyqed/polariton/vsc.py — ``VSC:28`` vibrational strong coupling with the
``hpsi`` matvec :390; pyqed/polariton/tdh.py — time-dependent Hartree
mean field ``:16``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.linalg import dag
from ..ops.operators import destroy
from .cavity import Cavity
from ..grid.spo import SPON


class GridMol:
    """A vibronic model on a nuclear grid: diabatic V(x) (nx, ns, ns) +
    (possibly coordinate-dependent) dipole."""

    def __init__(self, x, v, edip, mass=1.0):
        self.x = np.asarray(x)
        self.nx = len(self.x)
        self.v = jnp.asarray(v)
        self.nstates = self.v.shape[-1]
        self.edip = jnp.asarray(edip)
        self.mass = mass


class VibronicPolariton:
    """1D vibronic model coupled to a single cavity mode
    (reference: pyqed/polariton/cavity.py:936)."""

    def __init__(self, mol: GridMol, cav: Cavity):
        self.mol = mol
        self.cav = cav
        self.x = mol.x
        self.nx = mol.nx
        self.nstates = mol.nstates * cav.ncav
        self.v = None
        self.va = None
        self._u = None

    def dpes(self, g, rwa=False, gauge="dipole"):
        """Polaritonic diabatic PES stack (nx, N, N)
        (reference: pyqed/polariton/cavity.py:969)."""
        mol, cav = self.mol, self.cav
        omegac = cav.omega
        nel, ncav = mol.nstates, cav.ncav
        N = self.nstates

        # diagonal: molecular surfaces + photon number
        ns_el = jnp.arange(nel)
        n_ph = jnp.arange(ncav)
        v = jnp.zeros((self.nx, N, N), dtype=jnp.result_type(mol.v, 1j * 0.0))
        # build as kron over the electronic/photonic structure
        diag = (mol.v[:, :, None, :, None]
                * jnp.eye(ncav)[None, None, :, None, :])
        v = diag.reshape(self.nx, N, N)
        v = v + jnp.kron(jnp.eye(nel),
                         jnp.diag(n_ph * omegac))[None, :, :]

        a = cav.annihilate()
        qc = jnp.real(a + dag(a))
        if mol.edip.ndim == 2:
            # Condon approximation
            v = v + g * jnp.kron(mol.edip, qc)[None, :, :]
        else:
            v = v + g * jax.vmap(lambda d: jnp.kron(d, qc))(mol.edip)
        self.v = v
        return v

    def add_coupling(self, ops):
        """(reference: pyqed/polariton/cavity.py:1012)."""
        for (mol_op, cav_op) in ops:
            mol_op = jnp.asarray(mol_op)
            if mol_op.ndim == 2:
                self.v = self.v + jnp.kron(mol_op, jnp.asarray(cav_op))[None]
            else:
                self.v = self.v + jax.vmap(
                    lambda d: jnp.kron(d, jnp.asarray(cav_op)))(mol_op)
        return self.v

    def ppes(self):
        """Polaritonic (adiabatic) surfaces — batched eigh
        (reference: pyqed/polariton/cavity.py:1035 loops in Python)."""
        w, u = jnp.linalg.eigh(self.v)
        self.va = w
        self._u = u
        return w

    def photon_number_surface(self):
        """<n_ph> on each polaritonic surface."""
        if self._u is None:
            self.ppes()
        num = jnp.kron(jnp.eye(self.mol.nstates),
                       jnp.diag(jnp.arange(self.cav.ncav, dtype=float)))
        return jnp.real(jnp.einsum("xin, ij, xjn -> xn",
                                   self._u.conj(), num, self._u))

    def run(self, psi0, dt, nt=1, nout=1):
        """SPO propagation on the polaritonic manifold
        (reference: pyqed/polariton/cavity.py:1090)."""
        spo = SPON([self.x], masses=[self.mol.mass], nstates=self.nstates)
        spo.set_dpes(self.v)
        return spo.run(psi0, dt=dt, nt=nt, nout=nout)


class VSC:
    """Vibrational strong coupling: a single-surface nuclear grid mode
    coupled to a cavity in its ground electronic state
    (reference: pyqed/polariton/vsc.py:28, matvec ``hpsi:390``).

    H = T_N + V(x) + omega_c a^dag a + g x (a + a^dag) [+ g^2 x^2/omega_c DSE]

    State psi(x, n_ph); KEO by FFT, cavity part dense — the hpsi matvec is
    a fused FFT + small matmul.
    """

    def __init__(self, x, v, cav: Cavity, mass=1.0, g=0.0, dse=True):
        self.x = np.asarray(x)
        self.v = jnp.asarray(v)
        self.cav = cav
        self.mass = mass
        self.g = g
        self.dse = dse
        self.nx = len(self.x)
        self.ncav = cav.ncav
        dx = self.x[1] - self.x[0]
        self.kx = 2 * np.pi * np.fft.fftfreq(self.nx, dx)

    def hpsi(self, psi):
        """H|psi> with psi (nx, ncav) (reference: pyqed/polariton/vsc.py:390)."""
        cav = self.cav
        a = cav.annihilate()
        qc = jnp.real(a + dag(a))
        hcav = jnp.real(cav.getH())
        k2 = jnp.asarray(self.kx**2) / (2 * self.mass)
        # kinetic via FFT along x
        tpsi = jnp.fft.ifft(k2[:, None] * jnp.fft.fft(psi, axis=0), axis=0)
        out = tpsi + self.v[:, None] * psi + psi @ hcav.T
        out = out + self.g * jnp.asarray(self.x)[:, None] * (psi @ qc.T)
        if self.dse:
            out = out + (self.g**2 / cav.omega
                         * jnp.asarray(self.x**2)[:, None] * psi)
        return out

    def spectrum(self, k=6):
        """Lowest polariton levels by dense diagonalization (small grids) —
        exposes the Rabi splitting of the vibrational mode."""
        nx, nc = self.nx, self.ncav
        dim = nx * nc

        def matvec(v):
            return self.hpsi(v.reshape(nx, nc)).reshape(-1)

        # dense build by applying to basis (fine for benchmark-size grids)
        H = jax.vmap(lambda e: matvec(e))(jnp.eye(dim, dtype=complex))
        H = H.T
        w = jnp.linalg.eigvalsh((H + dag(H)) / 2)
        return w[:k]

    def run(self, psi0, dt, nt, nout=1):
        """Split-operator propagation treating (V + H_cav + coupling) as
        the potential part at each x — one batched eigh over x."""
        cav = self.cav
        a = cav.annihilate()
        qc = np.real(np.asarray(a + dag(a)))
        hcav = np.real(np.asarray(cav.getH()))
        vx = np.asarray(self.v)
        V = (vx[:, None, None] * np.eye(self.ncav)[None]
             + hcav[None]
             + self.g * np.asarray(self.x)[:, None, None] * qc[None])
        if self.dse:
            V = V + (self.g**2 / cav.omega
                     * np.asarray(self.x**2)[:, None, None]
                     * np.eye(self.ncav)[None])
        spo = SPON([self.x], masses=[self.mass], nstates=self.ncav)
        spo.set_dpes(jnp.asarray(V))
        return spo.run(psi0, dt=dt, nt=nt, nout=nout)


class TDH:
    """Time-dependent Hartree mean field for system ⊗ cavity
    (reference: pyqed/polariton/tdh.py:16).

    psi(x, n) ~ chi(x) phi(n); coupled mean-field equations integrated
    with RK4 under lax.scan.
    """

    def __init__(self, x, v, cav: Cavity, mass=1.0, g=0.0):
        self.x = np.asarray(x)
        self.v = jnp.asarray(v)
        self.cav = cav
        self.mass = mass
        self.g = g
        self.nx = len(self.x)
        dx = self.x[1] - self.x[0]
        self.dx = dx
        self.kx = jnp.asarray(2 * np.pi * np.fft.fftfreq(self.nx, dx))

    def run(self, chi0, phi0, dt, nt, nout=1):
        cav = self.cav
        a = cav.annihilate()
        qc = jnp.real(a + dag(a))
        hcav = jnp.real(cav.getH())
        x = jnp.asarray(self.x)
        k2 = self.kx**2 / (2 * self.mass)
        g = self.g
        dx = self.dx

        def rhs(state):
            chi, phi = state
            xave = jnp.real(jnp.vdot(chi, x * chi) * dx)
            qave = jnp.real(jnp.vdot(phi, qc @ phi))
            tchi = jnp.fft.ifft(k2 * jnp.fft.fft(chi))
            hchi = tchi + (self.v + g * qave * x) * chi
            hphi = phi @ hcav.T + g * xave * (qc @ phi)
            return (-1j * hchi, -1j * hphi)

        def step(state, _):
            def axpy(s, k, c):
                return (s[0] + c * k[0], s[1] + c * k[1])
            k1 = rhs(state)
            k2_ = rhs(axpy(state, k1, dt / 2))
            k3 = rhs(axpy(state, k2_, dt / 2))
            k4 = rhs(axpy(state, k3, dt))
            new = (state[0] + dt / 6 * (k1[0] + 2 * k2_[0] + 2 * k3[0] + k4[0]),
                   state[1] + dt / 6 * (k1[1] + 2 * k2_[1] + 2 * k3[1] + k4[1]))
            xave = jnp.real(jnp.vdot(new[0], x * new[0]) * dx) \
                / jnp.real(jnp.vdot(new[0], new[0]) * dx)
            nave = jnp.real(jnp.vdot(new[1], jnp.arange(self.cav.ncav)
                                     * new[1]))
            return new, (xave, nave)

        state0 = (jnp.asarray(chi0, dtype=complex),
                  jnp.asarray(phi0, dtype=complex))
        (chif, phif), (xave, nave) = jax.lax.scan(step, state0, None,
                                                  length=nt)
        return dict(chi=chif, phi=phif, xave=xave, nave=nave)


class GridMol2:
    """A vibronic model on a 2D nuclear grid: diabatic V(x, y) of shape
    (nx, ny, ns, ns) + constant electronic dipole."""

    def __init__(self, x, y, v, edip, mass=(1.0, 1.0)):
        self.x = np.asarray(x)
        self.y = np.asarray(y)
        self.nx, self.ny = len(self.x), len(self.y)
        self.v = jnp.asarray(v)
        self.nstates = self.v.shape[-1]
        self.edip = jnp.asarray(edip)
        self.mass = list(mass) if np.ndim(mass) else [mass, mass]


def berry_curvature_field(u):
    """Fukui-Hatsugai plaquette Berry curvature of an eigenvector field.

    u : (nx, ny, dim) normalized state |u(x_i, y_j)>.
    Returns F (nx-1, ny-1): Im log of the Wilson plaquette product —
    the discrete Berry curvature times the plaquette area. Summing F
    over a region gives the Berry phase of its boundary loop (π per
    enclosed conical intersection for real Hamiltonians).

    (The reference's ``berry_curvature`` at pyqed/polariton/cavity.py:1324
    is an empty ``pass`` stub; this is a working implementation.)
    """
    u = jnp.asarray(u)
    ux = jnp.einsum("ijd, ijd -> ij", jnp.conj(u[:-1, :]), u[1:, :])
    uy = jnp.einsum("ijd, ijd -> ij", jnp.conj(u[:, :-1]), u[:, 1:])
    # plaquette product U_x(r) U_y(r+dx) U_x(r+dy)^* U_y(r)^*
    W = (ux[:, :-1] * uy[1:, :] * jnp.conj(ux[:, 1:]) * jnp.conj(uy[:-1, :]))
    return jnp.angle(W)


class VibronicPolariton2(VibronicPolariton):
    """2D vibronic model coupled to a single cavity mode
    (reference: pyqed/polariton/cavity.py:1111)."""

    def __init__(self, mol: GridMol2, cav: Cavity, g=None):
        self.mol = mol
        self.cav = cav
        self.x, self.y = mol.x, mol.y
        self.nx, self.ny = mol.nx, mol.ny
        self.nel = mol.nstates
        self.ncav = cav.ncav
        self.nstates = self.nel * self.ncav
        self.mass = mol.mass
        self.g = g
        self.v = None
        self.va = None
        self._u = None
        self._ground_state = None

    def dpes_global(self, g=None, rwa=False):
        """Polaritonic diabatic PES (nx, ny, N, N)
        (reference: pyqed/polariton/cavity.py:1173)."""
        if g is not None:
            self.g = g
        if self.g is None:
            raise ValueError("set the light-matter coupling g first")
        mol, cav = self.mol, self.cav
        nel, ncav, N = self.nel, self.ncav, self.nstates
        # diagonal: molecular surfaces + photon number ladder
        eyec = np.eye(ncav)
        vm = np.asarray(mol.v)                       # (nx, ny, nel, nel)
        v = np.einsum("xyab, mn -> xyambn", vm, eyec).reshape(
            self.nx, self.ny, N, N)
        wc = cav.omega
        nph = np.kron(np.eye(nel), np.diag(np.arange(ncav)))
        v = v + wc * nph[None, None]
        a = np.asarray(cav.annihilate())
        coupl = self.g * np.kron(np.asarray(mol.edip).real, a + a.T)
        v = v + coupl[None, None]
        self.v = jnp.asarray(v)
        return self.v

    def ppes(self):
        """Adiabatic polaritonic surfaces + transformation (batched eigh
        over the grid; reference: pyqed/polariton/cavity.py:1240)."""
        if self.v is None:
            self.dpes_global()
        w, u = jnp.linalg.eigh(self.v)
        self.va, self._u = w, u
        return w

    def ground_state(self, representation="adiabatic"):
        """Lowest nuclear eigenstate on the lowest polaritonic surface
        (reference: pyqed/polariton/cavity.py:1145)."""
        from ..grid.dvr import DVRN, SineDVR
        if self.va is None:
            self.ppes()
        V = (self.va[:, :, 0] if representation == "adiabatic"
             else self.v[:, :, 0, 0])
        dx = self.x[1] - self.x[0]
        dy = self.y[1] - self.y[0]
        dvrx = SineDVR(self.x[0] - dx, self.x[-1] + dx, self.nx,
                       mass=self.mass[0])
        dvry = SineDVR(self.y[0] - dy, self.y[-1] + dy, self.ny,
                       mass=self.mass[1])
        Tx = np.asarray(dvrx.t())
        Ty = np.asarray(dvry.t())
        H = (np.kron(Tx, np.eye(self.ny))
             + np.kron(np.eye(self.nx), Ty)
             + np.diag(np.asarray(V).ravel()))
        w, U = np.linalg.eigh(H)
        self._ground_state = U[:, 0].reshape(self.nx, self.ny)
        return w[0], self._ground_state

    def berry_curvature(self, state_id=0):
        """Plaquette Berry curvature of adiabatic polaritonic state
        ``state_id`` (WORKING implementation of the reference's stub at
        pyqed/polariton/cavity.py:1324)."""
        if self._u is None:
            self.ppes()
        return berry_curvature_field(self._u[:, :, :, state_id])

    def promote_op(self, a, kind="mol"):
        """(reference: pyqed/polariton/cavity.py:1378)."""
        if kind in ("mol", "m"):
            return jnp.kron(jnp.asarray(a), jnp.eye(self.ncav))
        return jnp.kron(jnp.eye(self.nel), jnp.asarray(a))

    def run(self, psi0=None, dt=0.1, nt=10, nout=1, **kw):
        """SPO2 propagation on the polaritonic surfaces
        (reference: pyqed/polariton/cavity.py:1328)."""
        from ..grid.spo import SPO2
        if self.v is None:
            self.dpes_global()
        if psi0 is None:
            if self._ground_state is None:
                self.ground_state()
            psi0 = np.zeros((self.nx, self.ny, self.nstates), complex)
            dvol = float((self.x[1] - self.x[0]) * (self.y[1] - self.y[0]))
            # grid normalization: sum |psi|^2 dvol = 1
            psi0[:, :, 0] = self._ground_state / np.sqrt(dvol)
        spo = SPO2(self.x, self.y, masses=self.mass,
                   nstates=self.nstates, **kw)
        spo.set_dpes(self.v)
        return spo.run(psi0, dt=dt, nt=nt, nout=nout)
