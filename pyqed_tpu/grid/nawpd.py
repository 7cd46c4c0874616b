"""Nonadiabatic wavepacket dynamics in a Gaussian basis (NAWPD).

TPU-native counterpart of the reference's moving-Gaussian nonadiabatic
solvers (reference: pyqed/moving_gaussian.py:737 ``NAWPD``, :919
``NAWPD2``; pyqed/ldr/gwp.py GWP-LDR matrix elements).

Method (locally-diabatic representation in a Gaussian "DVR"):
1. From N real Gaussians, build overlap S and position X matrices
   (closed-form outer products, no loops) and solve the generalized
   eigenproblem X u = x S u — the eigenvalues are quadrature points,
   the eigenvectors an orthogonal (Wannier-like) basis.
2. Diagonalize the diabatic potential at every quadrature point
   (one vmapped eigh) → APES + adiabatic states.
3. Dress the kinetic matrix with electronic overlap factors
   A[i a, j b] = K_ij <a(x_i)|b(x_j)> and propagate
   i dpsi/dt = (A + diag(APES)) psi with RK4 under lax.scan.

The formulation is gauge covariant: arbitrary per-point eigenvector
phases cancel between A and the state coefficients.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import scipy.linalg

from .gwp import GWP, overlap_real, moment_real
from ..core.result import Result


class NAWPD:
    """Nonadiabatic Gaussian-basis wavepacket dynamics (1D).

    Parameters
    ----------
    basis : sequence of GWP (real, p=0) or (q, a) tuples.
    dpes : callable x -> (ns, ns) diabatic potential matrix (vectorized
        over a trailing grid axis is not required; it is vmapped).
    mass : nuclear mass.
    nstates : number of electronic states.
    """

    def __init__(self, basis: Sequence, dpes: Callable, mass=1.0,
                 nstates=2):
        gs = [g if isinstance(g, GWP) else GWP(q=g[0], a=g[1])
              for g in basis]
        self.basis = gs
        self.nbasis = len(gs)
        self.mass = mass
        self.nstates = nstates
        self.dpes = dpes

        q = np.array([g.q for g in gs])
        a = np.array([g.a for g in gs])
        self.q, self.a = q, a

        # closed-form matrices as broadcast outer products
        aj, ak = a[:, None], a[None, :]
        qj, qk = q[:, None], q[None, :]
        S = np.asarray(overlap_real(aj, qj, ak, qk))
        X = np.asarray(moment_real(aj, qj, ak, qk, n=1)) + qj * S
        K = (-1.0 / (2 * mass)) * (
            ak ** 2 * np.asarray(moment_real(aj, qj, ak, qk, n=2))
            - ak * S)
        K = 0.5 * (K + K.T)

        # Gaussian DVR: generalized eigenproblem X u = x S u
        w, U = scipy.linalg.eigh(X, S)
        self.x_evals = w            # quadrature points
        self.U = U                  # (gaussian, dvr), U† S U = 1
        self.S = S
        self.K_dvr = U.conj().T @ K @ U

        # adiabatic states at quadrature points: batched eigh
        V = jnp.stack([jnp.asarray(dpes(x)) for x in w])  # (N, ns, ns)
        apes, ustates = jnp.linalg.eigh(V)
        self.apes = np.asarray(apes)              # (N, ns)
        self.adiabatic_states = ustates           # (N, ns, ns)

        # dressed kinetic: A[i a, j b] = K_ij <a(x_i)|b(x_j)>
        ov = jnp.einsum("ica, jcb -> iajb", jnp.conj(ustates), ustates)
        self.A = jnp.asarray(self.K_dvr)[:, None, :, None] * ov

    # -------------------------------------------------------------- init
    def project(self, psi_diabatic: Callable, state=None):
        """Project a diabatic wavefunction onto the (orthogonal basis x
        adiabatic states) representation.

        psi_diabatic: callable x -> scalar amplitude; ``state`` picks the
        diabatic surface it lives on (or pass a callable returning a
        (ns,) vector).
        """
        # <g_j|psi> by Gauss-Hermite-exact quadrature on a dense grid
        xs = np.linspace(self.q.min() - 6 / np.sqrt(self.a.max()),
                         self.q.max() + 6 / np.sqrt(self.a.max()), 4001)
        dx = xs[1] - xs[0]
        gvals = np.stack([np.asarray(g.evaluate(xs)) for g in self.basis])
        if state is None:
            psivals = np.stack([psi_diabatic(x) for x in xs])  # (nx, ns)
        else:
            amp = np.array([psi_diabatic(x) for x in xs])
            psivals = np.zeros((len(xs), self.nstates), dtype=complex)
            psivals[:, state] = amp
        proj = gvals.conj() @ psivals * dx            # (N, ns) diabatic
        c = self.U.conj().T @ proj                    # orthogonal basis
        # rotate diabatic -> adiabatic at each point
        u = np.asarray(self.adiabatic_states)
        psi0 = np.einsum("nda, nd -> na", u.conj(), c)
        return jnp.asarray(psi0)

    # --------------------------------------------------------------- run
    def rhs(self, psi):
        return -1j * (jnp.einsum("iajb, jb -> ia", self.A, psi)
                      + jnp.asarray(self.apes) * psi)

    def run(self, psi0, dt, nt, nout=1) -> Result:
        psi0 = jnp.asarray(psi0, dtype=complex)
        ns_steps = nt // nout
        A = self.A.astype(complex)
        V = jnp.asarray(self.apes)

        def rhs(psi):
            return -1j * (jnp.einsum("iajb, jb -> ia", A, psi) + V * psi)

        def step(psi):
            k1 = rhs(psi)
            k2 = rhs(psi + k1 * (dt / 2))
            k3 = rhs(psi + k2 * (dt / 2))
            k4 = rhs(psi + k3 * dt)
            return psi + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)

        @jax.jit
        def evolve(psi):
            def window(p, _):
                def fine(i, y):
                    return step(y)
                p = jax.lax.fori_loop(0, nout, fine, p)
                return p, p
            return jax.lax.scan(window, psi, None, length=ns_steps)

        psi_f, psis = evolve(psi0)
        r = Result(dt=dt, nt=nt, nout=nout)
        r.times = np.arange(1, ns_steps + 1) * dt * nout
        r.states = psis
        r.psi = psi_f
        return r

    # ------------------------------------------------------- observables
    def population(self, psi, representation="adiabatic"):
        """Adiabatic populations P_a = sum_n |psi[n, a]|^2 (the basis is
        orthogonal)."""
        if representation == "adiabatic":
            return np.asarray(jnp.sum(jnp.abs(psi) ** 2, axis=0))
        # diabatic: rotate back at each point
        u = self.adiabatic_states
        psid = jnp.einsum("nda, na -> nd", u, psi)
        return np.asarray(jnp.sum(jnp.abs(psid) ** 2, axis=0))

    def norm(self, psi):
        return float(jnp.linalg.norm(psi.reshape(-1)))


class NAWPD2:
    """2D nonadiabatic Gaussian-basis dynamics with a direct-product
    basis and per-dimension Wannier (Gaussian-DVR) transforms
    (reference: pyqed/moving_gaussian.py:919 ``NAWPD2`` — 'use direct
    product basis set first, the transformation to Wannier basis is
    simply a tensor product of 1D transformation matrices').

    Parameters
    ----------
    basis_x, basis_y : sequences of (q, a) or GWP per dimension.
    dpes : callable (x, y) -> (ns, ns).
    masses : [mx, my].
    """

    def __init__(self, basis_x, basis_y, dpes, masses=(1.0, 1.0),
                 nstates=2):
        self.dims = []
        for basis, mass in zip((basis_x, basis_y), masses):
            gs = [g if isinstance(g, GWP) else GWP(q=g[0], a=g[1])
                  for g in basis]
            q = np.array([g.q for g in gs])
            a = np.array([g.a for g in gs])
            aj, ak = a[:, None], a[None, :]
            qj, qk = q[:, None], q[None, :]
            S = np.asarray(overlap_real(aj, qj, ak, qk))
            X = np.asarray(moment_real(aj, qj, ak, qk, n=1)) + qj * S
            K = (-1.0 / (2 * mass)) * (
                ak ** 2 * np.asarray(moment_real(aj, qj, ak, qk, n=2))
                - ak * S)
            K = 0.5 * (K + K.T)
            w, U = scipy.linalg.eigh(X, S)
            self.dims.append(dict(gs=gs, q=q, a=a, S=S, U=U, xe=w,
                                  K_dvr=U.conj().T @ K @ U))
        self.nx = len(self.dims[0]["gs"])
        self.ny = len(self.dims[1]["gs"])
        self.nstates = nstates
        self.dpes = dpes

        X, Y = np.meshgrid(self.dims[0]["xe"], self.dims[1]["xe"],
                           indexing="ij")
        V = jnp.stack([jnp.stack([jnp.asarray(dpes(X[i, j], Y[i, j]))
                                  for j in range(self.ny)])
                       for i in range(self.nx)])
        apes, ustates = jnp.linalg.eigh(V)
        self.apes = apes                       # (nx, ny, ns)
        self.adiabatic_states = ustates        # (nx, ny, ns, ns)
        # electronic overlaps between ALL point pairs would be O(N^2);
        # kinetic is separable, so only pairs sharing one index appear:
        # A_x[(i,i'), j] couples (i,j)<->(i',j); A_y likewise.
        u = ustates
        self.Ax = jnp.einsum("ijca, kjcb -> ikjab", jnp.conj(u), u)
        self.Ay = jnp.einsum("ijca, ilcb -> ijlab", jnp.conj(u), u)
        self.Kx = jnp.asarray(self.dims[0]["K_dvr"])
        self.Ky = jnp.asarray(self.dims[1]["K_dvr"])

    def rhs(self, psi):
        """psi (nx, ny, ns): kinetic dressing per dimension + APES."""
        tx = jnp.einsum("ik, ikjab, kjb -> ija", self.Kx, self.Ax, psi)
        ty = jnp.einsum("jl, ijlab, ilb -> ija", self.Ky, self.Ay, psi)
        return -1j * (tx + ty + self.apes * psi)

    def project(self, psi_fn, state=0):
        """Project a separable-or-not diabatic amplitude psi(x, y)."""
        d0, d1 = self.dims
        xs = np.linspace(d0["q"].min() - 4, d0["q"].max() + 4, 801)
        ys = np.linspace(d1["q"].min() - 4, d1["q"].max() + 4, 801)
        gx = np.stack([np.asarray(g.evaluate(xs)) for g in d0["gs"]])
        gy = np.stack([np.asarray(g.evaluate(ys)) for g in d1["gs"]])
        P = np.array([[psi_fn(x, y) for y in ys] for x in xs])
        dx, dy = xs[1] - xs[0], ys[1] - ys[0]
        proj = gx.conj() @ P @ gy.conj().T * dx * dy      # (nx, ny)
        c = d0["U"].conj().T @ proj @ d1["U"].conj()
        # rotate diabatic -> adiabatic: only diabatic `state` populated
        u = np.asarray(self.adiabatic_states)
        psi0 = np.einsum("ij, ija -> ija", c,
                         u.conj()[:, :, state, :])
        return jnp.asarray(psi0)

    def run(self, psi0, dt, nt, nout=1) -> Result:
        psi0 = jnp.asarray(psi0, dtype=complex)
        rhs = self.rhs

        def step(psi):
            k1 = rhs(psi)
            k2 = rhs(psi + k1 * (dt / 2))
            k3 = rhs(psi + k2 * (dt / 2))
            k4 = rhs(psi + k3 * dt)
            return psi + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)

        ns_steps = nt // nout

        @jax.jit
        def evolve(psi):
            def window(p, _):
                def fine(i, y):
                    return step(y)
                p = jax.lax.fori_loop(0, nout, fine, p)
                return p, p
            return jax.lax.scan(window, psi, None, length=ns_steps)

        psi_f, psis = evolve(psi0)
        r = Result(dt=dt, nt=nt, nout=nout)
        r.times = np.arange(1, ns_steps + 1) * dt * nout
        r.states = psis
        r.psi = psi_f
        return r

    def population(self, psi, representation="adiabatic"):
        if representation == "adiabatic":
            return np.asarray(jnp.sum(jnp.abs(psi) ** 2, axis=(0, 1)))
        u = self.adiabatic_states
        psid = jnp.einsum("ijda, ija -> ijd", u, psi)
        return np.asarray(jnp.sum(jnp.abs(psid) ** 2, axis=(0, 1)))

    def norm(self, psi):
        return float(jnp.linalg.norm(jnp.asarray(psi).reshape(-1)))
