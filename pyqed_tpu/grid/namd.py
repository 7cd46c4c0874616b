"""Adiabatic-representation nonadiabatic wavepacket dynamics (1D grid).

The reference's ``NAMD`` (reference: pyqed/namd/adiabatic.py:34) propagates
psi(x, a) on adiabatic surfaces v_a(x) coupled by derivative couplings
D_ab(x) = <a|d/dx b>, applying H via FFT spectral derivatives inside a
Python RK4 loop.  Its ``hpsi`` (adiabatic.py:252) keeps only the
first-order coupling -D(d psi)/m and drops the second-order terms, and its
``evolve`` hard-codes mass=1 through a module global.

TPU-native rebuild:

* the FULL transformed kinetic operator.  With P = -i d/dx and the
  antisymmetric D, the nuclear kinetic energy in the adiabatic basis is

      T = (P - i D)^2 / 2m
        = [ -d^2/dx^2 - 2 D d/dx - D' - D^2 ] / 2m

  (``order=2``, default), so the propagation is EXACTLY unitary-equivalent
  to diabatic dynamics.  ``order=1`` reproduces the reference's truncation.
* one fused rhs (two FFTs per state application), RK4 under ``lax.scan``
  with static (nout, nt) windows — no per-step host dispatch;
* everything complex stays inside jit (TPU-safe real boundary not needed
  here: this runs under the CPU/x64 parity surface and on-device under jit).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.result import Result


class NAMD:
    """Nonadiabatic dynamics in the adiabatic representation on a 1D grid.

    Parameters
    ----------
    x : (nx,) uniform grid.
    v : (nx, ns) adiabatic potential energy surfaces.
    nac : (nx, ns, ns) derivative couplings D_ab(x) = <a | d/dx b>
        (antisymmetric in (a, b) for real electronic states).
    mass : nuclear mass.
    order : 1 keeps only -(D d/dx)/m (the reference's ``hpsi``);
        2 (default) adds the -(D' + D^2)/2m second-order terms, making the
        dynamics exactly equivalent to the diabatic propagation.

    (reference: pyqed/namd/adiabatic.py:34 ``NAMD``.)
    """

    def __init__(self, x, v, nac, mass=1.0, order=2):
        self.x = np.asarray(x)
        nx = self.x.size
        dx = self.x[1] - self.x[0]
        self.dx = float(dx)
        self.v = jnp.asarray(v)
        self.nac = jnp.asarray(nac)
        if self.v.ndim != 2 or self.v.shape[0] != nx:
            raise ValueError("v must be (nx, nstates)")
        if self.nac.shape != (nx, self.v.shape[1], self.v.shape[1]):
            raise ValueError("nac must be (nx, nstates, nstates)")
        self.nstates = int(self.v.shape[1])
        self.mass = float(mass)
        if order not in (1, 2):
            raise ValueError("order must be 1 or 2")
        self.order = order
        self.k = jnp.asarray(2.0 * np.pi * np.fft.fftfreq(nx, d=self.dx))
        if order == 2:
            # D'(x) + D^2, both static.  D is NOT periodic over the box
            # (adiabatic states swap character across a crossing), so a
            # spectral derivative would ring at the boundary — use the
            # non-periodic central-difference gradient instead.
            dD = jnp.asarray(np.gradient(np.asarray(self.nac), dx, axis=0))
            self._second = (dD + jnp.einsum("xab, xbc -> xac",
                                            self.nac, self.nac))
        else:
            self._second = None

    # ------------------------------------------------------------------ rhs
    def hpsi(self, psi):
        """H psi for psi of shape (nx, ns)
        (reference: pyqed/namd/adiabatic.py:252 — first-order only there)."""
        psi_k = jnp.fft.fft(psi, axis=0)
        kcol = self.k[:, None]
        tpsi = jnp.fft.ifft(kcol**2 / (2.0 * self.mass) * psi_k, axis=0)
        dpsi = jnp.fft.ifft(1j * kcol * psi_k, axis=0)       # d psi / dx
        vpsi = self.v * psi
        hp = tpsi + vpsi - jnp.einsum("xab, xb -> xa", self.nac,
                                      dpsi) / self.mass
        if self._second is not None:
            hp = hp - jnp.einsum("xab, xb -> xa", self._second,
                                 psi) / (2.0 * self.mass)
        return hp

    def rhs(self, psi):
        return -1j * self.hpsi(psi)

    # ------------------------------------------------------------------ run
    def run(self, psi0, dt, nt, nout=1, e_ops=None) -> Result:
        """RK4 propagation under ``lax.scan``
        (reference: pyqed/namd/adiabatic.py:172 ``evolve`` — a Python loop
        with a hard-coded matplotlib plot per window there)."""
        psi0 = jnp.asarray(psi0, dtype=jnp.complex64
                           if not jax.config.jax_enable_x64
                           else jnp.complex128)
        if psi0.shape != (self.x.size, self.nstates):
            raise ValueError("psi0 must be (nx, nstates)")
        rhs = self.rhs

        def step(psi):
            k1 = rhs(psi)
            k2 = rhs(psi + 0.5 * dt * k1)
            k3 = rhs(psi + 0.5 * dt * k2)
            k4 = rhs(psi + dt * k3)
            return psi + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

        def window(psi, _):
            psi = jax.lax.fori_loop(0, nout, lambda i, p: step(p), psi)
            return psi, psi

        if nt % nout != 0:
            raise ValueError(f"nt={nt} must be a multiple of nout={nout}")
        nwin = nt // nout
        psi_f, states = jax.lax.scan(window, psi0, None, length=nwin)
        # package convention (Result docstring, SPO): include the t=0 point
        states = jnp.concatenate([psi0[None], states], axis=0)
        r = Result(dt=dt, nt=nt, nout=nout)
        r.times = np.arange(nwin + 1) * (dt * nout)
        r.psi0 = psi0
        r.psi = psi_f
        r.states = states
        if e_ops is not None:
            r.observables = jnp.stack(
                [jnp.einsum("txa, xab, txb -> t", jnp.conj(states),
                            jnp.asarray(op), states) * self.dx
                 if jnp.asarray(op).ndim == 3 else
                 jnp.einsum("txa, ab, txb -> t", jnp.conj(states),
                            jnp.asarray(op), states) * self.dx
                 for op in e_ops], axis=-1)
        return r

    # ---------------------------------------------------------- observables
    def population(self, psi):
        """Adiabatic-state populations, (ns,) or (t, ns)."""
        psi = jnp.asarray(psi)
        return jnp.sum(jnp.abs(psi) ** 2, axis=-2) * self.dx

    def norm(self, psi):
        return jnp.sum(jnp.abs(psi) ** 2, axis=(-2, -1)) * self.dx

    def energy(self, psi):
        """<psi|H|psi> (real up to truncation order)."""
        return jnp.real(jnp.sum(jnp.conj(psi) * self.hpsi(psi)) * self.dx)


def diabatic_to_adiabatic_1d(x, dpes, smooth_gauge=True, ddpes=None):
    """Diagonalize a diabatic PES matrix field and return smooth adiabatic
    surfaces, the transformation U(x), and derivative couplings D(x).

    dpes : (nx, ns, ns) real symmetric diabatic matrix at each grid point.
    Returns (v, U, nac): v (nx, ns), U (nx, ns, ns) with columns the
    adiabatic states (smooth sign gauge along x), nac (nx, ns, ns) with
    D_ab = <a|d/dx b> via spectral differentiation of U.

    (reference: pyqed/namd/adiabatic.py:408 ``get_nac`` hand-codes the
    2-state analytic derivative for one model; this is general-ns.)
    """
    dpes = np.asarray(dpes)
    nx, ns, _ = dpes.shape
    w, u = np.linalg.eigh(dpes)          # ascending surfaces, real U
    if smooth_gauge:
        for i in range(1, nx):
            # parallel transport: align each column with its predecessor
            s = np.sign(np.sum(u[i] * u[i - 1], axis=0))
            s[s == 0] = 1.0
            u[i] *= s[None, :]
    dx = x[1] - x[0]
    if ddpes is not None:
        # Hellmann-Feynman: D_ab = <a| dH/dx |b> / (w_b - w_a), exact given
        # the analytic diabatic gradient — no grid-differentiation floor
        dH = np.einsum("xia, xij, xjb -> xab", u, np.asarray(ddpes), u)
        dw = w[:, None, :] - w[:, :, None]               # w_b - w_a
        with np.errstate(divide="ignore", invalid="ignore"):
            nac = np.where(np.abs(dw) > 1e-14, dH / dw, 0.0)
        idx = np.arange(ns)
        nac[:, idx, idx] = 0.0
    else:
        # U(x) is not periodic over the box (states swap character across a
        # crossing) — non-periodic central differences, not FFT
        du = np.gradient(u, dx, axis=0)
        nac = np.einsum("xia, xib -> xab", u, du)
    nac = 0.5 * (nac - np.transpose(nac, (0, 2, 1)))   # enforce antisymmetry
    return w, u, nac
