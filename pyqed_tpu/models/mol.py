"""Multi-level system (`Mol`) and closed-system solver (`SESolver`).

TPU-native counterpart of the reference model/solver layer
(reference: pyqed/mol.py — ``Mol:184``, ``SESolver:1369``,
``_quantum_dynamics:1603``, ``driven_dynamics:1862``, ``_propagator:1569``,
``mls:1988``).

Design: propagation is a pure ``(psi, t) -> psi`` step under ``lax.scan``
(:mod:`pyqed_tpu.core.dynamics`) instead of the reference's Python loop of
sparse matvecs. Two stepping engines:

- ``method='rk4'``: classic RK4 (the reference integrator), needed for the
  1e-8 golden parity tests;
- ``method='expm'`` (default for time-independent H): one exact
  eigendecomposition at setup then diagonal phase evolution — unconditionally
  stable, one matmul pair per sampling window.

Driven dynamics evaluates the pulse *inside* the jitted RK4 stages — the
field is a traced function of t, so XLA fuses H(t) assembly into the stage
matmuls. Sign convention: H(t) = H0 − μ E(t) (reference: pyqed/mol.py:1905).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.linalg import dag, isdiag, obs, transform, sort_eig
from ..ops.operators import basis
from ..core.result import Result
from ..core.dynamics import run_solver, rk4_step_t
from ..units import au2ev


def tdse(psi, H):
    """RHS of the TDSE: -i H psi (reference: pyqed/mol.py:1322)."""
    return -1j * (H @ psi)


class Mol:
    """N-level system: Hamiltonian + transition dipole(s)
    (reference: pyqed/mol.py:184)."""

    def __init__(self, H, edip=None, lowering=None, edip_rms=None, gamma=None):
        self.H = jnp.asarray(H)
        self.E = jnp.diagonal(self.H).real if isdiag(self.H) else None
        self.nonhermH = None
        self._edip = jnp.asarray(edip) if edip is not None else None
        self.dip = self._edip
        self._edip_rms = jnp.asarray(edip_rms) if edip_rms is not None else None
        if lowering is not None:
            self.lowering = jnp.asarray(lowering)
            self.raising = dag(self.lowering)
        elif edip is not None:
            # default: split the dipole in the (ascending-energy) basis —
            # lowering connects high -> low, i.e. the strict upper triangle
            # (the reference leaves this commented at pyqed/mol.py:243 and
            # its Polariton RWA branch then crashes on mol.raising; made
            # real here so Polariton.getH(RWA=True) works out of the box)
            self.lowering = jnp.triu(self._edip, k=1)
            self.raising = dag(self.lowering)
        else:
            self.lowering = self.raising = None
        self.nstates = self.dim = self.size = self.H.shape[0]
        self.idm = jnp.eye(self.dim, dtype=self.H.dtype)
        self.gamma = gamma
        self.mdip = None
        self.dephasing = 0.0

    # ---------------------------------------------------------------- dipole
    @property
    def edip(self):
        return self._edip

    @edip.setter
    def edip(self, edip):
        self._edip = jnp.asarray(edip)

    @property
    def edip_rms(self):
        """Root-mean-square dipole over Cartesian components
        (reference: pyqed/mol.py:287)."""
        if self._edip_rms is None:
            if self._edip is None:
                raise ValueError("edip not set")
            if self._edip.ndim == 3:
                self._edip_rms = jnp.sqrt(
                    jnp.sum(jnp.abs(self._edip) ** 2, axis=-1))
            else:
                self._edip_rms = jnp.abs(self._edip)
        return self._edip_rms

    @edip_rms.setter
    def edip_rms(self, v):
        self._edip_rms = jnp.asarray(v) if v is not None else None

    def set_dipole(self, dip):
        self.dip = jnp.asarray(dip)

    def set_edip(self, edip, pol=None):
        self.edip_rms = edip

    def set_mdip(self, mdip):
        self.mdip = mdip

    # ----------------------------------------------------------------- decay
    def set_decay_for_all(self, gamma):
        g = [gamma] * self.nstates
        g[0] = 0.0
        self.gamma = np.asarray(g)

    def set_decay(self, gamma):
        self.gamma = np.asarray(gamma)

    def set_dephasing(self, gamma):
        self.dephasing = gamma

    def set_lifetime(self, tau):
        self.lifetime = tau

    def get_nonhermH(self):
        """H − i diag(gamma) (reference: pyqed/mol.py:417)."""
        if self.gamma is None:
            raise ValueError("Please set gamma first.")
        self.nonhermH = self.H - 1j * jnp.diag(jnp.asarray(self.gamma, dtype=float))
        return self.nonhermH

    get_nonhermitianH = get_nonhermH

    def getH(self):
        return self.H

    def get_dip(self):
        return self.dip

    def get_edip(self):
        return self._edip

    def get_dm(self):
        """Ground-state density matrix |0><0| (reference: pyqed/mol.py:434)."""
        psi = self.groundstate()
        return jnp.outer(psi, psi.conj())

    def get_p_from_r(self):
        """Momentum matrix from the position/dipole matrix,
        p_ij = i m (E_i - E_j) x_ij from p = i m [H, x] (reference:
        pyqed/mol.py:304 — inert there: it calls the nonexistent
        ``np.substract``, and its sign contradicts its own docstring;
        the harmonic-oscillator test pins the sign here)."""
        E = self.E if self.E is not None else self.eigenenergies()
        return 1j * (E[:, None] - E[None, :]) * self.edip

    # ----------------------------------------------------------- eigenstates
    def eigenenergies(self):
        return jnp.linalg.eigvalsh(self.H)

    def eigvals(self):
        if isdiag(self.H):
            return jnp.diagonal(self.H).real
        return jnp.linalg.eigvalsh(self.H)

    def eigenstates(self, k: Optional[int] = None):
        w, v = jnp.linalg.eigh(self.H)
        if k is not None and k < self.dim:
            return w[:k], v[:, :k]
        return w, v

    def groundstate(self, method="trivial"):
        if method == "trivial":
            return basis(self.dim, 0, dtype=self.H.dtype)
        w, v = self.eigenstates(k=1)
        return v[:, 0]

    ground_state = groundstate

    def energy(self, psi):
        return obs(psi, self.H)

    # -------------------------------------------------------------- dynamics
    def run(self, psi0=None, dt=0.01, e_ops=None, nt=1, Nt=None, nout=1,
            t0=0.0, pulse=None, edip=None, method="rk4", store_states=True):
        """Dynamics dispatch (reference: pyqed/mol.py:628)."""
        nt = Nt if Nt is not None else nt
        solver = SESolver(self.H)
        if psi0 is None:
            psi0 = self.groundstate()
        if pulse is not None and edip is None:
            edip = self.edip
        return solver.run(psi0=psi0, dt=dt, Nt=nt, e_ops=e_ops, nout=nout,
                          t0=t0, pulse=pulse, edip=edip, method=method,
                          store_states=store_states)

    evolve = run

    def quantum_dynamics(self, psi0, dt=0.001, Nt=1, e_ops=None, nout=1, t0=0.0):
        return SESolver(self.H).run(psi0=psi0, dt=dt, Nt=Nt, e_ops=e_ops,
                                    nout=nout, t0=t0)

    def driven_dynamics(self, psi0, pulse, dt=0.001, Nt=1, e_ops=None,
                        nout=1, t0=0.0):
        return SESolver(self.H).run(psi0=psi0, dt=dt, Nt=Nt, e_ops=e_ops,
                                    nout=nout, t0=t0, pulse=pulse,
                                    edip=self.edip)

    def Floquet(self, omegad, E0, nt=31):
        """Sambe-space Floquet treatment of this system under a
        monochromatic dipole drive (reference: pyqed/mol.py Mol.Floquet —
        dangling there, its target class is commented out at
        pyqed/floquet/Floquet.py:1043)."""
        from ..floquet import Floquet as _Floquet
        return _Floquet(self.H, self.edip, omegad, E0, nt=nt)

    def deom(self, bath, coupling=None, lmax=4, decomposition="pade",
             nexp=2, **kwargs):
        """Hierarchical-equations-of-motion solver for this system in
        `bath` (reference: pyqed/mol.py Mol.deom -> DEOMSolver).

        `coupling`: system operator(s) the bath couples to (defaults to
        the dipole). Returns a :class:`~pyqed_tpu.open.heom.HEOMSolver`;
        drive it with ``run(edip=, pulse=)`` for laser-driven DEOM."""
        from ..open.heom import HEOMSolver
        if coupling is None:
            coupling = self.edip
        ops = coupling if isinstance(coupling, (list, tuple)) else [coupling]
        if hasattr(bath, "set_bath_ops") and getattr(bath, "bath_ops", None) is None:
            bath.set_bath_ops([jnp.asarray(o, dtype=complex) for o in ops])
        return HEOMSolver(self.H.astype(complex), bath=bath, lmax=lmax,
                          decomposition=decomposition, nexp=nexp, **kwargs)

    def multi(self, nmol=2):
        """Direct-product aggregate of `nmol` identical copies:
        H_tot = sum_n 1x..xHx..x1 and the total dipole likewise
        (reference: pyqed/mol.py Mol.multi with scipy.sparse kron).
        Returns (H_tot, edip_tot)."""
        H, I, edip = self.H, self.idm, self.edip

        def embed(op, n):
            ops = [I] * nmol
            ops[n] = op
            out = ops[0]
            for o in ops[1:]:
                out = jnp.kron(out, o)
            return out

        h_tot = sum(embed(H, n) for n in range(nmol))
        edip_tot = sum(embed(edip, n) for n in range(nmol))
        return h_tot, edip_tot

    # ---------------------------------------------------------- spectroscopy
    def absorption(self, omegas, method="sos", **kwargs):
        """Linear absorption (reference: pyqed/mol.py:766)."""
        from ..signal.sos import absorption as sos_absorption
        return sos_absorption(self, omegas, **kwargs)

    def PE(self, pump, probe, t2=0.0, **kwargs):
        from ..signal.sos import photon_echo
        return photon_echo(self, pump=pump, probe=probe, t2=t2, **kwargs)

    photon_echo = PE

    def PE2(self, omega1, omega2, t3=0.0, **kwargs):
        from ..signal.sos import photon_echo_t3
        return photon_echo_t3(self, omega1=omega1, omega2=omega2, t3=t3, **kwargs)

    def cars(self, shift, omega1, t2=0.0, **kwargs):
        from ..signal.sos import cars
        return cars(self, shift=shift, omega1=omega1, t2=t2, **kwargs)

    def tpa(self, omegas, **kwargs):
        from ..signal.sos import TPA
        return TPA(self, omegas, **kwargs)


def mls(dim=3):
    """A simple 3-level model system (reference: pyqed/mol.py:1988)."""
    E = jnp.array([0.0, 0.6, 10.0]) / au2ev
    H = jnp.diag(E)
    dip = jnp.zeros((3, 3)).at[1, 2].set(1.0).at[2, 1].set(1.0) \
                           .at[0, 1].set(1.0).at[1, 0].set(1.0)
    return Mol(H, edip=dip)


class SESolver:
    """Time-dependent Schrödinger equation solver
    (reference: pyqed/mol.py:1369)."""

    def __init__(self, H=None):
        self.H = jnp.asarray(H) if H is not None else None
        self.groundstate = None

    def run(self, psi0=None, dt=0.01, Nt=1, e_ops=None, nout=1, t0=0.0,
            edip=None, pulse=None, method="rk4", store_states=True,
            nt=None) -> Result:
        if nt is not None:       # lowercase alias, same as Mol.run
            Nt = nt
        if psi0 is None:
            psi0 = self.groundstate
        psi0 = jnp.asarray(psi0)
        H0 = self.H
        cdtype = jnp.result_type(H0, psi0, 1j)
        psi0 = psi0.astype(cdtype)
        H0 = H0.astype(cdtype)

        if pulse is None:
            if method == "expm":
                # exact stepping: psi -> V e^{-i w dt} V† psi
                w, V = jnp.linalg.eigh(H0)
                phase = jnp.exp(-1j * w * dt)

                def step(psi, t):
                    return V @ (phase * (dag(V) @ psi))
            else:
                def step(psi, t):
                    return rk4_step_t(lambda y, tt: -1j * (H0 @ y))(psi, t, dt)
        else:
            pulses = pulse if isinstance(pulse, (list, tuple)) else [pulse]
            if edip is None:
                raise ValueError(
                    "Electric dipole must be provided for laser-driven dynamics.")
            edips = edip if isinstance(edip, (list, tuple)) else [edip] * len(pulses)
            edips = [jnp.asarray(d).astype(cdtype) for d in edips]

            # accept Pulse-like objects (with .efield) or plain
            # jax-traceable callables E(t)
            fields = [p.efield if hasattr(p, "efield") else p
                      for p in pulses]

            def Ht(t):
                H = H0
                for d, E in zip(edips, fields):
                    H = H - E(t) * d
                return H

            def step(psi, t):
                return rk4_step_t(lambda y, tt: -1j * (Ht(tt) @ y))(psi, t, dt)

        return run_solver(step, psi0, dt, Nt, e_ops=e_ops, nout=nout, t0=t0,
                          store_states=store_states, is_dm=False)

    def propagator(self, dt, Nt, method="diag"):
        from ..ops.expm import propagators
        return propagators(self.H, dt, Nt, method=method)

    # ---------------------------------------------------- correlation suite
    def correlation_3op_1t(self, psi0, oplist, dt, Nt):
        """<A B(t) C> (reference: pyqed/mol.py:1475)."""
        H = self.H
        a_op, b_op, c_op = [jnp.asarray(o) for o in oplist]
        ket = SESolver(H).run(psi0=c_op @ psi0, dt=dt, Nt=Nt,
                              store_states=True).states
        bra = SESolver(H).run(psi0=dag(a_op) @ psi0, dt=dt, Nt=Nt,
                              store_states=True).states
        return jnp.einsum("ti, ij, tj -> t", bra.conj(), b_op, ket)[:Nt]

    def correlation_2op_1t(self, psi0, oplist, dt, Nt):
        a_op, b_op = oplist
        eye = jnp.eye(self.H.shape[0], dtype=self.H.dtype)
        return self.correlation_3op_1t(psi0, [a_op, b_op, eye], dt, Nt)

    def correlation_3op_2t(self, psi0, oplist, dt, Nt, Ntau):
        """<A(t) B(t+tau) C(t)> (reference: pyqed/mol.py:1503)."""
        H = self.H
        a_op, b_op, c_op = [jnp.asarray(o) for o in oplist]
        psi_t = SESolver(H).run(psi0=psi0, dt=dt, Nt=Nt, store_states=True).states[:Nt]

        def one_t(psi):
            ket = SESolver(H).run(psi0=c_op @ psi, dt=dt, Nt=Ntau,
                                  store_states=True).states[:Ntau]
            bra = SESolver(H).run(psi0=dag(a_op) @ psi, dt=dt, Nt=Ntau,
                                  store_states=True).states[:Ntau]
            return jnp.einsum("ti, ij, tj -> t", bra.conj(), b_op, ket)

        return jax.lax.map(one_t, psi_t)

    def correlation_4op_1t(self, psi0, oplist, dt=0.005, Nt=1):
        a, b, c, d = oplist
        return self.correlation_3op_1t(psi0, [a, b @ c, d], dt, Nt)

    def correlation_4op_2t(self, psi0, oplist, dt=0.005, Nt=1, Ntau=1):
        a, b, c, d = oplist
        return self.correlation_3op_2t(psi0, [a, b @ c, d], dt, Nt, Ntau)


def quantum_dynamics(ham, psi0, dt=0.001, Nt=1, obs_ops=None, nout=1,
                     t0=0.0):
    """Field-free TDSE propagation, reference drop-in (reference:
    pyqed/phys.py:1325 — there an RK4 loop writing obs.dat; here the
    SESolver scan returning a Result)."""
    return SESolver(ham).run(psi0=psi0, dt=dt, Nt=Nt, e_ops=obs_ops,
                             nout=nout, t0=t0)


def driven_dynamics(ham, dip, psi0, pulse, dt=0.001, Nt=1, obs_ops=None,
                    nout=1, t0=0.0):
    """Laser-driven TDSE propagation, reference drop-in (reference:
    pyqed/phys.py:1393): H(t) = H - E(t) mu."""
    return SESolver(ham).run(psi0=psi0, dt=dt, Nt=Nt, e_ops=obs_ops,
                             nout=nout, t0=t0, pulse=pulse, edip=dip)


def read_input(fname_e, fname_edip, g_included=True):
    """Read energy levels + Cartesian dipole-moment files from quantum
    chemistry output (reference: pyqed/mol.py read_input). Returns
    (E (nstates,), edip (nstates, nstates, 3))."""
    E = np.genfromtxt(fname_e)
    if not g_included:
        E = np.insert(E, 0, 0.0)
    nstates = len(E)
    edip = np.zeros((nstates, nstates, 3))
    for k in range(3):
        edip[:, :, k] = np.genfromtxt(fname_edip[k], unpack=False)
    return E, edip
