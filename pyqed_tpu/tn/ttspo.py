"""Tensor-train (MPS) compressed SPO / LDR nonadiabatic dynamics.

TPU-native counterpart of the reference's TT-format grid dynamics
(reference: pyqed/mps/namd.py:147 ``TT_LDR`` and its duplicate
pyqed/tensor/namd.py:26 — both are unfinished sketches: ``buildK``
iterates ``for d in self.ndim``, ``evolve_k`` is commented out, and
``run`` returns after the first loop pass.  This module supplies the
capability for real: a wavepacket on an ndim nuclear grid x electronic
index held as a tensor train ``|n_1 ... n_d alpha>`` with bounded bond
rank, propagated by Strang splitting

    U(dt) = e^{-i V dt/2} [ A ⊙ (⊗_d e^{-i T_d dt}) ] e^{-i V dt/2}

exactly as the dense flagship ``grid/ldr.py::LDRN`` — so at full rank
the two agree to machine precision (tests/test_ttspo.py) and at
truncated rank the TT beats the dense method's O(N^d) memory wall
(the reference notes "extremely expensive, ndim < 4" at
pyqed/ldr/ldr.py:329; the TT format is how it scales past that).

TPU design notes
----------------
* Every contraction and SVD runs through jnp (XLA); cores are small
  dense tensors so the SVD sweeps map onto the MXU-friendly batched
  linalg path.
* The kinetic propagator in the DIABATIC case (overlap A = 1) is a
  product of SINGLE-SITE operators e^{-i T_d dt} — applying it is
  rank-preserving and needs no compression at all; only the potential
  half-steps change ranks.  The reference never exploited this.
* With a nontrivial electronic overlap A(R, a; R', b), the kinetic
  factor becomes an MPO obtained by TT-SVD of the reshaped A-dressed
  propagator (rank_ovlp), matching pyqed/mps/namd.py:351-420.
* Bond ranks are data-dependent, so the sweep loop lives in host
  Python (not under jit) — each core update is still an XLA op.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .ttals import tt_svd
from ..grid.dvr import SineDVR, SincDVR


# --------------------------------------------------------------------------
# TT core algebra
# --------------------------------------------------------------------------

def tt_norm(cores) -> float:
    """<psi|psi>**0.5 by the transfer-matrix zipper."""
    E = jnp.ones((1, 1), dtype=cores[0].dtype)
    for G in cores:
        # E[a, a'] G*[a, n, b] G[a', n, b'] -> E'[b, b']
        E = jnp.einsum("ac, anb, cnd -> bd", E, jnp.conj(G), G)
    return float(jnp.sqrt(jnp.abs(E[0, 0])).real)


def tt_inner(a, b):
    """<a|b> for two TTs with identical physical dims."""
    E = jnp.ones((1, 1), dtype=jnp.result_type(a[0], b[0]))
    for Ga, Gb in zip(a, b):
        E = jnp.einsum("ac, anb, cnd -> bd", E, jnp.conj(Ga), Gb)
    return complex(E[0, 0])


def tt_to_dense(cores):
    out = cores[0]
    for G in cores[1:]:
        out = jnp.einsum("...a, anb -> ...nb", out, G)
    return jnp.squeeze(out, axis=(0, -1))


def tt_compress(cores, chi_max: int, eps: float = 0.0):
    """Canonicalize + truncate a TT to bond rank <= chi_max.

    Left-to-right QR sweep (left-canonicalize) followed by a
    right-to-left SVD sweep keeping the chi_max dominant singular
    vectors per bond — the quasi-optimal TT rounding algorithm.
    """
    cores = [jnp.asarray(G) for G in cores]
    d = len(cores)
    # left-to-right QR
    for k in range(d - 1):
        r1, n, r2 = cores[k].shape
        Q, R = jnp.linalg.qr(cores[k].reshape(r1 * n, r2))
        rnew = Q.shape[1]
        cores[k] = Q.reshape(r1, n, rnew)
        cores[k + 1] = jnp.einsum("ab, bnc -> anc", R, cores[k + 1])
    # right-to-left SVD truncation
    for k in range(d - 1, 0, -1):
        r1, n, r2 = cores[k].shape
        U, S, Vh = jnp.linalg.svd(cores[k].reshape(r1, n * r2),
                                  full_matrices=False)
        Snp = np.asarray(S)
        r = min(chi_max, Snp.size)
        if eps > 0 and Snp.size and Snp[0] > 0:
            r = min(r, max(1, int(np.sum(Snp > eps * Snp[0]))))
        cores[k] = Vh[:r].reshape(r, n, r2)
        cores[k - 1] = jnp.einsum("anb, bc -> anc",
                                  cores[k - 1], U[:, :r] * S[None, :r])
    return cores


def hadamard_apply(v_tt, psi, chi_max: Optional[int] = None):
    """Apply a diagonal (Hadamard) operator in TT form:
    (V ⊙ psi) with cores  (a,n,b) x (c,n,d) -> (ac,n,bd)."""
    out = []
    for Gv, Gp in zip(v_tt, psi):
        a1, n, a2 = Gv.shape
        c1, _, c2 = Gp.shape
        A = jnp.einsum("anb, cnd -> acnbd", Gv, Gp)
        out.append(A.reshape(a1 * c1, n, a2 * c2))
    if chi_max is not None:
        out = tt_compress(out, chi_max)
    return out


def mpo_apply(T, psi, chi_max: Optional[int] = None):
    """Apply an MPO with cores (a, i, j, b) (i = out, j = in) to a TT."""
    out = []
    for W, G in zip(T, psi):
        a1, ni, nj, a2 = W.shape
        c1, _, c2 = G.shape
        A = jnp.einsum("aijb, cjd -> acibd", W, G)
        out.append(A.reshape(a1 * c1, ni, a2 * c2))
    if chi_max is not None:
        out = tt_compress(out, chi_max)
    return out


# --------------------------------------------------------------------------
# TT-LDR / TT-SPO propagator
# --------------------------------------------------------------------------

class TT_LDR:
    """TT/MPS-format LDR dynamics with the SPO integrator.

    Sites 1..ndim are nuclear DVR grids, the LAST site is the electronic
    index (reference: pyqed/mps/namd.py:147 layout |n_1 ... n_d alpha>).

    Diabatic dynamics: leave ``A`` unset — the kinetic step is then a
    rank-preserving product of single-site phase matrices.  Exact
    nonadiabatic (LDR) dynamics: supply the electronic overlap tensor
    ``A`` of shape (*nx, ns, *nx, ns) as built by
    ``grid/ldr.py::LDRN.build_ovlp``.
    """

    def __init__(self, domains: Sequence, levels: Sequence, nstates: int = 2,
                 mass: Optional[Sequence] = None, dvr_type: str = "sine"):
        self.ndim = len(levels)
        self.nsites = self.L = self.ndim + 1
        self.nstates = nstates
        self.mass = list(mass) if mass is not None else [1.0] * self.ndim

        self.dvr = []
        for d in range(self.ndim):
            npts = 2 ** levels[d] - 1
            if dvr_type == "sine":
                self.dvr.append(SineDVR(*domains[d], npts, mass=self.mass[d]))
            elif dvr_type == "sinc":
                a, b = domains[d]
                self.dvr.append(SincDVR(b - a, npts, x0=0.5 * (a + b),
                                        mass=self.mass[d]))
            else:
                raise ValueError(f"DVR {dvr_type} is not supported.")
        self.x = [np.asarray(dvr.x) for dvr in self.dvr]
        self.nx = [len(x) for x in self.x]
        self.dims = self.nx + [nstates]

        self.apes = None        # (*nx, nstates) adiabatic/diabatic PES
        self.A = None           # electronic overlap tensor (LDR)
        self.exp_K = None

    # ------------------------------------------------------------- inputs
    def set_apes(self, v):
        v = jnp.asarray(v)
        assert v.shape == tuple(self.dims), \
            f"APES shape {v.shape} != {tuple(self.dims)}"
        self.apes = v
        return self

    set_dpes = set_apes   # diabatic-diagonal naming alias

    def set_ovlp(self, A):
        A = jnp.asarray(A)
        assert A.shape == (*self.nx, self.nstates, *self.nx, self.nstates)
        self.A = A
        return self

    # ------------------------------------------------------------ builders
    def buildK(self, dt):
        """Per-dimension single-site kinetic propagators e^{-i T_d dt}."""
        self.exp_K = [jnp.asarray(dvr.expT(dt)) for dvr in self.dvr]
        return self.exp_K

    def _kinetic_mpo(self, rank_ovlp: int):
        """A-dressed kinetic propagator as an MPO (nonadiabatic path).

        Reshape A to (n_1 n_1', ..., n_d n_d', ns ns'), TT-SVD at
        rank_ovlp, fold exp_K into the nuclear cores
        (reference: pyqed/mps/namd.py:368-420).
        """
        d = self.ndim
        ns = self.nstates
        # A axes: (x_1..x_d, a, x'_1..x'_d, b) -> (x_1 x'_1)...(a b)
        perm = []
        for i in range(d):
            perm += [i, d + 1 + i]
        perm += [d, 2 * d + 1]
        At = jnp.transpose(self.A, perm)
        shape = [n * n for n in self.nx] + [ns * ns]
        factors = tt_svd(np.asarray(At.reshape(shape)), max_rank=rank_ovlp)
        T = []
        n = self.dims
        for l in range(self.L):
            b1, _, b2 = factors[l].shape
            t = jnp.asarray(factors[l]).reshape(b1, n[l], n[l], b2)
            if l < d:
                # t[b, i, j, c] holds A(i out, j in); the kinetic phase
                # multiplies ELEMENTWISE over the (out, in) pair — the
                # dense LDRN contraction is A ⊙ (⊗_d exp_K), a Hadamard
                # product on the nuclear index pairs, not a matmul
                t = t * self.exp_K[l][None, :, :, None]
            T.append(t)
        return T

    def _v_tt(self, dt, rank_pes: int):
        """TT of the half-step potential propagator e^{-i V dt/2}."""
        V = jnp.exp(-0.5j * dt * self.apes)
        return [jnp.asarray(G)
                for G in tt_svd(np.asarray(V), max_rank=rank_pes)]

    # ---------------------------------------------------------------- run
    def run(self, psi0, dt, nt, rank_state: int = 16,
            rank_pes: int = 16, rank_ovlp: int = 16, nout: int = 1,
            e_ops=()):
        """Propagate nt total steps, recording every nout (same
        (nt, nout) convention as LDRN.run / SPON.run / Ehrenfest.run —
        swapping the dense LDRN for TT_LDR keeps the dynamics length).

        psi0: dense (*nx, nstates) array or list of TT cores.
        Returns a dict with 'cores_list' (TT snapshots), 'rdm_el',
        'norms', and per-e_op diagonal-observable expectations.
        """
        if self.apes is None:
            raise ValueError("APES has not been constructed.")
        psi = (psi0 if isinstance(psi0, (list, tuple))
               else [jnp.asarray(G)
                     for G in tt_svd(np.asarray(psi0), max_rank=rank_state)])
        psi = list(psi)

        self.buildK(dt)
        v_tt = self._v_tt(dt, rank_pes)
        T = self._kinetic_mpo(rank_ovlp) if self.A is not None else None

        # diagonal observables O(R, alpha): TT-decompose once, evaluate
        # <psi| O ⊙ psi> per snapshot
        eop_tts = []
        for O in (e_ops or ()):
            O = np.asarray(O)
            assert O.shape == tuple(self.dims), \
                f"e_op shape {O.shape} != {tuple(self.dims)} (diagonal " \
                "grid x state observables only)"
            eop_tts.append([jnp.asarray(G)
                            for G in tt_svd(O, max_rank=rank_pes)])

        snaps, rdms, norms, expects = [], [], [], []

        def record(p):
            snaps.append([np.asarray(G) for G in p])
            rdms.append(np.asarray(self.rdm_el(p)))
            norms.append(tt_norm(p))
            if eop_tts:
                expects.append([complex(tt_inner(p, hadamard_apply(ot, p)))
                                for ot in eop_tts])

        record(psi)
        for _ in range(max(nt // nout, 0)):
            for _ in range(nout):
                psi = hadamard_apply(v_tt, psi, chi_max=rank_state)
                if T is None:
                    # diabatic: single-site kinetic phases, rank-preserving
                    psi = [jnp.einsum("mn, anb -> amb", K, G)
                           for K, G in zip(self.exp_K, psi[:-1])] + [psi[-1]]
                else:
                    psi = mpo_apply(T, psi, chi_max=rank_state)
                psi = hadamard_apply(v_tt, psi, chi_max=rank_state)
            record(psi)

        out = {"cores_list": snaps, "rdm_el": np.array(rdms),
               "norms": np.array(norms)}
        if eop_tts:
            out["expect"] = np.array(expects)
        return out

    # ---------------------------------------------------------- observables
    def rdm_el(self, cores):
        """Electronic reduced density matrix rho[a, b] = <psi| (|b><a| ⊗ 1) |psi>.

        Zipper over the nuclear sites, electronic indices left open
        (cost O(L chi^3 n) — no dense reconstruction).
        """
        E = jnp.ones((1, 1), dtype=cores[0].dtype)
        for G in cores[:-1]:
            E = jnp.einsum("ac, anb, cnd -> bd", E, jnp.conj(G), G)
        Ge = cores[-1]                       # (chi, ns, 1)
        return jnp.einsum("ac, amb, cnb -> mn", E, jnp.conj(Ge), Ge)

    def population(self, cores):
        return jnp.real(jnp.diag(self.rdm_el(cores)))
