"""Matrix-product states/operators, two-site DMRG, and TEBD.

TPU-native counterpart of the reference tensor-network layer
(reference: pyqed/mps/mps.py — ``MPS:37`` (B-form with bond singular
values), ``LeftCanonical:486``, ``MPO:640``, ``apply_mpo:702``, zipper
expectation ``:788-834``, ``two_site_dmrg:1200`` with Lanczos
``HamiltonianMultiply:1117``, ``tebd:1422``; the duplicate pyqed/tensor/
directory is unified here per SURVEY.md §7).

Conventions: B tensors have legs (vL, p, vR); MPO W tensors have legs
(wL, wR, p, p*). All contractions are jnp einsums (MXU); the DMRG
eigensolve is a fixed-iteration Lanczos on the effective two-site
Hamiltonian, implemented as pure jnp so it runs identically on CPU and TPU
(no scipy LinearOperator host round-trips).
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


class MPS:
    """Finite MPS in right-canonical (B) form with bond singular values
    (reference: pyqed/mps/mps.py:37)."""

    def __init__(self, Bs: Sequence, Ss: Optional[Sequence] = None,
                 bc="finite", form="B"):
        self.Bs = [jnp.asarray(B) for B in Bs]
        self.L = len(Bs)
        if Ss is None:
            Ss = [jnp.ones(1) for _ in range(self.L)]
        self.Ss = [jnp.asarray(S) for S in Ss]
        self.bc = bc
        self.form = form

    @classmethod
    def from_product_state(cls, local_states):
        Bs = [jnp.asarray(v, dtype=complex).reshape(1, -1, 1)
              for v in local_states]
        Ss = [jnp.ones(1) for _ in local_states]
        return cls(Bs, Ss)

    @classmethod
    def random(cls, L, d=2, chi=8, seed=0):
        """Random normalized MPS in proper (Ss, Bs) canonical form —
        spans all symmetry sectors, the recommended DMRG seed for
        Hamiltonians whose product eigenstates trap local sweeps.

        Two-pass canonicalization: L→R QR to left-canonical form, then
        R→L SVD; with the left side left-canonical the singular values
        ARE the Schmidt spectra."""
        rng = np.random.default_rng(seed)
        chis = [1] + [min(chi, d ** (i + 1), d ** (L - i - 1))
                      for i in range(L - 1)] + [1]
        Ms = [jnp.asarray(rng.standard_normal((chis[i], d, chis[i + 1]))
                          + 1j * rng.standard_normal(
                              (chis[i], d, chis[i + 1])))
              for i in range(L)]
        # pass 1: L -> R QR
        for i in range(L - 1):
            chiL, dd, chiR = Ms[i].shape
            Q, R = jnp.linalg.qr(Ms[i].reshape(chiL * dd, chiR))
            Ms[i] = Q.reshape(chiL, dd, Q.shape[1])
            Ms[i + 1] = jnp.einsum("ab, bpc -> apc", R, Ms[i + 1])
        Ms[-1] = Ms[-1] / jnp.linalg.norm(Ms[-1].reshape(-1))
        # pass 2: R -> L SVD
        Bs = [None] * L
        Ss = [jnp.ones(1)] * L
        M = Ms[-1]
        for i in range(L - 1, 0, -1):
            chiL, dd, chiR = M.shape
            U, S, Vh = jnp.linalg.svd(M.reshape(chiL, dd * chiR),
                                      full_matrices=False)
            Bs[i] = Vh.reshape(Vh.shape[0], dd, chiR)
            Ss[i] = S / jnp.linalg.norm(S)
            M = jnp.einsum("apb, bc, c -> apc", Ms[i - 1], U, S)
        Bs[0] = M / jnp.linalg.norm(M.reshape(-1))
        return cls(Bs, Ss)

    def pad_noise(self, chi, noise=1e-8, seed=0):
        """Return a copy with bond dimensions enlarged to ``chi`` by tiny
        random entries, re-canonicalized. TDVP from a low-rank (product)
        state suffers an O(dt)-per-unit-time projection error until the
        rank grows; seeding the extra bond directions removes it (the
        state change is of order ``noise``)."""
        rng = np.random.default_rng(seed)
        L = self.L
        dims = [B.shape[1] for B in self.Bs]
        chis = [1] + [min(chi, int(np.prod(dims[:i + 1])),
                          int(np.prod(dims[i + 1:])))
                      for i in range(L - 1)] + [1]
        Ms = []
        for i in range(L):
            B = np.asarray(self.get_theta1(i) if i == 0 else self.Bs[i])
            tgt = (chis[i], dims[i], chis[i + 1])
            M = noise * (rng.standard_normal(tgt)
                         + 1j * rng.standard_normal(tgt))
            M[:B.shape[0], :, :B.shape[2]] += B
            Ms.append(jnp.asarray(M))
        # two-pass canonicalization (see MPS.random)
        for i in range(L - 1):
            chiL, dd, chiR = Ms[i].shape
            Q, R = jnp.linalg.qr(Ms[i].reshape(chiL * dd, chiR))
            Ms[i] = Q.reshape(chiL, dd, Q.shape[1])
            Ms[i + 1] = jnp.einsum("ab, bpc -> apc", R, Ms[i + 1])
        Ms[-1] = Ms[-1] / jnp.linalg.norm(Ms[-1].reshape(-1))
        Bs = [None] * L
        Ss = [jnp.ones(1)] * L
        M = Ms[-1]
        for i in range(L - 1, 0, -1):
            chiL, dd, chiR = M.shape
            U, S, Vh = jnp.linalg.svd(M.reshape(chiL, dd * chiR),
                                      full_matrices=False)
            Bs[i] = Vh.reshape(Vh.shape[0], dd, chiR)
            Ss[i] = S / jnp.linalg.norm(S)
            M = jnp.einsum("apb, bc, c -> apc", Ms[i - 1], U, S)
        Bs[0] = M / jnp.linalg.norm(M.reshape(-1))
        return MPS(Bs, Ss)

    @classmethod
    def from_dense(cls, psi, dims, chi_max=None):
        """Exact MPS decomposition of a state vector by sequential SVD."""
        psi = jnp.asarray(psi).reshape(1, -1)
        Bs, Ss = [], []
        L = len(dims)
        # left-to-right QR to A-form, then convert; simpler: do
        # right-to-left SVDs producing B tensors directly
        rest = psi  # (chi_left_total, prod(dims))
        tensors = []
        chi_r = 1
        mats = []
        m = jnp.asarray(psi).reshape(int(np.prod(dims)), 1)
        for i in reversed(range(L)):
            d = dims[i]
            m = m.reshape(-1, d * chi_r)
            U, S, Vh = jnp.linalg.svd(m, full_matrices=False)
            if chi_max is not None and S.shape[0] > chi_max:
                U, S, Vh = U[:, :chi_max], S[:chi_max], Vh[:chi_max]
            keep = S > 1e-14
            nk = int(jnp.sum(keep))
            U, S, Vh = U[:, :nk], S[:nk], Vh[:nk]
            B = Vh.reshape(nk, d, chi_r)
            tensors.insert(0, B)
            mats.insert(0, S)
            m = U * S[None, :]
            chi_r = nk
        Ss = [jnp.ones(1)] + mats[1:]
        mps = cls(tensors, Ss)
        # absorb leftover scalar phase/norm
        mps.Bs[0] = mps.Bs[0] * m.reshape(1, 1, 1)[0, 0, 0]
        return mps

    def copy(self):
        return MPS([B for B in self.Bs], [S for S in self.Ss], self.bc,
                   self.form)

    def get_bond_dimensions(self):
        return [B.shape[2] for B in self.Bs]

    def to_dense(self):
        psi = self.Bs[0]
        for B in self.Bs[1:]:
            psi = jnp.einsum("apb, bqc -> apqc", psi, B).reshape(
                psi.shape[0], -1, B.shape[2])
        return psi.reshape(-1)

    # ---------------------------------------------------------------- forms
    def get_theta1(self, i):
        """S_i B_i (reference: pyqed/mps/mps.py:103)."""
        return jnp.einsum("a, apb -> apb", self.Ss[i], self.Bs[i])

    def get_theta2(self, i):
        """Two-site wavefunction (reference: pyqed/mps/mps.py:110)."""
        j = i + 1
        return jnp.einsum("apb, bqc -> apqc", self.get_theta1(i), self.Bs[j])

    # ---------------------------------------------------------- observables
    def site_expectation_value(self, op):
        """<op> on every site (reference: pyqed/mps/mps.py:118)."""
        op = jnp.asarray(op)
        out = []
        for i in range(self.L):
            th = self.get_theta1(i)
            out.append(jnp.einsum("apb, pq, aqb ->", th.conj(), op, th))
        return jnp.stack(out)

    def bond_expectation_value(self, op):
        """<op_two_site> on every bond (reference: pyqed/mps/mps.py:128)."""
        op = jnp.asarray(op)
        out = []
        for i in range(self.L - 1):
            th = self.get_theta2(i)
            d1, d2 = th.shape[1], th.shape[2]
            o = op.reshape(d1, d2, d1, d2)
            out.append(jnp.einsum("apqb, pqrs, arsb ->", th.conj(), o, th))
        return jnp.stack(out)

    def correlation_function(self, op_i, i, op_j, j):
        """<op_i(i) op_j(j)> (reference: pyqed/mps/mps.py:163)."""
        assert i < j
        op_i, op_j = jnp.asarray(op_i), jnp.asarray(op_j)
        th = self.get_theta1(i)
        C = jnp.einsum("apb, pq, aqc -> bc", th.conj(), op_i, th)
        for k in range(i + 1, j):
            B = self.Bs[k]
            C = jnp.einsum("bc, bpd, cpe -> de", C, B.conj(), B)
        B = self.Bs[j]
        return jnp.einsum("bc, bpd, pq, cqd ->", C, B.conj(), op_j, B)

    def entanglement_entropy(self):
        """von Neumann entropy at every internal bond
        (reference: pyqed/mps/mps.py:91)."""
        out = []
        for i in range(1, self.L):
            S = self.Ss[i]
            S2 = S**2
            S2 = S2 / jnp.sum(S2)
            out.append(-jnp.sum(S2 * jnp.log(S2 + 1e-300)))
        return jnp.stack(out)

    def norm(self):
        return jnp.linalg.norm(self.to_dense())

    def compress(self, chi_max, return_error=False):
        """Truncate every bond to dimension <= chi_max by a two-pass
        canonicalization sweep (L->R QR, then R->L truncated SVD)
        (reference: pyqed/mps/mps.py MPS.compress). Returns a new MPS
        (and the summed discarded weight if return_error)."""
        L = self.L
        Ms = [B for B in self.Bs]
        for i in range(L - 1):
            chiL, d, chiR = Ms[i].shape
            Q, R = jnp.linalg.qr(Ms[i].reshape(chiL * d, chiR))
            Ms[i] = Q.reshape(chiL, d, Q.shape[1])
            Ms[i + 1] = jnp.einsum("ab, bpc -> apc", R, Ms[i + 1])
        Bs = [None] * L
        Ss = [jnp.ones(1)] * L
        err = 0.0
        M = Ms[-1]
        for i in range(L - 1, 0, -1):
            chiL, d, chiR = M.shape
            U, S, Vh = jnp.linalg.svd(M.reshape(chiL, d * chiR),
                                      full_matrices=False)
            keep = min(chi_max, S.shape[0])
            err += float(jnp.sum(S[keep:] ** 2))
            U, S, Vh = U[:, :keep], S[:keep], Vh[:keep]
            Bs[i] = Vh.reshape(keep, d, chiR)
            nrm = jnp.linalg.norm(S)
            Ss[i] = S / nrm
            M = jnp.einsum("apb, bc, c -> apc", Ms[i - 1], U, S)
        Bs[0] = M / jnp.linalg.norm(M.reshape(-1))
        out = MPS(Bs, Ss, bc=self.bc, form=self.form)
        return (out, err) if return_error else out

    def correlation_length(self):
        """Correlation length from the second-largest transfer-matrix
        eigenvalue, xi = -L / ln|lambda_2 / lambda_1| (reference:
        pyqed/mps/mps.py MPS.correlation_length — infinite bc only)."""
        if self.bc != "infinite":
            raise ValueError("correlation_length requires bc='infinite'")
        B = self.Bs[0]
        chi = B.shape[0]
        T = jnp.einsum("apb, cpd -> acbd", B, jnp.conj(B))
        for i in range(1, self.L):
            B = self.Bs[i]
            T = jnp.einsum("acbd, bpe, dpf -> acef", T, B, jnp.conj(B))
        T = T.reshape(chi * chi, chi * chi)
        lam = jnp.linalg.eigvals(T)
        mags = jnp.sort(jnp.abs(lam))[::-1]
        return float(-self.L / jnp.log(mags[1] / mags[0]))

    def overlap(self, other):
        C = jnp.einsum("apb, apc -> bc", self.Bs[0].conj(), other.Bs[0])
        for k in range(1, self.L):
            C = jnp.einsum("bc, bpd, cpe -> de", C, self.Bs[k].conj(),
                           other.Bs[k])
        return C.reshape(())


class MPO:
    """Finite MPO; W legs (wL, wR, p, p*)
    (reference: pyqed/mps/mps.py:640)."""

    def __init__(self, Ws: Sequence):
        self.Ws = [jnp.asarray(W) for W in Ws]
        self.L = len(Ws)

    def to_dense(self):
        M = self.Ws[0]
        for W in self.Ws[1:]:
            M = jnp.einsum("awpq, wbrs -> abprqs", M, W).reshape(
                M.shape[0], W.shape[1], M.shape[2] * W.shape[2],
                M.shape[3] * W.shape[3])
        return M[0, -1] if M.shape[1] > 1 else M[0, 0]

    def __matmul__(self, other):
        """MPO @ MPS -> MPS (uncompressed; use ``.compress`` after), or
        MPO @ MPO -> MPO (reference: pyqed/mps/mps.py:680)."""
        if isinstance(other, MPS):
            return apply_mpo(self, other)
        if isinstance(other, MPO):
            Ws = [jnp.einsum("abpq, cdqr -> acbdpr", W1, W2).reshape(
                W1.shape[0] * W2.shape[0], W1.shape[1] * W2.shape[1],
                W1.shape[2], W2.shape[3])
                for W1, W2 in zip(self.Ws, other.Ws)]
            return MPO(Ws)
        return NotImplemented

    def expect(self, mps: MPS):
        """<mps|MPO|mps> via the zipper contraction
        (reference: pyqed/mps/mps.py:795)."""
        th0 = mps.get_theta1(0)
        # environment convention (used consistently across DMRG/TDVP):
        # E[ket, w, bra]; W legs are (wL, wR, p_out, p_in), ket contracts
        # p_in, bra contracts p_out
        E = jnp.einsum("kpx, wqp, kqy -> xwy", th0, self.Ws[0][0],
                       th0.conj())
        for k in range(1, mps.L):
            B = mps.Bs[k]
            E = jnp.einsum("kwb, kpx, wvqp, bqy -> xvy",
                           E, B, self.Ws[k], B.conj())
        return E[:, -1, :].trace() if E.shape[1] > 1 else E[:, 0, :].trace()


def apply_mpo(mpo: MPO, mps: MPS, chi_max=None):
    """Apply an MPO to an MPS: per site B'_{(a l), p, (b r)} =
    sum_q W_{a b p q} B_{l q r}, with the MPO boundary (row 0 left,
    column -1 right) contracted in, then optional SVD compression to
    ``chi_max``.

    (reference: pyqed/mps/mps.py:702 ``apply_mpo`` — which mutates its
    B_list, leaves the boundary bonds open, returns only the LAST
    tensor, and has its ``compress`` call commented out; completed
    here. Pinned against the reference's mutated tensor chain in
    tests/test_ref_oracle3.py.)
    """
    L = mps.L
    Bs = []
    for W, B in zip(mpo.Ws, mps.Bs):
        T = jnp.einsum("abpq, lqr -> albpr", W, B)
        a, l, b, p, r = T.shape
        Bs.append(jnp.transpose(T, (0, 1, 3, 2, 4)).reshape(
            a * l, p, b * r))
    # MPO boundary selection: to_dense uses M[0, -1] (row 0 opens,
    # column -1 closes)
    a0, l0 = mpo.Ws[0].shape[0], mps.Bs[0].shape[0]
    Bs[0] = Bs[0].reshape(a0, l0, *Bs[0].shape[1:])[0]
    aL, lL = mpo.Ws[-1].shape[1], mps.Bs[-1].shape[-1]
    BL = Bs[-1].reshape(*Bs[-1].shape[:-1], aL, lL)
    Bs[-1] = BL[..., -1, :]
    out = MPS(Bs, bc=mps.bc, form=None)
    if chi_max is not None:
        out = out.compress(chi_max)
    return out


def mpo_nearest_neighbor(L, h_onsite, h_bond_left, h_bond_right, d=None):
    """Standard W for H = sum_i h_onsite(i) + sum_i h_L(i) h_R(i+1):

        W = [[I, h_L, h_on], [0, 0, h_R], [0, 0, I]]
    """
    hs = jnp.asarray(h_onsite)
    hL = jnp.asarray(h_bond_left)
    hR = jnp.asarray(h_bond_right)
    d = hs.shape[0]
    Z = jnp.zeros((d, d), dtype=complex)
    I = jnp.eye(d, dtype=complex)
    W = jnp.stack([
        jnp.stack([I, hL, hs], axis=0),
        jnp.stack([Z, Z, hR], axis=0),
        jnp.stack([Z, Z, I], axis=0),
    ], axis=0)  # (3, 3, d, d)
    Ws = [W] * L
    return MPO(Ws)


def mpo_tfim(L, J=1.0, h=1.0):
    """TFIM MPO: H = -J sum sz sz - h sum sx."""
    sx = jnp.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
    sz = jnp.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
    return mpo_nearest_neighbor(L, -h * sx, -J * sz, sz)


def mpo_heisenberg(L, J=1.0, h=0.0):
    """Heisenberg MPO with 5-dim bond."""
    sx = jnp.array([[0, 1], [1, 0]], dtype=complex) / 2
    sy = jnp.array([[0, -1j], [1j, 0]], dtype=complex) / 2
    sz = jnp.array([[1, 0], [0, -1]], dtype=complex) / 2
    I = jnp.eye(2, dtype=complex)
    Z = jnp.zeros((2, 2), dtype=complex)
    row0 = [I, J * sx, J * sy, J * sz, h * sz]
    W = jnp.zeros((5, 5, 2, 2), dtype=complex)
    for c, op in enumerate(row0):
        W = W.at[0, c].set(op)
    W = W.at[1, 4].set(sx)
    W = W.at[2, 4].set(sy)
    W = W.at[3, 4].set(sz)
    W = W.at[4, 4].set(I)
    return MPO([W] * L)


# ------------------------------------------------------------------- DMRG

def _bucket(n, step=8):
    return n if n <= 2 else -(-n // step) * step


def _lanczos_ground(matvec, v0, k=20, restarts=4, tol=1e-12):
    """Restarted Lanczos for the lowest eigenpair — pure jnp
    (replaces scipy eigsh on the reference's LinearOperator,
    pyqed/mps/mps.py:1117). A single k-step pass is NOT converged for
    generic (especially complex) start vectors; restarting from the
    Ritz vector is, at 2-5x the matvec count."""
    E, psi = None, v0
    for r in range(restarts):
        Enew, psi = _lanczos_pass(matvec, psi, k=k)
        if E is not None and abs(Enew - E) < tol:
            return Enew, psi
        E = Enew
    return E, psi


def _lanczos_core_jit(matvec, v0, k):
    """Jit-safe k-step Lanczos pass: no data-dependent python control
    flow; dead iterations (breakdown) are masked with huge diagonal
    entries so the small eigh ignores them."""
    n = v0.shape[0]
    dtype = v0.dtype
    v0 = v0 / jnp.linalg.norm(v0)
    V = jnp.zeros((k, n), dtype=dtype).at[0].set(v0)
    alphas = jnp.full((k,), 1e30)
    betas = jnp.zeros((k - 1,))
    alive = jnp.ones((k,), dtype=bool)

    w = matvec(v0)
    a0 = jnp.real(jnp.vdot(v0, w))
    alphas = alphas.at[0].set(a0)
    w = w - a0 * v0

    def body(j, carry):
        V, alphas, betas, alive, w = carry
        b = jnp.linalg.norm(w)
        ok = (b > 1e-13) & alive[j - 1]
        v = jnp.where(ok, 1.0, 0.0) * w / jnp.where(b > 1e-13, b, 1.0)
        # full reorthogonalization against live basis vectors
        proj = jnp.conj(V) @ v                     # (k,)
        v = v - V.T @ proj
        nv = jnp.linalg.norm(v)
        v = v / jnp.where(nv > 1e-13, nv, 1.0)
        V = V.at[j].set(jnp.where(ok & (nv > 1e-13), 1.0, 0.0) * v)
        w2 = matvec(v)
        a = jnp.real(jnp.vdot(v, w2))
        alphas = alphas.at[j].set(jnp.where(ok, a, 1e30))
        betas = betas.at[j - 1].set(jnp.where(ok, b, 0.0))
        alive = alive.at[j].set(ok)
        w2 = w2 - a * v - b * V[j - 1]
        return (V, alphas, betas, alive, w2)

    V, alphas, betas, alive, _ = jax.lax.fori_loop(
        1, k, body, (V, alphas, betas, alive, w))
    T = jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1)
    evals, evecs = jnp.linalg.eigh(T)
    coeff = evecs[:, 0].astype(dtype)
    psi = V.T @ coeff
    psi = psi / jnp.linalg.norm(psi)
    return evals[0], psi


@partial(jax.jit, static_argnames=("k", "restarts"))
def _dmrg_local_ground(LP, W1, W2, RP, th0, k=20, restarts=3):
    """Shape-cached jitted local two-site ground solve: restarted
    Lanczos on H_eff. One compile per (chiL, chiR, D) combination; all
    sweeps reuse the cache — the DMRG hot loop runs fully on device."""
    shape = th0.shape

    def mv(x):
        th = x.reshape(shape)
        out = jnp.einsum("kwb, kpqx, wvrp, vusq, xuy -> brsy",
                         LP, th, W1, W2, RP)
        return out.reshape(-1)

    v = th0.reshape(-1).astype(jnp.result_type(th0, LP, 1j))
    E = jnp.asarray(0.0)
    for _ in range(restarts):
        E, v = _lanczos_core_jit(mv, v, k)
    return E, v.reshape(shape)


def _lanczos_pass(matvec, v0, k=20):
    v0 = v0 / jnp.linalg.norm(v0)
    vs = [v0]
    alphas, betas = [], []
    w = matvec(v0)
    a = jnp.real(jnp.vdot(v0, w))
    alphas.append(a)
    w = w - a * v0
    for j in range(1, k):
        b = jnp.linalg.norm(w)
        if float(b) < 1e-12:
            break
        v = w / b
        # full reorthogonalization (small k)
        for u in vs:
            v = v - jnp.vdot(u, v) * u
        nv = jnp.linalg.norm(v)
        if float(nv) < 1e-12:
            break
        v = v / nv
        vs.append(v)
        betas.append(b)
        w = matvec(v)
        a = jnp.real(jnp.vdot(v, w))
        alphas.append(a)
        w = w - a * v - b * vs[-2]
    T = np.diag(np.asarray(alphas))
    if betas:
        T += np.diag(np.asarray(betas), 1) + np.diag(np.asarray(betas), -1)
    evals, evecs = np.linalg.eigh(T)
    coeff = evecs[:, 0]
    psi = sum(c * v for c, v in zip(coeff, vs))
    psi = psi / jnp.linalg.norm(psi)
    return float(evals[0]), psi


class DMRG:
    """Two-site DMRG ground-state solver
    (reference: pyqed/mps/mps.py:1200 ``two_site_dmrg``)."""

    def __init__(self, mpo: MPO, mps: MPS, chi_max=32, eps=1e-12):
        self.mpo = mpo
        self.psi = mps
        self.chi_max = chi_max
        self.eps = eps
        self.L = mps.L
        # left/right environments; LPs[i] has legs (vL*, wL, vL)
        self.LPs = [None] * self.L
        self.RPs = [None] * self.L
        D = self.mpo.Ws[0].shape[0]
        chi0 = mps.Bs[0].shape[0]
        LP = jnp.zeros((chi0, D, chi0), dtype=complex).at[:, 0, :].set(
            jnp.eye(chi0))
        chiL = mps.Bs[-1].shape[2]
        RP = jnp.zeros((chiL, D, chiL), dtype=complex).at[:, -1, :].set(
            jnp.eye(chiL))
        self.LPs[0] = LP
        self.RPs[-1] = RP
        for i in range(self.L - 1, 1, -1):
            self.update_RP(i)

    def update_LP(self, i):
        """LP[i+1] from LP[i] with the left-canonical tensor
        A_i = S_i B_i S_{i+1}^{-1} (reference: contract_from_left,
        pyqed/mps/mps.py:911)."""
        j = i + 1
        LP = self.LPs[i]
        B = self.psi.Bs[i]
        Sj = self.psi.Ss[j] if j < self.L else jnp.ones(B.shape[2])
        invSj = jnp.where(Sj > 1e-12, 1.0 / Sj, 0.0)
        A = jnp.einsum("a, apb, b -> apb", self.psi.Ss[i], B, invSj)
        self.LPs[j] = jnp.einsum("kwb, kpx, wvqp, bqy -> xvy",
                                 LP, A, self.mpo.Ws[i], A.conj())

    def update_RP(self, i):
        j = i - 1
        RP = self.RPs[i]
        B = self.psi.Bs[i]
        self.RPs[j] = jnp.einsum("kwb, xpk, vwqp, yqb -> xvy",
                                 RP, B, self.mpo.Ws[i], B.conj())

    def eff_matvec(self, i, shape):
        LP = self.LPs[i]
        RP = self.RPs[i + 1]
        W1, W2 = self.mpo.Ws[i], self.mpo.Ws[i + 1]

        def mv(x):
            th = x.reshape(shape)
            out = jnp.einsum("kwb, kpqx, wvrp, vusq, xuy -> brsy",
                             LP, th, W1, W2, RP)
            return out.reshape(-1)
        return mv

    def sweep(self):
        E = None
        for i in list(range(self.L - 1)) + list(range(self.L - 2, -1, -1)):
            E = self.update_bond(i)
        return E

    def update_bond(self, i):
        th = self.psi.get_theta2(i).astype(complex)
        chiL, d1, d2, chiR = th.shape
        # bucket the bond dimensions (pad with zeros) so the jitted local
        # solver compiles once per bucket, not once per (bond, sweep);
        # zero rows/cols keep the Krylov space inside the physical block
        bl = _bucket(chiL)
        br = _bucket(chiR)
        thp = jnp.pad(th, ((0, bl - chiL), (0, 0), (0, 0), (0, br - chiR)))
        LP = jnp.pad(self.LPs[i],
                     ((0, bl - chiL), (0, 0), (0, bl - chiL)))
        RP = jnp.pad(self.RPs[i + 1],
                     ((0, br - chiR), (0, 0), (0, br - chiR)))
        E, thp = _dmrg_local_ground(LP, self.mpo.Ws[i],
                                    self.mpo.Ws[i + 1], RP, thp,
                                    k=min(40, th.size), restarts=3)
        th = thp[:chiL, :, :, :chiR]
        E = float(jnp.real(E))
        # split with SVD
        M = th.reshape(chiL * d1, d2 * chiR)
        U, S, Vh = jnp.linalg.svd(M, full_matrices=False)
        chi = min(self.chi_max, int(jnp.sum(S > self.eps)))
        chi = max(chi, 1)
        U, S, Vh = U[:, :chi], S[:chi], Vh[:chi]
        S = S / jnp.linalg.norm(S)
        B_right = Vh.reshape(chi, d2, chiR)
        # left tensor in B form: B_i = Ss[i]^-1 U S
        SL = self.psi.Ss[i]
        invSL = jnp.where(SL > 1e-12, 1.0 / SL, 0.0)
        A = U.reshape(chiL, d1, chi)
        B_left = jnp.einsum("a, apb, b -> apb", invSL, A, S)
        self.psi.Bs[i] = B_left
        self.psi.Ss[i + 1] = S
        self.psi.Bs[i + 1] = B_right
        self.update_LP(i)
        self.update_RP(i + 1)
        return E

    def run(self, sweeps=5, tol=1e-10, verbose=False):
        """Returns (energies per sweep, ground-state MPS)."""
        energies = []
        for s in range(sweeps):
            self.sweep()
            E = float(jnp.real(self.mpo.expect(self.psi)))
            energies.append(E)
            if len(energies) > 1 and abs(energies[-1] - energies[-2]) < tol:
                break
        return energies, self.psi


def two_site_dmrg(mpo, mps, chi_max=32, sweeps=5):
    """Functional entry matching the reference name
    (pyqed/mps/mps.py:1200)."""
    solver = DMRG(mpo, mps, chi_max=chi_max)
    return solver.run(sweeps=sweeps)


# ------------------------------------------------------------------- TEBD

def tebd(mps: MPS, bond_op, dt, nt, chi_max=32, order=2):
    """Real-time TEBD with a uniform nearest-neighbor bond Hamiltonian
    (reference: pyqed/mps/mps.py:1422).

    bond_op: (d*d, d*d) two-site Hamiltonian h; evolution by Trotterized
    e^{-i h dt} over even/odd bonds.
    """
    d = mps.Bs[0].shape[1]
    h = jnp.asarray(bond_op)
    w, V = jnp.linalg.eigh(h)

    def gate(tau):
        return (V * jnp.exp(-1j * w * tau)) @ V.conj().T

    U_full = gate(dt).reshape(d, d, d, d)
    U_half = gate(dt / 2).reshape(d, d, d, d)

    def apply_gate(psi, i, U):
        th = psi.get_theta2(i)
        th = jnp.einsum("pqrs, arsb -> apqb", U, th)
        chiL, d1, d2, chiR = th.shape
        M = th.reshape(chiL * d1, d2 * chiR)
        Um, S, Vh = jnp.linalg.svd(M, full_matrices=False)
        chi = min(chi_max, int(jnp.sum(S > 1e-12)))
        chi = max(chi, 1)
        Um, S, Vh = Um[:, :chi], S[:chi], Vh[:chi]
        S = S / jnp.linalg.norm(S)
        SL = psi.Ss[i]
        invSL = jnp.where(SL > 1e-12, 1.0 / SL, 0.0)
        psi.Bs[i] = jnp.einsum("a, apb, b -> apb", invSL,
                               Um.reshape(chiL, d1, chi), S)
        psi.Ss[i + 1] = S
        psi.Bs[i + 1] = Vh.reshape(chi, d2, chiR)

    psi = mps.copy()
    even = list(range(0, psi.L - 1, 2))
    odd = list(range(1, psi.L - 1, 2))
    for n in range(nt):
        if order == 2:
            for i in even:
                apply_gate(psi, i, U_half)
            for i in odd:
                apply_gate(psi, i, U_full)
            for i in even:
                apply_gate(psi, i, U_half)
        else:
            for i in even + odd:
                apply_gate(psi, i, U_full)
    return psi

MatrixProductState = MPS    # reference drop-in name (pyqed/mps/mps.py)
