"""Lattice models: tight-binding chains, Fermi-/Bose-Hubbard, Jordan-Wigner.

TPU-native counterpart of the reference lattice layer
(reference: pyqed/lattice/hubbard.py — ``FermiHubbard:30`` (JWT + exact
diagonalization), ``BoseHubbard:222``; pyqed/qchem/jordan_wigner/).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.linalg import dag, tensor
from ..ops.operators import destroy, pauli


def jordan_wigner_ops(nmodes):
    """Fermionic annihilation operators on nmodes spin-orbitals via JWT:
    c_j = (prod_{k<j} Z_k) sigma^-_j
    (reference: pyqed/qchem/jordan_wigner/spinful.py:231)."""
    s0, sx, sy, sz = pauli()
    sm = jnp.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)  # |0><1|
    ops = []
    for j in range(nmodes):
        factors = [sz] * j + [sm] + [s0] * (nmodes - j - 1)
        ops.append(tensor(factors))
    return ops


def _fenwick_tree(n):
    """Fenwick-tree parent map over modes 0..n-1 (root = n-1).

    The recursive bisection used by the Bravyi-Kitaev encoding: qubit i
    stores the occupation-sum of its subtree."""
    parent = {}
    children = {i: [] for i in range(n)}

    def build(left, right):
        if left >= right:
            return
        pivot = (left + right) >> 1
        parent[pivot] = right
        children[right].append(pivot)
        build(left, pivot)
        build(pivot + 1, right)

    if n > 0:
        build(0, n - 1)
    return parent, children


def bravyi_kitaev_sets(j, n):
    """Update / flip / parity / remainder index sets for mode j of n
    (Seeley-Richard-Love conventions on a Fenwick tree, valid for any
    n, not just powers of two)."""
    parent, children = _fenwick_tree(n)
    # ancestors of j
    U = set()
    k = j
    while k in parent:
        k = parent[k]
        U.add(k)
    F = set(children[j])
    # parity set: children (< j) of j and of each ancestor encountered
    # on the root path — their subtree sums add up to parity of 0..j-1
    P = set(c for c in children[j] if c < j)
    k = j
    while k in parent:
        k = parent[k]
        P |= set(c for c in children[k] if c < j)
    R = P - F
    return U, F, P, R


def bravyi_kitaev_ops(nmodes):
    """Fermionic annihilation operators in the Bravyi-Kitaev encoding
    (the reference's ``bravyi_kitaev_transform``,
    pyqed/qchem/jordan_wigner/spinless.py:74, is a ``pass`` stub — made
    real).  BK stores PARTIAL occupation sums on the qubits (Fenwick
    tree), so parity and update strings are O(log n) weight instead of
    the JW O(n) Z-string:

        a_j = 1/2 X_{U(j)} (X_j Z_{P(j)} + i Y_j Z_{R(j)})

    Validated in tests against the exact basis-relabeling oracle
    P a_j^{JW} P^T with P|x> = |Bx mod 2| (B the BK matrix)."""
    s0, sx, sy, sz = pauli()
    sx = np.asarray(sx, dtype=complex)
    sy = np.asarray(sy, dtype=complex)
    sz = np.asarray(sz, dtype=complex)
    eye = np.eye(2, dtype=complex)

    def pauli_string(spec):
        mats = [spec.get(q, eye) for q in range(nmodes)]
        out = mats[0]
        for m in mats[1:]:
            out = np.kron(out, m)
        return out

    ops = []
    for j in range(nmodes):
        U, F, P, R = bravyi_kitaev_sets(j, nmodes)
        spec_x = {q: sx for q in U}
        spec_x[j] = sx
        spec_x.update({q: sz for q in P})
        spec_y = {q: sx for q in U}
        spec_y[j] = sy
        spec_y.update({q: sz for q in R})
        a = 0.5 * (pauli_string(spec_x) + 1j * pauli_string(spec_y))
        ops.append(jnp.asarray(a))
    return ops


def bravyi_kitaev_matrix(n):
    """The (n, n) binary BK encoding matrix B: qubit bits b = B x mod 2
    where x are mode occupations (qubit i stores its Fenwick subtree
    sum)."""
    _, children = _fenwick_tree(n)

    def subtree(i):
        out = {i}
        for c in children[i]:
            out |= subtree(c)
        return out

    B = np.zeros((n, n), dtype=int)
    for i in range(n):
        for jx in subtree(i):
            B[i, jx] = 1
    return B


bravyi_kitaev_transform = bravyi_kitaev_ops    # reference drop-in name


class FermiHubbard:
    """Spin-half Fermi-Hubbard chain by JWT + dense diagonalization
    (reference: pyqed/lattice/hubbard.py:30).

    H = -t sum_{<ij>s} (c†_is c_js + hc) + U sum_i n_iu n_id - mu sum_i n_i
    Ordering of JW modes: (site0 up, site0 dn, site1 up, ...).
    """

    def __init__(self, t, U, nsites, filling=None, nelec=None, mu=None):
        self.t = t
        self.U = U
        self.mu = mu or 0.0
        self.L = self.nsites = nsites
        self.d = 4
        self.nelec = nelec
        self.H = None
        self.e_tot = None
        self.eigvecs = None

    def jordan_wigner(self):
        """(reference: pyqed/lattice/hubbard.py:115)."""
        n = 2 * self.nsites
        c = jordan_wigner_ops(n)
        cd = [dag(op) for op in c]

        def up(i):
            return 2 * i

        def dn(i):
            return 2 * i + 1

        H = 0.0
        for i in range(self.nsites - 1):
            for s in (0, 1):
                a, b = 2 * i + s, 2 * (i + 1) + s
                H = H - self.t * (cd[a] @ c[b] + cd[b] @ c[a])
        for i in range(self.nsites):
            nu = cd[up(i)] @ c[up(i)]
            nd = cd[dn(i)] @ c[dn(i)]
            H = H + self.U * nu @ nd - self.mu * (nu + nd)
        self.H = H
        self._c = c
        return H

    def number_operator(self):
        if self.H is None:
            self.jordan_wigner()
        return sum(dag(op) @ op for op in self._c)

    def run(self, nstates=1):
        if self.H is None:
            self.jordan_wigner()
        w, v = jnp.linalg.eigh(self.H)
        if self.nelec is not None:
            # filter to the fixed-particle-number sector
            N = self.number_operator()
            occ = jnp.real(jnp.einsum("ik, ij, jk -> k", v.conj(), N, v))
            mask = jnp.abs(occ - self.nelec) < 1e-8
            idx = jnp.nonzero(mask, size=int(jnp.sum(mask)))[0]
            w, v = w[idx], v[:, idx]
        self.e_tot = w[:nstates]
        self.eigvecs = v[:, :nstates]
        return self.e_tot


class BoseHubbard:
    """Bose-Hubbard chain (reference stub: pyqed/lattice/hubbard.py:222,
    completed here): H = -t sum (b†_i b_{i+1} + hc) + U/2 sum n(n-1) -
    mu sum n with local truncation nmax."""

    def __init__(self, t, U, nsites, nmax=3, mu=0.0):
        self.t = t
        self.U = U
        self.mu = mu
        self.nsites = nsites
        self.nmax = nmax
        self.H = None

    def buildH(self):
        d = self.nmax + 1
        b1 = destroy(d)
        n1 = dag(b1) @ b1
        I = jnp.eye(d, dtype=b1.dtype)

        def embed(op, i):
            ops = [I] * self.nsites
            ops[i] = op
            return tensor(ops)

        bs = [embed(b1, i) for i in range(self.nsites)]
        H = 0.0
        for i in range(self.nsites - 1):
            H = H - self.t * (dag(bs[i]) @ bs[i + 1] + dag(bs[i + 1]) @ bs[i])
        for i in range(self.nsites):
            ni = embed(n1, i)
            H = H + 0.5 * self.U * ni @ (ni - embed(I, i)) - self.mu * ni
        self.H = H
        return H

    def run(self, nstates=1):
        if self.H is None:
            self.buildH()
        w, v = jnp.linalg.eigh(self.H)
        return w[:nstates]


# ---------------------------------------------------------------------------
# Real-space tight-binding models (reference: pyqed/lattice/chain.py)
# ---------------------------------------------------------------------------

class Chain:
    """Open/periodic 1D tight-binding chain with norb orbitals per cell
    (reference: pyqed/lattice/chain.py:21 ``Chain`` — its ``gf``/
    ``gf_surface`` are ``pass`` stubs; here they are real, via
    ``green_renormalization``).
    """

    def __init__(self, nsite, onsite, hopping, norb=1,
                 boundary_condition="open"):
        self.nsite = nsite
        self.norb = norb
        self.size = nsite * norb
        self.onsite = np.atleast_1d(np.asarray(onsite, dtype=float))
        self.hopping = np.asarray(hopping)
        self.boundary_condition = boundary_condition
        self.H = None
        self.evals = self.evecs = None

    def position(self):
        """Cell-index position operator in the Wannier basis
        (reference: pyqed/lattice/chain.py:57)."""
        idx = np.repeat(np.arange(1, self.nsite + 1), self.norb)
        return jnp.diag(jnp.asarray(idx, dtype=jnp.float64
                                    if jax.config.jax_enable_x64 else None))

    def buildH(self):
        norb, nsite = self.norb, self.nsite
        H = np.zeros((self.size, self.size))
        if norb == 1:
            on = np.broadcast_to(self.onsite, (nsite,))
            H[np.arange(nsite), np.arange(nsite)] = on
            t = float(self.hopping)
            for n in range(nsite - 1):
                H[n, n + 1] = H[n + 1, n] = t
            if self.boundary_condition == "periodic" and nsite > 2:
                H[0, -1] = H[-1, 0] = t
        else:
            hop = self.hopping
            assert hop.shape == (norb, norb)
            for n in range(nsite):
                for j in range(norb):
                    H[norb * n + j, norb * n + j] = self.onsite[j]
            for n in range(nsite - 1):
                H[norb * n:norb * (n + 1),
                  norb * (n + 1):norb * (n + 2)] = hop
                H[norb * (n + 1):norb * (n + 2),
                  norb * n:norb * (n + 1)] = hop.conj().T
            if self.boundary_condition == "periodic" and nsite > 2:
                H[norb * (nsite - 1):, :norb] = hop
                H[:norb, norb * (nsite - 1):] = hop.conj().T
        self.H = jnp.asarray(H)
        return self.H

    def run(self):
        if self.H is None:
            self.buildH()
        self.evals, self.evecs = jnp.linalg.eigh(self.H)
        return self.evals, self.evecs

    def gf(self, omega, eta=1e-4):
        """Retarded lattice GF G(w) = (w + i eta - H)^{-1} as one batched
        solve over the frequency grid (the reference inverts per-omega in
        Python, chain.py:389)."""
        if self.H is None:
            self.buildH()
        omega = jnp.atleast_1d(jnp.asarray(omega))
        n = self.size
        A = ((omega[:, None, None] + 1j * eta) * jnp.eye(n)[None]
             - self.H[None])
        G = jnp.linalg.solve(A, jnp.broadcast_to(
            jnp.eye(n, dtype=A.dtype), A.shape))
        return G[0] if G.shape[0] == 1 else G

    def ldos(self, omega, eta=1e-4, site=0):
        """-Im G_ii(w)/pi local density of states."""
        G = self.gf(omega, eta)
        if G.ndim == 2:
            return float(-jnp.imag(G[site, site]) / jnp.pi)
        return -jnp.imag(G[:, site, site]) / jnp.pi

    def gf_surface(self, energy=0.0, delta=1e-3, max_iter=100):
        """Semi-infinite surface/bulk GF of the chain's repeating cell
        (reference ``Chain.gf_surface`` is a ``pass`` stub)."""
        norb = self.norb
        if norb == 1:
            intra = np.array([[float(np.broadcast_to(self.onsite, (1,))[0])]])
            inter = np.array([[float(self.hopping)]])
        else:
            intra = np.diag(self.onsite).astype(complex)
            inter = np.asarray(self.hopping, dtype=complex)
        return green_renormalization(intra, inter, energy=energy,
                                     delta=delta, max_iter=max_iter)


class RiceMele(Chain):
    """Rice-Mele / SSH dimerized chain (reference:
    pyqed/lattice/chain.py:290)."""

    def __init__(self, v, w, nsites=None, boundary_condition="open"):
        self.intra = v
        self.inter = w
        self.norb = 2
        self.nsite = self.nsites = nsites
        self.size = nsites            # reference convention: nsites = #orbitals
        self.boundary_condition = boundary_condition
        self.H = None
        self.evals = self.evecs = None

    def buildH(self):
        n = self.nsite
        H = np.zeros((n, n))
        for i in range(0, n - 1, 2):
            H[i, i + 1] = H[i + 1, i] = self.intra
        for i in range(1, n - 1, 2):
            H[i, i + 1] = H[i + 1, i] = self.inter
        self.H = jnp.asarray(H)
        return self.H

    def position(self):
        """Cell-index position operator: orbital j sits in cell j//2 + 1
        (Chain.position assumes norb entries per cell of self.nsite cells;
        RiceMele counts ORBITALS in self.nsite, hence the override)."""
        idx = np.arange(self.nsite) // 2 + 1
        return jnp.diag(jnp.asarray(idx, dtype=float))

    def band_structure(self, k=None):
        """Analytic two-band dispersion E(k) = ±|v + w e^{ik}|."""
        if k is None:
            k = np.linspace(-np.pi, np.pi, 101)
        k = jnp.asarray(k)
        h = self.intra + self.inter * jnp.exp(1j * k)
        e = jnp.abs(h)
        return jnp.stack([-e, e], axis=-1)

    def gf_surface(self, energy=0.0, delta=1e-3, max_iter=100):
        intra = np.array([[0.0, self.intra], [self.intra, 0.0]], complex)
        inter = np.array([[0.0, 0.0], [self.inter, 0.0]], complex)
        return green_renormalization(intra, inter, energy=energy,
                                     delta=delta, max_iter=max_iter)


class Lattice2D:
    """Finite 2D lattice with per-orbital offsets and bond hoppings
    (reference: pyqed/lattice/chain.py:158 ``Lattice``)."""

    def __init__(self, size=(2, 2), norb=1, lattice_vectors=None,
                 orb_coords=None):
        self.size = tuple(size)
        self.norb = norb
        self.nsites = self.size[0] * self.size[1] * norb
        self.lattice_vectors = (np.eye(2) if lattice_vectors is None
                                else np.asarray(lattice_vectors))
        self.orb_coords = (np.zeros((norb, 2)) if orb_coords is None
                           else np.asarray(orb_coords))
        self._hops = []       # (J, a, b, R)
        self._onsite = np.zeros(norb)
        self.H = None

    def index(self, i, j, n):
        nx, ny = self.size
        return (i % nx) * ny * self.norb + (j % ny) * self.norb + n

    def set_onsite(self, e):
        self._onsite = np.broadcast_to(np.asarray(e, float), (self.norb,))
        return self

    def set_hop(self, J, a, b, R, boundary_condition="open"):
        """Hopping J between orbital a in cell (i, j) and orbital b in cell
        (i, j) + R."""
        self._hops.append((J, a, b, tuple(R), boundary_condition))
        return self

    def buildH(self):
        nx, ny = self.size
        H = np.zeros((self.nsites, self.nsites), complex)
        for i in range(nx):
            for j in range(ny):
                for n in range(self.norb):
                    H[self.index(i, j, n), self.index(i, j, n)] = \
                        self._onsite[n]
        for (J, a, b, R, bc) in self._hops:
            for i in range(nx):
                for j in range(ny):
                    ii, jj = i + R[0], j + R[1]
                    wraps = not (0 <= ii < nx and 0 <= jj < ny)
                    if bc == "open" and wraps:
                        continue
                    if wraps:
                        # same convention as Chain: periodic wrap only for
                        # >2 cells along the wrapped direction (avoids the
                        # doubled bond of a 2-cell ring and the self-bond
                        # of a 1-cell ring)
                        if (R[0] and nx <= 2) or (R[1] and ny <= 2):
                            continue
                    p, q = self.index(i, j, a), self.index(ii, jj, b)
                    H[p, q] += J
                    H[q, p] += np.conj(J)
        self.H = jnp.asarray(H)
        return self.H

    def solve(self):
        if self.H is None:
            self.buildH()
        return jnp.linalg.eigh(self.H)


def green_renormalization(intra, inter, energy=0.0, delta=1e-3,
                          max_iter=100, tol_scale=1e-6):
    """Sancho-Rubio decimation: bulk + surface GF of a semi-infinite
    chain of identical cells (reference: pyqed/lattice/chain.py:451,
    J. Phys. F 15, 851 (1985) Eq. 11).

    Fixed-iteration ``lax.scan`` (alpha/beta decay quadratically, so
    ~50 iterations reach machine precision) — XLA-friendly static
    control flow instead of the reference's data-dependent while loop.
    """
    intra = jnp.asarray(intra, dtype=complex)
    inter = jnp.asarray(inter, dtype=complex)
    n = intra.shape[0]
    e = (energy + 1j * abs(delta)) * jnp.eye(n, dtype=complex)

    def body(carry, _):
        alpha, beta, eps, eps_s = carry
        einv = jnp.linalg.inv(e - eps)
        eps_s = eps_s + alpha @ einv @ beta
        eps = eps + alpha @ einv @ beta + beta @ einv @ alpha
        alpha = alpha @ einv @ alpha
        beta = beta @ einv @ beta
        return (alpha, beta, eps, eps_s), None

    init = (inter, inter.conj().T, intra, intra)
    (alpha, beta, eps, eps_s), _ = jax.lax.scan(body, init, None,
                                                length=max_iter)
    g_bulk = jnp.linalg.inv(e - eps)
    g_surf = jnp.linalg.inv(e - eps_s)
    return g_bulk, g_surf

Lattice = Lattice2D              # reference drop-in name (pyqed/lattice/chain.py:158)
