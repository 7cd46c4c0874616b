"""QSATS: variational Monte Carlo for quantum atomic solids (solid He).

TPU-native counterpart of the reference's only native engine — the
QSATS v1.0 Fortran+MPI replica farm
(/root/reference/pyqed/qmc/MC_exchange/permute3d/dissipation/):
  main.f:13   parent/child MPI farm        -> vmapped walker batch, mesh-
                                              shardable 'walker' axis
  eloc.f:313  local-energy estimator       -> batched closed-form
                                              gradient/Laplacian of ln psi
  vinit.f:91  HFD-B(He) Aziz 1987 pair     -> evaluated directly (no
              potential lookup table          lookup: the MXU/VPU evals
                                              the closed form faster than
                                              a gather)
  child.f:380 Gaussian-displacement        -> all-atom batched Metropolis
              single-atom Metropolis          + optional exact per-atom
                                              sequential mode (lax.scan)
  odd.f/even.f replica scheduling          -> one lax.scan over sweeps

Physics: N He-4 atoms on an fcc/hcp lattice with periodic boundary
conditions (minimum image), pair-product trial function

    ln psi(q) = -a sum_i |q_i|^2  - 1/2 sum_{pairs} (b / r_ij)^5 ,

where q_i is atom i's DISPLACEMENT from its lattice site and
r_ij = |q_j - q_i + R_ij| with R_ij the minimum-image lattice vector
(eloc.f:325-330: Einstein-site localization x McMillan b^5 Jastrow).
Permutation-exchange moves swap the site assignment of neighbouring
atoms (the 'MC_exchange' in the reference's directory name): positions
are untouched and displacements are rebased; the acceptance evaluates
the full trial (with an infinite stencil only the Einstein factor
would change).

All quantities in atomic units (bohr / hartree); ``HART2K`` converts to
Kelvin (eloc.f:257).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["hfdbhe", "fcc_lattice", "hcp_lattice", "build_pairs",
           "QSATS", "HART2K", "HE4_MASS"]

HART2K = 315774.65            # hartree -> Kelvin   (vinit.f:21)
K_PER_ATOM = 3.1668513e-6     # hartree per Kelvin  (eloc.f:257)
HE4_MASS = 7296.299           # He-4 mass in m_e


def hfdbhe(r2):
    """HFD-B(He) He-He pair potential [hartree] vs squared distance
    [bohr^2] — R.A. Aziz et al., Mol. Phys. 61, 1487 (1987); the same
    published parameterization the reference tabulates (vinit.f:91).
    """
    astar = 1.8443101e5
    alstar = 10.43329537
    bestar = -2.27965105
    d = 1.4826
    c6, c8, c10 = 1.36745214, 0.42123807, 0.17473318
    rm, eps = 5.59926, 10.948
    r = jnp.sqrt(r2)
    x = r / rm
    vstar = astar * jnp.exp(-alstar * x + bestar * x * x)
    vd = c6 / x ** 6 + c8 / x ** 8 + c10 / x ** 10
    vd = jnp.where(x < d, vd * jnp.exp(-(d / x - 1.0) ** 2), vd)
    return (vstar - vd) * eps / HART2K


def fcc_lattice(ncell, density):
    """fcc supercell: ncell=(n1,n2,n3) conventional cubic cells, atomic
    number density [bohr^-3]. Returns (sites (N,3), box (3,))."""
    n1, n2, n3 = ncell
    a = (4.0 / density) ** (1.0 / 3.0)        # cubic lattice constant
    basis = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                      [0, 0.5, 0.5]])
    cells = np.array([(i, j, k) for i in range(n1) for j in range(n2)
                      for k in range(n3)], float)
    sites = (cells[:, None, :] + basis[None, :, :]).reshape(-1, 3) * a
    box = np.array([n1, n2, n3], float) * a
    return sites, box


def hcp_lattice(ncell, density):
    """hcp supercell (orthorhombic 4-atom representation) at the given
    number density; ideal c/a. Returns (sites (N,3), box (3,))."""
    n1, n2, n3 = ncell
    ca = np.sqrt(8.0 / 3.0)
    # orthorhombic cell: ax = a, ay = a*sqrt(3), az = c; 4 atoms
    vol_per_atom = 1.0 / density
    a = (4.0 * vol_per_atom / (np.sqrt(3.0) * ca)) ** (1.0 / 3.0)
    ax, ay, az = a, a * np.sqrt(3.0), a * ca
    basis = np.array([[0.0, 0.0, 0.0],
                      [0.5, 0.5, 0.0],
                      [0.5, 5.0 / 6.0, 0.5],
                      [0.0, 1.0 / 3.0, 0.5]])
    cells = np.array([(i, j, k) for i in range(n1) for j in range(n2)
                      for k in range(n3)], float)
    sites = ((cells[:, None, :] + basis[None, :, :]).reshape(-1, 3)
             * np.array([ax, ay, az]))
    box = np.array([n1 * ax, n2 * ay, n3 * az])
    return sites, box


def build_pairs(sites, box, ratio=1.8):
    """Directed interacting-pair stencil: all (i, j), j != i, whose
    minimum-image LATTICE separation is below ratio * r_nn
    (eloc.f:158-221). Returns (ipairs (P, 2) int,
    vpvec (P, 3) float with vpvec = min-image R_j - R_i, and the
    nearest-neighbor distance rnn)."""
    sites = np.asarray(sites)
    box = np.asarray(box)
    dv = sites[None, :, :] - sites[:, None, :]
    dv -= box * np.round(dv / box)            # minimum image
    r = np.sqrt((dv ** 2).sum(-1))
    np.fill_diagonal(r, np.inf)
    rnn = r.min()
    ii, jj = np.where(r < ratio * rnn)
    return (np.stack([ii, jj], axis=1).astype(np.int32),
            dv[ii, jj].astype(np.float64), rnn)


@dataclass
class QSATS:
    """Pair-product VMC on a quantum solid (see module docstring).

    Parameters
    ----------
    sites, box : lattice sites (N, 3) and periodic box (3,) [bohr]
    a : Einstein localization exponent [bohr^-2]  (eloc.f:323 'aa')
    b : McMillan Jastrow length [bohr]            (eloc.f:329 'bb')
    mass : atomic mass [m_e]
    ratio : stencil cutoff in nearest-neighbor distances
    """
    sites: np.ndarray
    box: np.ndarray
    a: float = 0.06
    b: float = 5.0
    mass: float = HE4_MASS
    ratio: float = 1.8

    def __post_init__(self):
        self.sites = np.asarray(self.sites, float)
        self.box = np.asarray(self.box, float)
        self.natoms = self.sites.shape[0]
        ip, vp, rnn = build_pairs(self.sites, self.box, self.ratio)
        self.ipairs, self.vpvec, self.rnn = ip, vp, rnn

    # ------------------------------------------------------ trial fn

    def _pair_r2(self, q):
        """Squared pair separations r_ij^2 for directed pairs (P,)."""
        i = self.ipairs[:, 0]
        j = self.ipairs[:, 1]
        d = q[j] - q[i] + self.vpvec                  # (P, 3)
        return jnp.sum(d * d, axis=1), d, i, j

    def log_psi(self, q):
        """ln psi(q), q = displacements from sites (N, 3)."""
        r2, _, _, _ = self._pair_r2(q)
        jas = -0.25 * jnp.sum((self.b ** 2 / r2) ** 2.5)   # 1/2 * 1/2 dbl count
        return -self.a * jnp.sum(q * q) + jas

    def local_energy(self, q):
        """(tloc, vloc) [hartree] via the closed-form gradient and
        Laplacian of ln psi (the eloc.f:313 'local' estimator,
        vectorized: per-pair terms scattered with segment-sums instead
        of the Fortran atom loop)."""
        r2, d, i, j = self._pair_r2(q)
        # Einstein part
        dlng = -2.0 * self.a * q                           # (N, 3)
        d2lng = jnp.full((self.natoms, 3), -2.0 * self.a)
        # Jastrow part: d/dx_i [-1/2 (b/r)^5] for each directed pair;
        # eloc.f:385-394
        br2 = self.b ** 2 / r2
        br5 = br2 ** 2 * jnp.sqrt(br2)
        br52 = br5 / r2                                    # (P,)
        # d points j -> i displacement (q_j - q_i + R); the gradient on
        # atom i gets +2.5 br52 * (-d) ... sign per eloc.f dx convention
        gi = -2.5 * br52[:, None] * d
        dlng = dlng.at[i].add(gi)
        d2 = 2.5 * br52[:, None] * (1.0 - 7.0 * d * d / r2[:, None])
        d2lng = d2lng.at[i].add(d2)
        tloc = -0.5 / self.mass * jnp.sum(d2lng + dlng * dlng)
        vloc = 0.5 * jnp.sum(hfdbhe(r2))
        return tloc, vloc

    def energy_per_atom_K(self, q):
        t, v = self.local_energy(q)
        return (t + v) / (K_PER_ATOM * self.natoms)

    # ------------------------------------------------------- sampling

    def _sweep_allatom(self, state, step):
        """One batched all-atom Metropolis sweep for a single walker."""
        q, lp, key = state
        key, k1, k2 = jax.random.split(key, 3)
        prop = q + step * jax.random.normal(k1, q.shape)
        lp_new = self.log_psi(prop)
        acc = jnp.log(jax.random.uniform(k2)) < 2.0 * (lp_new - lp)
        q = jnp.where(acc, prop, q)
        lp = jnp.where(acc, lp_new, lp)
        return (q, lp, key), acc

    def _sweep_peratom(self, state, step):
        """Sequential per-atom Metropolis sweep (the exact child.f:398
        move structure) via lax.scan over atoms."""
        q, lp, key = state
        key, kd, ku, kp = jax.random.split(key, 4)
        disp = step * jax.random.normal(kd, q.shape)
        us = jnp.log(jax.random.uniform(ku, (self.natoms,)))

        def body(carry, n):
            q, lp = carry
            prop = q.at[n].add(disp[n])
            lp_new = self.log_psi(prop)
            acc = us[n] < 2.0 * (lp_new - lp)
            return (jnp.where(acc, prop, q), jnp.where(acc, lp_new, lp)), acc

        (q, lp), accs = jax.lax.scan(body, (q, lp),
                                     jnp.arange(self.natoms))
        return (q, lp, key), jnp.mean(accs)

    def _exchange(self, state):
        """Permutation-exchange move: pick a random directed pair
        (i, j) from the stencil and swap the atoms' SITE assignments.
        Positions are unchanged — displacements rebase as
        q_i -> q_i - R_ij, q_j -> q_j + R_ij — so the Jastrow (a
        function of positions only) cancels and the acceptance is the
        Einstein-factor ratio. This is the reference's exchange
        sampling (MC_exchange/permute3d) as a Metropolis move."""
        q, lp, key = state
        key, kp, ku = jax.random.split(key, 3)
        n = jax.random.randint(kp, (), 0, self.ipairs.shape[0])
        ip = jnp.asarray(self.ipairs)
        i = ip[n, 0]
        j = ip[n, 1]
        R = jnp.asarray(self.vpvec)[n]          # min-image S_j - S_i
        # site i inherits the atom at site j (absolute positions fixed):
        # q_i' = r_j - S_i = q_j + R,  q_j' = r_i - S_j = q_i - R
        qi_new = q[j] + R
        qj_new = q[i] - R
        q_new = q.at[i].set(qi_new).at[j].set(qj_new)
        # with an INFINITE stencil only the Einstein factor changes (the
        # positions are permutation-invariant); with the finite stencil
        # the swapped atoms see slightly different neighbor lists, so
        # evaluate the full trial for exact detailed balance
        lp_new = self.log_psi(q_new)
        acc = jnp.log(jax.random.uniform(ku)) < 2.0 * (lp_new - lp)
        q = jnp.where(acc, q_new, q)
        lp = jnp.where(acc, lp_new, lp)
        return (q, lp, key), acc

    def run(self, key, nwalkers=64, nsweeps=500, nequil=100, step=0.5,
            mode="peratom", exchange_prob=0.0, mesh=None, q0=None):
        """Batched VMC. Returns dict with e_trace (nsweeps,) [K/atom],
        energy mean/err over post-equilibration sweeps, acceptance, and
        exchange acceptance count.

        mesh : optional jax.sharding.Mesh — shards the walker axis (the
        reference's MPI replica farm, main.f:23/76).
        q0 : optional (nwalkers, natoms, 3) restart configurations
        (e.g. ``out['walkers']`` of a previous run).
        """
        key, k0 = jax.random.split(jax.random.PRNGKey(key)
                                   if np.isscalar(key) else key)
        if q0 is None:
            # start tight around the lattice (0.3x the Einstein width):
            # a full-width Einstein draw puts some pairs in catastrophic
            # overlap where the Jastrow local energy diverges; the
            # Fortran (child.f) starts exactly on the lattice for the
            # same reason
            q0 = (0.3 * jax.random.normal(k0, (nwalkers, self.natoms, 3))
                  / np.sqrt(4.0 * self.a))
        else:
            q0 = jnp.asarray(q0)
            nwalkers = q0.shape[0]
        sweep = (self._sweep_allatom if mode == "allatom"
                 else self._sweep_peratom)

        def one_walker_sweep(q, lp, key, do_exch):
            st = (q, lp, key)
            st, acc = sweep(st, step)
            # optional exchange attempt after the sweep
            def with_ex(st):
                st2, eacc = self._exchange(st)
                return st2, jnp.asarray(eacc, float)

            st, eacc = jax.lax.cond(
                do_exch, with_ex, lambda s: (s, 0.0), st)
            q, lp, key = st
            return q, lp, key, jnp.asarray(acc, float), eacc

        vsweep = jax.vmap(one_walker_sweep, in_axes=(0, 0, 0, None))

        def scan_body(carry, do_exch_u):
            q, lp, keys = carry
            do_exch, _ = do_exch_u
            q, lp, keys, acc, eacc = vsweep(q, lp, keys, do_exch)
            t, v = jax.vmap(self.local_energy)(q)
            e = jnp.mean(t + v) / (K_PER_ATOM * self.natoms)
            return (q, lp, keys), (e, jnp.mean(acc), jnp.mean(eacc))

        keys = jax.random.split(key, nwalkers)
        lp0 = jax.vmap(self.log_psi)(q0)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P(mesh.axis_names[0]))
            q0 = jax.device_put(q0, NamedSharding(
                mesh, P(mesh.axis_names[0], None, None)))
            keys = jax.device_put(keys, NamedSharding(
                mesh, P(mesh.axis_names[0], None)))
            lp0 = jax.device_put(lp0, sh)

        exch_flags = (np.random.default_rng(0).random(nsweeps)
                      < exchange_prob)

        @jax.jit
        def drive(q0, lp0, keys, flags):
            return jax.lax.scan(scan_body, (q0, lp0, keys),
                                (flags, jnp.zeros(nsweeps)))

        (qf, lpf, _), (e_tr, acc_tr, eacc_tr) = drive(
            q0, lp0, keys, jnp.asarray(exch_flags))
        e_tr = np.asarray(e_tr)
        post = e_tr[nequil:]
        nb = max(len(post) // 16, 1)
        blocks = np.array([b.mean() for b in np.array_split(post, nb)])
        return {
            "e_trace": e_tr,
            "energy": float(post.mean()),
            "error": float(blocks.std(ddof=1) / np.sqrt(len(blocks)))
            if len(blocks) > 1 else 0.0,
            "acceptance": float(np.asarray(acc_tr).mean()),
            "exchange_acceptance": float(np.asarray(eacc_tr).sum()),
            "walkers": np.asarray(qf),
        }
