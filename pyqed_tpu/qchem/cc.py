"""Coupled-cluster singles and doubles (CCSD), spin-orbital formulation.

Beyond the reference (its tree has no coupled cluster at all; correlation
stops at CISD/CASSCF + pyscf wrappers).  Implementation follows the
standard intermediate factorization of Stanton, Gauss, Watts & Bartlett,
JCP 94, 4334 (1991) — every contraction is a dense einsum (MXU work), the
amplitude update is a fixed-point iteration with DIIS acceleration.

Physics pins used by the tests: for any TWO-electron system CCSD is exact
(equals FCI to machine precision); the first iteration from zero
amplitudes reproduces MP2.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ci import spinorb_ints

__all__ = ["CCSD"]


def _spin_fock(mf):
    """Canonical spin-orbital Fock matrix (diagonal eps, interleaved)."""
    eps = np.repeat(np.asarray(mf.mo_energy), 2)
    return np.diag(eps)


class CCSD:
    """Closed-shell molecules via the spin-orbital CCSD equations
    (exact spin adaptation not required; O(n^6) with small prefactor —
    fine for the basis sizes this package targets on-host, and every
    term is a batched einsum)."""

    def __init__(self, mf, max_cycle: int = 100, conv_tol: float = None,
                 diis_size: int = 8):
        assert mf.mo_coeff is not None, "run RHF first"
        self.mf = mf
        self.max_cycle = max_cycle
        if conv_tol is None:
            # 1e-10 is unreachable in f32 (|dE| floors near 1e-7): the
            # loop would burn max_cycle and report converged=False
            import jax
            conv_tol = 1e-10 if jax.config.jax_enable_x64 else 3e-7
        self.conv_tol = conv_tol
        self.diis_size = diis_size
        self._cache = None
        self.e_corr = None
        self.e_tot = None
        self.t1 = None
        self.t2 = None
        self.converged = False

    # ------------------------------------------------------------- setup
    def _setup(self):
        if self._cache is not None:
            # run()/ccsd_t()/external consumers share one MO transform +
            # spin-orbital integral build (the O(N^5) + quadruple-loop
            # part) instead of repeating it per stage
            return self._cache
        mf = self.mf
        hmo, eri_mo = mf.mo_ints()
        _, g = spinorb_ints(hmo, eri_mo)      # <pq||rs> physicists'
        f = _spin_fock(mf)
        no = mf.nocc * 2
        nv = f.shape[0] - no
        o, v = slice(None, no), slice(no, None)
        eps = np.diag(f)
        d1 = eps[o, None] - eps[None, v]
        d2 = (eps[o, None, None, None] + eps[None, o, None, None]
              - eps[None, None, v, None] - eps[None, None, None, v])
        self._cache = (jnp.asarray(f), jnp.asarray(g), o, v,
                       jnp.asarray(d1), jnp.asarray(d2), no, nv)
        return self._cache

    @staticmethod
    def _tau(t1, t2, tilde=False):
        tt = jnp.einsum("ia, jb -> ijab", t1, t1)
        tt = tt - jnp.swapaxes(tt, 2, 3)
        return t2 + (0.5 * tt if tilde else tt)

    # ---------------------------------------------------------- residuals
    def _update(self, t1, t2, f, g, o, v, d1, d2):
        """One Stanton et al. amplitude update (canonical f: f_ov = 0)."""
        tau_t = self._tau(t1, t2, tilde=True)
        tau = self._tau(t1, t2)

        Fae = (- 0.5 * jnp.einsum("me, ma -> ae", f[o, v], t1)
               + jnp.einsum("mf, mafe -> ae", t1, g[o, v, v, v])
               - 0.5 * jnp.einsum("mnaf, mnef -> ae", tau_t,
                                  g[o, o, v, v]))
        Fmi = (0.5 * jnp.einsum("ie, me -> mi", t1, f[o, v])
               + jnp.einsum("ne, mnie -> mi", t1, g[o, o, o, v])
               + 0.5 * jnp.einsum("inef, mnef -> mi", tau_t,
                                  g[o, o, v, v]))
        Fme = f[o, v] + jnp.einsum("nf, mnef -> me", t1, g[o, o, v, v])

        Wmnij = (g[o, o, o, o]
                 + jnp.einsum("je, mnie -> mnij", t1, g[o, o, o, v])
                 - jnp.einsum("ie, mnje -> mnij", t1, g[o, o, o, v])
                 + 0.25 * jnp.einsum("ijef, mnef -> mnij", tau,
                                     g[o, o, v, v]))
        Wabef = (g[v, v, v, v]
                 - jnp.einsum("mb, amef -> abef", t1, g[v, o, v, v])
                 + jnp.einsum("ma, bmef -> abef", t1, g[v, o, v, v])
                 + 0.25 * jnp.einsum("mnab, mnef -> abef", tau,
                                     g[o, o, v, v]))
        Wmbej = (g[o, v, v, o]
                 + jnp.einsum("jf, mbef -> mbej", t1, g[o, v, v, v])
                 - jnp.einsum("nb, mnej -> mbej", t1, g[o, o, v, o])
                 - jnp.einsum("jnfb, mnef -> mbej",
                              0.5 * t2 + jnp.einsum("jf, nb -> jnfb",
                                                    t1, t1),
                              g[o, o, v, v]))

        # T1
        r1 = (f[o, v]
              + jnp.einsum("ie, ae -> ia", t1, Fae)
              - jnp.einsum("ma, mi -> ia", t1, Fmi)
              + jnp.einsum("imae, me -> ia", t2, Fme)
              - jnp.einsum("nf, naif -> ia", t1, g[o, v, o, v])
              - 0.5 * jnp.einsum("imef, maef -> ia", t2, g[o, v, v, v])
              - 0.5 * jnp.einsum("mnae, nmei -> ia", t2, g[o, o, v, o]))

        # T2
        FbeH = Fae - 0.5 * jnp.einsum("mb, me -> be", t1, Fme)
        FmjH = Fmi + 0.5 * jnp.einsum("je, me -> mj", t1, Fme)

        r2 = g[o, o, v, v].astype(t2.dtype)
        tmp = jnp.einsum("ijae, be -> ijab", t2, FbeH)
        r2 = r2 + tmp - jnp.swapaxes(tmp, 2, 3)
        tmp = jnp.einsum("imab, mj -> ijab", t2, FmjH)
        r2 = r2 - tmp + jnp.swapaxes(tmp, 0, 1)
        r2 = r2 + 0.5 * jnp.einsum("mnab, mnij -> ijab", tau, Wmnij)
        r2 = r2 + 0.5 * jnp.einsum("ijef, abef -> ijab", tau, Wabef)
        tmp = (jnp.einsum("imae, mbej -> ijab", t2, Wmbej)
               - jnp.einsum("ie, ma, mbej -> ijab", t1, t1,
                            g[o, v, v, o]))
        tmp = tmp - jnp.swapaxes(tmp, 0, 1)
        r2 = r2 + tmp - jnp.swapaxes(tmp, 2, 3)
        tmp = jnp.einsum("ie, abej -> ijab", t1, g[v, v, v, o])
        r2 = r2 + tmp - jnp.swapaxes(tmp, 0, 1)
        tmp = jnp.einsum("ma, mbij -> ijab", t1, g[o, v, o, o])
        r2 = r2 - tmp + jnp.swapaxes(tmp, 2, 3)

        return r1 / d1, r2 / d2

    def _energy_expr(self, t1, t2, f, g, o, v):
        return jnp.real(
            jnp.einsum("ia, ia ->", f[o, v], t1)
            + 0.25 * jnp.einsum("ijab, ijab ->", g[o, o, v, v], t2)
            + 0.5 * jnp.einsum("ijab, ia, jb ->", g[o, o, v, v], t1, t1))

    def energy(self, t1, t2, f, g, o, v):
        return float(self._energy_expr(t1, t2, f, g, o, v))

    # ---------------------------------------------------------------- run
    def run(self):
        import jax
        from .scf import diis_extrapolate

        f, g, o, v, d1, d2, no, nv = self._setup()
        t1 = jnp.zeros((no, nv))
        t2 = g[o, o, v, v] / d2                   # MP2 start

        # the whole amplitude update + energy is ONE compiled program
        # per cycle (the ~30 einsums fuse; only DIIS stays on host)
        @jax.jit
        def cycle(t1, t2):
            t1n, t2n = self._update(t1, t2, f, g, o, v, d1, d2)
            return t1n, t2n

        e_old = self.energy(t1, t2, f, g, o, v)
        self.e_mp2 = e_old

        errs, vecs = [], []
        for it in range(self.max_cycle):
            t1n, t2n = cycle(t1, t2)
            # DIIS on the concatenated amplitude vector
            vec = jnp.concatenate([t1n.ravel(), t2n.ravel()])
            err = vec - jnp.concatenate([t1.ravel(), t2.ravel()])
            errs.append(np.asarray(err)); vecs.append(np.asarray(vec))
            if len(errs) > self.diis_size:
                errs.pop(0); vecs.pop(0)
            if len(errs) > 1:
                mix = diis_extrapolate(errs, vecs)
                if mix is not None:
                    t1n = jnp.asarray(mix[: no * nv]).reshape(no, nv)
                    t2n = jnp.asarray(mix[no * nv:]).reshape(
                        no, no, nv, nv)
            t1, t2 = t1n, t2n
            e_new = self.energy(t1, t2, f, g, o, v)
            if abs(e_new - e_old) < self.conv_tol:
                self.converged = True
                e_old = e_new
                break
            e_old = e_new

        self.t1, self.t2 = t1, t2
        self.e_corr = e_old
        self.e_tot = float(self.mf.e_tot) + e_old
        return self

    # ------------------------------------------------------------ triples
    def ccsd_t(self):
        """Perturbative triples correction (T) [Raghavachari et al.,
        CPL 157, 479 (1989)], spin-orbital form per Crawford & Schaefer:

            E_(T) = 1/36 sum t^c_ijkabc D_ijkabc (t^c + t^d)_ijkabc

        with disconnected t^d D = P(i/jk) P(a/bc) t_i^a <jk||bc> and
        connected t^c D = P(i/jk) P(a/bc) [sum_e t_jk^ae <ei||bc>
        - sum_m t_im^bc <ma||jk>].  Identically zero for two-electron
        systems (no triples exist).  Sets .e_t and .e_tot_t.
        """
        assert self.t2 is not None, "run CCSD first"
        f, g, o, v, d1, d2, no, nv = self._setup()
        if no < 3:
            self.e_t = 0.0
            self.e_tot_t = self.e_tot
            return self.e_t
        t1, t2 = self.t1, self.t2
        eps = jnp.diag(f)
        eo, ev = eps[o], eps[v]
        d3 = (eo[:, None, None, None, None, None]
              + eo[None, :, None, None, None, None]
              + eo[None, None, :, None, None, None]
              - ev[None, None, None, :, None, None]
              - ev[None, None, None, None, :, None]
              - ev[None, None, None, None, None, :])

        def p_ijk(x):
            # P(i/jk): x - x(i<->j) - x(i<->k) on the first three axes
            return (x - jnp.swapaxes(x, 0, 1) - jnp.swapaxes(x, 0, 2))

        def p_abc(x):
            # P(a/bc) on the last three axes
            return (x - jnp.swapaxes(x, 3, 4) - jnp.swapaxes(x, 3, 5))

        disc = p_ijk(p_abc(
            jnp.einsum("ia, jkbc -> ijkabc", t1, g[o, o, v, v])))
        conn = p_ijk(p_abc(
            jnp.einsum("jkae, eibc -> ijkabc", t2, g[v, o, v, v])
            - jnp.einsum("imbc, majk -> ijkabc", t2, g[o, v, o, o])))
        tc = conn / d3
        self.e_t = float(jnp.einsum("ijkabc, ijkabc ->",
                                    tc, conn + disc) / 36.0)
        self.e_tot_t = self.e_tot + self.e_t
        return self.e_t
