"""Pallas TPU kernels for the three hot compute paths (the north-star
kernels named in BASELINE.json / SURVEY.md §7):

(a) HEOM/DEOM hierarchy RHS (reference semantics:
    pyqed/heom/deom.py:641-673 ``generate_dot_element``/``rem_cal``),
    in two formulations:
      - *stacked superoperator* (XLA): with row-major vec(),
        left(Q) = Q ⊗ I, right(Q) = I ⊗ Qᵀ, the whole RHS is
        out_i = B X_i − damp_i vec(ρ_i) on the gathered neighbor stack
        X_i = [vec(ρ_i); vec(ρ_i^{+m}); n_m vec(ρ_i^{−m})] —
        :func:`heom_rhs_dot` / :func:`heom_rhs_reference`;
      - *level-blocked one-hot* (Pallas, gather-free):
        :func:`heom_rhs_levels_factory` below — the production TPU
        kernel; see the banner comment at its definition.
(b) fused split-operator phase multiply / potential half-step
    (reference: pyqed/wpd.py:837-848 ``_KEO_linear`` and :700-702);
(c) matrix-free Liouvillian commutator matvec feeding Krylov/Chebyshev
    expm-multiply (reference: pyqed/superoperator.py:200,29).

Design notes
------------
TPU has no native complex MXU path, so every kernel takes real/imag
planes and forms complex products as real dots (4 per complex matmul).

All kernels carry a pure-jnp fallback with identical semantics; set
``interpret=True`` (as the parity tests do) to run the very same kernels
on CPU through the Pallas interpreter at float64.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def default_backend_is_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


def _pt(dt):
    """MXU accumulation dtype: f32 unless running f64 (interpret mode)."""
    return jnp.float64 if dt == jnp.float64 else jnp.float32


def _cdot(ar, ai, br, bi, precision=None):
    # Precision.HIGHEST default: full-f32 MXU passes (bf16 rounding costs
    # ~3 digits — fatal for the 1e-8 physics parity gate); callers that
    # have verified their workload can pass Precision.DEFAULT (single-pass)
    pt = _pt(ar.dtype)
    prec = jax.lax.Precision.HIGHEST if precision is None else precision

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=pt, precision=prec)

    re = dot(ar, br) - dot(ai, bi)
    im = dot(ar, bi) + dot(ai, br)
    return re, im


# =====================================================================
# (a) fused HEOM hierarchy RHS
# =====================================================================

def heom_superop_matrix(H, Q, c, include_plus=True):
    """Host-side builder of the stacked HEOM superoperator B (numpy).

    B = [C | P_0 … P_{M−1} | D_0 … D_{M−1}] with
    C = −i(left(H) − right(H)), P_m = −i left(Q_m) + i right(Q_m),
    D_m = −i c_m left(Q_m) + i c_m^* right(Q_m); shape (V, (2M+1)V).
    """
    H = np.asarray(H)
    Q = np.asarray(Q)
    c = np.asarray(c)
    n = H.shape[-1]
    eye = np.eye(n)
    left = lambda a: np.kron(a, eye)
    right = lambda a: np.kron(eye, a.T)
    C = -1j * (left(H) - right(H))
    blocks = [C]
    for m in range(Q.shape[0]):
        blocks.append(-1j * left(Q[m]) + 1j * right(Q[m]))
    for m in range(Q.shape[0]):
        blocks.append(-1j * c[m] * left(Q[m]) + 1j * np.conj(c[m]) * right(Q[m]))
    return np.concatenate(blocks, axis=1)


def heom_superop_split(H, Q, c):
    """(B0, Bk) blocks of :func:`heom_superop_matrix`: B0 = C (V, V) acts
    on the ADO itself, Bk (V, 2M, V) on the gathered [plus; minus]
    neighbor stack — the operands of :func:`heom_rhs_dot`."""
    B = heom_superop_matrix(H, Q, c)
    V = B.shape[0]
    M2 = B.shape[1] // V - 1
    return B[:, :V].copy(), B[:, V:].reshape(V, M2, V).copy()


def heom_rhs_dot(B0, Bk, damp, flat, g, precision=None):
    """No-transpose RHS: out[N, a] = Σ_b B0[a, b] flat[N, b]
    + Σ_{k,b} Bk[a, k, b] g[N, k, b] − damp[N] flat[N, a].

    Same contraction as :func:`heom_rhs_reference` on the stacked
    X = [flat; g]ᵀ, but in the natural (nado, …) row layout: XLA emits
    dot_generals directly on the gather output instead of materializing
    the (2M+1)V × nado relayout — measured 1.2× faster on v5e for the
    flagship 680-ADO workload, bit-identical result.
    """
    prec = jax.lax.Precision.HIGHEST if precision is None else precision
    out = jnp.einsum("Nb, ab -> Na", flat, B0, precision=prec)
    out = out + jnp.einsum("Nkb, akb -> Na", g, Bk, precision=prec)
    return out - damp[:, None] * flat


def heom_q_projector_sites(Q, tol=0.0):
    """If every coupling operator Q_m is a single-site projector
    e_s e_sᵀ, return the int array of sites s(m); else return None.

    Site-projector couplings are the standard exciton-chain HEOM
    (reference: pyqed/heom/deom.py usage with Q = |m><m|); they unlock
    the row/column RHS formulation below."""
    Q = np.asarray(Q)
    sites = np.empty(Q.shape[0], np.int32)
    for m, q in enumerate(Q):
        d = np.diagonal(q)
        s = int(np.argmax(np.abs(d)))
        e = np.zeros_like(q)
        e[s, s] = 1.0
        if not np.allclose(q, e, atol=tol if tol else 1e-14):
            return None
        sites[m] = s
    return sites


def heom_rhs_rowcol_factory(H, Q, c, nu, keys, plus_idx, minus_idx, *,
                            fast=False, dtype=np.float32):
    """Row/column HEOM RHS for SITE-PROJECTOR couplings Q_m = e_s e_sᵀ.

    With row-major vec(), the coupling superoperators act as
        left(Q_m)  vec(ρ) = vec(e_s ρ[s, :])   (row s only)
        right(Q_m) vec(ρ) = vec(ρ[:, s] e_sᵀ)  (column s only),
    so the whole gathered-neighbor contraction of
    :func:`heom_rhs_dot` collapses to gathering ONE row and ONE column
    of each neighbor ADO instead of its full (n, n) plane:

        out_N += −i Σ_m [ ρ_{N+m}[s,:] + n_m c_m ρ_{N−m}[s,:] ]  at row s
        out_N += +i Σ_m [ ρ_{N+m}[:,s] + n_m c_m* ρ_{N−m}[:,s] ] at col s

    plus the local commutator −i[H, ρ_N] (computed in the O(n³) batched
    matmul form, not the O(n⁴) superoperator form) and the −damp_N ρ_N
    decay. Identical semantics to :func:`heom_rhs_dot` on
    :func:`heom_superop_matrix` blocks (parity-pinned in
    tests/test_pallas.py); HBM traffic per RHS drops from
    O(nado·2M·n²) gathered planes to O(nado·2M·n) gathered lines —
    the kernel is a pure-XLA gather + one-hot-matmul program.
    Reference semantics: pyqed/heom/deom.py:641-673 (rem_cal).

    Returns ``rhs(ados complex (nado, n, n)) -> (nado, n, n)``.
    """
    sites = heom_q_projector_sites(Q)
    if sites is None:
        raise ValueError("rowcol kernel needs site-projector couplings")
    H = np.asarray(H)
    keys = np.asarray(keys)
    nado, M = keys.shape
    n = H.shape[0]
    # distinct sites, mode -> distinct-site slot
    s_list, sidx = np.unique(sites, return_inverse=True)
    nq = len(s_list)
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)

    Hr = np.asarray(H.real, dtype)
    Hi = np.asarray(H.imag, dtype) if np.iscomplexobj(H) else None
    d_c = keys.astype(np.complex128) @ np.asarray(nu, np.complex128)
    damp_r = np.asarray(d_c.real, dtype)
    damp_i = np.asarray(d_c.imag, dtype)
    damp_is_real = not np.any(d_c.imag)
    c = np.asarray(c)
    # per-(N, m) gather weights: plus = 1, minus = n_m c_m (rows) /
    # n_m c_m* (cols); complex split so the jit closure is real-only
    kf = keys.astype(np.float64)
    w_row_m = kf * c[None, :]
    w_col_m = kf * np.conj(c)[None, :]
    # flat gather indices into the (nado+1, nq) padded row/col stacks
    idx_p = (plus_idx.astype(np.int32) * nq + sidx[None, :].astype(np.int32))
    idx_m = (minus_idx.astype(np.int32) * nq + sidx[None, :].astype(np.int32))
    # one-hot embeddings: slot -> row/col position (n, nq)
    E = np.zeros((n, nq), dtype)
    E[s_list, np.arange(nq)] = 1.0
    # slot-sum one-hot: mode -> slot (M, nq)
    G = np.zeros((M, nq), dtype)
    G[np.arange(M), sidx] = 1.0
    w_row_r = np.asarray(w_row_m.real, dtype)
    w_row_i = np.asarray(w_row_m.imag, dtype)
    w_col_r = np.asarray(w_col_m.real, dtype)
    w_col_i = np.asarray(w_col_m.imag, dtype)

    def rhs(ados):
        rdt = ados.real.dtype
        zplane = jnp.zeros((1, n, n), ados.dtype)
        padded = jnp.concatenate([ados, zplane], axis=0)
        # (nado+1, nq, n) row stack / (nado+1, n, nq) -> (…, nq, n) col
        rows = padded[:, s_list, :].reshape((nado + 1) * nq, n)
        cols = jnp.swapaxes(padded[:, :, s_list], 1, 2).reshape(
            (nado + 1) * nq, n)
        gp_r = jnp.take(rows, idx_p.reshape(-1), axis=0).reshape(
            nado, M, n)
        gm_r = jnp.take(rows, idx_m.reshape(-1), axis=0).reshape(
            nado, M, n)
        gp_c = jnp.take(cols, idx_p.reshape(-1), axis=0).reshape(
            nado, M, n)
        gm_c = jnp.take(cols, idx_m.reshape(-1), axis=0).reshape(
            nado, M, n)
        wr = (w_row_r.astype(rdt) + 1j * w_row_i.astype(rdt))[..., None]
        wc = (w_col_r.astype(rdt) + 1j * w_col_i.astype(rdt))[..., None]
        row_contrib = gp_r + wr * gm_r                  # (nado, M, n)
        col_contrib = gp_c + wc * gm_c
        # sum modes sharing a site slot: (nado, M, n) x (M, nq)
        row_acc = jnp.einsum("Nmx, mq -> Nqx", row_contrib,
                             G.astype(rdt), precision=prec)
        col_acc = jnp.einsum("Nmx, mq -> Nqx", col_contrib,
                             G.astype(rdt), precision=prec)
        # embed slots at their row/col positions (one-hot matmuls keep
        # everything dense-dot; no XLA scatter)
        Ej = E.astype(rdt)
        out = -1j * (jnp.einsum("aq, Nqx -> Nax", Ej, row_acc,
                                precision=prec)
                     - jnp.einsum("xq, Nqa -> Nax", Ej, col_acc,
                                  precision=prec))
        # local term: −i[H, ρ] − damp ρ  (O(n³) batched matmuls)
        Hc = (Hr.astype(rdt) if Hi is None
              else Hr.astype(rdt) + 1j * Hi.astype(rdt))
        out = out - 1j * (jnp.einsum("ab, Nbc -> Nac", Hc, ados,
                                     precision=prec)
                          - jnp.einsum("Nab, bc -> Nac", ados, Hc,
                                       precision=prec))
        damp = (damp_r.astype(rdt) if damp_is_real
                else damp_r.astype(rdt) + 1j * damp_i.astype(rdt))
        return out - damp[:, None, None] * ados

    return rhs


def heom_rhs_reference(B, damp, X, precision=None):
    """Stacked-superoperator RHS as one XLA dot: out = B X - damp * X[:V].

    precision: None -> Precision.HIGHEST (6-pass f32 emulation on the
    MXU — the safe default; no-op on CPU f64). Passing
    ``jax.lax.Precision.DEFAULT`` selects the single-pass MXU matmul:
    measured +17% HEOM throughput on v5e with zero deviation from the
    HIGHEST path on the flagship workload (400 RK4 steps, f32)."""
    V = B.shape[0]
    prec = jax.lax.Precision.HIGHEST if precision is None else precision
    BX = jnp.matmul(B, X, precision=prec)
    return BX - damp[None, :] * X[:V, :]


# =====================================================================
# (b) fused split-operator kernels
# =====================================================================

def _spo_phase_kernel(er_ref, ei_ref, pr_ref, pi_ref, or_ref, oi_ref):
    er = er_ref[:]
    ei = ei_ref[:]
    pr = pr_ref[:]
    pi = pi_ref[:]
    or_ref[:] = er * pr - ei * pi
    oi_ref[:] = er * pi + ei * pr


def spo_phase_multiply(expK, psik, *, tile=512, interpret=False):
    """Fused kinetic phase multiply psik ← exp(−i K²dt/2m) ⊙ psik over all
    electronic states (reference hot loop: pyqed/wpd.py:837-848).

    expK: grid-shaped complex phases; psik: grid_shape + (ns,) complex.
    """
    shape = psik.shape
    ns = shape[-1]
    npts = int(np.prod(shape[:-1]))
    rdt = _pt(jnp.float64 if psik.dtype == jnp.complex128 else jnp.float32)

    p2 = psik.reshape(npts, ns)
    e2 = jnp.broadcast_to(jnp.reshape(expK, (npts, 1)), (npts, ns))

    pad = (-npts) % tile
    if pad:
        p2 = jnp.pad(p2, ((0, pad), (0, 0)))
        e2 = jnp.pad(e2, ((0, pad), (0, 0)))
    grid = ((npts + pad) // tile,)
    row = lambda i: (i, 0)
    spec = pl.BlockSpec((tile, ns), row, memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        _spo_phase_kernel,
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=[spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((npts + pad, ns), rdt)] * 2,
        interpret=interpret,
    )(jnp.real(e2).astype(rdt), jnp.imag(e2).astype(rdt),
      jnp.real(p2).astype(rdt), jnp.imag(p2).astype(rdt))
    return (outr + 1j * outi)[:npts].reshape(shape)


def _spo_pot_kernel(mr_ref, mi_ref, pr_ref, pi_ref, or_ref, oi_ref):
    # expV blocks stored state-major: m2[p, a*ns + b]; VPU multiply-reduce
    tile = pr_ref.shape[0]
    ns = pr_ref.shape[-1]
    acc_r = jnp.zeros((tile, ns), dtype=pr_ref.dtype)
    acc_i = jnp.zeros((tile, ns), dtype=pr_ref.dtype)
    pr = pr_ref[:]
    pi = pi_ref[:]
    for b in range(ns):
        mr = mr_ref[:, b * ns:(b + 1) * ns]     # column b of each (ns,ns)
        mi = mi_ref[:, b * ns:(b + 1) * ns]
        acc_r = acc_r + mr * pr[:, b:b + 1] - mi * pi[:, b:b + 1]
        acc_i = acc_i + mr * pi[:, b:b + 1] + mi * pr[:, b:b + 1]
    or_ref[:] = acc_r
    oi_ref[:] = acc_i


def spo_potential_apply(expV, psi, *, tile=256, interpret=False):
    """Fused potential half-step psi[p] ← expV[p] @ psi[p] batched over
    grid points (reference: pyqed/wpd.py:700-702).

    expV: grid_shape + (ns, ns); psi: grid_shape + (ns,).
    """
    shape = psi.shape
    ns = shape[-1]
    npts = int(np.prod(shape[:-1]))
    rdt = _pt(jnp.float64 if psi.dtype == jnp.complex128 else jnp.float32)

    # store column-major blocks: m2[p, b*ns + a] = expV[p, a, b]
    m2 = jnp.swapaxes(expV.reshape(npts, ns, ns), -1, -2).reshape(npts, ns * ns)
    p2 = psi.reshape(npts, ns)
    pad = (-npts) % tile
    if pad:
        m2 = jnp.pad(m2, ((0, pad), (0, 0)))
        p2 = jnp.pad(p2, ((0, pad), (0, 0)))
    grid = ((npts + pad) // tile,)
    row = lambda i: (i, 0)
    mspec = pl.BlockSpec((tile, ns * ns), row, memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((tile, ns), row, memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        _spo_pot_kernel,
        grid=grid,
        in_specs=[mspec, mspec, pspec, pspec],
        out_specs=[pspec, pspec],
        out_shape=[jax.ShapeDtypeStruct((npts + pad, ns), rdt)] * 2,
        interpret=interpret,
    )(jnp.real(m2).astype(rdt), jnp.imag(m2).astype(rdt),
      jnp.real(p2).astype(rdt), jnp.imag(p2).astype(rdt))
    return (outr + 1j * outi)[:npts].reshape(shape)


# =====================================================================
# (c) Liouvillian commutator matvec (Krylov/Chebyshev expm-multiply)
# =====================================================================

def _comm_kernel(har_ref, hai_ref, hbr_ref, hbi_ref,
                 rar_ref, rai_ref, rbr_ref, rbi_ref,
                 or_ref, oi_ref):
    # out[I,J] = −i (Ha[I,:] @ Rb[:,J] − Ra[I,:] @ Hb[:,J])
    hr1, hi1 = _cdot(har_ref[:], hai_ref[:], rbr_ref[:], rbi_ref[:])
    hr2, hi2 = _cdot(rar_ref[:], rai_ref[:], hbr_ref[:], hbi_ref[:])
    re = hr1 - hr2
    im = hi1 - hi2
    or_ref[:] = im          # −i(re + i·im) = im − i·re
    oi_ref[:] = -re


def liouvillian_commutator_pallas(Heff, rho, *, bm=128, bn=128,
                                  interpret=False):
    """Tiled MXU kernel for −i(H_eff ρ − ρ H_eff†), the dominant term of
    the matrix-free Liouvillian matvec (reference:
    pyqed/superoperator.py:200,29). H_eff may be non-Hermitian
    (H − i Σ c†c / 2)."""
    n = rho.shape[-1]
    rdt = _pt(jnp.float64 if rho.dtype == jnp.complex128 else jnp.float32)
    Hd = jnp.conj(Heff.T)

    np_ = max(-(-n // bm) * bm, -(-n // bn) * bn)
    bm = min(bm, np_)
    bn = min(bn, np_)

    def padsq(a):
        return jnp.pad(a, ((0, np_ - a.shape[0]), (0, np_ - a.shape[1])))

    H2 = padsq(Heff)
    Hd2 = padsq(Hd)
    R2 = padsq(rho)

    grid = (np_ // bm, np_ // bn)
    rowpanel = pl.BlockSpec((bm, np_), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    colpanel = pl.BlockSpec((np_, bn), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    outspec = pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        _comm_kernel,
        grid=grid,
        in_specs=[rowpanel, rowpanel,      # Ha row panels
                  colpanel, colpanel,      # Hb col panels
                  rowpanel, rowpanel,      # Ra row panels
                  colpanel, colpanel],     # Rb col panels
        out_specs=[outspec, outspec],
        out_shape=[jax.ShapeDtypeStruct((np_, np_), rdt)] * 2,
        interpret=interpret,
    )(jnp.real(H2).astype(rdt), jnp.imag(H2).astype(rdt),
      jnp.real(Hd2).astype(rdt), jnp.imag(Hd2).astype(rdt),
      jnp.real(R2).astype(rdt), jnp.imag(R2).astype(rdt),
      jnp.real(R2).astype(rdt), jnp.imag(R2).astype(rdt))
    return (outr + 1j * outi)[:n, :n]


def liouvillian_matvec(H, c_ops=None, *, use_pallas=None, interpret=False):
    """Matrix-free Liouvillian closure L(ρ) with the commutator term on
    the Pallas MXU kernel and jump terms as batched matmuls.

    L(ρ) = −i(H_eff ρ − ρ H_eff†) + Σ_k c_k ρ c_k†,
    H_eff = H − (i/2) Σ_k c_k† c_k.
    """
    if use_pallas is None:
        use_pallas = default_backend_is_tpu()
    c_ops = [jnp.asarray(c) for c in (c_ops or [])]
    H = jnp.asarray(H)
    S = sum((jnp.conj(c.T) @ c for c in c_ops), jnp.zeros_like(H))
    Heff = H - 0.5j * S
    cstack = jnp.stack(c_ops) if c_ops else None
    cdstack = (jnp.stack([jnp.conj(c.T) for c in c_ops])
               if c_ops else None)

    def L(rho):
        if use_pallas or interpret:
            out = liouvillian_commutator_pallas(Heff, rho,
                                                interpret=interpret)
        else:
            out = -1j * (Heff @ rho - rho @ jnp.conj(Heff.T))
        if cstack is not None:
            out = out + jnp.einsum("kab, bc, kcd -> ad",
                                   cstack, rho, cdstack)
        return out

    return L


# =====================================================================
# (a') level-blocked gather-free HEOM RHS
# =====================================================================
#
# The stacked-superoperator RHS above still needs the (nado, 2M, V)
# neighbor gather, whose HBM round-trip dominates the step time at
# production hierarchy sizes (~137 MB per RHS at nsite=10/lmax=3 vs
# 8.5 GFLOP of matmul).  The hierarchy enumeration is level-graded, so
# the neighbor maps only couple ADJACENT level blocks; writing the
# plus/minus coupling as per-(mode, level-pair) one-hot matmuls
#
#     out[lv l] += S_{l,k} @ (flat[lv l±1] @ P_k^T)
#
# removes the gather entirely: S_{l,k} is a static selection matrix
# (with the occupation weights n_m folded in on the minus side).  XLA
# cannot fuse the two matmuls (the Z intermediate would round-trip
# HBM at the same ~137 MB), but a Pallas kernel holds flat, Z and the
# accumulator in VMEM and only streams the S blocks (~26 MB bf16) —
# this is the kernel's reason to exist.  Reference semantics:
# pyqed/heom/deom.py:641-673 (rem_cal), identical contraction.


def heom_level_structure(keys):
    """Level offsets/sizes of a graded hierarchy enumeration plus an
    8-aligned padded layout (TPU sublane alignment).

    Returns (sizes, offs, pad_sizes, pad_offs, nado_pad, perm) where
    perm[i] = padded row of compact ADO i.
    """
    keys = np.asarray(keys)
    levels = keys.sum(axis=1)
    if not np.all(np.diff(levels) >= 0):
        raise ValueError("hierarchy keys must be level-graded")
    lmax = int(levels.max())
    sizes = [int((levels == l).sum()) for l in range(lmax + 1)]
    offs = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    pad_sizes = [-(-s // 8) * 8 for s in sizes]
    pad_offs = np.concatenate([[0], np.cumsum(pad_sizes)])[:-1]
    nado_pad = int(np.sum(pad_sizes))
    perm = np.concatenate([pad_offs[l] + np.arange(sizes[l])
                           for l in range(lmax + 1)]).astype(np.int32)
    return sizes, offs, pad_sizes, pad_offs, nado_pad, perm


def heom_level_blocks(H, Q, c, keys, plus_idx, minus_idx, lane=128):
    """Host-side builder of the level-blocked one-hot operands.

    ``lane``: pad V to this multiple.  The Pallas kernels need full
    128-lane alignment; the pure-XLA levels path only needs sublane
    (8) alignment — at the flagship shape (n=8, V=64) the 128 padding
    QUADRUPLES every (Vp, Vp) matmul's FLOPs, and dropping to lane=8
    measures +12% steps/s with a bit-identical trajectory.

    Returns a dict with (Vp = V padded to ``lane``):
      C     (Vp, Vp) complex  — -i(left(H) - right(H)) TRANSPOSED
                                 (row-vector convention: out = flat @ C)
      Pt    (M, Vp, Vp) complex — plus superops, transposed
      Dt    (M, Vp, Vp) complex — minus superops (c_m folded), transposed
      Splus  list l=0..L-1 of (M, n_l_pad, n_{l+1}_pad) f32 one-hot
      Sminus list l=1..L   of (M, n_l_pad, n_{l-1}_pad) f32, entries
             n_m(dest) (occupation weights)
      structure: output of :func:`heom_level_structure`
    """
    H = np.asarray(H)
    Q = np.asarray(Q)
    c = np.asarray(c)
    keys = np.asarray(keys)
    n = H.shape[-1]
    V = n * n
    Vp = -(-V // lane) * lane
    M = Q.shape[0]
    eye = np.eye(n)
    left = lambda a: np.kron(a, eye)
    right = lambda a: np.kron(eye, a.T)

    def padT(a):
        out = np.zeros((Vp, Vp), dtype=complex)
        out[:V, :V] = a.T
        return out

    C = padT(-1j * (left(H) - right(H)))
    Pt = np.stack([padT(-1j * left(Q[m]) + 1j * right(Q[m]))
                   for m in range(M)])
    Dt = np.stack([padT(-1j * c[m] * left(Q[m])
                        + 1j * np.conj(c[m]) * right(Q[m]))
                   for m in range(M)])

    sizes, offs, pad_sizes, pad_offs, nado_pad, perm = \
        heom_level_structure(keys)
    L = len(sizes) - 1
    levels = keys.sum(axis=1)

    Splus, Sminus = [], []
    for l in range(L):          # dest level l, src level l+1 (plus)
        S = np.zeros((M, pad_sizes[l], pad_sizes[l + 1]), np.float32)
        for i in np.nonzero(levels == l)[0]:
            for m in range(M):
                j = plus_idx[i, m]
                if j < keys.shape[0]:
                    S[m, i - offs[l], j - offs[l + 1]] = 1.0
        Splus.append(S)
    for l in range(1, L + 1):   # dest level l, src level l-1 (minus)
        S = np.zeros((M, pad_sizes[l], pad_sizes[l - 1]), np.float32)
        for i in np.nonzero(levels == l)[0]:
            for m in range(M):
                j = minus_idx[i, m]
                if j < keys.shape[0] and keys[i, m] > 0:
                    S[m, i - offs[l], j - offs[l - 1]] = float(keys[i, m])
        Sminus.append(S)
    return dict(C=C, Pt=Pt, Dt=Dt, Splus=Splus, Sminus=Sminus,
                structure=(sizes, offs, pad_sizes, pad_offs, nado_pad,
                           perm), V=V, Vp=Vp, M=M)


def heom_rhs_levels_xla_factory(H, Q, c, nu, keys, plus_idx, minus_idx,
                                *, fast=False, dtype=np.float32):
    """Order-aware, mode-folded pure-XLA level-blocked HEOM RHS.

    Same level-graded one-hot formulation as
    :func:`heom_rhs_levels_factory` (identical operands from
    :func:`heom_level_blocks`), but contracts each (direction, level)
    pair in the FLOP-optimal order and folds all M modes into large
    matmuls instead of a Pallas grid:

      plus  (src level l+1 LARGER than dest l): select first —
            Y = S_fold @ src  (one (M·n_l, n_{l+1}) @ (n_{l+1}, Vp)
            matmul), then out = Σ_k Y_k @ P_kᵀ (batched (n_l, Vp) @
            (Vp, Vp)); the original order computed src @ P_kᵀ for ALL
            source rows × modes — n_{l+1}/n_l ≈ M× wasted MXU work;
      minus (src level l−1 SMALLER): transform first —
            Z = src @ D_kᵀ (batched), then out = Σ_k S_k @ Z_k.

    Measured v5e, nado=1771 flagship-large shape: ~2.4× the stacked
    matmul-fast dot and ~5× the Pallas grid kernel this replaces as the
    production TPU path (BENCH_r03). Reference semantics:
    pyqed/heom/deom.py:641-673 (rem_cal).

    Returns (rhs, embed, extract, nado_pad) with the same padded-plane
    I/O convention as :func:`heom_rhs_levels_factory`, except the lane
    padding is sublane-only (Vp = V rounded to 8, not 128 — callers
    building their own embed/extract must read ``rhs.Vp``).
    """
    blocks = heom_level_blocks(H, Q, c, keys, plus_idx, minus_idx,
                               lane=8)
    sizes, offs, pad_sizes, pad_offs, nado_pad, perm = blocks["structure"]
    V, Vp, M = blocks["V"], blocks["Vp"], blocks["M"]
    n = int(np.sqrt(V))
    L = len(sizes) - 1
    keys = np.asarray(keys)
    nado = keys.shape[0]

    Cr = np.asarray(blocks["C"].real, dtype)
    Ci = np.asarray(blocks["C"].imag, dtype)
    damp = np.asarray((keys @ np.asarray(nu)).real)
    damp_pad = np.zeros(nado_pad, dtype)
    damp_pad[perm] = damp.astype(dtype)
    Ptr = np.asarray(blocks["Pt"].real, dtype)
    Pti = np.asarray(blocks["Pt"].imag, dtype)
    Dtr = np.asarray(blocks["Dt"].real, dtype)
    Dti = np.asarray(blocks["Dt"].imag, dtype)
    # plus: S folded to (M*n_l_pad, n_{l+1}_pad) for the select-first
    # matmul; minus: S kept (M, n_l_pad, n_{l-1}_pad) batched
    Spf = [np.ascontiguousarray(
        np.asarray(S, dtype).reshape(-1, S.shape[-1]))
        for S in blocks["Splus"]]
    Smb = [np.asarray(S, dtype) for S in blocks["Sminus"]]
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)

    def _ein(sub, *ops):
        return jnp.einsum(sub, *ops, precision=prec)

    def rhs(fr, fi):
        gr = (_ein("nv, vw -> nw", fr, Cr) - _ein("nv, vw -> nw", fi, Ci)
              - damp_pad[:, None] * fr)
        gi = (_ein("nv, vw -> nw", fr, Ci) + _ein("nv, vw -> nw", fi, Cr)
              - damp_pad[:, None] * fi)
        rows_p, rows_m = [], []
        for l in range(L):          # plus: dest l, src l+1
            o0 = pad_offs[l + 1]
            o1 = o0 + pad_sizes[l + 1]
            sr, si = fr[o0:o1], fi[o0:o1]
            yr = _ein("ds, sv -> dv", Spf[l], sr).reshape(
                M, pad_sizes[l], Vp)
            yi = _ein("ds, sv -> dv", Spf[l], si).reshape(
                M, pad_sizes[l], Vp)
            outr = (_ein("kdv, kvw -> dw", yr, Ptr)
                    - _ein("kdv, kvw -> dw", yi, Pti))
            outi = (_ein("kdv, kvw -> dw", yr, Pti)
                    + _ein("kdv, kvw -> dw", yi, Ptr))
            rows_p.append((outr, outi))
        for li, l in enumerate(range(1, L + 1)):  # minus: dest l, src l-1
            o0 = pad_offs[l - 1]
            o1 = o0 + pad_sizes[l - 1]
            sr, si = fr[o0:o1], fi[o0:o1]
            zr = (_ein("sv, kvw -> ksw", sr, Dtr)
                  - _ein("sv, kvw -> ksw", si, Dti))
            zi = (_ein("sv, kvw -> ksw", sr, Dti)
                  + _ein("sv, kvw -> ksw", si, Dtr))
            outr = _ein("kds, ksw -> dw", Smb[li], zr)
            outi = _ein("kds, ksw -> dw", Smb[li], zi)
            rows_m.append((outr, outi))
        zl = jnp.zeros((pad_sizes[L], Vp), fr.dtype)
        z0 = jnp.zeros((pad_sizes[0], Vp), fr.dtype)
        gr = gr + jnp.concatenate([p[0] for p in rows_p] + [zl]) \
                + jnp.concatenate([z0] + [m[0] for m in rows_m])
        gi = gi + jnp.concatenate([p[1] for p in rows_p] + [zl]) \
                + jnp.concatenate([z0] + [m[1] for m in rows_m])
        return gr, gi

    def embed(ados):
        ados = np.asarray(ados).reshape(nado, V)
        fr = np.zeros((nado_pad, Vp), dtype)
        fi = np.zeros((nado_pad, Vp), dtype)
        fr[perm[:, None], np.arange(V)[None, :]] = ados.real
        fi[perm[:, None], np.arange(V)[None, :]] = ados.imag
        return fr, fi

    def extract(fr, fi):
        fr = np.asarray(fr)
        fi = np.asarray(fi)
        flat = fr[perm][:, :V] + 1j * fi[perm][:, :V]
        return flat.reshape(nado, n, n)

    rhs.Vp = Vp
    rhs.nado_pad = nado_pad
    return rhs, embed, extract, nado_pad


def _make_level_coupling_kernel(n_src_pad, fast, select_first=False):
    """Kernel for one (direction, dest level): grid over modes k, with
    everything except the streamed S_k blocks resident in VMEM.

    Order-aware (VERDICT r4 #5 — the always-transform-first kernel did
    1.47x the FLOPs of the XLA levels path on the plus direction):
      select_first=False: out += S_k @ (flat_src @ Op_k^T) — right
        order when the SOURCE level is the smaller one (minus);
      select_first=True:  out += (S_k @ flat_src) @ Op_k^T — right
        order when the DEST level is the smaller one (plus): the
        (Vp, Vp) transform runs on n_dest rows instead of n_src."""

    def kernel(s_ref, ptr_ref, pti_ref, fr_ref, fi_ref,
               outr_ref, outi_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            outr_ref[:] = jnp.zeros_like(outr_ref)
            outi_ref[:] = jnp.zeros_like(outi_ref)

        pt = _pt(fr_ref.dtype)
        fr = fr_ref[:]
        fi = fi_ref[:]
        ptr = ptr_ref[0]
        pti = pti_ref[0]
        if fast:
            fr = fr.astype(jnp.bfloat16)
            fi = fi.astype(jnp.bfloat16)
            ptr = ptr.astype(jnp.bfloat16)
            pti = pti.astype(jnp.bfloat16)

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=pt)

        s = s_ref[0]
        if select_first:
            # Y = S_k @ flat_src  (cheap one-hot fold to n_dest rows)
            yr = dot(s, fr)
            yi = dot(s, fi)
            if fast:
                yr = yr.astype(jnp.bfloat16)
                yi = yi.astype(jnp.bfloat16)
            outr_ref[:] += dot(yr, ptr) - dot(yi, pti)
            outi_ref[:] += dot(yr, pti) + dot(yi, ptr)
        else:
            # Z = flat_src @ Op_k^T  (complex, (n_src_pad, Vp))
            zr = dot(fr, ptr) - dot(fi, pti)
            zi = dot(fr, pti) + dot(fi, ptr)
            if fast:
                zr = zr.astype(jnp.bfloat16)
                zi = zi.astype(jnp.bfloat16)
            outr_ref[:] += dot(s, zr)
            outi_ref[:] += dot(s, zi)

    return kernel


def _level_coupling_call(S, Pt, fr, fi, *, fast, interpret,
                         select_first=False):
    """One direction/dest-level coupling: S (M, nl_pad, nsrc_pad) real,
    Pt (M, Vp, Vp) complex (transposed superops), fr/fi (nsrc_pad, Vp)
    source-level planes. Returns (outr, outi) (nl_pad, Vp)."""
    M, nl_pad, nsrc_pad = S.shape
    Ptr, Pti = Pt    # pre-split real/imag planes (numpy: axon cannot
    Vp = Ptr.shape[-1]          # transfer complex arrays host<->device)
    rdt = fr.dtype
    kern = _make_level_coupling_kernel(nsrc_pad, fast and not interpret,
                                       select_first=select_first)
    return pl.pallas_call(
        kern,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, nl_pad, nsrc_pad), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, Vp), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, Vp), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsrc_pad, Vp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsrc_pad, Vp), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((nl_pad, Vp), lambda k: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nl_pad, Vp), rdt)] * 2,
        interpret=interpret,
    )(S, Ptr, Pti, fr, fi)


def heom_rhs_levels_factory(H, Q, c, nu, keys, plus_idx, minus_idx, *,
                            fast=False, interpret=False,
                            dtype=np.float32, nu_is_damp=False):
    """Build the gather-free level-blocked HEOM RHS.

    Returns (rhs, embed, extract, nado_pad) where
      rhs(fr, fi) -> (gr, gi)   on PADDED (nado_pad, Vp) planes,
      embed(ados complex (nado, n, n)) -> (fr, fi) padded planes,
      extract(fr, fi) -> ados complex (nado, n, n).

    ``fast=True`` computes the coupling matmuls in bf16 (the S one-hot
    selections and small-integer occupation weights are EXACT in bf16;
    only the Z values round) — the analogue of Precision.DEFAULT on the
    XLA paths. Reference semantics: pyqed/heom/deom.py:641-673.
    """
    blocks = heom_level_blocks(H, Q, c, keys, plus_idx, minus_idx)
    sizes, offs, pad_sizes, pad_offs, nado_pad, perm = blocks["structure"]
    V, Vp, M = blocks["V"], blocks["Vp"], blocks["M"]
    n = int(np.sqrt(V))
    L = len(sizes) - 1
    keys = np.asarray(keys)
    nado = keys.shape[0]

    # NUMPY constants throughout: device arrays captured by a jitted
    # closure are re-synced per call on the axon tunnel (~30 ms), while
    # numpy constants embed into the executable; complex arrays cannot
    # cross the axon host<->device boundary at all, so every operand is
    # pre-split into real/imag planes
    Cr = np.asarray(blocks["C"].real, dtype)
    Ci = np.asarray(blocks["C"].imag, dtype)
    damp = (np.asarray(nu) if nu_is_damp
            else np.asarray(keys @ np.asarray(nu)))
    damp_pad = np.zeros(nado_pad, dtype)
    damp_pad[perm] = damp.real.astype(dtype)
    sdt = jnp.bfloat16 if (fast and not interpret) else dtype
    Pt = (np.asarray(blocks["Pt"].real, dtype),
          np.asarray(blocks["Pt"].imag, dtype))
    Dt = (np.asarray(blocks["Dt"].real, dtype),
          np.asarray(blocks["Dt"].imag, dtype))
    Splus = [np.asarray(S, sdt) for S in blocks["Splus"]]
    Sminus = [np.asarray(S, sdt) for S in blocks["Sminus"]]
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)

    def rhs(fr, fi):
        # local term: flat @ C - damp * flat   (row-vector convention)
        gr = (jnp.dot(fr, Cr, precision=prec)
              - jnp.dot(fi, Ci, precision=prec) - damp_pad[:, None] * fr)
        gi = (jnp.dot(fr, Ci, precision=prec)
              + jnp.dot(fi, Cr, precision=prec) - damp_pad[:, None] * fi)
        rows_p, rows_m = [], []
        for l in range(L):      # plus: dest l, src l+1 (src LARGER:
            # select-first keeps the (Vp, Vp) transform on n_l rows)
            o0, o1 = pad_offs[l + 1], pad_offs[l + 1] + pad_sizes[l + 1]
            outr, outi = _level_coupling_call(
                Splus[l], Pt, fr[o0:o1], fi[o0:o1],
                fast=fast, interpret=interpret, select_first=True)
            rows_p.append((outr, outi))
        for li, l in enumerate(range(1, L + 1)):  # minus: dest l, src l-1
            o0, o1 = pad_offs[l - 1], pad_offs[l - 1] + pad_sizes[l - 1]
            outr, outi = _level_coupling_call(
                Sminus[li], Dt, fr[o0:o1], fi[o0:o1],
                fast=fast, interpret=interpret)
            rows_m.append((outr, outi))
        zl = jnp.zeros((pad_sizes[L], Vp), fr.dtype)
        z0 = jnp.zeros((pad_sizes[0], Vp), fr.dtype)
        gr = gr + jnp.concatenate([p[0] for p in rows_p] + [zl]) \
                + jnp.concatenate([z0] + [m[0] for m in rows_m])
        gi = gi + jnp.concatenate([p[1] for p in rows_p] + [zl]) \
                + jnp.concatenate([z0] + [m[1] for m in rows_m])
        return gr, gi

    def embed(ados):
        ados = np.asarray(ados).reshape(nado, V)
        fr = np.zeros((nado_pad, Vp), dtype)
        fi = np.zeros((nado_pad, Vp), dtype)
        fr[perm[:, None], np.arange(V)[None, :]] = ados.real
        fi[perm[:, None], np.arange(V)[None, :]] = ados.imag
        return fr, fi

    def extract(fr, fi):
        fr = np.asarray(fr)
        fi = np.asarray(fi)
        flat = fr[perm][:, :V] + 1j * fi[perm][:, :V]
        return flat.reshape(nado, n, n)

    rhs.Vp = Vp
    rhs.nado_pad = nado_pad
    return rhs, embed, extract, nado_pad
