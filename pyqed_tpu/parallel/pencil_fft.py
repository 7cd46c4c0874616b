"""Distributed pencil / four-step FFT over a sharded grid axis.

This is the framework's true context parallelism for FFT-based kinetic
energy propagation (the workload class of the reference's
``_KEO_linear``, pyqed/wpd.py:837): under plain GSPMD, jax 0.9's
partitioner does NOT decompose an FFT along a sharded axis — it
all-gathers the axis, FFTs locally and dynamic-slices the shard back
out (pinned by ``tests/test_parallel.py``), which re-imposes a
single-device O(N) memory/communication ceiling.  Here the transform
along the sharded axis is done the classical distributed way instead,
with ``shard_map`` + explicit ``all_to_all`` transposes so per-device
memory and communication stay O(N/d):

* **Pencil decomposition** (``fft_ndim >= 2``): FFT the unsharded grid
  axes locally, transpose the array over the mesh with ONE tiled
  all-to-all so the formerly-sharded axis 0 becomes device-local
  (axis 1 absorbs the sharding), FFT it, transpose back.  Two
  all-to-alls per forward transform, each moving N/d per device.

* **Four-step / Bailey decomposition** (``fft_ndim == 1``): a length-N
  DFT with N = d*m is factored as  X[k1 + d*k2] =
  FFT_m{ W_N^(n2*k1) * FFT_d{ x[n2 + m*... ] } } — concretely, view
  x as the (d, m) matrix A[n1, n2] with device p holding row p;
  transpose to columns (all-to-all), FFT the length-d axis, twiddle by
  exp(-2*pi*i*k1*n2/N), transpose to rows (all-to-all), FFT the
  length-m axis, and block-transpose once more so each device ends with
  its contiguous chunk of the standard-order spectrum.  Three
  all-to-alls per forward transform.

The fused :func:`make_keo_pencil` applies forward FFT, a diagonal
k-space phase and the inverse FFT in ONE ``shard_map`` region, keeping
the phase multiply in the *transposed* (resp. strided-k) layout so the
intermediate re-transposes cancel: 2 all-to-alls per KEO application in
ND, 4 in 1D.

Sharded-axis divisibility: the pencil path needs ``n1 % d == 0`` (ND)
or ``n0 % d**2 == 0`` (1D); :func:`pencil_supported` reports this and
callers fall back to the GSPMD (all-gather) path when unsupported.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["pencil_supported", "fft_sharded", "ifft_sharded",
           "make_keo_pencil", "make_keo_factors_pencil"]


def _a2a(x, ax, split, concat):
    return lax.all_to_all(x, ax, split_axis=split, concat_axis=concat,
                          tiled=True)


def pencil_supported(shape, ndev: int, fft_ndim: int) -> bool:
    """Can the pencil/four-step path run for this global grid shape?"""
    if ndev <= 1 or shape[0] % ndev:
        return False
    if fft_ndim >= 2:
        return shape[1] % ndev == 0
    return (shape[0] // ndev) % ndev == 0


# ----------------------------------------------------------- local bodies
def _fwd_nd(p, ax, fft_ndim):
    """Forward FFT over axes [0, fft_ndim); local view (n0/d, n1, ...)."""
    p = jnp.fft.fftn(p, axes=tuple(range(1, fft_ndim)))
    p = _a2a(p, ax, 1, 0)            # (n0, n1/d, ...) — axis 0 now local
    p = jnp.fft.fft(p, axis=0)
    return _a2a(p, ax, 0, 1)         # back to (n0/d, n1, ...)


def _four_step_fwd(p, ax, d, n0, reorder=True):
    """1D four-step forward FFT along (sharded) axis 0.

    Local view (m, *rest), m = n0//d; device p holds rows
    [p*m, (p+1)*m) == row p of the global (d, m) matrix A[n1, n2].
    With ``reorder=False`` stops in the strided-k layout (device p
    holds X[p::d]) saving one all-to-all — used by the fused KEO.
    """
    m = p.shape[0]
    rest = p.shape[1:]
    ones = (1,) * len(rest)
    # transpose to columns: device j -> A[:, j-th m/d chunk]
    q = _a2a(p, ax, 0, 0).reshape((d, m // d) + rest)
    q = jnp.fft.fft(q, axis=0)                       # over n1 (length d)
    j = lax.axis_index(ax)
    k1 = jnp.arange(d)
    n2 = j * (m // d) + jnp.arange(m // d)
    tw = jnp.exp((-2j * jnp.pi / n0)
                 * k1[:, None] * n2[None, :]).astype(q.dtype)
    q = q * tw.reshape((d, m // d) + ones)
    # back to rows: device p -> B[p, :] (all n2, chunk order = global)
    q = _a2a(q.reshape((m,) + rest), ax, 0, 0)
    q = jnp.fft.fft(q, axis=0)                       # over n2 (length m)
    if not reorder:
        return q                                     # strided: X[p::d]
    # reorder to contiguous spectrum chunks: device j -> X[j*m:(j+1)*m]
    q = _a2a(q, ax, 0, 0).reshape((d, m // d) + rest)
    return jnp.moveaxis(q, 0, 1).reshape((m,) + rest)


def _four_step_inv_from_strided(q, ax, d, n0):
    """Mirror of ``_four_step_fwd(reorder=False)``: from the strided-k
    layout back to the original row layout, applying the INVERSE
    transform (1/N normalized)."""
    m = q.shape[0]
    rest = q.shape[1:]
    ones = (1,) * len(rest)
    q = jnp.fft.ifft(q, axis=0)                      # undo n2 FFT
    q = _a2a(q, ax, 0, 0).reshape((d, m // d) + rest)  # to column chunks
    j = lax.axis_index(ax)
    k1 = jnp.arange(d)
    n2 = j * (m // d) + jnp.arange(m // d)
    tw = jnp.exp((+2j * jnp.pi / n0)
                 * k1[:, None] * n2[None, :]).astype(q.dtype)
    q = q * tw.reshape((d, m // d) + ones)
    q = jnp.fft.ifft(q, axis=0)                      # undo n1 FFT
    return _a2a(q.reshape((m,) + rest), ax, 0, 0)    # back to rows


# ------------------------------------------------------------- public API
def fft_sharded(x, mesh, axis_name=None, fft_ndim=1):
    """Distributed FFT of ``x`` over axes [0, fft_ndim), with array
    axis 0 sharded over ``mesh`` axis ``axis_name``; trailing axes
    (electronic states, batch) ride along unsharded.  Equals
    ``jnp.fft.fftn(x, axes=range(fft_ndim))`` to roundoff, with
    all-to-all (never all-gather) collectives and O(N/d) per-device
    memory.  Raises if :func:`pencil_supported` is False."""
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    d = mesh.shape[axis_name]
    if not pencil_supported(x.shape, d, fft_ndim):
        raise ValueError(
            f"pencil FFT unsupported: shape {x.shape}, {d} devices, "
            f"fft_ndim={fft_ndim} (needs axis-0 % d == 0 and "
            f"{'axis-1 % d == 0' if fft_ndim >= 2 else 'axis-0 % d^2 == 0'})")
    n0 = x.shape[0]
    spec = P(*([axis_name] + [None] * (x.ndim - 1)))

    if fft_ndim >= 2:
        body = lambda p: _fwd_nd(p, axis_name, fft_ndim)
    else:
        body = lambda p: _four_step_fwd(p, axis_name, d, n0)
    return jax.shard_map(body, mesh=mesh, in_specs=spec, out_specs=spec)(x)


def ifft_sharded(x, mesh, axis_name=None, fft_ndim=1):
    """Inverse of :func:`fft_sharded` (1/N normalized), via
    ifft(x) = conj(fft(conj(x)))/N with the same collective pattern."""
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    n = float(np.prod(x.shape[:fft_ndim]))
    return jnp.conj(fft_sharded(jnp.conj(x), mesh, axis_name,
                                fft_ndim)) / n


def make_keo_pencil(grid_shape, nstates, exp_K_ri, mesh, axis_name=None):
    """Build the fused sharded KEO  psi -> IFFT( expK * FFT(psi) ).

    ``exp_K_ri = (re, im)`` is the k-space phase on the full grid
    (``grid_shape``); psi has shape ``grid_shape + (nstates,)`` with
    axis 0 sharded.  Returns a jittable callable, or ``None`` when the
    grid/device combination cannot run the pencil path (caller falls
    back to GSPMD).  The phase multiply happens in the transposed (ND)
    or strided-k (1D) intermediate layout, so only 2 (ND) / 4 (1D)
    all-to-alls fire per application — communication O(N/d) per device,
    vs O(N) for the GSPMD all-gather this replaces.
    """
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    d = mesh.shape[axis_name]
    fft_ndim = len(grid_shape)
    psi_shape = tuple(grid_shape) + (nstates,)
    if not pencil_supported(psi_shape, d, fft_ndim):
        return None
    n0 = grid_shape[0]
    spec_psi = P(*([axis_name] + [None] * fft_ndim))

    kr, ki = (jnp.asarray(exp_K_ri[0]), jnp.asarray(exp_K_ri[1]))

    if fft_ndim >= 2:
        # phase consumed in the TRANSPOSED layout: shard grid axis 1
        spec_k = P(None, axis_name, *([None] * (fft_ndim - 2)))

        def body(p, kr_, ki_):
            p = jnp.fft.fftn(p, axes=tuple(range(1, fft_ndim)))
            p = _a2a(p, axis_name, 1, 0)      # (n0, n1/d, ..., ns)
            p = jnp.fft.fft(p, axis=0)
            p = p * (kr_ + 1j * ki_)[..., None]
            p = jnp.fft.ifft(p, axis=0)
            p = _a2a(p, axis_name, 0, 1)      # (n0/d, n1, ..., ns)
            return jnp.fft.ifftn(p, axes=tuple(range(1, fft_ndim)))
    else:
        # phase consumed in the STRIDED-k layout (device p holds k=p::d):
        # pre-permute once on the host so spec P(axis) hands each device
        # exactly its strided chunk contiguously
        m = n0 // d
        kr = jnp.reshape(kr, (m, d)).T.reshape(-1)
        ki = jnp.reshape(ki, (m, d)).T.reshape(-1)
        spec_k = P(axis_name)

        def body(p, kr_, ki_):
            q = _four_step_fwd(p, axis_name, d, n0, reorder=False)
            q = q * (kr_ + 1j * ki_)[:, None]
            return _four_step_inv_from_strided(q, axis_name, d, n0)

    sharded = jax.shard_map(body, mesh=mesh,
                            in_specs=(spec_psi, spec_k, spec_k),
                            out_specs=spec_psi)

    def keo(psi):
        return sharded(psi, kr, ki)

    return keo


def make_keo_factors_pencil(grid_shape, nstates, factors, mesh,
                            axis_name=None):
    """Fused sharded KEO for SEQUENTIAL per-axis FFT-diagonal factors —
    the jacobi-coordinate SPO2/SPO3 kinetic propagators (reference:
    pyqed/wpd.py:850 ``_KEO_jacobi``), where each factor is
    ``psi -> ifft_axis(phase * fft_axis(psi))``.

    ``factors``: ordered sequence of ``(axis, phase_ri)`` with
    ``phase_ri = (re, im)`` and phase shape either
    ``(grid_shape[axis],)`` (an axis-only phase — e.g. exp(-i kx^2 dt))
    or the full ``grid_shape`` rank (a coordinate-dependent phase —
    e.g. the jacobi angular factor exp(-i B(r, R) k_theta^2 dt)).

    Axis-0 factors run as ONE all-to-all transpose pair each (the
    four-step 1D machinery is unnecessary: jacobi grids are always
    >= 2D, so axis 1 absorbs the sharding); other axes transform
    locally inside the same shard_map region.  Axis-0 phases must be
    axis-only (they are applied in the transposed layout) — true for
    every jacobi KEO in the package.  Returns a jittable callable or
    ``None`` when unsupported (caller falls back to GSPMD)."""
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    d = mesh.shape[axis_name]
    ndim = len(grid_shape)
    if (d <= 1 or ndim < 2 or grid_shape[0] % d
            or grid_shape[1] % d):
        return None
    for axis, phase_ri in factors:
        ph = np.asarray(phase_ri[0])
        if axis == 0 and ph.ndim != 1:
            return None          # transposed-layout phase must be 1D
        if ph.ndim not in (1, ndim):
            return None

    spec_psi = P(*([axis_name] + [None] * ndim))
    specs = [spec_psi]
    args = []
    for axis, (pr, pi) in factors:
        pr = jnp.asarray(pr)
        pi = jnp.asarray(pi)
        if pr.ndim == 1:
            specs.append(P(None))              # replicated axis phase
        else:
            specs.append(P(*([axis_name] + [None] * (ndim - 1))))
        args.extend([pr, pi])
        specs.append(specs[-1])                # same spec for im plane

    meta = [(axis, np.asarray(phase_ri[0]).ndim)
            for axis, phase_ri in factors]

    def body(p, *phases):
        for i, (axis, pdim) in enumerate(meta):
            kr, ki = phases[2 * i], phases[2 * i + 1]
            if pdim == 1:
                shape = [1] * (ndim + 1)
                shape[axis] = kr.shape[0]
                ph = (kr + 1j * ki).reshape(shape)
            else:
                ph = (kr + 1j * ki)[..., None]
            if axis == 0:
                p = _a2a(p, axis_name, 1, 0)   # (n0, n1/d, ..., ns)
                p = jnp.fft.fft(p, axis=0)
                p = p * ph
                p = jnp.fft.ifft(p, axis=0)
                p = _a2a(p, axis_name, 0, 1)
            else:
                p = jnp.fft.fft(p, axis=axis)
                p = p * ph
                p = jnp.fft.ifft(p, axis=axis)
        return p

    sharded = jax.shard_map(body, mesh=mesh, in_specs=tuple(specs),
                            out_specs=spec_psi)

    def keo(psi):
        return sharded(psi, *args)

    return keo
