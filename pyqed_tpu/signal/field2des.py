"""Explicit-field, phase-cycled 2D electronic spectroscopy.

Beyond the reference's response-function 2DES (pyqed/signal/2DES.py and
the DEOM frequency-domain path): here the THREE LASER PULSES are
propagated explicitly through the driven hierarchy (open/heom.py
``run(edip=, pulse=)`` machinery), and the rephasing third-order signal
in the -k1+k2+k3 direction is isolated by phase cycling — the
numerically exact route that stays valid for strong fields and finite
pulse durations, where perturbative response functions break down.

TPU design: one compiled ``lax.scan`` time loop, ``vmap``-ed over the
full (phase-combination x t1-delay) batch — (N1·N2·nt1) propagations
run as ONE batched RK4 on the MXU, not a Python loop of solver calls
(a re-jit per run, as the reference's propagator.py structure implies,
would recompile hundreds of times).

Phase cycling: with pulse phases (phi1, phi2, 0), the detected
polarization decomposes as P = sum_{a,b} P_{ab} e^{i(a phi1 + b phi2)}.
An N1 x N2 cycle (default 4 x 4) extracts the (a, b) = (-1, +1)
component — the rephasing (photon-echo) signature — by a discrete
Fourier sum. Weak fields keep higher-order (|a| or |b| > 1)
contamination negligible.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _three_pulse_field(t, E0, tau, omega, tc1, tc2, tc3, ph1, ph2):
    """Sum of three Gaussian-envelope carrier pulses; the third phase is
    the detection reference (0)."""
    def one(tc, ph, amp):
        return amp * jnp.exp(-((t - tc) ** 2) / (2.0 * tau ** 2)) * \
            jnp.cos(omega * (t - tc) + ph)
    return (one(tc1, ph1, E0[0]) + one(tc2, ph2, E0[1])
            + one(tc3, 0.0, E0[2]))


def field_2des_rephasing(solver, rho0, mu, t1s, t2, nt3, dt,
                         pulse_width, e_amps, omega_c, pad=None,
                         n_phase=(4, 4), kernel="einsum", mesh=None):
    """Rephasing (-k1+k2+k3) 2DES signal from explicit three-pulse
    propagation with phase cycling.

    solver : HEOMSolver (any hierarchy solver exposing ``rhs_fn``)
    rho0   : initial density matrix (n, n)
    mu     : dipole operator (n, n)
    t1s    : coherence-time delays (array, multiples of dt)
    t2     : waiting time (scalar, multiple of dt)
    nt3    : number of detection samples (t3 axis, spacing dt)
    pulse_width : Gaussian sigma of each pulse
    e_amps : (E1, E2, E3) field amplitudes (weak for clean chi3)
    omega_c: carrier frequency
    pad    : time before the first pulse center (default 4 sigma)

    Returns (P3, t1s, t3s): the phase-cycled third-order polarization
    P3[t1_idx, t3_idx] (complex), ready for the double Fourier transform
    (conjugate over t1 for the rephasing map).
    """
    if pad is None:
        pad = 4.0 * pulse_width
    t1s = np.asarray(t1s, dtype=float)
    dtype = jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64
    rhs, nado = solver.rhs_fn(dtype, kernel=kernel)
    n = solver.n
    mu = jnp.asarray(mu).astype(dtype)
    rho0 = jnp.asarray(rho0).astype(dtype)

    N1, N2 = n_phase
    ph1 = 2.0 * np.pi * np.arange(N1) / N1
    ph2 = 2.0 * np.pi * np.arange(N2) / N2
    # batch = (N1, N2, nt1) flattened
    P1, P2, T1 = np.meshgrid(ph1, ph2, t1s, indexing="ij")
    bshape = P1.shape
    P1f = jnp.asarray(P1.ravel())
    P2f = jnp.asarray(P2.ravel())
    T1f = jnp.asarray(T1.ravel())

    t1_max = float(t1s.max())
    tc1 = pad
    # total horizon: pad + t1_max + t2 + pad (after 3rd pulse) + t3 window
    t_det0 = tc1 + t1_max + t2 + pad          # detection start (shared)
    nt_total = int(round(t_det0 / dt)) + nt3
    E0 = jnp.asarray(e_amps, dtype=jnp.float64 if
                     jax.config.jax_enable_x64 else jnp.float32)
    tau = pulse_width
    om = omega_c

    ados0 = jnp.zeros((nado, n, n), dtype=dtype).at[0].set(rho0)

    def run_one(p1, p2, t1):
        # pulse centers: the THIRD pulse is anchored so detection starts
        # at the same absolute time for every t1 (shared scan length);
        # pulses 1, 2 move backwards with t1
        tc3 = tc1 + t1_max + t2
        tc2_ = tc3 - t2
        tc1_ = tc2_ - t1

        def field(t):
            return _three_pulse_field(t, E0, tau, om, tc1_, tc2_, tc3,
                                      p1, p2)

        def step(y, t):
            def f(y, t):
                E = field(t)
                drive = (-1j * E) * (
                    jnp.einsum("ij, ajk -> aik", mu, y)
                    - jnp.einsum("aij, jk -> aik", y, mu))
                return rhs(y) + drive
            k1 = f(y, t)
            k2 = f(y + k1 * (dt / 2), t + dt / 2)
            k3 = f(y + k2 * (dt / 2), t + dt / 2)
            k4 = f(y + k3 * dt, t + dt)
            return y + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)

        def body(y, k):
            t = k * dt
            y = step(y, t)
            pol = jnp.trace(mu @ y[0])
            return y, pol

        _, pols = jax.lax.scan(body, ados0, jnp.arange(nt_total))
        return pols[-nt3:]

    batched = jax.jit(jax.vmap(run_one))
    if mesh is not None:
        # shard the (phase x t1) batch axis over the device mesh — the
        # propagations are independent, so this is pure data parallelism
        # (each device runs its slice of the batch; no collectives until
        # the host-side phase-cycle reduction)
        from jax.sharding import NamedSharding, PartitionSpec
        sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        P1f, P2f, T1f = (jax.device_put(a, sh) for a in (P1f, P2f, T1f))
    pols = batched(P1f, P2f, T1f)                      # (B, nt3)
    pols = np.asarray(pols).reshape(*bshape, nt3)

    # phase-cycle extraction of the (a, b) = (-1, +1) component:
    # P_{-1,+1} = (1/N1N2) sum e^{+i phi1} e^{-i phi2} P(phi1, phi2)
    w1 = np.exp(1j * ph1)[:, None, None, None]
    w2 = np.exp(-1j * ph2)[None, :, None, None]
    P3 = (pols * w1 * w2).sum(axis=(0, 1)) / (N1 * N2)
    t3s = np.arange(nt3) * dt
    return P3, t1s, t3s


def rephasing_spectrum(P3, t1s, t3s, pad_factor=4):
    """Double Fourier transform of the phase-cycled polarization:
    conjugate-FT over t1 (rephasing), FT over t3. Returns
    (omega1, omega3, S) with S[w1_idx, w3_idx]."""
    n1 = pad_factor * len(t1s)
    n3 = pad_factor * len(t3s)
    dt1 = t1s[1] - t1s[0] if len(t1s) > 1 else 1.0
    dt3 = t3s[1] - t3s[0] if len(t3s) > 1 else 1.0
    S = np.fft.fft(np.conj(np.fft.fft(P3, n=n1, axis=0)),
                   n=n3, axis=1)
    S = np.fft.fftshift(S, axes=(0, 1))
    w1 = 2 * np.pi * np.fft.fftshift(np.fft.fftfreq(n1, dt1))
    w3 = 2 * np.pi * np.fft.fftshift(np.fft.fftfreq(n3, dt3))
    return w1, w3, S
