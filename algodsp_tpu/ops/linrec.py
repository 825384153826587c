"""Blocked second-order linear recurrence engine — the biquad keystone.

The reference's hot loop is the per-sample DF2T biquad
(`dsp/filter/biquad/section.go:47-53`):

    y  = B0*x + d0
    d0 = B1*x - A1*y + d1
    d1 = B2*x - A2*y

which is equivalent to the direct-form recurrence

    f_n = b0 x_n + b1 x_{n-1} + b2 x_{n-2}       (FIR part, parallel)
    y_n = f_n - a1 y_{n-1} - a2 y_{n-2}          (AR part, sequential)

The AR part is a constant-coefficient linear recurrence, so its
sequential dependency can be eliminated exactly with block algebra
(state-space block processing):

  * Let h be the impulse response of the all-pole filter
    1/(1 + a1 z^-1 + a2 z^-2):  h[0]=1, h[1]=-a1,
    h[n] = -a1 h[n-1] - a2 h[n-2].
  * Within a block of B samples with initial conditions
    (y_{-1}, y_{-2}):

        y = L @ f + y_{-1} * p + y_{-2} * q

    where L[i,j] = h[i-j] (lower-triangular Toeplitz — a B×B matmul
    that lands on the MXU), p[n] = h[n+1], q[n] = -a2 h[n].
  * Across blocks, the 2-vector carry c = (y_{B-1}, y_{B-2}) obeys the
    affine recurrence c_k = G c_{k-1} + w_k with constant
    G = [[h[B], -a2 h[B-1]], [h[B-1], -a2 h[B-2]]] and
    w_k = ((L f_k)[B-1], (L f_k)[B-2]) — solved in log depth with
    `jax.lax.associative_scan`.

This is exact (same recurrence, different evaluation order), turns
~99% of the FLOPs into batched B×B matmuls, and leaves only a tiny
(K, 2)-shaped scan as the sequential skeleton. Kernels (h, L, G, p, q)
are precomputed host-side in float64 per coefficient set.

Streaming state is (x_{n-1}, x_{n-2}, y_{n-1}, y_{n-2}) per section —
carrying the same information as the reference's (d0, d1)
(`section.go:29`), in the direct-form basis.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

DEFAULT_BLOCK = 128


@dataclasses.dataclass(frozen=True)
class AR2Kernels:
    """Host-precomputed block kernels for a batch of S second-order
    AR sections (float64 NumPy).

    For slow complex-pole sections (|h| peaking above ~4 in a block —
    e.g. low-frequency highpass filters) the carry recurrence is run in
    the MODAL basis: with λ = α ± iβ the pole pair and
    Vr = [[α, β], [1, 0]], the carry c' = Vr^-1 (y1, y2) propagates by
    Gm = r^B * rotation(Bθ) — every entry bounded by r^B <= 1 — and the
    within-block correction rows Pm = Vr^T [p; q] are bounded modal
    responses. The direct basis (S = I) keeps G entries and p/q rows of
    magnitude peak(h) (~80 for a 60 Hz filter at 48 kHz) that cancel in
    f32, costing 30-60 dB; the modal basis removes that cancellation
    exactly (host f64 precompute) at identical device cost."""
    L: np.ndarray      # (S, B, B) lower-triangular Toeplitz of h
    G: np.ndarray      # (S, 2, 2) block carry propagation (direct basis)
    p: np.ndarray      # (S, B) response column for y_{-1} (direct basis)
    q: np.ndarray      # (S, B) response column for y_{-2} (direct basis)
    S: np.ndarray      # (S, 2, 2) carry-basis transform (I = direct)
    Gm: np.ndarray     # (S, 2, 2) carry propagation in the S basis
    Pm: np.ndarray     # (S, 2, B) correction rows in the S basis
    modal: np.ndarray  # (S,) bool: section uses the modal carry basis
    block: int


def _ar2_impulse_response(a1: np.ndarray, a2: np.ndarray, n: int) -> np.ndarray:
    """h[s, 0..n] for each section: the all-pole impulse response."""
    s = a1.shape[0]
    h = np.zeros((s, n + 1), dtype=np.float64)
    h[:, 0] = 1.0
    if n >= 1:
        h[:, 1] = -a1
    for i in range(2, n + 1):
        h[:, i] = -a1 * h[:, i - 1] - a2 * h[:, i - 2]
    return h


@lru_cache(maxsize=512)
def _ar2_kernels_cached(a1_key: bytes, a2_key: bytes, s: int, block: int) -> AR2Kernels:
    a1 = np.frombuffer(a1_key, dtype=np.float64).copy()
    a2 = np.frombuffer(a2_key, dtype=np.float64).copy()
    b = block
    h = _ar2_impulse_response(a1, a2, b)  # (S, B+1)

    idx = np.arange(b)[:, None] - np.arange(b)[None, :]  # (B, B) i-j
    L = np.where(idx >= 0, h[:, np.clip(idx, 0, b)], 0.0)  # (S, B, B)

    p = h[:, 1:b + 1]                      # (S, B): h[n+1]
    q = -a2[:, None] * h[:, :b]            # (S, B): -a2*h[n]

    G = np.empty((s, 2, 2), dtype=np.float64)
    G[:, 0, 0] = h[:, b]
    G[:, 0, 1] = -a2 * h[:, b - 1]
    G[:, 1, 0] = h[:, b - 1]
    G[:, 1, 1] = -a2 * h[:, b - 2]

    Smat = np.tile(np.eye(2), (s, 1, 1))
    Gm = G.copy()
    Pm = np.stack([p, q], axis=1)                   # (S, 2, B)
    modal = np.zeros(s, dtype=bool)
    for i in range(s):
        disc = a1[i] * a1[i] - 4.0 * a2[i]
        if disc >= 0.0 or np.max(np.abs(h[i])) <= 4.0:
            continue                                # direct basis is fine
        alpha = -a1[i] / 2.0
        beta = np.sqrt(-disc) / 2.0
        lam_b = complex(alpha, beta) ** b
        # basis columns (vr, vi) of the eigenvector v = (λ, 1):
        # A [vr vi] = [vr vi] [[α, β], [-β, α]], so G = A^B maps to the
        # scaled rotation [[Re λ^B, Im λ^B], [-Im λ^B, Re λ^B]]
        Vr = np.array([[alpha, beta], [1.0, 0.0]])
        Smat[i] = np.linalg.inv(Vr)
        Gm[i] = np.array([[lam_b.real, lam_b.imag],
                          [-lam_b.imag, lam_b.real]])
        # corr = y1*p + y2*q with (y1, y2) = Vr @ c'
        Pm[i] = np.stack([Vr[0, 0] * p[i] + Vr[1, 0] * q[i],
                          Vr[0, 1] * p[i] + Vr[1, 1] * q[i]])
        modal[i] = True
    return AR2Kernels(L=L, G=G, p=p, q=q, S=Smat, Gm=Gm, Pm=Pm, modal=modal,
                      block=b)


def ar2_kernels(a1, a2, block: int = DEFAULT_BLOCK) -> AR2Kernels:
    """Precompute block kernels for S sections (host, float64)."""
    a1 = np.atleast_1d(np.asarray(a1, dtype=np.float64))
    a2 = np.atleast_1d(np.asarray(a2, dtype=np.float64))
    if a1.shape != a2.shape or a1.ndim != 1:
        raise ValueError("a1/a2 must be 1-D arrays of equal length")
    return _ar2_kernels_cached(a1.tobytes(), a2.tobytes(), a1.size, int(block))


def condition_sos(sos: np.ndarray, block: int = DEFAULT_BLOCK,
                  peak_threshold: float = 8.0) -> np.ndarray:
    """Split ill-conditioned real-pole sections into first-order pairs.

    The blocked engine evaluates each section as (zero-IC Toeplitz
    response) + (carry correction). For sections whose all-pole impulse
    response h grows large within a block — e.g. the A-weighting 20.6 Hz
    highpass, a double real pole at r=0.99731 where h peaks at ~91 —
    those two terms are each ~500x the output and cancel, costing ~60 dB
    of f32 SNR. When both poles AND both zeros are real, the section
    splits exactly into two first-order sections (a2=0) with each zero
    paired to its nearest pole, so every intermediate stays O(1) and
    |h| <= 1 per sub-section.

    Returns a new (S', 5) float64 SOS array (S' >= S) that is
    input/output identical to `sos` in exact arithmetic. Sections with
    complex poles, complex zeros, or small in-block growth pass through
    unchanged.
    """
    sos = np.asarray(sos, dtype=np.float64)
    out = []
    for b0, b1, b2, a1, a2 in sos:
        # peak of the all-pole impulse response within one block
        h = _ar2_impulse_response(np.array([a1]), np.array([a2]), block)[0]
        # relative tolerance: a repeated real pole computes disc ~ -eps*a1^2
        tol = 1e-9 * max(a1 * a1, abs(4.0 * a2), 1e-30)
        disc = a1 * a1 - 4.0 * a2
        if np.max(np.abs(h)) <= peak_threshold or disc < -tol or b0 == 0.0:
            out.append([b0, b1, b2, a1, a2])
            continue
        rt = np.sqrt(max(disc, 0.0))
        p_lo, p_hi = sorted([(-a1 - rt) / 2.0, (-a1 + rt) / 2.0])
        ztol = 1e-9 * max(b1 * b1, abs(4.0 * b0 * b2), 1e-30)
        zdisc = b1 * b1 - 4.0 * b0 * b2
        if b2 == 0.0 and b1 == 0.0:
            z_lo = z_hi = 0.0          # pure all-pole: zeros at origin
        elif zdisc < -ztol:
            out.append([b0, b1, b2, a1, a2])   # complex zeros: keep
            continue
        else:
            zrt = np.sqrt(max(zdisc, 0.0))
            z_lo, z_hi = sorted([(-b1 - zrt) / (2.0 * b0),
                                 (-b1 + zrt) / (2.0 * b0)])
        # nearest pairing keeps each sub-section's gain flat (for the
        # weighting HP case: (1 - z^-1)/(1 - 0.9973 z^-1) twice)
        if abs(z_hi - p_hi) + abs(z_lo - p_lo) <= \
           abs(z_hi - p_lo) + abs(z_lo - p_hi):
            pairs = [(z_hi, p_hi), (z_lo, p_lo)]
        else:
            pairs = [(z_hi, p_lo), (z_lo, p_hi)]
        out.append([b0, -b0 * pairs[0][0], 0.0, -pairs[0][1], 0.0])
        out.append([1.0, -pairs[1][0], 0.0, -pairs[1][1], 0.0])
    return np.asarray(out, dtype=np.float64).reshape(-1, 5)


def residual_flags(sos: np.ndarray, block: int = DEFAULT_BLOCK) -> np.ndarray:
    """Per-section flags: evaluate via the residual decomposition
    H(z) = b0 + (B(z) - b0*A(z))/A(z)?

    The blocked engine's error scales with its largest intermediate:
    |L @ f| ~ peak(h) * ||b|| for the direct drive versus
    |b0| + peak(h) * ||e|| for the residual drive (e1 = b1 - a1*b0,
    e2 = b2 - a2*b0). For sections whose zeros nearly cancel slow poles
    (low-frequency highpass/shelf: complex poles near z = 1 with
    B ~ b0*A), ||e|| << ||b|| and the decomposition recovers 30-50 dB
    of f32 SNR. For ordinary sections ||e|| ~ ||b|| and the flag stays
    False, keeping the long-validated direct path.
    """
    sos = np.asarray(sos, dtype=np.float64).reshape(-1, 5)
    flags = np.zeros(sos.shape[0], dtype=bool)
    peaks = np.max(np.abs(_ar2_impulse_response(
        sos[:, 3], sos[:, 4], block)), axis=1)
    for s, (b0, b1, b2, a1, a2) in enumerate(sos):
        e = np.hypot(b1 - a1 * b0, b2 - a2 * b0)
        bn = np.hypot(np.hypot(b0, b1), b2)
        flags[s] = (peaks[s] > 4.0
                    and abs(b0) + peaks[s] * e < 0.5 * peaks[s] * bn)
    return flags


def fir3(x, b0, b1, b2, x1, x2):
    """3-tap causal FIR f_n = b0 x_n + b1 x_{n-1} + b2 x_{n-2} with explicit
    2-sample history (x1 = x_{n-1} carry-in, x2 = x_{n-2}). Fully parallel."""
    xm1 = jnp.concatenate([x1[..., None], x[..., :-1]], axis=-1)
    if x.shape[-1] >= 2:
        xm2 = jnp.concatenate([x2[..., None], x1[..., None], x[..., :-2]], axis=-1)
    else:
        xm2 = x2[..., None]
    return b0 * x + b1 * xm1 + b2 * xm2


def affine1_scan(m, b, axis: int = -1):
    """Inclusive composition of scalar affine maps s -> m_n s + b_n
    along `axis`: returns (M, B) with the partial compositions
    F_n = f_n o ... o f_1, i.e. s_n = M_n s_in + B_n for ANY incoming
    state s_in. Log-depth associative scan; the workhorse for
    time-varying one-pole recurrences (sidechain prefilters,
    `core.go:600-662`; selection-fixed envelope solves,
    `parallel/sharded.py:envelope_time_sharded`)."""
    def combine(left, right):
        ml, bl = left
        mr, br = right
        return ml * mr, mr * bl + br

    return jax.lax.associative_scan(combine, (m, b), axis=axis)


def _affine_scan(G, w):
    """Inclusive scan of c_k = G c_{k-1} + w_k over axis -2 of w.

    G: (2, 2) constant; w: (..., K, 2). Returns (..., K, 2) of c_k with
    c_{-1} = 0 (fold nonzero initial carry into w_0 beforehand).
    """
    K = w.shape[-2]
    # matrices flattened to 4-vectors so every scan leaf shares the same
    # (..., K, d) layout (associative_scan applies one axis to all leaves)
    A = jnp.broadcast_to(G.reshape(4), w.shape[:-2] + (K, 4))

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        # a = a_r @ a_l with [m00, m01, m10, m11] packing
        a = jnp.stack([
            a_r[..., 0] * a_l[..., 0] + a_r[..., 1] * a_l[..., 2],
            a_r[..., 0] * a_l[..., 1] + a_r[..., 1] * a_l[..., 3],
            a_r[..., 2] * a_l[..., 0] + a_r[..., 3] * a_l[..., 2],
            a_r[..., 2] * a_l[..., 1] + a_r[..., 3] * a_l[..., 3],
        ], axis=-1)
        # b = a_r @ b_l + b_r
        b = jnp.stack([
            a_r[..., 0] * b_l[..., 0] + a_r[..., 1] * b_l[..., 1],
            a_r[..., 2] * b_l[..., 0] + a_r[..., 3] * b_l[..., 1],
        ], axis=-1) + b_r
        return a, b

    _, c = jax.lax.associative_scan(combine, (A, w), axis=-2)
    return c


def ar2_apply_blocked(f, kernels: AR2Kernels, section: int, y1, y2,
                      *, precision=jax.lax.Precision.HIGHEST):
    """Apply one AR section to the (already FIR-filtered) drive f.

    f: (..., N) with N a multiple of kernels.block.
    y1, y2: (...,) initial conditions y_{-1}, y_{-2}.
    Returns y: (..., N).

    precision defaults to HIGHEST: on TPU the default matmul path
    truncates inputs to bfloat16, which costs ~50 dB of SNR in an IIR
    where errors recirculate. The Toeplitz matmul must run in full f32.
    """
    b = kernels.block
    n = f.shape[-1]
    if n % b:
        raise ValueError(f"length {n} not a multiple of block {b}")
    k = n // b
    dtype = f.dtype

    L = jnp.asarray(kernels.L[section], dtype=dtype)       # (B, B)
    S = jnp.asarray(kernels.S[section], dtype=dtype)       # (2, 2)
    Gm = jnp.asarray(kernels.Gm[section], dtype=dtype)     # (2, 2)
    Pm = jnp.asarray(kernels.Pm[section], dtype=dtype)     # (2, B)

    fb = f.reshape(f.shape[:-1] + (k, b))
    # Zero-IC within-block solution: u_k = f_k @ L^T  (MXU)
    u = jnp.einsum("...kb,cb->...kc", fb, L,
                   preferred_element_type=dtype, precision=precision)
    # Block carries w_k = S @ (u_k[B-1], u_k[B-2]) in the carry basis.
    # These 2x2 applications MUST run at full f32: the TPU default
    # would truncate S (entries up to ~1/beta) to bfloat16.
    mm2 = lambda M, v: jnp.einsum("ij,...j->...i", M, v,
                                  preferred_element_type=dtype,
                                  precision=precision)
    w = jnp.stack([u[..., b - 1], u[..., b - 2]], axis=-1)  # (..., K, 2)
    c_init = jnp.stack([y1, y2], axis=-1).astype(dtype)
    if bool(kernels.modal[section]):
        w = mm2(S, w)
        c_init = mm2(S, c_init)
    # Fold initial conditions into w_0: c_0 = Gm c_{-1} + w_0
    w = w.at[..., 0, :].add(mm2(Gm, c_init))
    c = _affine_scan(Gm, w)                                  # (..., K, 2) inclusive
    # carry INTO block k is c_{k-1}; block 0 gets the true ICs
    c_prev = jnp.concatenate([c_init[..., None, :], c[..., :-1, :]], axis=-2)
    y = u + c_prev[..., 0:1] * Pm[0] + c_prev[..., 1:2] * Pm[1]
    return y.reshape(f.shape[:-1] + (n,))


def ar2_apply_scan(f, a1, a2, y1, y2, *, unroll: int = 8):
    """Sequential lax.scan evaluation of the same AR recurrence — the
    correctness cross-check (the analog of the reference's generic-vs-SIMD
    dispatch tests) and the fallback for tiny signals."""
    f_t = jnp.moveaxis(f, -1, 0)
    a1 = jnp.asarray(a1, f.dtype)
    a2 = jnp.asarray(a2, f.dtype)

    def step(carry, fn):
        ym1, ym2 = carry
        y = fn - a1 * ym1 - a2 * ym2
        return (y, ym1), y

    y1 = jnp.asarray(y1, f.dtype)
    y2 = jnp.asarray(y2, f.dtype)
    (_, _), ys = jax.lax.scan(step, (y1, y2), f_t, unroll=unroll)
    return jnp.moveaxis(ys, 0, -1)


def ar2_apply_blocked_banded(f, kernels: AR2Kernels, y1, y2,
                             *, precision=jax.lax.Precision.HIGHEST):
    """Banded variant: apply section b of `kernels` to band row b.

    f: (..., B, N) with B == number of sections in `kernels` and N a
    multiple of kernels.block. y1, y2: (..., B) initial conditions.
    Returns y: (..., B, N). Used by parallel filter banks (octave bank,
    vocoder) where every band runs a *different* biquad over the same
    timeline — one einsum with the band axis batched on the MXU.
    """
    b = kernels.block
    nbands = kernels.L.shape[0]
    if f.shape[-2] != nbands:
        raise ValueError(f"band axis {f.shape[-2]} != kernel sections {nbands}")
    n = f.shape[-1]
    if n % b:
        raise ValueError(f"length {n} not a multiple of block {b}")
    k = n // b
    dtype = f.dtype

    L = jnp.asarray(kernels.L, dtype=dtype)        # (B, blk, blk)
    Gm = jnp.asarray(kernels.Gm, dtype=dtype)      # (B, 2, 2)
    Pm = jnp.asarray(kernels.Pm, dtype=dtype)      # (B, 2, blk)

    mm2 = lambda M, v: jnp.einsum("sij,...sj->...si", M, v,
                                  preferred_element_type=dtype,
                                  precision=precision)
    mm2k = lambda M, v: jnp.einsum("sij,...skj->...ski", M, v,
                                   preferred_element_type=dtype,
                                   precision=precision)
    fb = f.reshape(f.shape[:-1] + (k, b))
    u = jnp.einsum("...skb,scb->...skc", fb, L,
                   preferred_element_type=dtype, precision=precision)
    w = jnp.stack([u[..., b - 1], u[..., b - 2]], axis=-1)   # (..., B, K, 2)
    c_init = jnp.stack([y1, y2], axis=-1).astype(dtype)      # (..., B, 2)
    if bool(np.any(kernels.modal)):  # carry in the modal basis per band
        S = jnp.asarray(kernels.S, dtype=dtype)
        w = mm2k(S, w)
        c_init = mm2(S, c_init)
    w = w.at[..., 0, :].add(mm2(Gm, c_init))
    c = _affine_scan_banded(Gm, w)
    c_prev = jnp.concatenate([c_init[..., None, :], c[..., :-1, :]], axis=-2)
    y = (u + c_prev[..., 0:1] * Pm[:, None, 0, :]
         + c_prev[..., 1:2] * Pm[:, None, 1, :])
    return y.reshape(f.shape[:-1] + (n,))


def _affine_scan_banded(G, w):
    """Like _affine_scan but G is per-band (B, 2, 2) and w is
    (..., B, K, 2); scans over K."""
    K = w.shape[-2]
    A = jnp.broadcast_to(G.reshape(G.shape[0], 1, 4),
                         w.shape[:-2] + (K, 4))

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        a = jnp.stack([
            a_r[..., 0] * a_l[..., 0] + a_r[..., 1] * a_l[..., 2],
            a_r[..., 0] * a_l[..., 1] + a_r[..., 1] * a_l[..., 3],
            a_r[..., 2] * a_l[..., 0] + a_r[..., 3] * a_l[..., 2],
            a_r[..., 2] * a_l[..., 1] + a_r[..., 3] * a_l[..., 3],
        ], axis=-1)
        bb = jnp.stack([
            a_r[..., 0] * b_l[..., 0] + a_r[..., 1] * b_l[..., 1],
            a_r[..., 2] * b_l[..., 0] + a_r[..., 3] * b_l[..., 1],
        ], axis=-1) + b_r
        return a, bb

    _, c = jax.lax.associative_scan(combine, (A, w), axis=-2)
    return c


def affine2_scan(A, w, s0):
    """Inclusive scan of the TIME-VARYING affine recurrence
    s_n = A_n s_{n-1} + w_n over axis -2.

    A: (..., N, 4) per-step 2x2 matrices packed [m00, m01, m10, m11];
    w: (..., N, 2); s0: (..., 2) initial state.  Returns
    (entry, final): `entry[..., n, :]` is the state BEFORE step n
    (entry[..., 0, :] == s0) and `final` is the state after step N-1.

    Log-depth `associative_scan` over (matrix, vector) pairs — the
    engine for filters whose coefficients vary per sample but are known
    upfront (input-driven modulation), e.g. the auto-wah bandpass.
    """
    s0b = jnp.broadcast_to(s0, A.shape[:-2] + (2,))
    # fold the initial state into the first step's offset
    w0 = jnp.stack([
        A[..., 0, 0] * s0b[..., 0] + A[..., 0, 1] * s0b[..., 1],
        A[..., 0, 2] * s0b[..., 0] + A[..., 0, 3] * s0b[..., 1],
    ], axis=-1) + w[..., 0, :]
    w = jnp.concatenate([w0[..., None, :], w[..., 1:, :]], axis=-2)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        a = jnp.stack([
            a_r[..., 0] * a_l[..., 0] + a_r[..., 1] * a_l[..., 2],
            a_r[..., 0] * a_l[..., 1] + a_r[..., 1] * a_l[..., 3],
            a_r[..., 2] * a_l[..., 0] + a_r[..., 3] * a_l[..., 2],
            a_r[..., 2] * a_l[..., 1] + a_r[..., 3] * a_l[..., 3],
        ], axis=-1)
        b = jnp.stack([
            a_r[..., 0] * b_l[..., 0] + a_r[..., 1] * b_l[..., 1],
            a_r[..., 2] * b_l[..., 0] + a_r[..., 3] * b_l[..., 1],
        ], axis=-1) + b_r
        return a, b

    _, after = jax.lax.associative_scan(combine, (A, w), axis=-2)
    entry = jnp.concatenate([s0b[..., None, :], after[..., :-1, :]], axis=-2)
    return entry, after[..., -1, :]


def affine_scan_nd(A, w, s0):
    """Inclusive scan of s_n = A_n s_{n-1} + w_n for d-dimensional state.

    A: (N, d, d) per-step matrices, shared across batch (coefficients
    that vary in time but not per channel, e.g. LFO-driven);
    w: (..., N, d) per-step offsets (input-dependent); s0: (..., d).
    Returns (after, final): `after[..., n, :]` is the state AFTER step n.

    Log-depth associative scan; the matrix-product half is
    batch-independent so its cost is O(N log N d^3) regardless of the
    channel count.
    """
    d = A.shape[-1]
    wt = jnp.moveaxis(w, -2, 0)                       # (N, ..., d)
    # fold the initial state into step 0's offset
    w0 = jnp.einsum("ij,...j->...i", A[0], jnp.broadcast_to(s0, wt.shape[1:]),
                    precision=jax.lax.Precision.HIGHEST)
    wt = wt.at[0].add(w0)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        # broadcast-multiply-reduce on the VPU: true f32 (so the bf16
        # MXU-lowering hazard the einsum form had to pin with HIGHEST
        # cannot arise), and no padding of the tiny d x d matmuls onto
        # 128x128 MXU tiles — the einsum form at HIGHEST (6 passes)
        # made the 9-dim phaser scan ~2.2x slower (round-5 measurement:
        # 34.4 -> 76.9 Msamples/s streamed). Remaining cost is the
        # log-depth scan's op count (latency-bound at small d), not
        # FLOPs.
        a = jnp.sum(a_r[:, :, :, None] * a_l[:, None, :, :], axis=2)
        nb = b_l.ndim - 2
        ar_e = a_r.reshape(a_r.shape[:1] + (1,) * nb + a_r.shape[1:])
        b = jnp.sum(ar_e * b_l[..., None, :], axis=-1) + b_r
        return a, b

    _, after_t = jax.lax.associative_scan(combine, (A, wt), axis=0)
    after = jnp.moveaxis(after_t, 0, -2)              # (..., N, d)
    return after, after[..., -1, :]
