"""Whole-cascade blocked IIR engine: one Toeplitz matmul for S sections.

`ops/linrec.py` evaluates each biquad section as its own B x B Toeplitz
matmul — S MXU passes over the signal (S*B MACs/sample). But the whole
SOS cascade is one LTI system, so by superposition an entire block can
be closed in a single pass:

    y_k = Lc @ x_k + Cout @ s_k          (within block k)
    s_{k+1} = T @ s_k + Win @ x_k        (across blocks)

with the compact cascade state s of dimension d = 2S + 2
(global input history x_{n-1}, x_{n-2}, plus each section's output
history y1_s, y2_s — section s's *input* history IS section s-1's
output history, so nothing else is needed), and host-precomputed f64
kernels:

  Lc   (B, B)  lower-triangular Toeplitz of the cascade impulse response
  Win  (d, B)  zero-IC end-of-block state response to the block input
  Cout (B, d)  within-block output response to the block-entry state
  T    (d, d)  zero-input state transfer over one block

Per-sample cost drops from 2*S*B FLOPs to ~2*(B + 2d + sweeps*d^2/B):
for a 15-section cascade at B=128 that is 1920 -> ~220 MACs/sample.

The across-block recurrence is solved in log depth with Hillis-Steele
sweeps whose combine matrices are the constant powers T^(2^l) —
precomputed host-side and *truncated*: for a stable filter
||T^(2^l)|| -> 0, and sweeps whose matrix is below f32 noise are
dropped entirely (a carry's influence dies within a few blocks for
typical audio filters; high-Q sections keep more sweeps
automatically).

This is the cascade-level analog of the per-section block algebra in
`ops/linrec.py` (reference hot loop: `dsp/filter/biquad/chain.go:59`,
`section.go:47-53`) and reuses the state conventions of `ops/fold.py`.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

SWEEP_TOL = 1e-12


@dataclasses.dataclass(frozen=True)
class CascadeKernels:
    """Host-precomputed (float64) block kernels for an SOS cascade.

    The compact state may be carried in a per-section MODAL basis
    (s' = Vinv @ s): slow complex-pole sections (low-frequency
    highpass/shelf) otherwise put entries of magnitude peak(h) (~80 for
    60 Hz at 48 kHz) into T/Win/Cout that cancel in f32 and cost
    30-60 dB; in the modal basis each such 2x2 block becomes the
    scaled rotation r^B * R(Bθ) with entries <= 1 (same algebra as
    `linrec.AR2Kernels.Gm`). V = I when no section qualifies."""
    Lc: np.ndarray       # (B, B)
    Win: np.ndarray      # (d, B)   modal basis when modal=True
    Cout: np.ndarray     # (B, d)   modal basis when modal=True
    T: np.ndarray        # (d, d)   modal basis when modal=True
    V: np.ndarray        # (d, d)   s_direct = V @ s_modal
    Vinv: np.ndarray     # (d, d)
    modal: bool
    block: int
    d: int


def _cascade_affine_step(sos: np.ndarray):
    """Single-sample affine step in the compact basis.

    State layout: [x_{n-1}, x_{n-2}, y1_0, y2_0, ..., y1_{S-1}, y2_{S-1}].
    Returns (A, b, c, d0) with s' = A s + b x_n and y_n = c s + d0 x_n.
    """
    S = sos.shape[0]
    d = 2 * S + 2
    A = np.zeros((d, d))
    b = np.zeros(d)

    def e(i):
        v = np.zeros(d)
        v[i] = 1.0
        return v

    # current input of section s as (state-row, input-coef)
    cur_s, cur_x = np.zeros(d), 1.0           # section 0 input = x_n
    h1_s, h1_x = e(0), 0.0                    # its history x_{n-1}
    h2_s, h2_x = e(1), 0.0                    # x_{n-2}
    for s in range(S):
        b0, b1, b2, a1, a2 = sos[s]
        y_s = (b0 * cur_s + b1 * h1_s + b2 * h2_s
               - a1 * e(2 + 2 * s) - a2 * e(3 + 2 * s))
        y_x = b0 * cur_x + b1 * h1_x + b2 * h2_x
        A[2 + 2 * s] = y_s
        b[2 + 2 * s] = y_x
        A[3 + 2 * s] = e(2 + 2 * s)
        b[3 + 2 * s] = 0.0
        cur_s, cur_x = y_s, y_x
        h1_s, h1_x = e(2 + 2 * s), 0.0
        h2_s, h2_x = e(3 + 2 * s), 0.0
    A[0] = np.zeros(d)
    b[0] = 1.0                                # new x_{n-1} = x_n
    A[1] = e(0)                               # new x_{n-2} = old x_{n-1}
    return A, b, cur_s.copy(), cur_x


@lru_cache(maxsize=64)
def _kernels_cached(sos_key: bytes, s_count: int, block: int) -> CascadeKernels:
    sos = np.frombuffer(sos_key, dtype=np.float64).reshape(s_count, 5)
    A, b, c, d0 = _cascade_affine_step(sos)
    d = A.shape[0]
    B = block

    # cascade impulse response h[0..B-1]: h[0] = d0, h[m] = c @ A^{m-1} @ b
    h = np.empty(B)
    h[0] = d0
    v = b.copy()
    Win = np.empty((d, B))
    Cout = np.empty((B, d))
    M = np.eye(d)
    for m in range(B):
        Cout[m] = c @ M                       # c @ A^m
        if m >= 1:
            h[m] = Cout[m - 1] @ b            # c @ A^{m-1} @ b
        M = A @ M if m < B - 1 else M
    # Win[:, j] = A^{B-1-j} @ b  (backward accumulation)
    v = b.copy()
    for m in range(B):
        Win[:, B - 1 - m] = v
        v = A @ v
    T = A @ M                                 # A^B  (M = A^{B-1})

    idx = np.arange(B)[:, None] - np.arange(B)[None, :]
    Lc = np.where(idx >= 0, h[np.clip(idx, 0, B - 1)], 0.0)

    # per-section modal basis for slow complex-pole sections (see class
    # docstring); the x-history block keeps the identity
    V = np.eye(d)
    modal = False
    for s_i in range(s_count):
        b0, b1, b2, a1, a2 = sos[s_i]
        disc = a1 * a1 - 4.0 * a2
        if disc >= 0.0:
            continue
        # peak of this section's all-pole response within a block
        hp = np.zeros(B + 1)
        hp[0] = 1.0
        if B >= 1:
            hp[1] = -a1
        for m in range(2, B + 1):
            hp[m] = -a1 * hp[m - 1] - a2 * hp[m - 2]
        if np.max(np.abs(hp)) <= 4.0:
            continue
        alpha, beta = -a1 / 2.0, np.sqrt(-disc) / 2.0
        V[2 + 2 * s_i:4 + 2 * s_i, 2 + 2 * s_i:4 + 2 * s_i] = \
            np.array([[alpha, beta], [1.0, 0.0]])
        modal = True
    if modal:
        Vinv = np.linalg.inv(V)
        Win = Vinv @ Win
        Cout = Cout @ V
        T = Vinv @ T @ V
    else:
        Vinv = V
    return CascadeKernels(Lc=Lc, Win=Win, Cout=Cout, T=T, V=V, Vinv=Vinv,
                          modal=modal, block=B, d=d)


def cascade_kernels(sos, block: int = 128) -> CascadeKernels:
    sos = np.ascontiguousarray(np.asarray(sos, dtype=np.float64))
    if sos.ndim != 2 or sos.shape[1] != 5:
        raise ValueError(f"sos must be (S, 5), got {sos.shape}")
    return _kernels_cached(sos.tobytes(), sos.shape[0], int(block))


@lru_cache(maxsize=256)
def _sweep_mats(sos_key: bytes, s_count: int, block: int, k_blocks: int):
    """Hillis-Steele combine matrices T^(2^l) for l = 0.., truncated
    once the matrix norm falls below f32 significance."""
    kern = _kernels_cached(sos_key, s_count, block)
    mats = []
    M = kern.T
    shift = 1
    while shift < k_blocks:
        if np.max(np.abs(M)) < SWEEP_TOL:
            break
        mats.append((shift, M.copy()))
        M = M @ M
        shift *= 2
    return tuple(mats)


# ---------------------------------------------------------------------------
# Matmul form notes (measured on a v5e chip, 8ch x 2^26, f32 HIGHEST)
# ---------------------------------------------------------------------------
#
# The engine is HBM-bound: this chip sustains ~500-540 GB/s effective
# (819 nominal), and a (2^21, 256)@(256, 256) HIGHEST dot runs at that
# bandwidth — but the SAME contraction phrased as a batched einsum
# "...kb,cb->...kc" costs ~1.7x more wall (XLA inserts relayouts for
# the batch form). The engine therefore flattens every big contraction
# to a 2-D dot against a host-pre-transposed weight and reshapes back.
# Two fused-Pallas variants (whole-engine VMEM pass with in-kernel
# carry scan; output-stage y = x@LcT + e@CoutT fusion) were built and
# measured SLOWER (70 ms / 61 ms vs 51 ms XLA): per-grid-step small-op
# latencies outweigh the saved HBM round trips at these shapes, so the
# XLA formulation stays.


@lru_cache(maxsize=64)
def _dot_consts(sos_key: bytes, s_count: int, block: int, gain: float):
    """Pre-transposed f64 weights for the flattened 2-D dot forms.

    The chain input gain is folded into the input-drive weights (Lc,
    Win) host-side — y = Lc @ (g x) + Cout @ s == (g Lc) @ x + Cout @ s
    — so the engine never materializes a scaled copy of x (a full HBM
    round trip at bulk sizes)."""
    kern = _kernels_cached(sos_key, s_count, block)
    return (np.ascontiguousarray(gain * kern.Lc.T),
            np.ascontiguousarray(gain * kern.Win.T),
            np.ascontiguousarray(kern.Cout.T))


def cascade_apply_blocked(x, sos, *, block: int = 128, s0=None,
                          return_state: bool = False, gain: float = 1.0,
                          precision=jax.lax.Precision.HIGHEST):
    """Run an entire SOS cascade over x in blocked form.

    x: (..., N) with N a multiple of `block`; s0: optional (..., d)
    entry state (zeros if None); gain: input gain, folded into the
    precomputed weights. Returns y or (y, s_final).
    """
    sos = np.ascontiguousarray(np.asarray(sos, dtype=np.float64))
    kern = cascade_kernels(sos, block)
    B, d = kern.block, kern.d
    x = jnp.asarray(x)
    n = x.shape[-1]
    if n % B:
        raise ValueError(f"length {n} not a multiple of block {B}")
    K = n // B
    dt = x.dtype

    LcT, WinT, CoutT = _dot_consts(sos.tobytes(), sos.shape[0], block,
                                   float(gain))
    T = jnp.asarray(kern.T, dt)

    xb = x.reshape(x.shape[:-1] + (K, B))
    # flattened 2-D dots against pre-transposed weights (see the matmul
    # form notes above: ~1.7x over the batched-einsum phrasing)
    dot = lambda a, W: jnp.dot(
        a.reshape((-1, a.shape[-1])), jnp.asarray(W, dt),
        preferred_element_type=dt, precision=precision,
    ).reshape(a.shape[:-1] + (W.shape[-1],))
    u = dot(xb, LcT)                                   # (..., K, B) zero-IC out
    w = dot(xb, WinT)                                  # (..., K, d) zero-IC end state

    if s0 is None:
        s0 = jnp.zeros(x.shape[:-1] + (d,), dt)
    else:
        s0 = jnp.asarray(s0, dt)
        # full-f32 state applications (TPU default truncates to bf16)
        mmv = lambda M, v: jnp.einsum("ij,...j->...i", M, v,
                                      preferred_element_type=dt,
                                      precision=precision)
        if kern.modal:  # direct -> modal carry basis
            s0 = mmv(jnp.asarray(kern.Vinv, dt), s0)
        w = w.at[..., 0, :].add(mmv(T, s0))

    # inclusive scan e_k = sum_{j<=k} T^{k-j} w_j, constant-matrix sweeps
    for shift, M in _sweep_mats(sos.tobytes(), sos.shape[0], block, K):
        Mj = jnp.asarray(M, dt)
        shifted = jnp.einsum("...kd,ed->...ke", w[..., :-shift, :], Mj,
                             preferred_element_type=dt, precision=precision)
        w = jnp.concatenate(
            [w[..., :shift, :], w[..., shift:, :] + shifted], axis=-2)

    entries = jnp.concatenate([s0[..., None, :], w[..., :-1, :]], axis=-2)
    y = u + dot(entries, CoutT)                        # (..., K, B)
    y = y.reshape(x.shape[:-1] + (n,))
    if return_state:
        s_fin = w[..., -1, :]
        if kern.modal:  # back to the direct chain-state basis
            s_fin = jnp.einsum("ij,...j->...i", jnp.asarray(kern.V, dt),
                               s_fin, preferred_element_type=dt,
                               precision=precision)
        return y, s_fin
    return y


@lru_cache(maxsize=64)
def _kernels_banded_cached(sos_key: bytes, n_bands: int, s_count: int,
                           block: int):
    """Per-band cascade kernels stacked on a leading band axis."""
    sos = np.frombuffer(sos_key, dtype=np.float64).reshape(
        n_bands, s_count, 5)
    ks = [_kernels_cached(np.ascontiguousarray(sos[b]).tobytes(),
                          s_count, block) for b in range(n_bands)]
    return CascadeKernels(
        Lc=np.stack([k.Lc for k in ks]), Win=np.stack([k.Win for k in ks]),
        Cout=np.stack([k.Cout for k in ks]), T=np.stack([k.T for k in ks]),
        V=np.stack([k.V for k in ks]), Vinv=np.stack([k.Vinv for k in ks]),
        modal=any(k.modal for k in ks), block=block, d=ks[0].d)


@lru_cache(maxsize=256)
def _sweep_mats_banded(sos_key: bytes, n_bands: int, s_count: int,
                       block: int, k_blocks: int):
    kern = _kernels_banded_cached(sos_key, n_bands, s_count, block)
    mats = []
    M = kern.T                     # (bands, d, d)
    shift = 1
    while shift < k_blocks:
        if np.max(np.abs(M)) < SWEEP_TOL:
            break
        mats.append((shift, M.copy()))
        M = np.einsum("bij,bjk->bik", M, M)
        shift *= 2
    return tuple(mats)


def cascade_apply_blocked_banded(xb, sos, *, block: int = 128, s0=None,
                                 return_state: bool = False,
                                 precision=jax.lax.Precision.HIGHEST):
    """Banded whole-cascade engine: band row b runs its own cascade.

    xb: (..., bands, N); sos: (bands, S, 5). One einsum per kernel with
    the band axis batched — replaces S sequential banded stages
    (filter banks, vocoder) by a single Toeplitz pass per block.
    """
    sos = np.ascontiguousarray(np.asarray(sos, dtype=np.float64))
    if sos.ndim != 3 or sos.shape[2] != 5:
        raise ValueError(f"banded sos must be (bands, S, 5), got {sos.shape}")
    nb, S = sos.shape[:2]
    kern = _kernels_banded_cached(sos.tobytes(), nb, S, int(block))
    B, d = kern.block, kern.d
    xb = jnp.asarray(xb)
    if xb.shape[-2] != nb:
        raise ValueError(f"band axis {xb.shape[-2]} != {nb}")
    n = xb.shape[-1]
    if n % B:
        raise ValueError(f"length {n} not a multiple of block {B}")
    K = n // B
    dt = xb.dtype
    Lc = jnp.asarray(kern.Lc, dt)
    Win = jnp.asarray(kern.Win, dt)
    Cout = jnp.asarray(kern.Cout, dt)
    T = jnp.asarray(kern.T, dt)

    xr = xb.reshape(xb.shape[:-1] + (K, B))
    mm = lambda a, b_: jnp.einsum("...skb,scb->...skc", a, b_,
                                  preferred_element_type=dt,
                                  precision=precision)
    u = mm(xr, Lc)                                     # (..., bands, K, B)
    w = mm(xr, Win)                                    # (..., bands, K, d)

    if s0 is None:
        s0 = jnp.zeros(xb.shape[:-1] + (d,), dt)
    else:
        s0 = jnp.asarray(s0, dt)
        mmv = lambda M, v: jnp.einsum("sij,...sj->...si", M, v,
                                      preferred_element_type=dt,
                                      precision=precision)
        if kern.modal:
            s0 = mmv(jnp.asarray(kern.Vinv, dt), s0)
        w = w.at[..., 0, :].add(mmv(T, s0))

    for shift, M in _sweep_mats_banded(sos.tobytes(), nb, S, int(block), K):
        Mj = jnp.asarray(M, dt)
        shifted = jnp.einsum("...skd,sed->...ske", w[..., :-shift, :], Mj,
                             preferred_element_type=dt, precision=precision)
        w = jnp.concatenate(
            [w[..., :shift, :], w[..., shift:, :] + shifted], axis=-2)

    entries = jnp.concatenate([s0[..., None, :], w[..., :-1, :]], axis=-2)
    y = u + jnp.einsum("...skd,scd->...skc", entries, Cout,
                       preferred_element_type=dt, precision=precision)
    y = y.reshape(xb.shape[:-1] + (n,))
    if return_state:
        s_fin = w[..., -1, :]
        if kern.modal:
            s_fin = jnp.einsum("sij,...sj->...si",
                               jnp.asarray(kern.V, dt), s_fin,
                               preferred_element_type=dt,
                               precision=precision)
        return y, s_fin
    return y


def chain_state_to_compact(state):
    """BiquadChain (..., S, 4) state -> compact (..., 2S+2)."""
    x12 = state[..., 0, 0:2]
    y12 = state[..., :, 2:4].reshape(state.shape[:-2] + (-1,))
    return jnp.concatenate([x12, y12], axis=-1)


def compact_state_to_chain(s, S: int):
    """Compact (..., 2S+2) -> BiquadChain (..., S, 4) state.

    Section s's input history is section s-1's output history (the
    global input history for section 0) — recovered exactly."""
    x12 = s[..., 0:2]
    y = s[..., 2:].reshape(s.shape[:-1] + (S, 2))
    xh = jnp.concatenate([x12[..., None, :], y[..., :-1, :]], axis=-2)
    return jnp.concatenate([xh, y], axis=-1)
