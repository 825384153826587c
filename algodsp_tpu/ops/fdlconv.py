"""Fused Pallas FDL convolution: FFT + spectral MAC + iFFT in one kernel.

The bulk frequency-domain delay-line convolution (conv reverb,
`conv/partitioned.py`) is FFT-bound: XLA's TPU FFT reaches only ~14%
of HBM bandwidth, and the frame spectra make three HBM round trips
(rfft out, MAC in/out, irfft in). This kernel performs the whole FDL
per frame inside VMEM, so spectra never touch HBM:

  per grid step (channel, frame):
    1. load two (B/128, 128) sample blocks — the 50%-overlap
       overlap-save frame [prev_block, cur_block] of length n = 2B;
    2. forward DFT as a Bailey 4-step factorization n = n1 x n2
       (n2 = 128 lanes): inner n1-point DFT = one (2*n1, n1)@(n1, 128)
       matmul on the MXU (real/imag stacked), twiddle on the VPU,
       outer 128-point DFT = four (n1, 128)@(128, 128) matmuls.
       Output lives on the (k1, k2) grid — bin k = k2*n1 + k1 — and is
       never transposed to natural order: the MAC and the inverse use
       the same grid, so the classic FFT transpose disappears;
    3. push the spectrum into a VMEM ring of the last P frames and
       run the P-tap spectral MAC against the partition spectra
       (the FDL recurrence Y[f] = sum_p H[p] * X[f-p]);
    4. inverse 4-step DFT computing only rows j1 >= n1/2 — exactly
       the B kept samples of the overlap-save discard — and only the
       real part: two (n1/2, n1)@(n1, 128) matmuls close the frame.

All matmuls run at Precision.HIGHEST (the only f32 mode Mosaic
lowers); measured SNR vs an f64 oracle is 130-134 dB, matching
jnp.fft.rfft, and scale-independent per channel (peak normalization
around the channel-pair packing). 8ch x 2^23 x 2^17-tap reverb runs
at 20.4 ms on a v5e chip (~3x the XLA FDL formulation); see
BENCHMARKS.md for the full sweep.

Reference behavior covered: `dsp/conv/partitioned.go:17-26` (bounded
per-block cost for long IRs); this is the TPU-shaped replacement for
the freq-domain MAC hot loop at `partitioned.go:134`.

VMEM budget: constants 8*n1^2 + ~n*12 bytes, ring + partition spectra
16*P*B bytes each; `supported()` enforces the fit.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_VMEM_BUDGET = 10 * 1024 * 1024
# frames closed per grid step by the pair kernel; supported()'s io
# budget scales with this — change both together (F=2 measured best
# on v5e; F=4 added VMEM/DMA pressure for no overhead win)
FRAMES_PER_STEP = 2


def _precision_mode() -> str:
    """Matmul precision for the fused kernels.

    "highest" (default): Precision.HIGHEST f32 matmuls (6 bf16 MXU
    passes) — 130-134 dB SNR vs f64.
    "fast": manual bf16x3 split (3 MXU passes, ~2x matmul throughput,
    ~105-115 dB SNR) — the TPU analog of the reference's `fastmath`
    build tag (`dynamics/compressor_math_fast.go:1-32`). Select with
    ALGODSP_FDL_PRECISION=fast.
    """
    mode = os.environ.get("ALGODSP_FDL_PRECISION", "highest").lower()
    if mode not in ("highest", "fast"):
        raise ValueError(
            f"ALGODSP_FDL_PRECISION must be 'highest' or 'fast', got {mode!r}")
    return mode


def _make_mm(mode: str):
    if mode == "fast":
        def mm(a, b):
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = b.astype(jnp.bfloat16)
            bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            d = functools.partial(jnp.dot,
                                  preferred_element_type=jnp.float32)
            return d(ah, bh) + (d(ah, bl) + d(al, bh))
        return mm
    return functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)


def supported(B: int, P: int, n_samples: int, channels: int = 2) -> bool:
    """True if the fused kernel can run this shape.

    Needs: frame rows n1 = 2B/128 a multiple of 8 (f32 sublane tile)
    with n1/2 >= 8, whole frames, and everything fitting in VMEM.
    `channels` picks the io budget: >= 2 routes to the two-frame pair
    kernel (4 in + 2 out frames per step), 1 to the single kernel.
    """
    if B < 1024 or B % LANES or n_samples % B:
        return False
    n1 = 2 * B // LANES
    if n1 % 8 or n1 // 2 < 8:
        return False
    q = _pick_pairs(channels) if channels >= 2 else 1
    const_bytes = 4 * (2 * n1 * n1 + 4 * n1 * LANES +
                       4 * LANES * LANES + n1 * n1)
    ring_bytes = 16 * P * B * q   # per-pair frame ring (VMEM scratch)
    # double-buffered in/out blocks: the F-frame Q-pair kernel moves
    # 2QF input windows (2B samples each) + 2Q output windows of F*B
    # per step, f32, x2 buffers; the single kernel 2 in + 1 out blocks
    io_bytes = 48 * FRAMES_PER_STEP * B * q if channels >= 2 else 24 * B
    # h-spectra constant (16*P*B) + ring + io
    return const_bytes + 16 * P * B + ring_bytes + io_bytes < _VMEM_BUDGET


@functools.lru_cache(maxsize=8)
def _plan(B: int):
    """Host-side DFT/twiddle constants for frame size n = 2B."""
    n = 2 * B
    n2 = LANES
    n1 = n // n2
    j1 = np.arange(n1)
    j2 = np.arange(n2)
    # forward: X[k1,k2] = sum_{j2} W_n2^{j2 k2} W_n^{j2 k1}
    #                     * sum_{j1} W_n1^{j1 k1} x[j1,j2]
    F1 = np.exp(-2j * np.pi * np.outer(j1, j1) / n1)           # (k1, j1)
    F1s = np.concatenate([F1.real, F1.imag], 0)                # (2n1, n1)
    T = np.exp(-2j * np.pi * np.outer(j1, j2) / n)             # (k1, j2)
    F2 = np.exp(-2j * np.pi * np.outer(j2, j2) / n2)           # (j2, k2)
    # inverse (1/n folded into E1), output rows j1 in [n1/2, n1)
    E2 = np.exp(2j * np.pi * np.outer(j2, j2) / n2)            # (k2, j2)
    j1h = np.arange(n1 // 2, n1)
    E1 = np.exp(2j * np.pi * np.outer(j1h, j1) / n1) / n       # (j1, k1)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    return (f32(F1s), f32(T.real), f32(T.imag),
            f32(F2.real), f32(F2.imag),
            f32(E2.real), f32(E2.imag),
            f32(E1.real), f32(E1.imag))


def kernel_spectra(kernel, B: int) -> np.ndarray:
    """Partition spectra on the (k1, k2) grid: (P, 2, n1, n2) f32."""
    kernel = np.asarray(kernel, np.float64).reshape(-1)
    n = 2 * B
    n1, n2 = n // LANES, LANES
    P = -(-kernel.size // B)
    padded = np.zeros(P * B)
    padded[:kernel.size] = kernel
    full = np.fft.fft(padded.reshape(P, B), n, axis=-1)        # (P, n)
    grid = full.reshape(P, n2, n1).transpose(0, 2, 1)          # [k1, k2]
    return np.stack([grid.real, grid.imag], 1).astype(np.float32)


def kernel_spectra_jax(kernel, B: int, P: int):
    """Traced (jit-safe) variant of `kernel_spectra`: partition spectra
    on the (k1, k2) grid computed on device — for kernels that are
    traced arrays (e.g. `fftconvolve` with a runtime kernel)."""
    kernel = jnp.asarray(kernel, jnp.float32).reshape(-1)
    n = 2 * B
    n1, n2 = n // LANES, LANES
    pad = P * B - kernel.shape[0]
    parts = jnp.pad(kernel, (0, pad)).reshape(P, B)
    full = jnp.fft.fft(parts.astype(jnp.complex64), n)         # (P, n)
    grid = jnp.transpose(full.reshape(P, n2, n1), (0, 2, 1))   # [k1, k2]
    return jnp.stack([jnp.real(grid), jnp.imag(grid)], 1).astype(jnp.float32)


def pick_block(m: int, n: int, channels: int = 2) -> int | None:
    """Partition size for a one-shot fused conv of an m-tap kernel over
    n samples, or None if no supported size fits."""
    # 2^13 measured fastest on v5e (lowest matmul count per sample once
    # the two-frame pair kernel amortizes per-step overheads); every
    # shape that admits a larger order also admits 2^13, so candidates
    # only descend from there
    for bo in (13, 12, 11, 10):
        B = 1 << bo
        P = -(-m // B)
        total = n + m - 1
        padded = -(-total // B) * B
        if supported(B, P, padded, channels=channels) and padded // B >= 1:
            return B
    return None


def _fdl_conv_fused_raw(x, hgrid, B: int):
    """Zero-state causal FDL convolution of x: (C, N) with the kernel
    whose partition spectra are `hgrid` (P, 2, n1, 128). N % B == 0.
    Returns (C, N) float32. Matches `PartitionedConvolver`'s bulk-FDL
    algebra exactly (ring zeroed per channel = zero initial state).

    With C >= 2 channels, pairs ride one complex DFT (`_fdl_fused_multi`)
    — ~1.4x fewer matmul FLOPs per channel. Channels are normalized to
    unit peak before pairing and rescaled after (convolution is
    linear), so a quiet channel sharing a DFT with a loud one keeps its
    own relative noise floor instead of inheriting the loud channel's
    absolute f32 roundoff as crosstalk."""
    x = jnp.asarray(x, jnp.float32)
    C, N = x.shape
    if C == 0:
        return x
    if C >= 2:
        s = jnp.max(jnp.abs(x), axis=-1)                       # (C,)
        # zero/denormal channels get the smallest normal scale: x*inv
        # stays 0 and the rescale crushes any pair crosstalk to ~1e-45
        s = jnp.maximum(s, jnp.float32(np.finfo(np.float32).tiny))
        Cp = C + (C % 2)
        if Cp != C:
            x = jnp.concatenate(
                [x, jnp.zeros((Cp - C, N), jnp.float32)], 0)
            s = jnp.concatenate([s, jnp.ones((1,), jnp.float32)], 0)
        nf = N // B
        F = FRAMES_PER_STEP
        if nf % F:
            # pad zero blocks at the end (zero-state FDL: appended
            # silence cannot affect earlier outputs), slice after
            x = jnp.concatenate(
                [x, jnp.zeros((Cp, (F - nf % F) * B), jnp.float32)], -1)
        # the normalization is applied INSIDE the kernel (stage-1 frames
        # scaled by 1/s, outputs rescaled by s): materializing x/s and
        # y*s would cost two full HBM round trips (~16 ms at 8ch x 2^26)
        y = _fdl_fused_multi(x, hgrid, B, F, s, 1.0 / s)
        return y[:C, :N]
    return _fdl_fused_single(x, hgrid, B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fdl_vjp(x, hgrid, B: int):
    return _fdl_conv_fused_raw(x, hgrid, B)


def _fdl_fwd(x, hgrid, B: int):
    return _fdl_conv_fused_raw(x, hgrid, B), (x, hgrid)


def _fdl_bwd(B: int, res, g):
    """Adjoints of the fused FDL (see `fdl_conv_fused` docstring).

    Signal side: for hgrid = partition spectra of a real kernel the map
    x -> y is causal Toeplitz (asserted vs direct convolution in
    tests/test_fdlconv.py), so the adjoint is flip -> same fused kernel
    -> flip: the backward runs at forward speed on the MXU.

    Spectra side: y_f = Re(iFFT(sum_p H_p . X_{f-p}))[B:], so with
    dV_f = FFT(embed(g_f)) / n (the exact adjoint of "real part of the
    iFFT at the kept rows"),

        dH_p = sum_{c, f >= p} dV_{c,f} . conj(X_{c,f-p}),

    computed here with jnp.fft in natural bin order and re-laid onto
    the (k1, k2) grid. This makes kernels *learnable*: chaining through
    `kernel_spectra_jax` gives gradients to a time-domain IR.
    """
    x, hgrid = res
    g = jnp.asarray(g, jnp.float32)
    dx = jnp.flip(_fdl_conv_fused_raw(jnp.flip(g, -1), hgrid, B), -1)

    C, N = x.shape
    n = 2 * B
    n1, n2 = n // LANES, LANES
    P = hgrid.shape[0]
    F = N // B
    # overlap-save frames of x: frame_f = x[(f-1)B : (f+1)B], zero-front
    blocks = jnp.concatenate(
        [jnp.zeros((C, 1, B), x.dtype), x.reshape(C, F, B)], axis=1)
    frames = jnp.concatenate([blocks[:, :-1], blocks[:, 1:]], axis=-1)
    X = jnp.fft.fft(frames)                                   # (C, F, n)
    ghat = jnp.concatenate(
        [jnp.zeros((C, F, B), g.dtype), g.reshape(C, F, B)], axis=-1)
    dV = jnp.fft.fft(ghat) / n                                # (C, F, n)
    Xc = jnp.conj(X)
    # only lags p < F are realizable: a partition delayed by >= F frames
    # never overlaps the signal, so its true gradient is exactly zero
    # (and the p >= F slices would be shape-mismatched empties)
    dH = jnp.stack([
        jnp.sum(dV[:, p:, :] * Xc[:, :F - p, :], axis=(0, 1))
        if p < F else jnp.zeros((n,), dV.dtype)
        for p in range(P)
    ])                                                        # (P, n)
    dgrid = jnp.transpose(dH.reshape(P, n2, n1), (0, 2, 1))   # [k1, k2]
    dhgrid = jnp.stack([jnp.real(dgrid), jnp.imag(dgrid)],
                       axis=1).astype(hgrid.dtype)
    return dx.astype(x.dtype), dhgrid


_fdl_vjp.defvjp(_fdl_fwd, _fdl_bwd)


def fdl_conv_fused(x, hgrid, B: int):
    """Differentiable front door to the fused FDL kernel (contract in
    `_fdl_conv_fused_raw`). Carries a custom VJP: JAX cannot autodiff
    the Pallas grid kernel, so the signal adjoint is the same kernel on
    the time-reversed cotangent (exact for hgrid = partition spectra of
    a real kernel — the op's contract) and the spectra adjoint is the
    frame-domain correlation (see `_fdl_bwd`), enabling gradient-based
    IR learning through `kernel_spectra_jax`."""
    return _fdl_vjp(jnp.asarray(x, jnp.float32),
                    jnp.asarray(hgrid, jnp.float32), B)


def _fdl_fused_single(x, hgrid, B: int):
    """One-channel-per-grid-step variant (real 4-step DFT per frame)."""
    C, N = x.shape
    n = 2 * B
    n1, n2 = n // LANES, LANES
    nf = N // B
    P = int(hgrid.shape[0])
    F1s, Tr, Ti, F2r, F2i, E2r, E2i, E1r, E1i = map(jnp.asarray, _plan(B))
    rows = B // n2                                             # = n1 // 2

    ext = jnp.concatenate([jnp.zeros((C, B), jnp.float32), x], -1)
    ext = ext.reshape(C, -1, n2)

    mm = _make_mm(_precision_mode())

    def kern(prev_ref, cur_ref, h_ref, f1_ref, tr_ref, ti_ref,
             f2r_ref, f2i_ref, e2r_ref, e2i_ref, e1r_ref, e1i_ref,
             y_ref, ring_ref):
        f = pl.program_id(1)

        @pl.when(f == 0)
        def _():
            ring_ref[...] = jnp.zeros_like(ring_ref)

        frame = jnp.concatenate([prev_ref[0], cur_ref[0]], 0)  # (n1, n2)
        # forward 4-step DFT
        Y = mm(f1_ref[...], frame)                             # (2n1, n2)
        Yr, Yi = Y[:n1], Y[n1:]
        Zr = Yr * tr_ref[...] - Yi * ti_ref[...]
        Zi = Yr * ti_ref[...] + Yi * tr_ref[...]
        Xr = mm(Zr, f2r_ref[...]) - mm(Zi, f2i_ref[...])       # (n1, n2)
        Xi = mm(Zr, f2i_ref[...]) + mm(Zi, f2r_ref[...])
        slot = jax.lax.rem(f, jnp.int32(P))
        ring_ref[slot, 0] = Xr
        ring_ref[slot, 1] = Xi
        # P-tap spectral MAC over the frame ring
        acc_r = jnp.zeros((n1, n2), jnp.float32)
        acc_i = jnp.zeros((n1, n2), jnp.float32)
        for p in range(P):
            s = jax.lax.rem(slot - p + P, jnp.int32(P))
            xr = ring_ref[s, 0]
            xi = ring_ref[s, 1]
            hr = h_ref[p, 0]
            hi = h_ref[p, 1]
            acc_r = acc_r + xr * hr - xi * hi
            acc_i = acc_i + xr * hi + xi * hr
        # inverse 4-step DFT: rows j1 >= n1/2 (overlap-save keep), real part
        Ar = mm(acc_r, e2r_ref[...]) - mm(acc_i, e2i_ref[...])
        Ai = mm(acc_r, e2i_ref[...]) + mm(acc_i, e2r_ref[...])
        Br = Ar * tr_ref[...] + Ai * ti_ref[...]
        Bi = Ai * tr_ref[...] - Ar * ti_ref[...]
        y_ref[0] = mm(e1r_ref[...], Br) - mm(e1i_ref[...], Bi)

    const = lambda shp: pl.BlockSpec(shp, lambda c, f: tuple([0] * len(shp)),
                                     memory_space=pltpu.VMEM)
    blk = lambda: pl.BlockSpec((1, rows, n2), lambda c, f: (c, f, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(C, nf),
        in_specs=[
            blk(), blk(),
            const((P, 2, n1, n2)),
            const((2 * n1, n1)),
            const((n1, n2)), const((n1, n2)),
            const((n2, n2)), const((n2, n2)),
            const((n2, n2)), const((n2, n2)),
            const((n1 // 2, n1)), const((n1 // 2, n1)),
        ],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((C, nf * rows, n2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P, 2, n1, n2), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(ext[:, :-rows], ext[:, rows:], jnp.asarray(hgrid),
      F1s, Tr, Ti, F2r, F2i, E2r, E2i, E1r, E1i)
    return out.reshape(C, N)


def _pick_pairs(channels: int) -> int:
    """Channel-pairs per grid step: 2 when the (padded) channel count
    splits into quads, else 1. Two pairs double every matmul's M or N
    dimension and halve the step count — the 4-step DFT matmuls are
    small (K = 128), so wider ops raise MXU utilization ~1.2x."""
    return 2 if channels >= 4 and channels % 4 == 0 else 1


def _fdl_fused_multi(x, hgrid, B: int, F: int, scales, inv_scales):
    """Channel-pair, F-frames-per-step, Q-pairs-per-step variant.

    Channels (2c, 2c+1) = (a, b) share one complex DFT pipeline per
    frame via the packing z = a + i*b: the FDL spectral MAC is
    complex-linear and the same H applies to every channel, so
    H * (A + iB) = H*A + i*(H*B) — the packed spectrum rides the ring
    and the MAC untouched, and because both convolution outputs are
    real, the inverse DFT's real part is channel a and its imaginary
    part is channel b, with no Hermitian split anywhere. Only stage 1
    of the forward 4-step (which already exploits real input) stays
    per-channel; twiddles, stage 2, the P-tap MAC, and the inverse
    collapse to once per pair (~1.4x fewer FLOPs).

    Each grid step closes F consecutive frames (Fg..Fg+F-1) for Q
    channel pairs: a later frame's newest MAC taps are the earlier
    frames' spectra, computed in the same step and kept in registers,
    so frame-batching costs nothing algorithmically — it divides the
    per-step overheads by F and multiplies every matmul's M or N
    dimension by F (stage 1 runs as one (2n1, n1)@(n1, 2QF*128) dot).
    Pair-batching (Q = 2 when channels % 4 == 0) stacks the second
    pair's frames on matmul rows/columns — the DFT matmuls are small
    (K = 128 contraction), so doubling their M/N dims and halving the
    grid steps buys real MXU utilization. All in-step spectra are
    written to the per-pair ring only AFTER the MAC reads: ring slot
    (s0+j) mod P still holds frame Fg+j-P, an earlier in-step frame's
    oldest tap. With P < F, colliding in-step slots are written in
    ascending j order so the newest frame survives. Requires
    C % (2Q) == 0 and nf % F == 0 (caller pads).

    Per-channel peak normalization rides SMEM scalars: the loaded
    half-frame windows are multiplied by 1/s_c before stage 1 and the
    closed frames by s_c before the write — numerically the same
    conditioning as pre-scaling x, without materializing scaled copies
    of the input and output in HBM."""
    x = jnp.asarray(x, jnp.float32)
    C, N = x.shape
    nf = N // B
    Q = _pick_pairs(C)
    assert C % (2 * Q) == 0 and nf % F == 0
    n = 2 * B
    n1, n2 = n // LANES, LANES
    P = int(hgrid.shape[0])
    F1s, Tr, Ti, F2r, F2i, E2r, E2i, E1r, E1i = map(jnp.asarray, _plan(B))
    TrQF = jnp.concatenate([Tr] * (Q * F), 0)                  # (QF*n1, n2)
    TiQF = jnp.concatenate([Ti] * (Q * F), 0)
    rows = B // n2

    ext = jnp.concatenate([jnp.zeros((C, B), jnp.float32), x], -1)
    ext = ext.reshape(C, -1, n2)

    mm = _make_mm(_precision_mode())

    def kern(sc_ref, isc_ref, w1_ref, w2_ref, h_ref,
             f1_ref, trf_ref, tif_ref, f2r_ref, f2i_ref, e2r_ref, e2i_ref,
             e1r_ref, e1i_ref, ya_ref, yb_ref, ring_ref):
        c = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            ring_ref[...] = jnp.zeros_like(ring_ref)

        # window of F+1 half-frames per channel, peak-normalized via the
        # SMEM scale scalars: frames j = W[j*r:(j+2)*r]
        Ws = [jnp.concatenate([w1_ref[ch], w2_ref[ch][-rows:]], 0)
              * isc_ref[2 * Q * c + ch] for ch in range(2 * Q)]
        # columns: all a-channel frames (q major, j minor), then all b's
        frames = jnp.concatenate(
            [Ws[2 * q][j * rows:j * rows + n1]
             for q in range(Q) for j in range(F)]
            + [Ws[2 * q + 1][j * rows:j * rows + n1]
               for q in range(Q) for j in range(F)], 1)     # (n1, 2QF*n2)
        S = mm(f1_ref[...], frames)                         # (2n1, 2QF*n2)
        # pack z = a + i*b per frame; (q, j) frames stacked on rows
        colA = lambda q, j: (q * F + j) * n2
        colB = lambda q, j: (Q * F + q * F + j) * n2
        Zr = jnp.concatenate(
            [S[:n1, colA(q, j):colA(q, j) + n2]
             - S[n1:, colB(q, j):colB(q, j) + n2]
             for q in range(Q) for j in range(F)], 0)       # (QF*n1, n2)
        Zi = jnp.concatenate(
            [S[n1:, colA(q, j):colA(q, j) + n2]
             + S[:n1, colB(q, j):colB(q, j) + n2]
             for q in range(Q) for j in range(F)], 0)
        # shared twiddle (tiled) + stage 2, all pairs/frames in one dot
        Wr = Zr * trf_ref[...] - Zi * tif_ref[...]
        Wi = Zr * tif_ref[...] + Zi * trf_ref[...]
        Xr = mm(Wr, f2r_ref[...]) - mm(Wi, f2i_ref[...])    # (QF*n1, n2)
        Xi = mm(Wr, f2i_ref[...]) + mm(Wi, f2r_ref[...])
        row = lambda q, j: (q * F + j) * n1
        Xs = {(q, j): (Xr[row(q, j):row(q, j) + n1],
                       Xi[row(q, j):row(q, j) + n1])
              for q in range(Q) for j in range(F)}
        s0 = jax.lax.rem(F * g, jnp.int32(P))
        # P-tap spectral MAC per pair: taps p <= j come from this step's
        # registers, older taps from the ring (each slot read once)
        accs = {}
        for q in range(Q):
            for j in range(F):
                ar = jnp.zeros((n1, n2), jnp.float32)
                ai = jnp.zeros((n1, n2), jnp.float32)
                for p in range(min(j + 1, P)):
                    xr, xi = Xs[(q, j - p)]
                    hr = h_ref[p, 0]
                    hi = h_ref[p, 1]
                    ar = ar + xr * hr - xi * hi
                    ai = ai + xr * hi + xi * hr
                accs[(q, j)] = [ar, ai]
        for m in range(1, P):
            sm = jax.lax.rem(s0 - m + P, jnp.int32(P))
            for q in range(Q):
                xr = ring_ref[sm, q, 0]
                xi = ring_ref[sm, q, 1]
                for j in range(F):
                    if j + m < P:
                        hr = h_ref[j + m, 0]
                        hi = h_ref[j + m, 1]
                        accs[(q, j)][0] = accs[(q, j)][0] + xr * hr - xi * hi
                        accs[(q, j)][1] = accs[(q, j)][1] + xr * hi + xi * hr
        for j in range(F):
            sj = jax.lax.rem(F * g + j, jnp.int32(P))
            for q in range(Q):
                ring_ref[sj, q, 0] = Xs[(q, j)][0]
                ring_ref[sj, q, 1] = Xs[(q, j)][1]
        acc_r = jnp.concatenate(
            [accs[(q, j)][0] for q in range(Q) for j in range(F)], 0)
        acc_i = jnp.concatenate(
            [accs[(q, j)][1] for q in range(Q) for j in range(F)], 0)
        # inverse 4-step, rows j1 >= n1/2; real part -> a, imag -> b
        Ar = mm(acc_r, e2r_ref[...]) - mm(acc_i, e2i_ref[...])
        Ai = mm(acc_r, e2i_ref[...]) + mm(acc_i, e2r_ref[...])
        Br = Ar * trf_ref[...] + Ai * tif_ref[...]
        Bi = Ai * trf_ref[...] - Ar * tif_ref[...]
        Bc_r = jnp.concatenate(
            [Br[row(q, j):row(q, j) + n1]
             for q in range(Q) for j in range(F)], 1)       # (n1, QF*n2)
        Bc_i = jnp.concatenate(
            [Bi[row(q, j):row(q, j) + n1]
             for q in range(Q) for j in range(F)], 1)
        Cr = mm(e1r_ref[...], Bc_r) - mm(e1i_ref[...], Bc_i)  # (n1/2, QF*n2)
        Ci = mm(e1r_ref[...], Bc_i) + mm(e1i_ref[...], Bc_r)
        col = lambda q, j: (q * F + j) * n2
        for q in range(Q):
            ya_ref[q] = jnp.concatenate(
                [Cr[:, col(q, j):col(q, j) + n2] for j in range(F)], 0) \
                * sc_ref[2 * Q * c + 2 * q]
            yb_ref[q] = jnp.concatenate(
                [Ci[:, col(q, j):col(q, j) + n2] for j in range(F)], 0) \
                * sc_ref[2 * Q * c + 2 * q + 1]

    const = lambda shp: pl.BlockSpec(shp, lambda c, g: tuple([0] * len(shp)),
                                     memory_space=pltpu.VMEM)
    blk = lambda: pl.BlockSpec((2 * Q, F * rows, n2), lambda c, g: (c, g, 0),
                               memory_space=pltpu.VMEM)
    oblk = lambda: pl.BlockSpec((Q, F * rows, n2), lambda c, g: (c, g, 0),
                                memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec((C,), lambda c, g: (0,),
                                memory_space=pltpu.SMEM)
    ya, yb = pl.pallas_call(
        kern,
        grid=(C // (2 * Q), nf // F),
        in_specs=[
            smem(), smem(),
            blk(), blk(),
            const((P, 2, n1, n2)),
            const((2 * n1, n1)),
            const((Q * F * n1, n2)), const((Q * F * n1, n2)),
            const((n2, n2)), const((n2, n2)),
            const((n2, n2)), const((n2, n2)),
            const((n1 // 2, n1)), const((n1 // 2, n1)),
        ],
        out_specs=(oblk(), oblk()),
        out_shape=(jax.ShapeDtypeStruct((C // 2, nf * rows, n2), jnp.float32),
                   jax.ShapeDtypeStruct((C // 2, nf * rows, n2), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((P, Q, 2, n1, n2), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(scales, jnp.float32), jnp.asarray(inv_scales, jnp.float32),
      ext[:, :-rows], ext[:, rows:],
      jnp.asarray(hgrid), F1s, TrQF, TiQF, F2r, F2i, E2r, E2i, E1r, E1i)
    y = jnp.stack([ya, yb], 1)                                 # (C/2, 2, ...)
    return y.reshape(C, nf * rows, n2).reshape(C, N)
