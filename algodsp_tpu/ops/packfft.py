"""Hermitian-packed batched real FFTs.

The classic 2-for-1 real-FFT packing: two real rows ride one complex
FFT (`z = a + i*b`; spectra untangle by Hermitian symmetry). Rows are
paired along the second-to-last axis, which every caller here already
batches over (FDL frames, channels).

This is the kind of trick the reference delegates to its FFT dep
(`github.com/cwbudde/algo-fft`, SURVEY.md §0); here it is a dispatch
layer over `jnp.fft`, analogous to the SIMD registry
(`dsp/filter/biquad/internal/arch/registry`): callers use
`rfft_batched`/`irfft_batched` and packing engages only when enabled.

Measured on a v5e chip (2026-08-17): XLA's TPU rfft already exploits
realness (rfft 5.98 ms vs complex fft 6.89 ms at (520, 32768) f32),
so packing — half the FFTs plus an O(n)-bandwidth untangle — is a
wash or a loss at every conv-engine shape (6.31 ms at the same shape;
1.7x WORSE at (32768, 512)). Packing therefore defaults OFF and the
dispatchers fall through to `jnp.fft`; set ALGODSP_PACKFFT=1 to
re-enable on backends where the measurement goes the other way.

Exactness: untangling is pure arithmetic — results match
`jnp.fft.rfft` to f32 rounding (tests assert >=120 dB agreement).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from algodsp_tpu.utils.fftjit import ifft, irfft


def _rev_full(z):
    """Z[(-k) mod n] along the last axis."""
    return jnp.roll(jnp.flip(z, axis=-1), 1, axis=-1)


def rfft_packed(x, n: int):
    """rfft along the last axis of real `x` (..., k, m), pairing rows
    of the k axis two-per-complex-FFT. Returns (..., k, n//2+1)."""
    x = jnp.asarray(x)
    k = x.shape[-2]
    pad = k % 2
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-2] + (1, x.shape[-1]), x.dtype)], axis=-2)
    a = x[..., 0::2, :]
    b = x[..., 1::2, :]
    z = jnp.fft.fft(jax.lax.complex(a, b), n)          # (..., k/2, n)
    zr = jnp.conj(_rev_full(z))
    even = 0.5 * (z + zr)                               # spectrum of a
    odd = -0.5j * (z - zr)                              # spectrum of b
    F = n // 2 + 1
    out = jnp.stack([even[..., :F], odd[..., :F]], axis=-2)
    out = out.reshape(out.shape[:-3] + (-1, F))
    return out[..., :k, :]


def irfft_packed(spec, n: int):
    """irfft along the last axis of half-spectra `spec` (..., k, F),
    pairing rows of the k axis. Returns real (..., k, n)."""
    spec = jnp.asarray(spec)
    k = spec.shape[-2]
    pad = k % 2
    if pad:
        spec = jnp.concatenate(
            [spec, jnp.zeros(spec.shape[:-2] + (1, spec.shape[-1]),
                             spec.dtype)], axis=-2)
    s0 = spec[..., 0::2, :]
    s1 = spec[..., 1::2, :]
    # rebuild full Hermitian spectra, then one complex inverse FFT
    # carries both rows: z = ifft(S0_full + i*S1_full)
    def full(s):
        mid = jnp.conj(jnp.flip(s[..., 1:-1], axis=-1))
        return jnp.concatenate([s, mid], axis=-1)
    z = ifft(full(s0) + 1j * full(s1), n)
    out = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-2)
    out = out.reshape(out.shape[:-3] + (-1, n))
    return out[..., :k, :]


def _use_packing(x) -> bool:
    return (os.environ.get("ALGODSP_PACKFFT", "0") == "1"
            and x.ndim >= 2 and x.shape[-2] >= 2)


# ---------------------------------------------------------------------------
# Bailey 4-step matmul FFT (natural bin order)
#
# XLA's TPU FFT reaches only ~14% of HBM bandwidth; re-expressing the
# DFT as n = n1 x 128 matmul stages puts the butterflies on the MXU.
# Measured at (520, 32768) f32 on v5e: 2.26 ms in-graph vs 3.35 ms for
# jnp.fft.rfft (1.49x) at BETTER accuracy (139.7 vs 130.3 dB vs f64 —
# HIGHEST-precision matmuls beat the f32 butterfly cascade's rounding).
# Arithmetic grows as sqrt(n) per sample, so the dispatch engages only
# for the sizes where the MXU win beats the extra FLOPs (2^15..2^16).
# ---------------------------------------------------------------------------

_MX_MIN_N = 1 << 15
_MX_MAX_N = 1 << 16
_MX_LANES = 128


@functools.lru_cache(maxsize=8)
def _mx_plan(n: int):
    # Deliberately not shared with fdlconv._plan: that kernel keeps the
    # (k1, k2) grid order and computes only the kept half-frame rows of
    # the inverse, while this natural-order path truncates the forward
    # outer DFT to rfft bins (F2 is (j2, n2/2+1)) and inverts the full
    # grid. Only F1s/T/E2 coincide.
    import numpy as np
    n2 = _MX_LANES
    n1 = n // n2
    j1 = np.arange(n1)
    j2 = np.arange(n2)
    F1 = np.exp(-2j * np.pi * np.outer(j1, j1) / n1)
    F1s = np.concatenate([F1.real, F1.imag], 0).astype(np.float32)
    T = np.exp(-2j * np.pi * np.outer(j1, j2) / n)
    k2 = np.arange(n2 // 2 + 1)
    F2 = np.exp(-2j * np.pi * np.outer(j2, k2) / n2)
    # inverse: full-grid 4-step, 1/n folded into E1
    E2 = np.exp(2j * np.pi * np.outer(j2, j2) / n2)
    E1 = np.exp(2j * np.pi * np.outer(j1, j1) / n1) / n
    f32 = lambda a: jnp.asarray(np.ascontiguousarray(a, np.float32))
    plan = (n1, n2, f32(F1s), f32(T.real), f32(T.imag),
            f32(F2.real), f32(F2.imag),
            f32(E2.real), f32(E2.imag), f32(E1.real), f32(E1.imag))
    return plan


_HI = jax.lax.Precision.HIGHEST


def rfft_mx(x, n: int):
    """Natural-order rfft via the 4-step matmul factorization.

    x: (..., m) real f32, m <= n, n = n1*128 pow2.
    Returns (..., n//2 + 1) complex64, bit-order identical to
    jnp.fft.rfft (the (k1,k2) grid is transposed back)."""
    n1, n2, F1s, Tr, Ti, F2r, F2i, *_ = _mx_plan(n)
    x = jnp.asarray(x, jnp.float32)
    m = x.shape[-1]
    if m < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - m)])
    elif m > n:
        x = x[..., :n]  # jnp.fft.rfft truncation semantics
    lead = x.shape[:-1]
    xr = x.reshape(lead + (n1, n2))
    Y = jnp.einsum("Ka,...ab->...Kb", F1s, xr, precision=_HI)
    Yr, Yi = Y[..., :n1, :], Y[..., n1:, :]
    Zr = Yr * Tr - Yi * Ti
    Zi = Yr * Ti + Yi * Tr
    Xr = (jnp.einsum("...Kb,bC->...KC", Zr, F2r, precision=_HI)
          - jnp.einsum("...Kb,bC->...KC", Zi, F2i, precision=_HI))
    Xi = (jnp.einsum("...Kb,bC->...KC", Zr, F2i, precision=_HI)
          + jnp.einsum("...Kb,bC->...KC", Zi, F2r, precision=_HI))
    F = n // 2 + 1
    Xr = jnp.swapaxes(Xr, -1, -2).reshape(lead + (-1,))[..., :F]
    Xi = jnp.swapaxes(Xi, -1, -2).reshape(lead + (-1,))[..., :F]
    return jax.lax.complex(Xr, Xi)


def irfft_mx(spec, n: int):
    """Natural-order irfft via the 4-step matmul factorization.

    spec: (..., n//2+1) complex; returns (..., n) real f32."""
    n1, n2, _, Tr, Ti, _, _, E2r, E2i, E1r, E1i = _mx_plan(n)
    spec = jnp.asarray(spec)
    # full Hermitian spectrum, then onto the (k1, k2) grid
    mid = jnp.conj(jnp.flip(spec[..., 1:-1], axis=-1))
    full = jnp.concatenate([spec, mid], axis=-1)          # (..., n)
    lead = full.shape[:-1]
    grid = jnp.swapaxes(full.reshape(lead + (n2, n1)), -1, -2)
    Gr = jnp.real(grid).astype(jnp.float32)
    Gi = jnp.imag(grid).astype(jnp.float32)
    Ar = (jnp.einsum("...Kb,bC->...KC", Gr, E2r, precision=_HI)
          - jnp.einsum("...Kb,bC->...KC", Gi, E2i, precision=_HI))
    Ai = (jnp.einsum("...Kb,bC->...KC", Gr, E2i, precision=_HI)
          + jnp.einsum("...Kb,bC->...KC", Gi, E2r, precision=_HI))
    Br = Ar * Tr + Ai * Ti
    Bi = Ai * Tr - Ar * Ti
    y = (jnp.einsum("Ja,...ab->...Jb", E1r, Br, precision=_HI)
         - jnp.einsum("Ja,...ab->...Jb", E1i, Bi, precision=_HI))
    return y.reshape(lead + (n,))


def _use_mx(x, n: int) -> bool:
    return (os.environ.get("ALGODSP_MXFFT", "auto") != "0"
            and jax.default_backend() == "tpu"
            and _MX_MIN_N <= n <= _MX_MAX_N
            and n % _MX_LANES == 0 and (n & (n - 1)) == 0
            and x.ndim >= 2 and int(np.prod(x.shape[:-1])) >= 8)


def rfft_batched(x, n: int):
    """rfft along the last axis: 4-step matmul FFT for the sizes/batches
    where the MXU wins on TPU, packing if opted in, else jnp.fft."""
    x = jnp.asarray(x)
    if x.dtype == jnp.float32 and _use_mx(x, n):
        return rfft_mx(x, n)
    if _use_packing(x):
        return rfft_packed(x, n)
    return jnp.fft.rfft(x, n)


def irfft_batched(spec, n: int):
    """irfft along the last axis; dispatch mirror of `rfft_batched`."""
    spec = jnp.asarray(spec)
    if spec.dtype == jnp.complex64 and _use_mx(spec, n):
        return irfft_mx(spec, n)
    if _use_packing(spec):
        return irfft_packed(spec, n)
    return irfft(spec, n)
