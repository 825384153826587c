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

import os

import jax
import jax.numpy as jnp


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
    z = jnp.fft.ifft(full(s0) + 1j * full(s1), n)
    out = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-2)
    out = out.reshape(out.shape[:-3] + (-1, n))
    return out[..., :k, :]


def _use_packing(x) -> bool:
    return (os.environ.get("ALGODSP_PACKFFT", "0") == "1"
            and x.ndim >= 2 and x.shape[-2] >= 2)


def rfft_batched(x, n: int):
    """rfft along the last axis; packs row pairs on TPU."""
    x = jnp.asarray(x)
    if _use_packing(x):
        return rfft_packed(x, n)
    return jnp.fft.rfft(x, n)


def irfft_batched(spec, n: int):
    """irfft along the last axis; packs row pairs on TPU."""
    spec = jnp.asarray(spec)
    if _use_packing(spec):
        return irfft_packed(spec, n)
    return jnp.fft.irfft(spec, n)
