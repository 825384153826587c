"""Linear and circular convolution.

Capability parity with `dsp/conv/conv.go`: Direct (O(N*M) time-domain,
`conv.go:76-127`), DirectCircular (`conv.go:158-192`), Convolve with
automatic direct-vs-FFT selection at kernel length >= 32
(`conv.go:194-218`), and Full/Same/Valid output modes (`conv.go:56-69`).

TPU-first: the direct path is an XLA convolution (lands on the MXU for
large kernels); the FFT path is batched `jnp.fft.rfft` at the next
power of two. All ops broadcast over leading channel/batch dims of the
*signal*; the kernel is 1-D.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu.core.numeric import next_pow2
from algodsp_tpu.utils.fftjit import irfft
import functools

# Kernel length at which Convolve switches to FFT (conv.go:24-28).
FFT_THRESHOLD = 32

_MODES = ("full", "same", "valid")


def _trim_to_mode(full, len_a: int, len_b: int, mode: str):
    """Full/Same/Valid windowing of the full convolution (`conv.go:229-248`)."""
    if mode == "full":
        return full
    if mode == "same":
        start = (len_b - 1) // 2
        return full[..., start:start + len_a]
    if mode == "valid":
        n = max(len_a, len_b) - min(len_a, len_b) + 1
        start = min(len_a, len_b) - 1
        return full[..., start:start + n]
    raise ValueError(f"unknown mode {mode!r}; expected one of {_MODES}")


def direct(a, b, mode: str = "full"):
    """Time-domain linear convolution (`conv.go:76-127`).

    a: (..., N) signal; b: (M,) kernel. Output (..., N+M-1) for "full".
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b).reshape(-1).astype(a.dtype)
    n, m = a.shape[-1], b.shape[-1]
    if n == 0 or m == 0:
        raise ValueError("conv: empty input")
    batch = a.shape[:-1]
    ab = a.reshape((-1, 1, n))
    kern = b[::-1].reshape(1, 1, m)
    y = jax.lax.conv_general_dilated(
        ab, kern, window_strides=(1,), padding=[(m - 1, m - 1)],
        dimension_numbers=("NCH", "IOH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    full = y.reshape(batch + (n + m - 1,))
    return _trim_to_mode(full, n, m, mode)


def direct_circular(a, b):
    """Circular convolution of length N = len(a) (`conv.go:158-192`).

    b is zero-padded (or wrapped) to N.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b).reshape(-1).astype(a.dtype)
    n = a.shape[-1]
    m = b.shape[-1]
    if n == 0 or m == 0:
        raise ValueError("conv: empty input")
    full = direct(a, b, mode="full")
    # wrap the tail around
    head = full[..., :n]
    tail = full[..., n:]
    pad = (-tail.shape[-1]) % n
    if pad:
        tail = jnp.concatenate(
            [tail, jnp.zeros(tail.shape[:-1] + (pad,), tail.dtype)], axis=-1)
    wrapped = tail.reshape(tail.shape[:-1] + (-1, n)).sum(axis=-2)
    return head + wrapped


def fftconvolve(a, b, mode: str = "full"):
    """FFT linear convolution at next-pow2(N+M-1) (`overlap_add.go:221`-style
    one-shot, generalized).

    On TPU with f32 inputs and kernels >= 4096 taps this dispatches to
    the fused Pallas FDL kernel (`ops/fdlconv.py`) — the same output,
    ~2x faster, with the kernel spectra computed on device so traced
    kernels work (ALGODSP_FDL_FUSED=0 disables)."""
    import os
    import jax as _jax
    # The env var and backend key the jit cache so toggling
    # ALGODSP_FDL_FUSED re-dispatches instead of replaying the
    # first-seen path. This only holds for eager top-level calls: when
    # fftconvolve is traced inside an enclosing jax.jit, the value read
    # at trace time is baked into THAT caller's executable — callers
    # embedding it in their own jit must key their caches on the env
    # var themselves (as jit_method(env_keys=...) does).
    fused_env = (_jax.default_backend() == "tpu"
                 and os.environ.get("ALGODSP_FDL_FUSED", "auto") != "0")
    return _fftconvolve_jit(a, b, mode=mode, fused_env=fused_env)


@functools.partial(jax.jit, static_argnames=("mode", "fused_env"))
def _fftconvolve_jit(a, b, mode: str = "full", *, fused_env: bool = False):
    a = jnp.asarray(a)
    b = jnp.asarray(b).reshape(-1).astype(a.dtype)
    n, m = a.shape[-1], b.shape[-1]
    if n == 0 or m == 0:
        raise ValueError("conv: empty input")
    if m >= 4096 and a.dtype == jnp.float32 and fused_env:
        from algodsp_tpu.ops import fdlconv
        rows = int(np.prod(a.shape[:-1])) if a.ndim > 1 else 1
        B = fdlconv.pick_block(m, n, channels=rows)
        if B is not None:
            P = -(-m // B)
            total = n + m - 1
            padded = -(-total // B) * B
            flat = a.reshape((-1, n)) if a.ndim > 1 else a[None, :]
            flat = jnp.pad(flat, ((0, 0), (0, padded - n)))
            hg = fdlconv.kernel_spectra_jax(b, B, P)
            y = fdlconv.fdl_conv_fused(flat, hg, B)[..., :total]
            full = y.reshape(a.shape[:-1] + (total,)) if a.ndim > 1 \
                else y[0]
            return _trim_to_mode(full, n, m, mode)
    size = next_pow2(n + m - 1)
    fa = jnp.fft.rfft(a, size)
    fb = jnp.fft.rfft(b, size)
    full = irfft(fa * fb, size)[..., :n + m - 1].astype(a.dtype)
    return _trim_to_mode(full, n, m, mode)


def convolve(a, b, mode: str = "full"):
    """Auto-selecting convolution: direct for short kernels, FFT once the
    kernel reaches FFT_THRESHOLD taps (`conv.go:194-218`)."""
    b_arr = np.asarray(b) if not isinstance(b, jnp.ndarray) else b
    m = b_arr.reshape(-1).shape[-1]
    if m >= FFT_THRESHOLD:
        return fftconvolve(a, b, mode)
    return direct(a, b, mode)
