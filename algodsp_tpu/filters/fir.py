"""FIR filter runtime.

Capability parity with `dsp/filter/fir/filter.go`: streaming FIR with
state carry (the Go circular delay line `filter.go:36-59`), block
processing (`filter.go:61-105`), frequency response (`filter.go:179`).

TPU-first runtime: the per-sample delay-line walk becomes a causal
convolution evaluated either directly (XLA conv, good to a few hundred
taps) or by FFT overlap (delegates to `algodsp_tpu.conv`, best for long
kernels) — the analog of the reference's 32-tap SIMD threshold.
Streaming state is simply the last taps-1 input samples.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax


# above this tap count the FFT path beats direct MXU convolution
_FFT_TAPS = 64


def _causal_conv(x, h):
    """y[n] = sum_k h[k] x[n-k] over the last axis, zero initial history.

    x: (..., N); h: (T,). Direct XLA conv (MXU-friendly) for short
    kernels; FFT convolution for T > 64 (the long-kernel analog of the
    reference's 32-tap SIMD switch, `filter.go:61-105`).
    """
    t = h.shape[0]
    if t > _FFT_TAPS:
        from algodsp_tpu.conv import fftconvolve
        return fftconvolve(x, h, mode="full")[..., :x.shape[-1]]
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    xb = x.reshape((-1, 1, n))
    # flip kernel for convolution; pad left with T-1 zeros for causality
    kern = h[::-1].reshape((1, 1, t)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xb, kern, window_strides=(1,), padding=[(t - 1, 0)],
        dimension_numbers=("NCH", "IOH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    return y.reshape(batch_shape + (n,))


class FIRFilter:
    """FIR filter with one-shot and streaming processing."""

    def __init__(self, coeffs):
        self.coeffs = np.asarray(coeffs, dtype=np.float64).reshape(-1)
        if self.coeffs.size == 0:
            raise ValueError("fir: empty coefficients")

    @property
    def num_taps(self) -> int:
        return self.coeffs.size

    def process(self, x):
        """One-shot filtering from zero history (`filter.go:61-105`)."""
        x = jnp.asarray(x)
        h = jnp.asarray(self.coeffs, dtype=x.dtype)
        return _causal_conv(x, h)

    def init_state(self, batch_shape: tuple[int, ...] = (), dtype=jnp.float32):
        """History of the last taps-1 inputs (oldest first)."""
        return jnp.zeros(batch_shape + (max(self.num_taps - 1, 0),), dtype=dtype)

    def process_stream(self, state, x):
        """(state, x) -> (state, y) streaming blocks of any length."""
        x = jnp.asarray(x)
        h = jnp.asarray(self.coeffs, dtype=x.dtype)
        t = self.num_taps
        if t == 1:
            return state, x * h[0]
        ext = jnp.concatenate([state.astype(x.dtype), x], axis=-1)
        y = _causal_conv(ext, h)[..., t - 1:]
        new_state = ext[..., -(t - 1):]
        return new_state, y

    def frequency_response(self, freqs, sample_rate: float) -> np.ndarray:
        """Complex response H(e^{jw}) = sum h[k] e^{-jwk} (`filter.go:179`)."""
        f = np.atleast_1d(np.asarray(freqs, dtype=np.float64))
        w = 2.0 * np.pi * f / sample_rate
        k = np.arange(self.coeffs.size)
        return np.exp(-1j * np.outer(w, k)) @ self.coeffs
