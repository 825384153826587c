"""Overlap-add / overlap-save FFT block convolution with streaming state.

Capability parity with `dsp/conv/overlap_add.go`, `overlap_save.go`, and
the streaming convolvers (`streaming*.go`): fixed-configuration block
convolvers carrying history across calls, plus one-shot conveniences.

TPU-first: a whole multi-hop input block is framed into (K, fft) hops
and processed with one batched rfft / bin-multiply / irfft — XLA batches
the FFTs and fuses the bin products; the Go per-hop loop disappears.
Streaming state is the raw input history (overlap-save: kernel_len-1
samples; overlap-add: fft-size output tail), explicit and shardable.
"""

from __future__ import annotations

import functools as _functools

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.core.numeric import next_pow2
from algodsp_tpu.utils.fftjit import irfft
from algodsp_tpu.utils.jitwrap import jit_method


def _frame(x, frame_len: int, hop: int, n_frames: int):
    """Gather (..., n_frames, frame_len) sliding frames from (..., T)."""
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(frame_len)[None, :])  # (K, frame)
    return jnp.take(x, idx, axis=-1)


class OverlapSave:
    """Overlap-save convolver (`overlap_save.go:32-257`).

    fft_size must be a power of two > kernel length. Step size =
    fft_size - kernel_len + 1; each hop keeps the last fft-step output
    samples (discarding the wrap-around prefix).
    """

    def __init__(self, kernel, fft_size: int | None = None):
        self.kernel = np.asarray(kernel, dtype=np.float64).reshape(-1)
        m = self.kernel.size
        if m == 0:
            raise ValueError("overlap-save: empty kernel")
        if fft_size is None:
            fft_size = max(next_pow2(4 * m), 64)
        if fft_size < next_pow2(m + 1) or fft_size & (fft_size - 1):
            raise ValueError(
                f"overlap-save: fft_size {fft_size} must be a power of two > kernel {m}")
        self.fft_size = int(fft_size)
        self.step = self.fft_size - m + 1
        self._kfft = np.fft.rfft(self.kernel, self.fft_size)

    @property
    def kernel_len(self) -> int:
        return self.kernel.size

    def init_state(self, batch_shape: tuple[int, ...] = (), dtype=jnp.float32):
        """History = previous kernel_len-1 input samples (`overlap_save.go:47`)."""
        return jnp.zeros(batch_shape + (self.kernel_len - 1,), dtype=dtype)

    @jit_method
    def process_stream(self, state, x):
        """(state, x) -> (state, y): y is the causal convolution segment
        aligned with x (length = len(x))."""
        x = jnp.asarray(x)
        n = x.shape[-1]
        m = self.kernel_len
        ext = jnp.concatenate([state.astype(x.dtype), x], axis=-1)
        pad = (-n) % self.step
        ext_p = jnp.concatenate(
            [ext, jnp.zeros(ext.shape[:-1] + (pad,), x.dtype)], axis=-1) if pad else ext
        k = (n + pad) // self.step
        frames = _frame(ext_p, self.fft_size, self.step, k)
        spec = jnp.fft.rfft(frames, self.fft_size)
        spec = spec * jnp.asarray(self._kfft, spec.dtype)
        out = irfft(spec, self.fft_size)[..., m - 1:].astype(x.dtype)
        y = out.reshape(out.shape[:-2] + (k * self.step,))[..., :n]
        new_state = ext[..., -(m - 1):] if m > 1 else ext[..., :0]
        return new_state, y

    def process(self, x):
        """One-shot from zero history."""
        x = jnp.asarray(x)
        state = self.init_state(x.shape[:-1], x.dtype)
        _, y = self.process_stream(state, x)
        return y


class OverlapAdd:
    """Overlap-add convolver (`overlap_add.go:24-185`).

    Splits input into blocks of block_size, convolves each with the
    kernel at fft_size = next_pow2(block+kernel-1), overlap-adds tails.
    Streaming state = the pending output tail (kernel_len-1 samples).
    """

    def __init__(self, kernel, block_size: int):
        self.kernel = np.asarray(kernel, dtype=np.float64).reshape(-1)
        if self.kernel.size == 0:
            raise ValueError("overlap-add: empty kernel")
        if block_size <= 0:
            raise ValueError("overlap-add: block size must be > 0")
        self.block_size = int(block_size)
        self.fft_size = next_pow2(self.block_size + self.kernel.size - 1)
        self._kfft = np.fft.rfft(self.kernel, self.fft_size)

    @property
    def kernel_len(self) -> int:
        return self.kernel.size

    def init_state(self, batch_shape: tuple[int, ...] = (), dtype=jnp.float32):
        return jnp.zeros(batch_shape + (max(self.kernel_len - 1, 1),), dtype=dtype)

    @jit_method
    def process_stream(self, state, x):
        """(state, x) -> (state, y). len(x) must be a multiple of
        block_size; y aligns with x (causal convolution segment)."""
        x = jnp.asarray(x)
        n = x.shape[-1]
        b = self.block_size
        if n % b:
            raise ValueError(f"overlap-add: input length {n} not a multiple of block {b}")
        k = n // b
        tail_len = state.shape[-1]
        blocks = x.reshape(x.shape[:-1] + (k, b))
        spec = jnp.fft.rfft(blocks, self.fft_size)
        conv = irfft(spec * jnp.asarray(self._kfft, spec.dtype),
                             self.fft_size)[..., :b + tail_len].astype(x.dtype)
        # overlap-add the tails sequentially across blocks: the tail of
        # block i lands in blocks i+1... — with tail <= block this is a
        # shifted add; longer tails fold over multiple following blocks.
        head = conv[..., :b]
        tails = conv[..., b:]
        # scatter tails into a (k*b + tail) timeline
        y_len = k * b + tail_len
        base = jnp.zeros(x.shape[:-1] + (y_len,), x.dtype)
        starts = jnp.arange(k) * b
        idx_head = starts[:, None] + jnp.arange(b)[None, :]
        idx_tail = starts[:, None] + b + jnp.arange(tail_len)[None, :]
        flat_idx = jnp.concatenate([idx_head, idx_tail], axis=-1).reshape(-1)
        flat_val = jnp.concatenate([head, tails], axis=-1).reshape(
            x.shape[:-1] + (-1,))
        y_full = base.at[..., flat_idx].add(flat_val)
        y_full = y_full.at[..., :tail_len].add(state.astype(x.dtype))
        y = y_full[..., :n]
        new_state = y_full[..., n:]
        return new_state, y

    def process(self, x):
        x = jnp.asarray(x)
        state = self.init_state(x.shape[:-1], x.dtype)
        _, y = self.process_stream(state, x)
        return y


# One-shot conveniences reuse convolver instances per (kernel, size) —
# the analog of the reference's per-FFT-size sync.Pool
# (`overlap_add.go:190,221`). Without this, each eager call would pay a
# fresh trace+compile (the jit cache hangs off the instance).
@_functools.lru_cache(maxsize=32)
def _oa_cached(kernel_bytes: bytes, block_size: int) -> "OverlapAdd":
    # .copy(): frombuffer views are read-only; cached instances must
    # behave identically to directly-constructed ones
    return OverlapAdd(
        np.frombuffer(kernel_bytes, np.float64).copy(), block_size)


@_functools.lru_cache(maxsize=32)
def _ols_cached(kernel_bytes: bytes, fft_size: int | None) -> "OverlapSave":
    return OverlapSave(
        np.frombuffer(kernel_bytes, np.float64).copy(), fft_size)


def overlap_add_convolve(signal, kernel, block_size: int | None = None):
    """One-shot OA convolution, full length N+M-1 (`overlap_add.go:221-254`)."""
    signal = jnp.asarray(signal)
    kernel = np.asarray(kernel, dtype=np.float64).reshape(-1)
    if block_size is None:
        block_size = max(next_pow2(kernel.size), 64)
    oa = _oa_cached(kernel.tobytes(), int(block_size))
    n = signal.shape[-1]
    m = kernel.size
    pad = (-n) % block_size + block_size  # room for the tail
    xp = jnp.concatenate(
        [signal, jnp.zeros(signal.shape[:-1] + (pad,), signal.dtype)], axis=-1)
    y = oa.process(xp)
    return y[..., :n + m - 1]


def overlap_save_convolve(signal, kernel, fft_size: int | None = None):
    """One-shot OLS convolution, full length N+M-1 (`overlap_save.go:313-343`)."""
    signal = jnp.asarray(signal)
    kernel = np.asarray(kernel, dtype=np.float64).reshape(-1)
    osv = _ols_cached(kernel.tobytes(),
                      None if fft_size is None else int(fft_size))
    n = signal.shape[-1]
    m = kernel.size
    xp = jnp.concatenate(
        [signal, jnp.zeros(signal.shape[:-1] + (m - 1,), signal.dtype)], axis=-1)
    y = osv.process(xp)
    return y[..., :n + m - 1]
