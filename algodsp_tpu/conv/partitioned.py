"""Partitioned convolution for long impulse responses (conv reverb).

Capability parity with `dsp/conv/partitioned.go` (UPOLA): fixed
latency of 2^min_block_order samples with arbitrarily long IRs, float32
and float64, streaming `process_block`, `latency` accessor.

TPU-first deviation (per SURVEY.md §7/M2): the reference uses
*non-uniform* partitions (exponentially growing, modulo-scheduled) to
bound per-block CPU cost. On TPU the frequency-domain MACs of a
*uniform* partitioning collapse into one batched complex matmul over
the frequency-domain delay line (FDL) — an MXU-shaped contraction —
so uniform partitioning is both simpler and faster here. The public
contract (latency = 2^min_block_order, streaming exactness) is
preserved; only the internal schedule differs.

State per channel: FDL of (P, fft/2+1) complex spectra + input tail.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu.ops import fdlconv
from algodsp_tpu.ops.packfft import rfft_batched, irfft_batched
from algodsp_tpu.utils.fftjit import irfft
from algodsp_tpu.utils.jitwrap import jit_method


class PartitionedConvolver:
    """Uniformly partitioned frequency-domain delay-line convolver."""

    def __init__(self, kernel, min_block_order: int,
                 max_block_order: int | None = None):
        kernel = np.asarray(kernel, dtype=np.float64).reshape(-1)
        if kernel.size == 0:
            raise ValueError("partitioned: empty impulse response")
        if min_block_order < 1:
            raise ValueError(
                f"partitioned: min_block_order must be >= 1, got {min_block_order}")
        if max_block_order is not None and max_block_order < min_block_order:
            raise ValueError("partitioned: max_block_order < min_block_order")
        self.block = 1 << min_block_order
        self.min_block_order = min_block_order
        self.kernel_len = kernel.size
        self.num_parts = -(-kernel.size // self.block)
        padded = np.zeros(self.num_parts * self.block)
        padded[:kernel.size] = kernel
        parts = padded.reshape(self.num_parts, self.block)
        # spectra of each partition at 2*block (50% overlap-save frames)
        self.fft_size = 2 * self.block
        self._part_spectra = np.fft.rfft(parts, self.fft_size, axis=-1)  # (P, F)
        self._kernel_f32 = kernel.astype(np.float64)
        self._fused_spectra_cache: dict[int, np.ndarray] = {}

    @property
    def kernel(self) -> np.ndarray:
        """The float64 impulse response this convolver applies
        (`KernelLen` analog, `partitioned.go:410`)."""
        return self._kernel_f32

    @property
    def latency(self) -> int:
        """Algorithmic latency contract (`partitioned.go:410`): outputs
        are exact causal convolution; block granularity = 2^order."""
        return self.block

    def init_state(self, batch_shape: tuple[int, ...] = (), dtype=jnp.float32):
        # The FDL is stored as (re, im) float pairs rather than complex:
        # some TPU runtimes (axon) cannot materialize complex zeros via
        # lax.full, and real state also shards/serializes more cleanly.
        fdl = jnp.zeros(batch_shape + (self.num_parts, self.fft_size // 2 + 1, 2),
                        dtype=dtype)
        tail = jnp.zeros(batch_shape + (self.block,), dtype=dtype)
        return {"fdl": fdl, "tail": tail}

    @jit_method
    def process_block(self, state, x):
        """Process exactly one block of `self.block` samples.

        (state, x:(..., B)) -> (state, y:(..., B)) with y the exact
        causal convolution continuation.
        """
        x = jnp.asarray(x)
        if x.shape[-1] != self.block:
            raise ValueError(
                f"partitioned: block must be {self.block} samples, got {x.shape[-1]}")
        frame = jnp.concatenate([state["tail"].astype(x.dtype), x], axis=-1)
        spec = jnp.fft.rfft(frame, self.fft_size)  # (..., F) complex
        new_head = jnp.stack([jnp.real(spec), jnp.imag(spec)],
                             axis=-1)[..., None, :, :]  # (..., 1, F, 2)
        fdl = jnp.concatenate([new_head, state["fdl"][..., :-1, :, :]], axis=-3)
        kre = jnp.asarray(np.real(self._part_spectra), x.dtype)  # (P, F)
        kim = jnp.asarray(np.imag(self._part_spectra), x.dtype)
        fre = fdl[..., 0]
        fim = fdl[..., 1]
        # batched complex MAC over partitions, in real arithmetic
        acc_re = jnp.sum(fre * kre - fim * kim, axis=-2)
        acc_im = jnp.sum(fre * kim + fim * kre, axis=-2)
        acc = jax.lax.complex(acc_re, acc_im)
        y = irfft(acc, self.fft_size)[..., self.block:].astype(x.dtype)
        return {"fdl": fdl, "tail": x}, y

    @jit_method(env_keys=("ALGODSP_FDL_FUSED",))
    def process_stream(self, state, x):
        """Streaming continuation over any multiple of the block size.

        Exact same semantics as calling `process_block` per block, but
        the whole call runs as vector algebra: the FDL recurrence
        Y[b] = sum_p H[p] * X[b-p] is a P-tap FIR along the BLOCK axis,
        evaluated as one depthwise convolution (per-frequency kernels)
        instead of P-deep sequential FDL shifts. 64ch x 2^17 drops from
        ~78 ms (block scan) to ~15 ms on a v5e chip, matching the bulk
        one-shot path while preserving exact streaming state.
        """
        x = jnp.asarray(x)
        n = x.shape[-1]
        B, P, F = self.block, self.num_parts, self.fft_size // 2 + 1
        if n % B:
            raise ValueError(
                f"partitioned: length {n} not a multiple of block {B}")
        # Long-IR fast path: the FDL state spans P*B >= kernel_len input
        # samples, so an exact continuation equals a ZERO-STATE bulk
        # convolution over [recovered history || x] with the first P*B
        # outputs discarded — which rides the fused Pallas kernel.
        # Engaged when the bulk recompute overhead is bounded (n >= P*B).
        mode = os.environ.get("ALGODSP_FDL_FUSED", "auto")
        batch_rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        # wide batches keep the depthwise path unless the call is long
        # enough to amortize the P*B-sample history recompute (measured
        # v5e crossovers: 8ch 22.6 -> 5.6 ms at n=P*B; 64ch ties at
        # n=P*B and wins from 2*P*B up — 23.8 vs 28.3 ms at 2^18)
        if (P >= 16 and n >= P * B and x.dtype == jnp.float32
                and (batch_rows < 32 or n >= 2 * P * B)
                and (mode == "1" or (mode != "0" and
                                     jax.default_backend() == "tpu"))):
            return self._process_stream_rehistory(state, x)
        k = n // B
        batch = x.shape[:-1]
        ext = jnp.concatenate([state["tail"].astype(x.dtype), x], axis=-1)
        frames = jnp.concatenate(
            [ext[..., :-B].reshape(batch + (k, B)),
             ext[..., B:].reshape(batch + (k, B))], axis=-1)   # (..., k, 2B)
        spec = rfft_batched(frames, self.fft_size)             # (..., k, F)
        X = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        past = jnp.flip(state["fdl"][..., :P - 1, :, :], axis=-3)
        seq = jnp.concatenate([past.astype(x.dtype), X], axis=-3)  # (...,k+P-1,F,2)

        kre = jnp.asarray(np.real(self._part_spectra), x.dtype)    # (P, F)
        kim = jnp.asarray(np.imag(self._part_spectra), x.dtype)

        def dconv(a, kern):
            """Depthwise P-tap FIR along the block axis.
            a: (..., W, F); kern: (P, F) newest-tap-first per frequency."""
            W = a.shape[-2]
            lhs = jnp.moveaxis(a, -1, -2).reshape((-1, F, W))  # (N, F, W)
            rhs = kern.T[:, None, ::-1]                        # (F, 1, P)
            out = jax.lax.conv_general_dilated(
                lhs, rhs, window_strides=(1,), padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                feature_group_count=F,
                precision=jax.lax.Precision.HIGHEST)           # (N, F, k)
            return jnp.moveaxis(out.reshape(batch + (F, k)), -2, -1)

        sre, sim = seq[..., 0], seq[..., 1]
        acc_re = dconv(sre, kre) - dconv(sim, kim)
        acc_im = dconv(sre, kim) + dconv(sim, kre)
        acc = jax.lax.complex(acc_re, acc_im)                  # (..., k, F)
        y = irfft_batched(acc, self.fft_size)[..., B:].astype(x.dtype)
        y = y.reshape(batch + (n,))

        new_fdl = jnp.flip(seq[..., -P:, :, :], axis=-3).astype(state["fdl"].dtype)
        return {"fdl": new_fdl, "tail": x[..., -B:]}, y

    def _process_stream_rehistory(self, state, x):
        """Streaming continuation as a zero-state bulk call.

        The state's FDL holds the spectra of the last P frames, whose
        kept halves are exactly the last P*B input samples — at least
        one kernel span. Since no older sample can reach the output,
        conv([history || x])[P*B:] IS the exact continuation. History
        is recovered by one batched irfft; the new state re-frames the
        combined signal's last P frames with one batched rfft."""
        B, P = self.block, self.num_parts
        batch = x.shape[:-1]
        spec = jax.lax.complex(state["fdl"][..., 0], state["fdl"][..., 1])
        frames = irfft(spec, self.fft_size)        # (..., P, 2B)
        # fdl index 0 = newest frame; kept half = that block's samples
        hist = jnp.flip(frames[..., B:], axis=-2).reshape(
            batch + (P * B,)).astype(x.dtype)              # oldest first
        combined = jnp.concatenate([hist, x], axis=-1)
        y = self.process(combined)[..., P * B:]
        # rebuild the FDL state from the last (P+1) blocks
        seg = combined[..., -(P + 1) * B:]
        new_frames = jnp.stack(
            [seg[..., (P - 1 - i) * B:(P + 1 - i) * B] for i in range(P)],
            axis=-2)                                       # newest first
        new_spec = rfft_batched(new_frames, self.fft_size)
        new_fdl = jnp.stack([jnp.real(new_spec), jnp.imag(new_spec)],
                            axis=-1).astype(state["fdl"].dtype)
        return {"fdl": new_fdl, "tail": x[..., -B:]}, y

    def _bulk_spectra(self, block_order: int) -> np.ndarray:
        """Partition spectra at an internal bulk block size (cached).

        The output of the FDL recurrence is the exact convolution for
        ANY partition size, so bulk one-shot calls are free to pick the
        partitioning that maps best onto the chip, independent of the
        latency-contract block."""
        if not hasattr(self, "_bulk_cache"):
            self._bulk_cache = {}
        if block_order not in self._bulk_cache:
            b = 1 << block_order
            parts = -(-self.kernel_len // b)
            padded = np.zeros(parts * b)
            padded[:self.kernel_len] = self._kernel_f32
            self._bulk_cache[block_order] = np.fft.rfft(
                padded.reshape(parts, b), 2 * b, axis=-1)
        return self._bulk_cache[block_order]

    @jit_method(env_keys=("ALGODSP_FDL_FUSED",))
    def process(self, x, *, bulk_block_order: int | None = None):
        """One-shot convolution over a whole buffer (zero initial state).

        Identical output to running the FDL block recurrence from a
        fresh state. Formulation is chosen for the chip: few-channel
        inputs route through the batched FDL path with a larger internal
        partition (FFT batch = channels x blocks fills the TPU; a
        batch-8 2^18-point FFT is latency-bound), wide batches use one
        large FFT. ~4x faster at 8 channels than the big-FFT path.
        Length must be a multiple of the block size (latency contract).
        """
        x = jnp.asarray(x)
        n = x.shape[-1]
        if n % self.block:
            raise ValueError(
                f"partitioned: length {n} not a multiple of block {self.block}")
        batch_rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        if bulk_block_order is None:
            import jax as _jax
            # the fused Pallas FDL (ops/fdlconv.py) beats the big-FFT
            # path at every batch size (64ch x 2^17: 6.6 vs 13.1 ms on
            # v5e); wide batches route to it only when it can engage
            fused_ok = (x.dtype == jnp.float32 and
                        os.environ.get("ALGODSP_FDL_FUSED", "auto") != "0")
            use_fdl = (_jax.default_backend() == "tpu"
                       and self.kernel_len >= 4096
                       and (batch_rows < 32 or fused_ok))
            if use_fdl:
                # pick the partition size that keeps FFT batch >= ~512
                # rows while partitions stay >= 8
                bo = self.min_block_order
                # 2^13 measured fastest on v5e; any shape admitting a
                # larger order also admits 2^13, so descend from there
                cands = [c for c in (13, 12, 11, 10)
                         if c >= self.min_block_order]
                cands += [c for c in range(9, self.min_block_order - 1, -1)]
                for cand in cands:
                    bsz = 1 << cand
                    if n % bsz == 0 and self.kernel_len // bsz >= 4 \
                            and batch_rows * (n // bsz) >= 256 \
                            and (batch_rows < 32 or fdlconv.supported(
                                bsz, -(-self.kernel_len // bsz), n,
                                channels=batch_rows)):
                        bo = cand
                        break
                bulk_block_order = bo
            else:
                bulk_block_order = 0  # big-FFT path
        if bulk_block_order:
            return self._process_bulk_fdl(x, bulk_block_order)
        from algodsp_tpu.core.numeric import next_pow2
        size = next_pow2(n + self.kernel_len - 1)
        xf = rfft_batched(x, size) if x.ndim > 1 else jnp.fft.rfft(x, size)
        kf = jnp.fft.rfft(jnp.asarray(self._kernel_f32, x.dtype), size)
        y = xf * kf
        y = irfft_batched(y, size) if x.ndim > 1 else irfft(y, size)
        return y[..., :n].astype(x.dtype)

    def _process_bulk_fdl(self, x, block_order: int):
        """Zero-state FDL evaluation at an arbitrary internal partition
        size: 50%-overlap frames -> rfft -> P-tap depthwise FIR along
        the block axis -> irfft, same algebra as `process_stream`.

        On TPU with f32 inputs this dispatches to the fused Pallas
        kernel (`ops/fdlconv.py`): FFT + spectral MAC + iFFT in one
        VMEM-resident pass, ~2.4x the XLA formulation below. Set
        ALGODSP_FDL_FUSED=0 to force the XLA path (=1 forces the
        kernel, interpreted off-TPU — used by equivalence tests)."""
        n = x.shape[-1]
        B = 1 << block_order
        if n % B:
            raise ValueError(
                f"partitioned: bulk length {n} not a multiple of 2^{block_order}")
        mode = os.environ.get("ALGODSP_FDL_FUSED", "auto")
        use_fused = (mode == "1" or
                     (mode != "0" and jax.default_backend() == "tpu"))
        if use_fused and x.dtype == jnp.float32:
            P = -(-self.kernel_len // B)
            batch_rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
            if fdlconv.supported(B, P, n, channels=batch_rows):
                hgrid = self._fused_spectra_cache.get(block_order)
                if hgrid is None:
                    hgrid = fdlconv.kernel_spectra(self._kernel_f32, B)
                    self._fused_spectra_cache[block_order] = hgrid
                batch = x.shape[:-1]
                flat = x.reshape((-1, n))
                y = fdlconv.fdl_conv_fused(flat, hgrid, B)
                return y.reshape(batch + (n,))
        spectra = self._bulk_spectra(block_order)
        P = spectra.shape[0]
        F = B + 1
        k = n // B
        batch = x.shape[:-1]
        ext = jnp.concatenate(
            [jnp.zeros(batch + (B,), x.dtype), x], axis=-1)
        frames = jnp.concatenate(
            [ext[..., :-B].reshape(batch + (k, B)),
             ext[..., B:].reshape(batch + (k, B))], axis=-1)
        spec = rfft_batched(frames, 2 * B)                     # (..., k, F)
        X = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        pad = jnp.zeros(batch + (P - 1, F, 2), x.dtype)
        seq = jnp.concatenate([pad, X], axis=-3)

        kre = jnp.asarray(np.real(spectra), x.dtype)           # (P, F)
        kim = jnp.asarray(np.imag(spectra), x.dtype)

        def dconv(a, kern):
            W = a.shape[-2]
            lhs = jnp.moveaxis(a, -1, -2).reshape((-1, F, W))
            rhs = kern.T[:, None, ::-1]
            out = jax.lax.conv_general_dilated(
                lhs, rhs, window_strides=(1,), padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                feature_group_count=F,
                precision=jax.lax.Precision.HIGHEST)
            return jnp.moveaxis(out.reshape(batch + (F, k)), -2, -1)

        sre, sim = seq[..., 0], seq[..., 1]
        acc_re = dconv(sre, kre) - dconv(sim, kim)
        acc_im = dconv(sre, kim) + dconv(sim, kre)
        acc = jax.lax.complex(acc_re, acc_im)
        y = irfft_batched(acc, 2 * B)[..., B:].astype(x.dtype)
        return y.reshape(batch + (n,))

    def process_scan(self, x):
        """Block-recurrence path (the exact streaming semantics); used by
        equivalence tests and as the reference for `process_block`."""
        x = jnp.asarray(x)
        n = x.shape[-1]
        if n % self.block:
            raise ValueError(
                f"partitioned: length {n} not a multiple of block {self.block}")
        k = n // self.block
        state = self.init_state(x.shape[:-1], x.dtype)
        blocks = jnp.moveaxis(
            x.reshape(x.shape[:-1] + (k, self.block)), -2, 0)

        def step(st, blk):
            st, y = self.process_block(st, blk)
            return st, y

        _, ys = jax.lax.scan(step, state, blocks)
        return jnp.moveaxis(ys, 0, -2).reshape(x.shape[:-1] + (n,))
