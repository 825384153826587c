"""Freeverb / Schroeder reverb.

Capability parity with `dsp/effects/reverb/reverb.go:5-200`: 8 parallel
feedback combs (damping one-pole in the loop, denormal squelch at
1e-23) + 4 serial allpasses, legacy 44.1 kHz tunings, fixed input gain
0.015, wet/dry/room-size/damp controls.

TPU design — blocked feedback processing: every feedback path runs
through a delay of >= 225 samples (shortest allpass), so a block of
B=128 consecutive samples never reads a value written inside the same
block.  That turns the per-sample recurrence into a per-block scan:

  * buffers run in shift-register layout (ring <-> linear conversion is
    two contiguous copies per call), so comb reads are pure slices and
    writes are concat-shifts — no TPU gather or scatter anywhere,
  * the in-loop damping one-pole -> an exact 128x128 lower-triangular
    Toeplitz matmul (db*da^(t-k)) plus a carry term da^(t+1)*fs0 — MXU
    work instead of 128 sequential VPU steps,
  * the 4 serial allpasses -> pure vector ops (no in-block recurrence).

~128x fewer sequential steps than the naive per-sample `lax.scan`
(`process_scan`, kept for parity testing).  Exact up to the denormal
squelch, which is applied per-block instead of per-sample: values the
reference would flush mid-recurrence differ by < 1e-23 (-460 dBFS).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...ops import ring

COMB_TUNINGS = (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)
ALLPASS_TUNINGS = (556, 441, 341, 225)
FIXED_GAIN = 0.015
_DENORMAL = 1e-23
_BLOCK = 128  # must be <= min(ALLPASS_TUNINGS)


class Freeverb:
    def __init__(self, *, wet: float = 0.22, dry: float = 1.0,
                 room_size: float = 0.72, damp: float = 0.45,
                 input_gain: float = FIXED_GAIN):
        self.input_gain = float(input_gain)
        self.wet = float(wet)
        self.dry = float(dry)
        self.room_size = float(room_size)
        self.damp = float(damp)
        # Freeverb scaling: feedback = roomsize (already scaled upstream
        # in the Go setter; legacy maps roomsize directly)
        self.comb_feedback = self.room_size
        self.allpass_feedback = 0.5
        # Blocked damping kernels (host float64):
        #   fs[t] = db*out[t] + da*fs[t-1]
        #   fs = out @ T^T + fs0 * p,  T[t,k] = db*da^(t-k) (t>=k),
        #   p[t] = da^(t+1)
        # At B=128 the dense Toeplitz matmul BEATS the log-depth affine
        # scan (measured 28.8 vs 52.0 ms on the 256-block streamed
        # bench): the matmul is one MXU pass while the scan is log2(B)
        # elementwise sweeps. The FDN (B=1024, where the matmul is 8x
        # more MACs/sample) makes the opposite choice.
        da, db = self.damp, 1.0 - self.damp
        t = np.arange(_BLOCK)
        lag = t[:, None] - t[None, :]
        self._damp_T = np.where(lag >= 0, db * da ** np.maximum(lag, 0), 0.0)
        self._damp_p = da ** (t + 1.0)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {
            "combs": [jnp.zeros(batch_shape + (n,), dtype) for n in COMB_TUNINGS],
            "filter_store": jnp.zeros(batch_shape + (len(COMB_TUNINGS),), dtype),
            "allpasses": [jnp.zeros(batch_shape + (n,), dtype)
                          for n in ALLPASS_TUNINGS],
            "step": jnp.zeros((), jnp.int32),
        }

    # ------------------------------------------------------------------
    # blocked path
    # ------------------------------------------------------------------
    def _block_step(self, carry, xb):
        """One 128-sample block; xb: (..., B).  Buffers are in
        shift-register layout (oldest first, newest last), so a comb of
        length D reads its D-lag output as the oldest B slots — a pure
        slice — and writes by concat-shifting.  No gather/scatter."""
        combs, fstore, allp, n0 = carry
        dtype = xb.dtype
        B = xb.shape[-1]
        fb = jnp.asarray(self.comb_feedback, dtype)
        apfb = jnp.asarray(self.allpass_feedback, dtype)

        T = jnp.asarray(self._damp_T, dtype)
        p = jnp.asarray(self._damp_p, dtype)
        inp = jnp.asarray(self.input_gain, dtype) * xb
        out = jnp.stack([c[..., :B] for c in combs], axis=-2)      # (...,8,B)
        # damping one-pole, blocked-exact (see constructor note on the
        # Toeplitz-vs-affine-scan choice at this block size)
        fs = (jnp.einsum("...ck,tk->...ct", out, T,
                         precision=jax.lax.Precision.HIGHEST)
              + fstore[..., None] * p)
        fs = jnp.where(jnp.abs(fs) < _DENORMAL, 0.0, fs)
        wr = inp[..., None, :] + fs * fb                           # (...,8,B)
        new_combs = [jnp.concatenate([combs[i][..., B:], wr[..., i, :]], axis=-1)
                     for i in range(len(COMB_TUNINGS))]
        acc = jnp.sum(out, axis=-2)
        # serial allpasses: delay >= 225 >= B, so in-block reads hit
        # previous blocks only -> pure vector ops
        new_allp = []
        for j, A in enumerate(ALLPASS_TUNINGS):
            buf_out = allp[j][..., :B]
            new_allp.append(jnp.concatenate(
                [allp[j][..., B:], acc + buf_out * apfb], axis=-1))
            acc = buf_out - acc
        y = acc * self.wet + xb * self.dry
        return (new_combs, fs[..., :, -1], new_allp, n0 + B), y

    # ------------------------------------------------------------------
    # per-sample reference path (reverb.go:118-166 order of operations)
    # ------------------------------------------------------------------
    def _sample_scan(self, carry, xs):
        damp_a = jnp.asarray(self.damp, xs.dtype)
        damp_b = jnp.asarray(1.0 - self.damp, xs.dtype)
        fb = jnp.asarray(self.comb_feedback, xs.dtype)
        apfb = jnp.asarray(self.allpass_feedback, xs.dtype)

        def step(carry, xv):
            combs, fstore, allp, n = carry
            inp = jnp.asarray(self.input_gain, xs.dtype) * xv
            acc = jnp.zeros_like(xv)
            new_combs = []
            new_fstore = []
            for i, size in enumerate(COMB_TUNINGS):
                idx = jnp.mod(n, size)
                out = combs[i][..., idx]
                fs = out * damp_b + fstore[..., i] * damp_a
                fs = jnp.where(jnp.abs(fs) < _DENORMAL, 0.0, fs)
                new_combs.append(combs[i].at[..., idx].set(inp + fs * fb))
                new_fstore.append(fs)
                acc = acc + out
            new_allp = []
            for i, size in enumerate(ALLPASS_TUNINGS):
                idx = jnp.mod(n, size)
                buf_out = allp[i][..., idx]
                out = buf_out - acc
                new_allp.append(allp[i].at[..., idx].set(acc + buf_out * apfb))
                acc = out
            y = acc * self.wet + xv * self.dry
            return (new_combs, jnp.stack(new_fstore, axis=-1), new_allp, n + 1), y

        return jax.lax.scan(step, carry, xs)

    def process(self, state, x):
        """(state, x:(..., N)) -> (state, y).  Full 128-sample blocks run
        the blocked path; any tail runs the per-sample scan."""
        x = jnp.asarray(x)
        n = x.shape[-1]
        nb, rem = divmod(n, _BLOCK)
        carry = (state["combs"], state["filter_store"], state["allpasses"],
                 state["step"])
        ys = []
        if nb:
            # ring -> shift-register layout (contiguous copies), run
            # the blocked scan, convert back for state compatibility
            step0 = state["step"]
            combs, fstore, allp, _ = carry
            combs = [ring.ring_to_linear(c, step0) for c in combs]
            allp = [ring.ring_to_linear(a, step0) for a in allp]
            carry = (combs, fstore, allp, step0)
            xb = jnp.moveaxis(
                x[..., :nb * _BLOCK].reshape(x.shape[:-1] + (nb, _BLOCK)),
                -2, 0)                                   # (nb, ..., B)
            carry, yb = jax.lax.scan(self._block_step, carry, xb)
            combs, fstore, allp, step1 = carry
            combs = [ring.linear_to_ring(c, step1) for c in combs]
            allp = [ring.linear_to_ring(a, step1) for a in allp]
            carry = (combs, fstore, allp, step1)
            ys.append(jnp.moveaxis(yb, 0, -2).reshape(x.shape[:-1] + (nb * _BLOCK,)))
        if rem:
            xs = jnp.moveaxis(x[..., nb * _BLOCK:], -1, 0)
            carry, yt = self._sample_scan(carry, xs)
            ys.append(jnp.moveaxis(yt, 0, -1))
        combs, fstore, allp, step = carry
        new_state = {"combs": combs, "filter_store": fstore,
                     "allpasses": allp, "step": step}
        y = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=-1)
        return new_state, y

    def process_blocks(self, state, x, *, block_size: int | None = None):
        """Streamed multi-block processing in ONE scan — Freeverb's
        `scan_blocks` specialization (same pattern as
        `FDNReverb.process_blocks`): the twelve ring<->linear layout
        conversions happen once per RUN instead of once per outer
        block. Same per-block algebra, same floats (asserted in
        tests/test_reverb.py). N must be a multiple of the internal
        128-sample block; `block_size` is validated against that."""
        x = jnp.asarray(x)
        n = x.shape[-1]
        if block_size is not None and block_size % _BLOCK:
            raise ValueError(
                f"freeverb process_blocks: block_size {block_size} must "
                f"be a multiple of the internal block {_BLOCK}")
        if n % _BLOCK:
            from algodsp_tpu.streaming import scan_blocks
            return scan_blocks(self.process, state, x,
                               block_size=block_size or n)
        nb = n // _BLOCK
        step0 = state["step"]
        combs = [ring.ring_to_linear(c, step0) for c in state["combs"]]
        allp = [ring.ring_to_linear(a, step0) for a in state["allpasses"]]
        carry = (combs, state["filter_store"], allp, step0)
        xb = jnp.moveaxis(x.reshape(x.shape[:-1] + (nb, _BLOCK)), -2, 0)
        carry, yb = jax.lax.scan(self._block_step, carry, xb)
        combs, fstore, allp, step1 = carry
        return ({"combs": [ring.linear_to_ring(c, step1) for c in combs],
                 "filter_store": fstore,
                 "allpasses": [ring.linear_to_ring(a, step1) for a in allp],
                 "step": step1},
                jnp.moveaxis(yb, 0, -2).reshape(x.shape[:-1] + (n,)))

    def process_scan(self, state, x):
        """Per-sample reference implementation (kept for parity tests)."""
        x = jnp.asarray(x)
        carry = (state["combs"], state["filter_store"], state["allpasses"],
                 state["step"])
        carry, ys = self._sample_scan(carry, jnp.moveaxis(x, -1, 0))
        combs, fstore, allp, step = carry
        return ({"combs": combs, "filter_store": fstore,
                 "allpasses": allp, "step": step}, jnp.moveaxis(ys, 0, -1))
