"""Feedback delay network reverb.

Capability parity with `dsp/effects/reverb/fdn_reverb.go:9-330`: 8
delay lines (prime-ish 44.1k tunings scaled to the sample rate), 8x8
Hadamard feedback matrix (1/sqrt(8) scaled), RT60-derived per-line
feedback gains 10^(-3*delay_sec/rt60), one-pole damping in the loop,
sinusoidal per-line delay modulation with 2*pi*i/8 phase offsets, and
fractional pre-delay.

TPU design — blocked feedback processing: every feedback read lags by
at least the shortest line delay (1537 samples at 44.1 kHz, scaled), so
a block of B samples never reads a value written inside the same
block.  Per block: each line's modulated fractional read is ONE
contiguous dynamic slice plus a few static in-window shifts, the
Hadamard mix an 8x8 matmul over the whole block, and the in-loop
damping one-pole a single-array Hillis-Steele scan with precomputed
scalar sweep weights (`_damp_block`).  The pre-delay is a pure input
delay (no feedback), so it is applied to the whole call vectorized,
outside the scan.  ~B fewer sequential steps than the per-sample
`lax.scan` (`process_scan`, kept for parity testing); results are
exact.  `process_blocks` streams many blocks in one scan with a single
ring<->linear layout conversion — the form the streamed bench row runs
(497 -> 882 Msamples/s at 64ch x 2048 x 256 on a v5e chip).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ...ops import ring

FDN_SIZE = 8
_DELAYS_441 = np.array([1537, 1753, 1999, 2251, 2473, 2689, 2851, 3067],
                       dtype=np.float64)
_REF_SR = 44100.0


def _hadamard8() -> np.ndarray:
    h = np.array([[1.0]])
    for _ in range(3):
        h = np.block([[h, h], [h, -h]])
    return h


class FDNReverb:
    def __init__(self, sample_rate: float, *, wet: float = 0.2, dry: float = 1.0,
                 rt60_seconds: float = 1.8, damp: float = 0.3,
                 pre_delay_seconds: float = 0.01,
                 mod_depth_seconds: float = 0.002, mod_rate_hz: float = 0.1):
        if sample_rate <= 0 or not math.isfinite(sample_rate):
            raise ValueError(f"fdn reverb sample rate must be > 0: {sample_rate}")
        if wet < 0 or dry < 0:
            raise ValueError("fdn reverb wet/dry must be >= 0")
        if rt60_seconds <= 0:
            raise ValueError("fdn reverb rt60 must be > 0")
        self.sample_rate = sample_rate
        self.wet, self.dry = wet, dry
        self.rt60 = rt60_seconds
        self.damp = damp
        scale = sample_rate / _REF_SR
        self.base_delays = _DELAYS_441 * scale
        self.mod_depth = mod_depth_seconds * sample_rate
        self.mod_rate = mod_rate_hz
        self.pre_delay = pre_delay_seconds * sample_rate
        self.gain = 1.0 / math.sqrt(FDN_SIZE)
        delay_seconds = self.base_delays / sample_rate
        self.feedback_gains = 10.0 ** (-3.0 * delay_seconds / rt60_seconds)
        self.line_len = int(np.ceil(self.base_delays.max() + self.mod_depth)) + 4
        self.pre_len = max(int(np.ceil(self.pre_delay)) + 4, 4)
        self.hadamard = _hadamard8() * self.gain
        # block size: in-block feedback reads must only hit earlier
        # blocks, so B < min line delay; larger B = fewer sequential
        # steps (the damping Toeplitz matmul is MXU work either way)
        B = int(min(1024, np.floor(self.base_delays.min()) - 2))
        # modulated reads run as a few contiguous dynamic slices, not a
        # gather: the read index walks +1/sample, wobbling by at most
        # drift = |d delay/dt| <= mod_depth * dphase per sample; keep
        # the wobble over a block small enough for a static shift set
        drift = self.mod_depth * 2.0 * np.pi * self.mod_rate / sample_rate
        while B > 16 and drift * B > 8.0:
            B //= 2
        self._block = B
        self._nshift = int(np.ceil(drift * B)) + 3

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {
            "lines": jnp.zeros(batch_shape + (FDN_SIZE, self.line_len), dtype),
            "pre": jnp.zeros(batch_shape + (self.pre_len,), dtype),
            "filter": jnp.zeros(batch_shape + (FDN_SIZE,), dtype),
            "lfo_phase": jnp.zeros((), dtype),
            "step": jnp.zeros((), jnp.int32),
        }

    def _frac_read(self, buf, write_pos, delay):
        """Linear-interp read `delay` samples behind write_pos in a ring
        of length L (fdn_reverb.go sampleFractionalDelay)."""
        L = buf.shape[-1]
        pos = write_pos - delay
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = (pos - i0).astype(buf.dtype)
        i0 = jnp.mod(i0, L)
        i1 = jnp.mod(i0 + 1, L)
        return buf[..., i0] * (1 - frac) + buf[..., i1] * frac

    # ------------------------------------------------------------------
    # pre-delay: pure input delay -> whole-call vectorized FIR
    # ------------------------------------------------------------------
    def _apply_pre_delay(self, pre, n0, x):
        """Returns (new_pre_ring, pre_delayed_input) for the whole call."""
        if self.pre_delay <= 0:
            return pre, x
        P, N = self.pre_len, x.shape[-1]
        dtype = x.dtype
        # ring -> linear history (oldest..newest), then extend with x
        hist = ring.ring_to_linear(pre, n0)
        ext = jnp.concatenate([hist, x], axis=-1)
        # sample n reads input at global lag pre_delay -> ext index
        # n + (P - pre_delay), a constant offset: two static slices
        c = P - self.pre_delay                 # >= 4 by pre_len construction
        i00 = int(math.floor(c))
        frac = jnp.asarray(c - i00, dtype)
        inp = (ext[..., i00:i00 + N] * (1 - frac)
               + ext[..., i00 + 1:i00 + 1 + N] * frac)
        # the new ring holds the last P input samples
        new_pre = ring.linear_to_ring(ext[..., -P:], n0 + N)
        return new_pre, inp

    # ------------------------------------------------------------------
    # blocked feedback loop
    # ------------------------------------------------------------------
    def _damp_block(self, feedback, fstate):
        """In-loop damping one-pole fs[t] = (1-da)*fb[t] + da*fs[t-1]
        over one block, with carried fs[-1] = fstate.

        The coefficient is CONSTANT, so the affine composition's matrix
        part is just scalar powers da^(2^l): a Hillis-Steele scan over a
        single array with precomputed scalar sweep weights — half the
        traffic of the generic (M, b) affine scan, and sweeps whose
        weight falls below dtype noise are dropped entirely (da = 0.3
        dies after 5 of 10 sweeps at B = 1024). Round 5: this + the
        single-scan `process_blocks` driver took the streamed row from
        497 to 882 Msamples/s; a truncated-FIR damping form
        (conv_general_dilated) and a mirrored-ring line buffer were
        both measured slower (156 / 810 M)."""
        dtype = feedback.dtype
        da = float(self.damp)
        b = (1.0 - da) * feedback
        n = b.shape[-1]
        tol = 1e-12 if dtype == jnp.float32 else 1e-20
        shift = 1
        while shift < n:
            m = da ** shift
            if abs(m) > tol:
                b = jnp.concatenate(
                    [b[..., :shift],
                     b[..., shift:] + jnp.asarray(m, dtype) * b[..., :-shift]],
                    axis=-1)
            shift *= 2
        cp = jnp.asarray(np.power(da, np.arange(n) + 1.0), dtype)
        return b + fstate[..., None] * cp

    def _block_step(self, carry, xs):
        xb, inpb = xs                                   # (..., B) each
        lines, fstate, lfo, n0 = carry
        dtype = xb.dtype
        B = xb.shape[-1]
        L = self.line_len
        had = jnp.asarray(self.hadamard, dtype)
        fb_g = jnp.asarray(self.feedback_gains, dtype)
        base = jnp.asarray(self.base_delays, dtype)
        phase_off = jnp.asarray(2.0 * np.pi * np.arange(FDN_SIZE) / FDN_SIZE,
                                dtype)
        dphase = 2.0 * np.pi * self.mod_rate / self.sample_rate
        t = jnp.arange(B)

        lfo_t = jnp.mod(lfo + dphase * t.astype(dtype), 2.0 * np.pi)
        mod = 0.5 * (1.0 + jnp.sin(lfo_t[:, None] + phase_off))   # (B,8)
        delays = base + self.mod_depth * mod                      # (B,8)
        # shift-register layout: lines[..., i, L-1] is the newest
        # sample (block start - 1); sample n0+t-delay sits at linear
        # index L + t - delay, always in [0, L-2] since B < min delay.
        # The index walks ~+1/sample with a small LFO wobble, so the
        # fractional read is a static set of contiguous dynamic slices
        # combined by selection weights — no TPU gather.
        pos = (L + t[:, None]).astype(dtype) - delays
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = jnp.asarray(pos - i0, dtype)                       # (B,8)
        # ONE dynamic slice of B+nshift per line, then nshift static
        # in-window shifts (round 5: replaces nshift dynamic slices per
        # line; 497 -> 555 Msamples/s streamed, bit-identical)
        W = B + self._nshift
        reads = []
        for i in range(FDN_SIZE):
            ci = jnp.min(i0[:, i] - t)                            # scalar
            e = i0[:, i] - t - ci                                 # (B,) small
            win = jax.lax.dynamic_slice_in_dim(
                lines[..., i, :], ci, W, axis=-1)                 # (...,W)
            acc = jnp.zeros(lines.shape[:-2] + (B,), dtype)
            for s in range(self._nshift):
                w = ((1 - frac[:, i]) * (e == s)
                     + frac[:, i] * (e == s - 1))
                acc = acc + w * win[..., s:s + B]
            reads.append(acc)
        d = jnp.stack(reads, axis=-2)                             # (...,8,B)
        feedback = jnp.einsum("ij,...jt->...it", had, d,
                              precision=jax.lax.Precision.HIGHEST)
        filtered = self._damp_block(feedback, fstate)             # (...,8,B)
        write = inpb[..., None, :] * self.gain + filtered * fb_g[:, None]
        lines = jnp.concatenate([lines[..., B:], write], axis=-1)
        out = jnp.sum(d, axis=-2) * self.gain
        y = xb * self.dry + out * self.wet
        lfo = jnp.mod(lfo + dphase * B, 2.0 * np.pi)
        return (lines, filtered[..., :, -1], lfo, n0 + B), y

    # ------------------------------------------------------------------
    # per-sample feedback loop (tail / reference)
    # ------------------------------------------------------------------
    def _sample_scan(self, carry, xs_pair):
        dtype = xs_pair[0].dtype
        had = jnp.asarray(self.hadamard, dtype)
        fb_g = jnp.asarray(self.feedback_gains, dtype)
        base = jnp.asarray(self.base_delays, dtype)
        damp = jnp.asarray(self.damp, dtype)
        phase_off = jnp.asarray(2.0 * np.pi * np.arange(FDN_SIZE) / FDN_SIZE,
                                dtype)
        dphase = 2.0 * np.pi * self.mod_rate / self.sample_rate

        def step(carry, xs):
            xv, inp = xs
            lines, fstate, lfo, n = carry
            mod = 0.5 * (1.0 + jnp.sin(lfo + phase_off))     # (8,)
            delays = base + self.mod_depth * mod             # (8,)
            wp_l = jnp.mod(n, self.line_len)
            reads = []
            for i in range(FDN_SIZE):
                reads.append(self._frac_read(lines[..., i, :],
                                             wp_l.astype(dtype), delays[i]))
            d = jnp.stack(reads, axis=-1)                    # (..., 8)
            feedback = jnp.einsum("ij,...j->...i", had, d,
                                  precision=jax.lax.Precision.HIGHEST)
            filtered = feedback * (1 - damp) + fstate * damp
            write = inp[..., None] * self.gain + filtered * fb_g
            lines = lines.at[..., :, wp_l].set(write)
            out = jnp.sum(d, axis=-1) * self.gain
            y = xv * self.dry + out * self.wet
            lfo = jnp.mod(lfo + dphase, 2.0 * np.pi)
            return (lines, filtered, lfo, n + 1), y

        return jax.lax.scan(step, carry, xs_pair)

    def process(self, state, x):
        x = jnp.asarray(x)
        N = x.shape[-1]
        B = self._block
        pre, inp = self._apply_pre_delay(state["pre"], state["step"], x)
        carry = (state["lines"], state["filter"], state["lfo_phase"],
                 state["step"])
        ys = []
        nb, rem = divmod(N, B) if B >= 16 else (0, N)
        if nb:
            # ring -> shift-register layout (two contiguous copies)
            step0 = state["step"]
            lines, fstate, lfo, _ = carry
            carry = (ring.ring_to_linear(lines, step0), fstate, lfo, step0)

            def to_blocks(a):
                return jnp.moveaxis(
                    a[..., :nb * B].reshape(a.shape[:-1] + (nb, B)), -2, 0)
            carry, yb = jax.lax.scan(self._block_step, carry,
                                     (to_blocks(x), to_blocks(inp)))
            lines, fstate, lfo, step1 = carry
            carry = (ring.linear_to_ring(lines, step1), fstate, lfo, step1)
            ys.append(jnp.moveaxis(yb, 0, -2).reshape(x.shape[:-1] + (nb * B,)))
        if rem:
            xs = (jnp.moveaxis(x[..., N - rem:], -1, 0),
                  jnp.moveaxis(inp[..., N - rem:], -1, 0))
            carry, yt = self._sample_scan(carry, xs)
            ys.append(jnp.moveaxis(yt, 0, -1))
        lines, fstate, lfo, n = carry
        y = ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=-1)
        return ({"lines": lines, "pre": pre, "filter": fstate,
                 "lfo_phase": lfo, "step": n}, y)

    def process_blocks(self, state, x, *, block_size: int | None = None):
        """Streamed multi-block processing in ONE scan — the FDN's own
        `scan_blocks` specialization. The generic
        `scan_blocks(fdn.process, ...)` pays a ring<->linear layout
        conversion of the full (8, line_len) buffer per outer block;
        this driver converts once, scans every internal B-block in one
        `lax.scan`, and converts back — same per-block algebra, same
        floats (asserted in tests/test_reverb.py). N must be a multiple
        of the internal block (`_block`, 1024 at 48 kHz); `block_size`
        is accepted for driver-API symmetry and only validated against
        that constraint."""
        x = jnp.asarray(x)
        N = x.shape[-1]
        B = self._block
        if block_size is not None and block_size % B:
            raise ValueError(
                f"fdn process_blocks: block_size {block_size} must be a "
                f"multiple of the internal block {B}")
        if B < 16 or N % B:
            # tiny-delay configs or ragged lengths: generic driver
            from algodsp_tpu.streaming import scan_blocks
            return scan_blocks(self.process, state, x,
                               block_size=block_size or N)
        nb = N // B
        pre, inp = self._apply_pre_delay(state["pre"], state["step"], x)
        step0 = state["step"]
        lines = ring.ring_to_linear(state["lines"], step0)

        def to_blocks(a):
            return jnp.moveaxis(a.reshape(a.shape[:-1] + (nb, B)), -2, 0)

        carry0 = (lines, state["filter"], state["lfo_phase"], step0)
        (lines, fstate, lfo, n1), yb = jax.lax.scan(
            self._block_step, carry0, (to_blocks(x), to_blocks(inp)))
        return ({"lines": ring.linear_to_ring(lines, n1), "pre": pre,
                 "filter": fstate, "lfo_phase": lfo, "step": n1},
                jnp.moveaxis(yb, 0, -2).reshape(x.shape[:-1] + (N,)))

    def process_scan(self, state, x):
        """Per-sample reference implementation (kept for parity tests);
        matches fdn_reverb.go:196-259 order of operations exactly."""
        x = jnp.asarray(x)
        dtype = x.dtype
        had = jnp.asarray(self.hadamard, dtype)
        fb_g = jnp.asarray(self.feedback_gains, dtype)
        base = jnp.asarray(self.base_delays, dtype)
        damp = jnp.asarray(self.damp, dtype)
        phase_off = jnp.asarray(2.0 * np.pi * np.arange(FDN_SIZE) / FDN_SIZE, dtype)
        dphase = 2.0 * np.pi * self.mod_rate / self.sample_rate
        xs = jnp.moveaxis(x, -1, 0)

        def step(carry, xv):
            lines, pre, fstate, lfo, n = carry
            if self.pre_delay > 0:
                wp = jnp.mod(n, self.pre_len)
                pre = pre.at[..., wp].set(xv)
                inp = self._frac_read(pre, wp.astype(dtype), self.pre_delay)
            else:
                inp = xv
            mod = 0.5 * (1.0 + jnp.sin(lfo + phase_off))
            delays = base + self.mod_depth * mod
            wp_l = jnp.mod(n, self.line_len)
            reads = []
            for i in range(FDN_SIZE):
                reads.append(self._frac_read(lines[..., i, :],
                                             wp_l.astype(dtype), delays[i]))
            d = jnp.stack(reads, axis=-1)
            feedback = jnp.einsum("ij,...j->...i", had, d,
                                  precision=jax.lax.Precision.HIGHEST)
            filtered = feedback * (1 - damp) + fstate * damp
            write = inp[..., None] * self.gain + filtered * fb_g
            lines = lines.at[..., :, wp_l].set(write)
            out = jnp.sum(d, axis=-1) * self.gain
            y = xv * self.dry + out * self.wet
            lfo = jnp.mod(lfo + dphase, 2.0 * np.pi)
            return (lines, pre, filtered, lfo, n + 1), y

        carry0 = (state["lines"], state["pre"], state["filter"],
                  state["lfo_phase"], state["step"])
        (lines, pre, fstate, lfo, n), ys = jax.lax.scan(step, carry0, xs)
        return ({"lines": lines, "pre": pre, "filter": fstate,
                 "lfo_phase": lfo, "step": n}, jnp.moveaxis(ys, 0, -1))
