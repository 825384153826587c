"""Feedback delay network reverb.

Capability parity with `dsp/effects/reverb/fdn_reverb.go:9-330`: 8
delay lines (prime-ish 44.1k tunings scaled to the sample rate), 8x8
Hadamard feedback matrix (1/sqrt(8) scaled), RT60-derived per-line
feedback gains 10^(-3*delay_sec/rt60), one-pole damping in the loop,
sinusoidal per-line delay modulation with 2*pi*i/8 phase offsets, and
fractional pre-delay.

Runs as one `lax.scan`: per step, 8 fractional delay reads (linear
interp), an 8-wide Hadamard mix, damping, and 8 writes — all fused;
channels batch in the carry.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

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

    def process(self, state, x):
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
            # pre-delay
            if self.pre_delay > 0:
                wp = jnp.mod(n, self.pre_len)
                pre = pre.at[..., wp].set(xv)
                inp = self._frac_read(pre, wp.astype(dtype), self.pre_delay)
            else:
                inp = xv
            # modulated fractional reads from all 8 lines
            mod = 0.5 * (1.0 + jnp.sin(lfo + phase_off))     # (8,)
            delays = base + self.mod_depth * mod             # (8,)
            wp_l = jnp.mod(n, self.line_len)
            reads = []
            for i in range(FDN_SIZE):
                reads.append(self._frac_read(lines[..., i, :],
                                             wp_l.astype(dtype), delays[i]))
            d = jnp.stack(reads, axis=-1)                    # (..., 8)
            # Hadamard feedback mix + damping one-pole
            feedback = jnp.einsum("ij,...j->...i", had, d)
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
