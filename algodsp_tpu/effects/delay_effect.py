"""Feedback delay effect.

Capability parity with `dsp/effects/delay.go`: fractional delay with
linear-interp read, feedback in [0, 0.99], wet/dry mix, and smooth
delay-time ramping toward a target (`delay.go:140-166`).

Feedback makes the recurrence sequential; it runs as a `lax.scan` with
the ring buffer in the carry, channels batched.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


class Delay:
    def __init__(self, sample_rate: float, *, delay_seconds: float = 0.25,
                 feedback: float = 0.35, mix: float = 0.25,
                 max_delay_seconds: float = 2.0, smooth_ms: float = 20.0):
        if sample_rate <= 0:
            raise ValueError("delay: sample rate must be > 0")
        if not (0.0 <= feedback <= 0.99):
            raise ValueError(f"delay feedback must be in [0, 0.99]: {feedback}")
        if not (0.0 <= mix <= 1.0):
            raise ValueError(f"delay mix must be in [0, 1]: {mix}")
        if not (0.0 < delay_seconds <= max_delay_seconds):
            raise ValueError(f"delay time out of range: {delay_seconds}")
        self.sample_rate = sample_rate
        self.delay_samples = round(delay_seconds * sample_rate)
        self.feedback = feedback
        self.mix = mix
        self.buf_len = int(math.ceil(max_delay_seconds * sample_rate)) + 4
        self.smooth_coeff = (1.0 - math.exp(-1.0 / (smooth_ms * 1e-3 * sample_rate))
                             if smooth_ms > 0 else 1.0)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {"buf": jnp.zeros(batch_shape + (self.buf_len,), dtype),
                "write": jnp.zeros((), jnp.int32),
                "current": jnp.asarray(float(self.delay_samples), dtype)}

    def process(self, state, x, target_delay_samples=None):
        x = jnp.asarray(x)
        dtype = x.dtype
        L = self.buf_len
        target = (jnp.asarray(float(self.delay_samples), dtype)
                  if target_delay_samples is None
                  else jnp.asarray(target_delay_samples, dtype))
        sc = jnp.asarray(self.smooth_coeff, dtype)
        xs = jnp.moveaxis(x, -1, 0)

        def step(carry, xv):
            buf, w, cur = carry
            cur = cur + (target - cur) * sc
            pos = jnp.mod(w.astype(dtype) - cur, float(L))
            i0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - i0
            i1 = jnp.mod(i0 + 1, L)
            delayed = buf[..., i0] * (1 - frac) + buf[..., i1] * frac
            buf = buf.at[..., jnp.mod(w, L)].set(xv + delayed * self.feedback)
            y = xv * (1.0 - self.mix) + delayed * self.mix
            return (buf, w + 1, cur), y

        (buf, w, cur), ys = jax.lax.scan(
            step, (state["buf"], state["write"], state["current"]), xs)
        return ({"buf": buf, "write": w, "current": cur},
                jnp.moveaxis(ys, 0, -1))
