"""Feedback delay effect.

Capability parity with `dsp/effects/delay.go`: fractional delay with
linear-interp read, feedback in [0, 0.99], wet/dry mix, and smooth
delay-time ramping toward a target (`delay.go:140-166`).

TPU design — blocked feedback processing: the smoothed delay-time
trajectory is closed-form (cur[n] = target + (cur0-target)*(1-sc)^(n+1),
independent of the audio), so it is computed vectorized upfront.  When
every lag in the call stays in [B+2, L-B-2] (B=128), a block of 128
samples only reads values written in earlier blocks, and the feedback
loop needs no in-block recurrence at all: the buffer runs in
shift-register layout, one small read + concat-shift write per block
instead of 128 scan steps.  A `lax.cond` selects the blocked or
the per-sample path at runtime from the precomputed trajectory, so
short delays (< ~2.7 ms) transparently fall back to the exact scan.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops import ring

_BLOCK = 128


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

    def _sample_scan(self, buf, w, x, cur):
        """Per-sample loop consuming the precomputed lag trajectory."""
        L = self.buf_len
        dtype = x.dtype

        def step(carry, xs):
            buf, w = carry
            xv, c = xs
            pos = jnp.mod(w.astype(dtype) - c, float(L))
            i0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - i0
            i1 = jnp.mod(i0 + 1, L)
            delayed = buf[..., i0] * (1 - frac) + buf[..., i1] * frac
            buf = buf.at[..., jnp.mod(w, L)].set(xv + delayed * self.feedback)
            y = xv * (1.0 - self.mix) + delayed * self.mix
            return (buf, w + 1), y

        (buf, w), ys = jax.lax.scan(step, (buf, w),
                                    (jnp.moveaxis(x, -1, 0), cur))
        return buf, w, jnp.moveaxis(ys, 0, -1)

    def _block_run(self, buf, w, x, cur, nb, rem):
        """Blocked path: valid when all lags are in [B+2, L-B-2].
        Runs in shift-register layout (newest sample last): the read at
        lag c for in-block offset t is linear index L + t - c, and the
        write is a concat-shift — no gather-modulo or scatter."""
        B = _BLOCK
        L = self.buf_len
        dtype = x.dtype
        shape = x.shape[:-1]
        lin = ring.ring_to_linear(buf, w)

        def bstep(carry, xs):
            lin, w = carry
            xbv, curb = xs                          # (..., B), (B,)
            t = jnp.arange(B)
            pos = (L + t).astype(dtype) - curb      # in [2, L-2]
            i0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - i0
            delayed = lin[..., i0] * (1 - frac) + lin[..., i0 + 1] * frac
            lin = jnp.concatenate([lin[..., B:], xbv + delayed * self.feedback],
                                  axis=-1)
            y = xbv * (1.0 - self.mix) + delayed * self.mix
            return (lin, w + B), y

        xb = jnp.moveaxis(x[..., :nb * B].reshape(shape + (nb, B)), -2, 0)
        cb = cur[:nb * B].reshape(nb, B)
        (lin, w), yb = jax.lax.scan(bstep, (lin, w), (xb, cb))
        buf = ring.linear_to_ring(lin, w)
        ys = [jnp.moveaxis(yb, 0, -2).reshape(shape + (nb * B,))]
        if rem:
            buf, w, yt = self._sample_scan(buf, w, x[..., nb * B:],
                                           cur[nb * B:])
            ys.append(yt)
        return buf, w, (ys[0] if len(ys) == 1 else jnp.concatenate(ys, axis=-1))

    def process(self, state, x, target_delay_samples=None):
        x = jnp.asarray(x)
        dtype = x.dtype
        N = x.shape[-1]
        L = self.buf_len
        target = (jnp.asarray(float(self.delay_samples), dtype)
                  if target_delay_samples is None
                  else jnp.asarray(target_delay_samples, dtype))
        sc = jnp.asarray(self.smooth_coeff, dtype)
        # closed-form smoothed lag trajectory (delay.go:140-166 recurrence)
        n = jnp.arange(N, dtype=dtype)
        cur = target + (state["current"] - target) * (1.0 - sc) ** (n + 1.0)
        new_cur = cur[-1] if N else state["current"]

        nb, rem = divmod(N, _BLOCK)
        if nb == 0:
            buf, w, y = self._sample_scan(state["buf"], state["write"], x, cur)
            return {"buf": buf, "write": w, "current": new_cur}, y

        ok = jnp.logical_and(jnp.min(cur) >= _BLOCK + 2.0,
                             jnp.max(cur) <= L - _BLOCK - 2.0)
        buf, w, y = jax.lax.cond(
            ok,
            lambda b, wp: self._block_run(b, wp, x, cur, nb, rem),
            lambda b, wp: self._sample_scan(b, wp, x, cur),
            state["buf"], state["write"])
        return {"buf": buf, "write": w, "current": new_cur}, y
