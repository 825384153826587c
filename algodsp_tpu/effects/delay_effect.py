"""Feedback delay effect.

Capability parity with `dsp/effects/delay.go`: fractional delay with
linear-interp read, feedback in [0, 0.99], wet/dry mix, smooth delay-
time ramping toward a target (`delay.go:140-166`), and the reference's
fixed 2.0 s maximum buffer (`delay.go:12,206`).

TPU design — blocked feedback processing on a TRUE ring: the smoothed
delay-time trajectory is closed-form
(cur[n] = target + (cur0-target)*(1-sc)^(n+1), independent of the
audio), so it is computed vectorized upfront.  When every lag stays in
[B+2, L-2] (B=128), a 128-sample block only reads values written in
earlier blocks, so the feedback loop needs no in-block recurrence.
Three execution tiers, picked by `lax.cond` from the trajectory and
the carried write cursor:

  1. aligned ring (the steady-state streaming path): the buffer length
     is a multiple of B and the cursor is B-aligned, so each block is
     ONE contiguous `dynamic_update_slice` write plus a modular-index
     gather read — O(B) HBM traffic per block, nothing ever shifts.
     This is what lets `streaming.scan_blocks` chain hundreds of
     blocks per dispatch at memory speed.
  2. linear extension (unaligned cursor or a ragged tail): reorder the
     ring once (`ops/ring.py` double-slice), extend by the call length,
     run the same blocked reads/writes at linear indices, and return
     with the cursor re-aligned to 0 — self-healing back to tier 1.
  3. exact per-sample scan when the lag trajectory dips below B+2
     (< ~2.7 ms delays).
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
        # ring length: max delay + interp/causality headroom, rounded up
        # to a whole number of blocks so tier-1 writes stay contiguous
        need = int(math.ceil(max_delay_seconds * sample_rate)) + 4
        self.buf_len = -(-need // _BLOCK) * _BLOCK
        self.smooth_coeff = (1.0 - math.exp(-1.0 / (smooth_ms * 1e-3 * sample_rate))
                             if smooth_ms > 0 else 1.0)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        """State: ring history, write cursor, smoothed current delay."""
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
        return buf, jnp.mod(w, L), jnp.moveaxis(ys, 0, -1)

    def _ring_blocks(self, buf, w, x, cur, nb):
        """Tier 1: B-aligned cursor, N == nb*B.  One contiguous write +
        one modular gather read per block; O(B) traffic, no shifting."""
        B = _BLOCK
        L = self.buf_len
        dtype = x.dtype
        shape = x.shape[:-1]

        def bstep(carry, xs):
            buf, base = carry                       # base: aligned cursor
            xbv, curb = xs                          # (..., B), (B,)
            t = jnp.arange(B)
            pos = jnp.mod((base + t).astype(dtype) - curb, float(L))
            i0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - i0
            i1 = jnp.mod(i0 + 1, L)
            delayed = buf[..., i0] * (1 - frac) + buf[..., i1] * frac
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, xbv + delayed * self.feedback, base, axis=-1)
            y = xbv * (1.0 - self.mix) + delayed * self.mix
            return (buf, jnp.mod(base + B, L)), y

        xb = jnp.moveaxis(x.reshape(shape + (nb, B)), -2, 0)
        cb = cur.reshape(nb, B)
        (buf, w), yb = jax.lax.scan(bstep, (buf, w), (xb, cb))
        return buf, w, jnp.moveaxis(yb, 0, -2).reshape(shape + (nb * B,))

    def _linear_blocks(self, buf, w, x, cur, nb, rem):
        """Tier 2: reorder the ring once into newest-last layout, extend
        by the call length, run blocked reads/writes at linear indices,
        slice the newest L back — cursor returns 0-aligned."""
        B = _BLOCK
        L = self.buf_len
        dtype = x.dtype
        shape = x.shape[:-1]
        lin = ring.ring_to_linear(buf, w)
        ext = jnp.concatenate(
            [lin, jnp.zeros(shape + (nb * B,), dtype)], axis=-1)

        def bstep(carry, xs):
            ext, base = carry
            xbv, curb = xs
            t = jnp.arange(B)
            pos = (base + t).astype(dtype) - curb   # >= 2, < base
            i0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - i0
            delayed = ext[..., i0] * (1 - frac) + ext[..., i0 + 1] * frac
            ext = jax.lax.dynamic_update_slice_in_dim(
                ext, xbv + delayed * self.feedback, base, axis=-1)
            y = xbv * (1.0 - self.mix) + delayed * self.mix
            return (ext, base + B), y

        xb = jnp.moveaxis(x[..., :nb * B].reshape(shape + (nb, B)), -2, 0)
        cb = cur[:nb * B].reshape(nb, B)
        (ext, _), yb = jax.lax.scan(
            bstep, (ext, jnp.asarray(L, jnp.int32)), (xb, cb))
        buf = ext[..., -L:]                         # newest-last == cursor 0
        w0 = jnp.zeros((), jnp.int32)
        ys = [jnp.moveaxis(yb, 0, -2).reshape(shape + (nb * B,))]
        if rem:
            buf, w0, yt = self._sample_scan(buf, w0, x[..., nb * B:],
                                            cur[nb * B:])
            ys.append(yt)
        return buf, w0, (ys[0] if len(ys) == 1
                         else jnp.concatenate(ys, axis=-1))

    def process(self, state, x, target_delay_samples=None):
        x = jnp.asarray(x)
        dtype = x.dtype
        N = x.shape[-1]
        L = self.buf_len
        target = (jnp.asarray(float(self.delay_samples), dtype)
                  if target_delay_samples is None
                  else jnp.asarray(target_delay_samples, dtype))
        sc = jnp.asarray(self.smooth_coeff, dtype)
        # closed-form smoothed lag trajectory (delay.go:140-166 recurrence),
        # clamped to the ring's representable lags — a runtime target
        # beyond the max-delay buffer would otherwise alias mod L in the
        # sample-scan tier (the reference clamps in SetDelayTime)
        n = jnp.arange(N, dtype=dtype)
        cur = target + (state["current"] - target) * (1.0 - sc) ** (n + 1.0)
        cur = jnp.clip(cur, 1.0, float(L - 2))
        new_cur = cur[-1] if N else state["current"]
        w_in = jnp.mod(state["write"], L)

        nb, rem = divmod(N, _BLOCK)
        if nb == 0:
            buf, w, y = self._sample_scan(state["buf"], w_in, x, cur)
            return {"buf": buf, "write": w, "current": new_cur}, y

        ok = jnp.logical_and(jnp.min(cur) >= _BLOCK + 2.0,
                             jnp.max(cur) <= L - 2.0)

        def blocked(b, wp):
            if rem:
                return self._linear_blocks(b, wp, x, cur, nb, rem)
            return jax.lax.cond(
                jnp.mod(wp, _BLOCK) == 0,
                lambda bb, ww: self._ring_blocks(bb, ww, x, cur, nb),
                lambda bb, ww: self._linear_blocks(bb, ww, x, cur, nb, 0),
                b, wp)

        buf, w, y = jax.lax.cond(
            ok, blocked,
            lambda b, wp: self._sample_scan(b, wp, x, cur),
            state["buf"], w_in)
        return {"buf": buf, "write": w, "current": new_cur}, y
