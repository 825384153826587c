"""Freeverb / Schroeder reverb.

Capability parity with `dsp/effects/reverb/reverb.go:5-200`: 8 parallel
feedback combs (damping one-pole in the loop, denormal squelch at
1e-23) + 4 serial allpasses, legacy 44.1 kHz tunings, fixed input gain
0.015, wet/dry/room-size/damp controls.

TPU note: the comb/allpass loops are feedback recurrences at audio
rate, so they run as one `lax.scan` with every ring buffer in the
carry; all channels advance together on VPU lanes. All 8 comb + 4
allpass updates happen inside a single fused scan step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

COMB_TUNINGS = (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)
ALLPASS_TUNINGS = (556, 441, 341, 225)
FIXED_GAIN = 0.015
_DENORMAL = 1e-23


class Freeverb:
    def __init__(self, *, wet: float = 0.22, dry: float = 1.0,
                 room_size: float = 0.72, damp: float = 0.45):
        self.wet = float(wet)
        self.dry = float(dry)
        self.room_size = float(room_size)
        self.damp = float(damp)
        # Freeverb scaling: feedback = roomsize (already scaled upstream
        # in the Go setter; legacy maps roomsize directly)
        self.comb_feedback = self.room_size
        self.allpass_feedback = 0.5

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {
            "combs": [jnp.zeros(batch_shape + (n,), dtype) for n in COMB_TUNINGS],
            "filter_store": jnp.zeros(batch_shape + (len(COMB_TUNINGS),), dtype),
            "allpasses": [jnp.zeros(batch_shape + (n,), dtype)
                          for n in ALLPASS_TUNINGS],
            "step": jnp.zeros((), jnp.int32),
        }

    def process(self, state, x):
        """(state, x:(..., N)) -> (state, y)."""
        x = jnp.asarray(x)
        damp_a = jnp.asarray(self.damp, x.dtype)
        damp_b = jnp.asarray(1.0 - self.damp, x.dtype)
        fb = jnp.asarray(self.comb_feedback, x.dtype)
        apfb = jnp.asarray(self.allpass_feedback, x.dtype)

        xs = jnp.moveaxis(x, -1, 0)

        def step(carry, xv):
            combs, fstore, allp, n = carry
            inp = FIXED_GAIN * xv
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

        carry0 = (state["combs"], state["filter_store"], state["allpasses"],
                  state["step"])
        (combs, fstore, allp, n), ys = jax.lax.scan(step, carry0, xs)
        new_state = {"combs": combs, "filter_store": fstore,
                     "allpasses": allp, "step": n}
        return new_state, jnp.moveaxis(ys, 0, -1)
