"""WSOLA time-domain pitch shifter.

Capability parity with `dsp/effects/pitch/pitch_shifter.go`: SoundTouch-
style WSOLA with the music preset (sequence 82 ms / overlap 10 ms /
seek window 28 ms), autocorrelation-based segment alignment, time
stretch followed by resampling.

TPU-first reformulation of the data-dependent search (SURVEY.md §7
hard-part #3): the per-segment "best offset" search over the seek
window becomes a *batched* correlation — all segments compute scores
against all candidate offsets with one einsum, then argmax per segment.
Control flow is static; only data moves.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu.resample import Resampler, Quality


class WSOLAPitchShifter:
    def __init__(self, sample_rate: float, *, pitch_ratio: float = 1.0,
                 sequence_ms: float = 82.0, overlap_ms: float = 10.0,
                 seek_window_ms: float = 28.0,
                 resample_quality: Quality = Quality.BALANCED):
        if sample_rate <= 0:
            raise ValueError("wsola: sample rate must be > 0")
        if not (0.25 <= pitch_ratio <= 4.0):
            raise ValueError(f"wsola: ratio must be in [0.25, 4]: {pitch_ratio}")
        self.sample_rate = sample_rate
        self.pitch_ratio = pitch_ratio
        self.sequence = max(int(sequence_ms * 1e-3 * sample_rate), 32)
        self.overlap = max(int(overlap_ms * 1e-3 * sample_rate), 8)
        self.seek = max(int(seek_window_ms * 1e-3 * sample_rate), 4)
        self.resample_quality = resample_quality

    def set_pitch_semitones(self, semitones: float):
        self.pitch_ratio = 2.0 ** (semitones / 12.0)

    def _time_stretch(self, x, rate: float):
        """WSOLA stretch: output length ~ N/rate... output advances by
        `seq - ov` while input nominally advances by (seq - ov) * rate,
        with per-segment alignment chosen by maximum cross-correlation
        within ±seek/2."""
        n = x.shape[-1]
        seq, ov, seek = self.sequence, self.overlap, self.seek
        flat = seq - ov
        out_segments = max(int((n - seq - seek) / (flat * rate)), 1)

        # nominal input positions per segment (static)
        nominal = (np.arange(out_segments) * flat * rate).astype(np.int32) \
            + seek // 2
        nominal = np.minimum(nominal, n - seq - seek // 2 - 1)
        offsets = np.arange(-(seek // 2), seek - seek // 2, dtype=np.int32)

        # cross-fade window
        fade_in = jnp.asarray(np.linspace(0.0, 1.0, ov, endpoint=False), x.dtype)
        fade_out = 1.0 - fade_in

        # The alignment target of segment i is the tail of segment i-1 as
        # placed in the output. With WSOLA the overlap region of the
        # previous *input* segment (its last `ov` samples) is the
        # reference; scoring all candidates is one batched dot product.
        # Sequential dependency: the chosen offset of segment i-1 shifts
        # the reference for segment i -> tiny scan over segments with the
        # heavy math (correlation einsum) precomputed where possible.
        def gather_win(start, length):
            """Per-channel window gather: start (...,) -> (..., length)."""
            idx = start[..., None] + jnp.arange(length)
            return jnp.take_along_axis(x, idx, axis=-1)

        def step(prev_tail_start, i):
            nom = nominal_j[i]
            # reference: ov samples following the previous segment tail
            # (the chosen offset differs per channel -> per-channel gathers)
            ref = gather_win(prev_tail_start, ov)
            # candidate windows at nom + offsets
            cand_idx = nom + offsets_j[:, None] + jnp.arange(ov)[None, :]
            cands = x[..., cand_idx]  # (..., K, ov)
            scores = jnp.einsum("...ko,...o->...k", cands, ref)
            norms = jnp.sqrt(jnp.einsum("...ko,...ko->...k", cands, cands) + 1e-12)
            best = jnp.argmax(scores / norms, axis=-1)
            off = offsets_j[best]
            start = nom + off
            segment = gather_win(start, seq)
            new_tail_start = (start + flat).astype(jnp.int32)
            return new_tail_start, segment

        nominal_j = jnp.asarray(nominal)
        offsets_j = jnp.asarray(offsets)
        init_tail = jnp.full(x.shape[:-1], int(nominal[0]), jnp.int32)
        _, segments = jax.lax.scan(step, init_tail, jnp.arange(out_segments))
        # segments: (S, ..., seq) -> overlap-add with linear cross-fades
        segments = jnp.moveaxis(segments, 0, -2)  # (..., S, seq)
        out_len = (out_segments - 1) * flat + seq
        # cross-fades: each segment fades in over its first ov samples
        # (except the first) and fades out over its last ov (except the
        # last), so overlapping regions sum to a constant-power blend
        fade_tail = jnp.ones((out_segments, seq), x.dtype)
        fade_tail = fade_tail.at[:-1, seq - ov:].set(fade_out)
        fade_head = jnp.ones((out_segments, seq), x.dtype)
        fade_head = fade_head.at[1:, :ov].set(fade_in)
        shaped = segments * fade_tail * fade_head
        starts = jnp.arange(out_segments) * flat
        idx = (starts[:, None] + jnp.arange(seq)[None, :]).reshape(-1)
        out = jnp.zeros(x.shape[:-1] + (out_len,), x.dtype)
        out = out.at[..., idx].add(shaped.reshape(shaped.shape[:-2] + (-1,)))
        return out

    def process(self, x):
        """One-shot pitch shift, output length == input length."""
        x = jnp.asarray(x)
        n = x.shape[-1]
        r = self.pitch_ratio
        if r == 1.0:
            return x
        min_len = self.sequence + self.seek + int(self.sequence * r) + 1
        if n < min_len:
            raise ValueError(f"wsola: input too short ({n} < {min_len})")
        stretched = self._time_stretch(x, r)
        rs = Resampler(*_ratio_to_fraction(1.0 / r),
                       quality=self.resample_quality)
        y = rs.process(stretched)
        if y.shape[-1] >= n:
            return y[..., :n]
        return jnp.concatenate(
            [y, jnp.zeros(y.shape[:-1] + (n - y.shape[-1],), y.dtype)], axis=-1)


def _ratio_to_fraction(v: float, max_den: int = 512) -> tuple[int, int]:
    from algodsp_tpu.resample import approximate_ratio
    return approximate_ratio(v, max_den)
