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
        # reference contract (`pitch_shifter.go:257-268`): ov < seq
        if self.overlap >= self.sequence:
            raise ValueError(
                f"wsola: overlap must be smaller than sequence: "
                f"overlap={overlap_ms} sequence={sequence_ms} ms")
        self.resample_quality = resample_quality

    def set_pitch_semitones(self, semitones: float):
        self.pitch_ratio = 2.0 ** (semitones / 12.0)

    def _time_stretch(self, x, rate: float):
        """WSOLA stretch: output length ~ N/rate... output advances by
        `seq - ov` while input nominally advances by (seq - ov) * rate,
        with per-segment alignment chosen by maximum cross-correlation
        within ±seek/2.

        TPU formulation: no per-candidate gathers. Each scan step slices
        ONE contiguous candidate region (static length seek-1+ov) and
        scores all `seek` offsets against the per-channel reference with
        a depthwise `conv_general_dilated` (XLA convs are
        cross-correlations, so scores[k] = <region[k:k+ov], ref>
        directly); candidate energies come from a second conv with a
        ones kernel. The only per-channel dynamic reads are the ov-long
        reference and the final seq-long chosen segments — contiguous
        dynamic slices, not element gathers. Overlap-add is a reshape
        (hop=flat >= ov means only neighbor overlap), not a scatter."""
        n = x.shape[-1]
        seq, ov, seek = self.sequence, self.overlap, self.seek
        flat = seq - ov
        # segment count from the TARGET output length (~n/rate), like
        # the reference's `for outLen < targetLen + seq` loop
        # (`pitch_shifter.go:299-319`); reads past the input return
        # zero (pitchSampleZero), realized here by zero-extending the
        # timeline so late segments read silence instead of clamping
        # onto repeated end content.
        target_len = max(int(round(n / rate)), 1)
        out_segments = max(-(-(target_len - seq) // flat) + 1, 1)

        # nominal input positions per segment (static)
        nominal = (np.arange(out_segments) * flat * rate).astype(np.int32) \
            + seek // 2
        region_starts = nominal - seek // 2         # candidate 0 position
        L = seek - 1 + ov                           # candidate region length

        batch = x.shape[:-1]
        x2 = x.reshape((-1, n))
        # segments whose reads touch the zero-extended region take the
        # nominal offset deterministically: alignment there would argmax
        # over fade-out noise, and the independent C++ golden must land
        # on the same segment (static mask — the grid is static)
        boundary = (region_starts + L + seq) > n
        n_need = int(nominal[-1]) + seek // 2 + seq + seek + 1
        if n_need > n:
            x2 = jnp.concatenate(
                [x2, jnp.zeros((x2.shape[0], n_need - n), x2.dtype)],
                axis=-1)
            n = n_need
        C = x2.shape[0]
        dn = ("NCH", "OIH", "NCH")
        hi = jax.lax.Precision.HIGHEST
        # candidate energies come from ONE prefix-sum of x^2 (outside
        # the scan): sum(region[k:k+ov]^2) = csq[k+ov] - csq[k]
        csq = jnp.concatenate(
            [jnp.zeros((C, 1), x2.dtype),
             jnp.cumsum(x2 * x2, axis=-1, dtype=jnp.float32)], axis=-1)

        def slice_rows(starts, length):
            """Per-channel contiguous dynamic slice: (C,) -> (C, length)."""
            return jax.vmap(
                lambda xc, s: jax.lax.dynamic_slice(xc, (s,), (length,))
            )(x2, starts)

        def step(prev_tail_start, xs_i):
            a_i, boundary_i = xs_i
            # reference: ov samples following the previous segment body
            ref = slice_rows(prev_tail_start, ov)               # (C, ov)
            region = jax.lax.dynamic_slice(
                x2, (jnp.int32(0), a_i), (C, L))
            scores = jax.lax.conv_general_dilated(
                region[None], ref[:, None, :], (1,), "VALID",
                dimension_numbers=dn, feature_group_count=C,
                precision=hi)[0]                                # (C, seek)
            norm2 = (jax.lax.dynamic_slice(
                        csq, (jnp.int32(0), a_i + ov), (C, seek))
                     - jax.lax.dynamic_slice(
                        csq, (jnp.int32(0), a_i), (C, seek)))
            best = jnp.argmax(scores / jnp.sqrt(norm2 + 1e-12), axis=-1)
            # silent or boundary regions (reads touching the
            # zero-extended tail): the argmax would pick fade-out float
            # noise, so take the NOMINAL offset deterministically —
            # keeps timing on-grid and the independent C++ golden lands
            # on the same segment
            silent = jnp.max(norm2, axis=-1) <= 1e-12
            best = jnp.where(jnp.logical_or(silent, boundary_i),
                             seek // 2, best)
            start = a_i + best.astype(jnp.int32)                # (C,)
            return (start + flat).astype(jnp.int32), start

        init_tail = jnp.full((C,), int(nominal[0]), jnp.int32)
        _, starts = jax.lax.scan(
            step, init_tail,
            (jnp.asarray(region_starts), jnp.asarray(boundary)))  # (S, C)
        segments = jax.vmap(lambda st: slice_rows(st, seq))(starts)
        segments = jnp.moveaxis(segments, 0, 1)                 # (C, S, seq)

        # overlap-add as the reference's sequential tail crossfade
        # (`pitch_shifter.go:328-337`): each step crossfades the last ov
        # samples of the output so far with the new segment's head, then
        # appends the remaining flat samples. Correct for ANY ov < seq
        # (ov > flat re-fades carried samples, exactly like the Go loop);
        # identical to fixed-window neighbor OLA when ov <= flat.
        S = out_segments
        fade_in = jnp.asarray(np.linspace(0.0, 1.0, ov, endpoint=False),
                              x.dtype)
        fade_out = 1.0 - fade_in

        def ola_step(carry, seg):                    # carry (C, ov)
            t = fade_out * carry + fade_in * seg[:, :ov]
            full = jnp.concatenate([t, seg[:, ov:]], axis=-1)   # (C, seq)
            return full[:, flat:], full[:, :flat]
        seg0 = segments[:, 0]
        carry, emitted = jax.lax.scan(
            ola_step, seg0[:, flat:], jnp.moveaxis(segments[:, 1:], 1, 0))
        out = jnp.concatenate(
            [seg0[:, :flat],
             jnp.moveaxis(emitted, 0, 1).reshape(C, (S - 1) * flat),
             carry], axis=-1)                        # ((S-1)*flat + seq,)
        return out.reshape(batch + (out.shape[-1],))

    def process(self, x):
        """One-shot pitch shift, output length == input length.

        Composition (the reference's `Process`,
        `pitch_shifter.go:225-240`): time-STRETCH the signal to ~n*r
        samples (stretch rate 1/r — WSOLA preserves pitch), then
        resample by 1/r back to n samples, which multiplies pitch by r
        while events keep their original timing. (Round 5 review fix:
        the stretch previously ran at rate r, compressing to n/r and
        leaving the resampled output at n/r^2 with a zero-padded tail.)
        """
        x = jnp.asarray(x)
        n = x.shape[-1]
        r = self.pitch_ratio
        if r == 1.0:
            return x
        min_len = self.sequence + self.seek + int(self.sequence * r) + 1
        if n < min_len:
            raise ValueError(f"wsola: input too short ({n} < {min_len})")
        stretched = self._time_stretch(x, 1.0 / r)      # ~n*r samples
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
