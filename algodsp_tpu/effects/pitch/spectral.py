"""Phase-vocoder spectral pitch shifter.

Capability parity with `dsp/effects/pitch/pitch_shift_spectral.go`:
hybrid approach — direct spectral bin shifting for |ratio-1| <= 0.15,
classic time-stretch + resample with identity phase locking
(Laroche & Dolson 1999) for larger shifts; Hann analysis windows,
frame 1024 / hop 256 defaults; mono one-shot buffer processing.

TPU-first: all frames process at once — framing is a gather, FFTs are
batched, and the phase-vocoder's running phase accumulator is a *cumsum
over frames* (the per-frame recurrence sum_phase += delta is a prefix
sum), so nothing is sequential.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from algodsp_tpu import window as win
from algodsp_tpu.resample import Resampler, Quality
from algodsp_tpu.utils.fftjit import irfft

BIN_SHIFT_THRESHOLD = 0.15
_NORM_FLOOR = 1e-12


def _frame(x, frame_size: int, hop: int):
    n = x.shape[-1]
    n_frames = max(1 + (n - frame_size) // hop, 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_size)[None, :]
    idx = jnp.minimum(idx, n - 1)
    return jnp.take(x, idx, axis=-1), n_frames


def _overlap_add(frames, hop: int, out_len: int, norm=None):
    n_frames, frame_size = frames.shape[-2], frames.shape[-1]
    starts = jnp.arange(n_frames) * hop
    idx = (starts[:, None] + jnp.arange(frame_size)[None, :]).reshape(-1)
    total = (n_frames - 1) * hop + frame_size
    out = jnp.zeros(frames.shape[:-2] + (total,), frames.dtype)
    out = out.at[..., idx].add(frames.reshape(frames.shape[:-2] + (-1,)))
    if norm is not None:
        out = out / jnp.maximum(norm, _NORM_FLOOR)
    if total < out_len:
        out = jnp.concatenate(
            [out, jnp.zeros(out.shape[:-1] + (out_len - total,), out.dtype)],
            axis=-1)
    return out[..., :out_len]


class SpectralPitchShifter:
    def __init__(self, sample_rate: float, *, pitch_ratio: float = 1.0,
                 frame_size: int = 1024, analysis_hop: int = 256,
                 window_type: win.WindowType = win.WindowType.HANN,
                 resample_quality: Quality = Quality.BALANCED):
        if sample_rate <= 0:
            raise ValueError("pitch: sample rate must be > 0")
        if frame_size < 64 or frame_size & (frame_size - 1):
            raise ValueError(f"pitch: frame size must be pow2 >= 64: {frame_size}")
        if not (0 < analysis_hop <= frame_size):
            raise ValueError(f"pitch: invalid analysis hop: {analysis_hop}")
        if not (0.25 <= pitch_ratio <= 4.0):
            raise ValueError(f"pitch: ratio must be in [0.25, 4]: {pitch_ratio}")
        self.sample_rate = sample_rate
        self.pitch_ratio = pitch_ratio
        self.frame_size = frame_size
        self.analysis_hop = analysis_hop
        self.window_type = window_type
        self.resample_quality = resample_quality
        self.window = win.generate(window_type, frame_size, periodic=True)

    @property
    def synthesis_hop(self) -> int:
        return max(int(round(self.analysis_hop * self.pitch_ratio)), 1)

    def effective_pitch_ratio(self) -> float:
        """Quantized ratio on the stretch path
        (`pitch_shift_spectral.go:108-115`)."""
        if self._use_bin_shift():
            return self.pitch_ratio
        return self.synthesis_hop / self.analysis_hop

    def set_pitch_semitones(self, semitones: float):
        self.pitch_ratio = 2.0 ** (semitones / 12.0)

    def _use_bin_shift(self) -> bool:
        return abs(self.pitch_ratio - 1.0) <= BIN_SHIFT_THRESHOLD

    def process(self, x):
        """One-shot pitch shift; output length == input length."""
        x = jnp.asarray(x)
        if self.pitch_ratio == 1.0:
            return x
        if self._use_bin_shift():
            return self._process_bin_shift(x)
        return self._process_stretch_resample(x)

    # -- bin shifting path -------------------------------------------------
    def _process_bin_shift(self, x):
        n = x.shape[-1]
        fs, hop = self.frame_size, self.analysis_hop
        w = jnp.asarray(self.window, x.dtype)
        frames, n_frames = _frame(x, fs, hop)
        spec = jnp.fft.rfft(frames * w, fs)  # (..., F, bins)
        mag = jnp.abs(spec)
        phase = jnp.angle(spec)
        bins = fs // 2 + 1
        r = self.pitch_ratio
        # target bin b gets energy from source bin b/r (linear interp)
        src = jnp.arange(bins) / r
        i0 = jnp.floor(src).astype(jnp.int32)
        frac = (src - i0).astype(x.dtype)
        valid = i0 < bins - 1
        i0c = jnp.clip(i0, 0, bins - 2)
        m = (jnp.take(mag, i0c, axis=-1) * (1 - frac)
             + jnp.take(mag, i0c + 1, axis=-1) * frac)
        m = jnp.where(valid, m, 0.0)
        # phase advance scaled by the ratio, accumulated over frames (cumsum)
        dphi_frame = 2.0 * jnp.pi * jnp.arange(bins) * hop / fs * (r - 1.0)
        acc = jnp.cumsum(jnp.broadcast_to(dphi_frame,
                                          phase.shape[:-2] + (n_frames, bins)),
                         axis=-2)
        p = jnp.take(phase, i0c, axis=-1) + acc.astype(x.dtype)
        import jax
        out_spec = jax.lax.complex(m * jnp.cos(p), m * jnp.sin(p))
        synth = irfft(out_spec, fs).astype(x.dtype) * w
        norm_frames = jnp.broadcast_to(w * w, (n_frames, fs))
        norm = _overlap_add(norm_frames.astype(x.dtype), hop, n)
        y = _overlap_add(synth, hop, n, norm=None)
        return y / jnp.maximum(norm, _NORM_FLOOR)

    # -- time-stretch + resample path -------------------------------------
    def _process_stretch_resample(self, x):
        n = x.shape[-1]
        fs = self.frame_size
        ha, hs = self.analysis_hop, self.synthesis_hop
        w = jnp.asarray(self.window, x.dtype)
        bins = fs // 2 + 1
        frames, n_frames = _frame(x, fs, ha)
        spec = jnp.fft.rfft(frames * w, fs)
        mag = jnp.abs(spec)
        phase = jnp.angle(spec).astype(x.dtype)
        omega = (2.0 * jnp.pi * jnp.arange(bins) / fs).astype(x.dtype)
        # instantaneous frequency: frame-to-frame phase difference
        dphi = jnp.diff(phase, axis=-2, prepend=phase[..., :1, :]) - omega * ha
        dphi = jnp.mod(dphi + jnp.pi, 2.0 * jnp.pi) - jnp.pi
        inst = omega + dphi / ha
        # synthesis phase: cumulative sum of inst*hs over frames
        # (the Go sumPhase recurrence is a prefix sum)
        synth_phase = phase[..., 0:1, :] + jnp.cumsum(inst * hs, axis=-2) \
            - inst[..., 0:1, :] * hs
        import jax
        out_spec = jax.lax.complex(mag * jnp.cos(synth_phase),
                                   mag * jnp.sin(synth_phase))
        synth = irfft(out_spec, fs).astype(x.dtype) * w
        stretched_len = (n_frames - 1) * hs + fs
        norm_frames = jnp.broadcast_to(w * w, (n_frames, fs)).astype(x.dtype)
        norm = _overlap_add(norm_frames, hs, stretched_len)
        stretched = _overlap_add(synth, hs, stretched_len) \
            / jnp.maximum(norm, _NORM_FLOOR)
        # resample back: stretch factor hs/ha, so resample by ha/hs
        rs = Resampler(ha, hs, quality=self.resample_quality)
        y = rs.process(stretched)
        if y.shape[-1] >= n:
            return y[..., :n]
        return jnp.concatenate(
            [y, jnp.zeros(y.shape[:-1] + (n - y.shape[-1],), y.dtype)], axis=-1)
