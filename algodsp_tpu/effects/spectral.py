"""Spectral and granular texture effects.

SpectralFreeze — capability parity with `dsp/effects/spectral_freeze.go`:
STFT processing where, while frozen, every frame is resynthesized from a
captured magnitude spectrum with phase either held or advanced by the
bin frequency per hop (`spectral_freeze.go:229-300`); windowed
overlap-add with window-power normalization; wet/dry mix.

Granular — capability parity with `dsp/effects/granular.go`: overlap-add
grain scheduling over the input timeline with per-grain pitch
(playback-rate) and Hann envelopes, deterministic seeded position spray.

TPU-first: both are frame/grain-parallel — frames gather + batched FFT;
grains are static slots whose (start, age) trajectories are closed-form
in the sample index, so every grain contribution is one vectorized
interpolated gather. The frozen-phase accumulation is a cumsum over
frames.
"""

from __future__ import annotations

import enum
import math

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu import window as win
from algodsp_tpu.delayline import fractional_read
from algodsp_tpu.interp import Mode
from algodsp_tpu.utils.fftjit import irfft

_NORM_FLOOR = 1e-12


class FreezePhaseMode(enum.Enum):
    HOLD = "hold"
    ADVANCE = "advance"


class SpectralFreeze:
    def __init__(self, sample_rate: float, *, frame_size: int = 2048,
                 hop_size: int = 512, frozen: bool = False,
                 phase_mode: FreezePhaseMode = FreezePhaseMode.ADVANCE,
                 mix: float = 1.0,
                 window_type: win.WindowType = win.WindowType.HANN):
        if frame_size < 64 or frame_size & (frame_size - 1):
            raise ValueError(f"spectral freeze: frame size must be pow2 >= 64: {frame_size}")
        if not (0 < hop_size <= frame_size):
            raise ValueError(f"spectral freeze: invalid hop: {hop_size}")
        self.sample_rate = sample_rate
        self.frame_size = frame_size
        self.hop_size = hop_size
        self.frozen = frozen
        self.phase_mode = phase_mode
        self.mix = mix
        self.window = win.generate(window_type, frame_size, periodic=True)

    def process(self, x):
        """One-shot buffer processing (`spectral_freeze.go:193-320`).

        When frozen, the first frame's spectrum is captured and all
        frames resynthesize from it.
        """
        x = jnp.asarray(x)
        n = x.shape[-1]
        fs, hop = self.frame_size, self.hop_size
        w = jnp.asarray(self.window, x.dtype)
        n_frames = 1 + (n - 1) // hop
        idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(fs)[None, :]
        valid = idx < n
        frames = jnp.where(valid, jnp.take(x, jnp.minimum(idx, n - 1), axis=-1), 0.0)
        spec = jnp.fft.rfft(frames * w, fs)
        mag = jnp.abs(spec)
        phase = jnp.angle(spec).astype(x.dtype)

        if self.frozen:
            held_mag = mag[..., 0:1, :]
            held_phase = phase[..., 0:1, :]
            if self.phase_mode == FreezePhaseMode.ADVANCE:
                omega = (2.0 * jnp.pi * jnp.arange(fs // 2 + 1) / fs).astype(x.dtype)
                adv = omega * hop
                steps = jnp.arange(n_frames, dtype=x.dtype)[:, None]
                ph = held_phase + adv * steps
            else:
                ph = jnp.broadcast_to(held_phase, phase.shape)
            out_mag = jnp.broadcast_to(held_mag, mag.shape)
        else:
            out_mag, ph = mag, phase
        out_spec = jax.lax.complex(out_mag * jnp.cos(ph), out_mag * jnp.sin(ph))
        synth = irfft(out_spec, fs).astype(x.dtype) * w

        starts = jnp.arange(n_frames) * hop
        oidx = (starts[:, None] + jnp.arange(fs)[None, :]).reshape(-1)
        total = (n_frames - 1) * hop + fs
        wet = jnp.zeros(x.shape[:-1] + (total,), x.dtype)
        wet = wet.at[..., oidx].add(synth.reshape(synth.shape[:-2] + (-1,)))
        norm = jnp.zeros((total,), x.dtype).at[oidx].add(
            jnp.broadcast_to(w * w, (n_frames, fs)).reshape(-1))
        wet = (wet / jnp.maximum(norm, _NORM_FLOOR))[..., :n]
        if wet.shape[-1] < n:
            # the frame/grain grid ends before the signal does: the
            # uncovered tail has a silent wet path
            wet = jnp.pad(wet, [(0, 0)] * (wet.ndim - 1)
                          + [(0, n - wet.shape[-1])])
        return x * (1.0 - self.mix) + wet * self.mix


class Granular:
    """Overlap-add granular texture (`granular.go:218-280` semantics).

    Grains are scheduled at a fixed rate derived from grain length and
    overlap; each grain reads the input timeline at its own playback
    rate with a Hann envelope; spray adds deterministic position jitter.
    """

    def __init__(self, sample_rate: float, *, grain_seconds: float = 0.08,
                 overlap: float = 0.5, pitch: float = 1.0,
                 spray_seconds: float = 0.0, mix: float = 1.0, seed: int = 1):
        if not (0.005 <= grain_seconds <= 0.5):
            raise ValueError(f"granular grain seconds out of range: {grain_seconds}")
        if not (0.0 <= overlap <= 0.95):
            raise ValueError(f"granular overlap out of range: {overlap}")
        if not (0.25 <= pitch <= 4.0):
            raise ValueError(f"granular pitch out of range: {pitch}")
        self.sample_rate = sample_rate
        self.grain = max(int(grain_seconds * sample_rate), 8)
        self.hop = max(int(self.grain * (1.0 - overlap)), 1)
        self.pitch = pitch
        self.spray = int(spray_seconds * sample_rate)
        self.mix = mix
        self.seed = seed
        self.env = win.generate(win.WindowType.HANN, self.grain)

    def process(self, x):
        """One-shot granular resynthesis over the buffer."""
        x = jnp.asarray(x)
        n = x.shape[-1]
        g, hop = self.grain, self.hop
        n_grains = max((n - g) // hop + 1, 1)
        rng = np.random.default_rng(self.seed)
        spray = (rng.integers(-self.spray, self.spray + 1, n_grains)
                 if self.spray > 0 else np.zeros(n_grains, dtype=np.int64))
        starts = np.clip(np.arange(n_grains) * hop + spray, 0,
                         max(n - g, 0)).astype(np.float64)
        # each grain reads at its own rate: src = start + age*pitch
        ages = jnp.arange(g, dtype=x.dtype)
        src = jnp.asarray(starts, x.dtype)[:, None] + ages[None, :] * self.pitch
        # x gains a broadcast dim so the grain axis of src pairs with it
        # instead of merging into the channel batch: (..., 1, T) read at
        # (G, g) -> (..., G, g)
        grains = fractional_read(x[..., None, :], src, Mode.LINEAR)
        env = jnp.asarray(self.env, x.dtype)
        shaped = grains * env
        out_starts = jnp.arange(n_grains) * hop
        oidx = (out_starts[:, None] + jnp.arange(g)[None, :]).reshape(-1)
        total = int((n_grains - 1) * hop + g)
        wet = jnp.zeros(x.shape[:-1] + (total,), x.dtype)
        wet = wet.at[..., oidx].add(shaped.reshape(shaped.shape[:-2] + (-1,)))
        norm = jnp.zeros((total,), x.dtype).at[oidx].add(
            jnp.broadcast_to(env, (n_grains, g)).reshape(-1))
        wet = (wet / jnp.maximum(norm, _NORM_FLOOR))[..., :n]
        if wet.shape[-1] < n:
            # the frame/grain grid ends before the signal does: the
            # uncovered tail has a silent wet path
            wet = jnp.pad(wet, [(0, 0)] * (wet.ndim - 1)
                          + [(0, n - wet.shape[-1])])
        return x * (1.0 - self.mix) + wet * self.mix
