"""Demo engine: step sequencer + synth + EQ + effect chain.

Capability parity with the reference's browser demo engine
(`internal/webdemo/engine.go:20-64,248,546`): a 16-step sequencer
driving up to 64 synthesizer voices (sine/saw/square/triangle with
exponential decay envelopes), a 5-band EQ where each band can use any
design family (RBJ peak/shelf or high-order Butterworth/Chebyshev),
and a JSON effect chain on the master bus. `render(n)` produces the
next n samples — the block-pull API that the reference exposes to the
browser via wasm (`web/wasm/main.go:254-260`); here it is the
host-side of the host->TPU dispatch boundary.

TPU-first: a whole render block is synthesized vectorially — every
active voice contributes a closed-form waveform segment (no per-sample
voice loop) — then the EQ (blocked-scan biquads) and the jitted chain
run on device.
"""

from __future__ import annotations

import dataclasses
import enum
import math

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu.filters.biquad import BiquadChain
from algodsp_tpu.filters.design import rbj, cascades
from algodsp_tpu.chain import Chain
from algodsp_tpu.demo.spectrum import SpectrumAnalyzer

MAX_VOICES = 64
NUM_STEPS = 16


class Waveform(enum.Enum):
    SINE = "sine"
    SAW = "saw"
    SQUARE = "square"
    TRIANGLE = "triangle"


@dataclasses.dataclass(frozen=True)
class EQBand:
    """One EQ band; family selects the designer (engine.go 5-band EQ)."""
    freq_hz: float
    gain_db: float = 0.0
    q: float = 0.707
    family: str = "peak"  # peak|lowshelf|highshelf|lowpass|highpass|butterworth-lp|butterworth-hp

    def design(self, sample_rate: float) -> np.ndarray:
        if self.family == "peak":
            return rbj.peak(self.freq_hz, self.gain_db, self.q, sample_rate)[None]
        if self.family == "lowshelf":
            return rbj.low_shelf(self.freq_hz, self.gain_db, self.q, sample_rate)[None]
        if self.family == "highshelf":
            return rbj.high_shelf(self.freq_hz, self.gain_db, self.q, sample_rate)[None]
        if self.family == "lowpass":
            return rbj.lowpass(self.freq_hz, self.q, sample_rate)[None]
        if self.family == "highpass":
            return rbj.highpass(self.freq_hz, self.q, sample_rate)[None]
        if self.family == "butterworth-lp":
            return cascades.butterworth_lp(self.freq_hz, 4, sample_rate)
        if self.family == "butterworth-hp":
            return cascades.butterworth_hp(self.freq_hz, 4, sample_rate)
        raise ValueError(f"unknown EQ family: {self.family}")


@dataclasses.dataclass
class _Voice:
    start: int          # absolute sample index of note-on
    freq: float
    waveform: Waveform
    amp: float
    decay_s: float


class Engine:
    def __init__(self, sample_rate: float = 48000.0, *, bpm: float = 120.0,
                 waveform: Waveform = Waveform.SAW, voice_amp: float = 0.25,
                 voice_decay_s: float = 0.25):
        self.sample_rate = sample_rate
        self.bpm = bpm
        self.waveform = waveform
        self.voice_amp = voice_amp
        self.voice_decay = voice_decay_s
        # steps[i] = frequency in Hz or 0 for rest
        self.steps = np.zeros(NUM_STEPS)
        self.eq_bands: list[EQBand] = [
            EQBand(100.0, 0.0, family="lowshelf"),
            EQBand(400.0), EQBand(1000.0), EQBand(4000.0),
            EQBand(10000.0, 0.0, family="highshelf")]
        self._eq_chain = None
        self._eq_state = None
        self.chain: Chain | None = None
        self._chain_state = None
        self._voices: list[_Voice] = []
        self._cursor = 0  # absolute sample position
        self.spectrum = SpectrumAnalyzer(sample_rate)
        self._rebuild_eq()

    # -- configuration ----------------------------------------------------
    def set_step(self, index: int, freq_hz: float):
        """Set sequencer step to a note frequency (0 = rest)."""
        self.steps[index % NUM_STEPS] = freq_hz

    def set_eq(self, bands: list[EQBand]):
        if len(bands) != 5:
            raise ValueError("engine EQ has exactly 5 bands")
        self.eq_bands = list(bands)
        self._rebuild_eq()

    def load_chain(self, graph_json: str):
        self.chain = Chain(self.sample_rate)
        self.chain.load_graph(graph_json)
        self._chain_state = self.chain.init_state((), jnp.float32)

    def _rebuild_eq(self):
        sos = np.concatenate([b.design(self.sample_rate) for b in self.eq_bands])
        self._eq_chain = BiquadChain(sos)
        self._eq_state = self._eq_chain.init_state((), jnp.float32)

    @property
    def samples_per_step(self) -> int:
        return max(int(round(self.sample_rate * 60.0 / self.bpm / 4.0)), 1)

    # -- synthesis --------------------------------------------------------
    def _spawn_voices(self, n: int):
        sps = self.samples_per_step
        first_step = -(-self._cursor // sps)  # next step boundary >= cursor
        last_step = (self._cursor + n - 1) // sps
        for s in range(first_step, last_step + 1):
            freq = float(self.steps[s % NUM_STEPS])
            if freq > 0:
                self._voices.append(_Voice(start=s * sps, freq=freq,
                                           waveform=self.waveform,
                                           amp=self.voice_amp,
                                           decay_s=self.voice_decay))
        # voice stealing: keep the newest MAX_VOICES
        if len(self._voices) > MAX_VOICES:
            self._voices = self._voices[-MAX_VOICES:]
        # drop fully decayed voices (< -80 dB)
        horizon = self._cursor - int(self.voice_decay * 9.2 * self.sample_rate)
        self._voices = [v for v in self._voices if v.start > horizon]

    def _render_voices(self, n: int) -> jnp.ndarray:
        t_abs = self._cursor + np.arange(n)
        out = jnp.zeros((n,), jnp.float32)
        for v in self._voices:
            rel = (t_abs - v.start) / self.sample_rate
            active = rel >= 0
            ph = v.freq * rel
            if v.waveform == Waveform.SINE:
                w = np.sin(2 * np.pi * ph)
            elif v.waveform == Waveform.SAW:
                w = 2.0 * (ph - np.floor(ph + 0.5))
            elif v.waveform == Waveform.SQUARE:
                w = np.sign(np.sin(2 * np.pi * ph))
            else:  # triangle
                w = 2.0 * np.abs(2.0 * (ph - np.floor(ph + 0.5))) - 1.0
            env = np.exp(-np.maximum(rel, 0.0) / v.decay_s)
            out = out + jnp.asarray(
                (active * w * env * v.amp).astype(np.float32))
        return out

    def render(self, n: int) -> np.ndarray:
        """Produce the next n master-bus samples (`engine.go:546-`)."""
        if n <= 0:
            return np.zeros(0, dtype=np.float32)
        self._spawn_voices(n)
        block = self._render_voices(n)
        self._eq_state, block = self._eq_chain.process_stream(self._eq_state, block)
        if self.chain is not None:
            self._chain_state, block = self.chain.process(self._chain_state, block)
        self._cursor += n
        out = np.asarray(block, dtype=np.float32)
        self.spectrum.push(out)  # master-bus analyzer (`spectrum.go:114`)
        return out

    def eq_curve_db(self, freqs) -> np.ndarray:
        """Master EQ magnitude response in dB at freqs (the eq-canvas
        curve the reference draws from `eq.go` chain responses)."""
        return self._eq_chain.magnitude_db(freqs, self.sample_rate)

    def reset(self):
        self._voices = []
        self._cursor = 0
        self._eq_state = self._eq_chain.init_state((), jnp.float32)
        self.spectrum.reset()
        if self.chain is not None:
            self._chain_state = self.chain.init_state((), jnp.float32)
