"""Demo engine: step sequencer + synth + EQ + effect chain.

Capability parity with the reference's browser demo engine
(`internal/webdemo/engine.go:248,546`, `sequencer.go:25-200`): a
16-step sequencer with transport control (tempo, decay, shuffle swing
`sequencer.go:39-51,149`), run/stop gating (`sequencer.go:53-61`),
per-step enable + frequency config (`engine.go:27-29`), up to 64
synthesizer voices (sine/saw/square/triangle, exponential
attack/decay envelopes `sequencer.go:154-173`), a 5-band EQ where
each band can use any design family, a JSON effect chain on the
master bus, and curve endpoints: master/per-node EQ magnitude
response and dynamics static curves (`engine.go:606-672`).
`render(n)` produces the next n samples — the block-pull API the
reference exposes to the browser via wasm (`web/wasm/main.go:254-260`);
here it is the host side of the host->TPU dispatch boundary.

TPU-first: a whole render block is synthesized vectorially — every
active voice contributes a closed-form waveform*envelope segment (no
per-sample voice loop) — then the EQ (blocked-scan biquads) and the
jitted chain run on device.
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
MIN_DECAY_S = 0.02
ATTACK_S = 0.005
ENV_FLOOR = 1e-4       # envelope start/end level (sequencer.go:156-158)

# default pattern: every 4th step enabled, C/E/G/A major-ish scale
# (`engine.go:518`, `sequencer.go:175-178`)
DEFAULT_STEP_FREQS = [130.81, 164.81, 196.0, 220.0,
                      261.63, 329.63, 392.0, 440.0]


class Waveform(enum.Enum):
    SINE = "sine"
    SAW = "saw"
    SQUARE = "square"
    TRIANGLE = "triangle"


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """One sequencer step (`engine.go:27-29`)."""
    enabled: bool = False
    freq_hz: float = 110.0


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
    amp: float          # envelope peak level
    decay_samples: int


def shuffle_ratio(shuffle: float) -> float:
    """0..1 swing control -> 0..1/3 timing ratio (`sequencer.go:149-152`)."""
    return (1.0 / 3.0) * math.pow(min(max(shuffle, 0.0), 1.0), 1.6)


class Engine:
    def __init__(self, sample_rate: float = 48000.0, *, bpm: float = 120.0,
                 waveform: Waveform = Waveform.SAW, voice_amp: float = 0.22,
                 voice_decay_s: float = 0.25):
        self.sample_rate = sample_rate
        self.bpm = bpm
        self.shuffle = 0.0
        self.running = True
        self.waveform = waveform
        self.voice_amp = voice_amp
        self.voice_decay = max(voice_decay_s, MIN_DECAY_S)
        # all steps disabled until configured; `default_pattern()` installs
        # the reference's out-of-the-box pattern (`engine.go:518`)
        self.steps: list[StepConfig] = [
            StepConfig(enabled=False, freq_hz=DEFAULT_STEP_FREQS[i % 8])
            for i in range(NUM_STEPS)]
        self.eq_bands: list[EQBand] = [
            EQBand(100.0, 0.0, family="lowshelf"),
            EQBand(400.0), EQBand(1000.0), EQBand(4000.0),
            EQBand(10000.0, 0.0, family="highshelf")]
        self._eq_chain = None
        self._eq_state = None
        self.chain: Chain | None = None
        self._chain_state = None
        self._voices: list[_Voice] = []
        self._cursor = 0            # absolute sample position
        self._step_index = 0        # next step to trigger
        self._next_trigger = 0.0    # absolute sample time of next trigger
        self.spectrum = SpectrumAnalyzer(sample_rate)
        self._rebuild_eq()

    # -- configuration ----------------------------------------------------
    def set_step(self, index: int, freq_hz: float):
        """Set sequencer step to a note frequency (0 = rest)."""
        i = index % NUM_STEPS
        self.steps[i] = StepConfig(enabled=freq_hz > 0,
                                   freq_hz=freq_hz if freq_hz > 0 else 110.0)

    def default_pattern(self):
        """Install the reference's out-of-the-box pattern: every 4th
        step enabled on the default scale (`engine.go:518`)."""
        self.steps = [StepConfig(enabled=(i % 4 == 0),
                                 freq_hz=DEFAULT_STEP_FREQS[i % 8])
                      for i in range(NUM_STEPS)]

    def set_steps(self, steps: list):
        """Bulk step config (`sequencer.go:63-73`). Each entry is a
        StepConfig, a dict {enabled, freq}, or a bare frequency."""
        for i, s in enumerate(steps[:NUM_STEPS]):
            if isinstance(s, StepConfig):
                cfg = s
            elif isinstance(s, dict):
                cfg = StepConfig(enabled=bool(s.get("enabled", True)),
                                 freq_hz=float(s.get("freq", s.get("freqHz", 110.0))))
            else:
                self.set_step(i, float(s))
                continue
            if cfg.freq_hz <= 0:
                cfg = dataclasses.replace(cfg, freq_hz=110.0)
            self.steps[i] = cfg

    def set_transport(self, bpm: float | None = None,
                      decay_s: float | None = None,
                      shuffle: float | None = None):
        """Tempo / decay / swing (`sequencer.go:39-51`)."""
        if bpm is not None and bpm > 0:
            self.bpm = float(bpm)
        if decay_s is not None:
            self.voice_decay = max(float(decay_s), MIN_DECAY_S)
        if shuffle is not None:
            self.shuffle = min(max(float(shuffle), 0.0), 1.0)

    def set_running(self, running: bool):
        """Start/stop step triggering (`sequencer.go:53-61`); restarting
        rewinds to step 0 at the next render block."""
        if running and not self.running:
            self._step_index = 0
            self._next_trigger = float(self._cursor)
        self.running = bool(running)

    def set_waveform(self, name: str):
        """Oscillator shape for newly-triggered voices (`sequencer.go:25`)."""
        try:
            self.waveform = Waveform(name)
        except ValueError:
            self.waveform = Waveform.SINE

    @property
    def current_step(self) -> int:
        """Most recently triggered step (`engine.go:532-535`)."""
        return (self._step_index - 1) % NUM_STEPS

    def set_eq(self, bands: list[EQBand]):
        if len(bands) != 5:
            raise ValueError("engine EQ has exactly 5 bands")
        self.eq_bands = list(bands)
        self._rebuild_eq()

    def load_chain(self, graph_json: str):
        self.chain = Chain(self.sample_rate)
        # keep every node a separate runtime: the demo's per-node
        # curve/metering endpoints (/node_curve, /dyn_curve) introspect
        # individual effects, which LTI fusion intentionally collapses
        self.chain.load_graph(graph_json, auto_fuse=False)
        self._chain_state = self.chain.init_state((), jnp.float32)

    def _rebuild_eq(self):
        sos = np.concatenate([b.design(self.sample_rate) for b in self.eq_bands])
        self._eq_chain = BiquadChain(sos)
        self._eq_state = self._eq_chain.init_state((), jnp.float32)

    # -- sequencer timing -------------------------------------------------
    @property
    def samples_per_step(self) -> float:
        return self.sample_rate * 60.0 / self.bpm / 4.0

    def step_duration(self, step_index: int) -> float:
        """Swing: even steps stretch, odd steps shrink by the shuffle
        ratio (`sequencer.go:134-147`); pattern length is unchanged."""
        base = self.samples_per_step
        r = shuffle_ratio(self.shuffle)
        if r <= 0:
            return base
        return base * (1 + r) if step_index % 2 == 0 else base * (1 - r)

    # -- synthesis --------------------------------------------------------
    def _spawn_voices(self, n: int):
        if not self.running:
            return
        end = self._cursor + n
        while self._next_trigger < end:
            step = self.steps[self._step_index % NUM_STEPS]
            if step.enabled and step.freq_hz > 0:
                self._voices.append(_Voice(
                    start=int(self._next_trigger), freq=step.freq_hz,
                    waveform=self.waveform, amp=self.voice_amp,
                    decay_samples=max(int(self.voice_decay * self.sample_rate), 1)))
            self._next_trigger += self.step_duration(self._step_index % NUM_STEPS)
            self._step_index += 1
        # voice stealing: keep the newest MAX_VOICES (`sequencer.go:81-84`)
        if len(self._voices) > MAX_VOICES:
            self._voices = self._voices[-MAX_VOICES:]
        # drop fully decayed voices
        self._voices = [v for v in self._voices
                        if v.start + v.decay_samples > self._cursor]

    def _envelope(self, age: np.ndarray, decay_samples: int,
                  peak: float) -> np.ndarray:
        """Exponential attack to `peak` over 5 ms, exponential decay back
        to the floor over the rest (`sequencer.go:154-173`), closed form
        over a whole block of ages."""
        attack = max(int(ATTACK_S * self.sample_rate), 1)
        atk = ENV_FLOOR * np.power(peak / ENV_FLOOR,
                                   np.minimum(age, attack) / attack)
        if decay_samples <= attack:
            dec = np.ones_like(atk)
        else:
            t = np.clip((age - attack) / (decay_samples - attack), 0.0, 1.0)
            dec = np.power(ENV_FLOOR / peak, t)
        env = np.where(age < attack, atk, peak * dec)
        return np.where((age >= 0) & (age < decay_samples), env, 0.0)

    def _render_voices(self, n: int) -> jnp.ndarray:
        t_abs = self._cursor + np.arange(n)
        out = np.zeros((n,), np.float64)
        for v in self._voices:
            age = t_abs - v.start
            rel = age / self.sample_rate
            ph = v.freq * np.maximum(rel, 0.0)
            if v.waveform == Waveform.SINE:
                w = np.sin(2 * np.pi * ph)
            elif v.waveform == Waveform.SAW:
                w = 2.0 * (ph - np.floor(ph + 0.5))
            elif v.waveform == Waveform.SQUARE:
                w = np.sign(np.sin(2 * np.pi * ph))
            else:  # triangle
                w = 2.0 * np.abs(2.0 * (ph - np.floor(ph + 0.5))) - 1.0
            out += w * self._envelope(age, v.decay_samples, v.amp)
        return jnp.asarray(out.astype(np.float32))

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

    # -- curve endpoints (`engine.go:606-672`) ----------------------------
    def eq_curve_db(self, freqs) -> np.ndarray:
        """Master EQ magnitude response in dB at freqs (the eq-canvas
        curve the reference draws from `eq.go` chain responses)."""
        return self._eq_chain.magnitude_db(freqs, self.sample_rate)

    def node_response_db(self, node_id: str, freqs) -> np.ndarray:
        """Magnitude response of one chain node in dB
        (`engine.go:623-649` NodeResponseCurveDB analog — here any
        filter-backed node of the loaded graph by id)."""
        fx = self._node_effect(node_id)
        if not hasattr(fx, "magnitude_db"):
            raise ValueError(f"node {node_id!r} has no frequency response")
        return fx.magnitude_db(freqs, self.sample_rate)

    def node_static_curve_db(self, node_id: str, inputs_db) -> np.ndarray:
        """Static transfer curve of a dynamics node: output level in dB
        for input levels in dB (`engine.go:651-672` Compressor/Limiter
        CurveDB analogs, generalized to any dynamics node)."""
        fx = self._node_effect(node_id)
        if not hasattr(fx, "calculate_output_level"):
            raise ValueError(f"node {node_id!r} has no static curve")
        inputs_db = np.asarray(inputs_db, np.float64)
        lin = np.power(10.0, inputs_db / 20.0)
        out = np.asarray(jax.jit(fx.calculate_output_level)(lin))
        return 20.0 * np.log10(np.maximum(out, 1e-12))

    def _node_effect(self, node_id: str):
        if self.chain is None or node_id not in self.chain.runtimes:
            raise KeyError(f"unknown chain node {node_id!r}")
        fx = self.chain.runtimes[node_id].effect
        if fx is None:
            raise ValueError(f"node {node_id!r} exposes no effect object")
        return fx

    def reset(self):
        self._voices = []
        self._cursor = 0
        self._step_index = 0
        self._next_trigger = 0.0
        self._eq_state = self._eq_chain.init_state((), jnp.float32)
        self.spectrum.reset()
        if self.chain is not None:
            self._chain_state = self.chain.init_state((), jnp.float32)
