"""Dynamics processors built on the shared core.

Capability parity with `dsp/effects/dynamics/`:
Compressor (`compressor.go`), Expander (`expander.go`), Gate with hold
timer (`gate.go`), Limiter = 100:1/0.1 ms hard-knee compressor preset
(`limiter.go`), LookaheadLimiter (delayed program path + early detector,
`lookahead_limiter.go:23-36,185-210`), DeEsser (band detector + split
or wideband gain, `deesser.go`), TransientShaper (attack/sustain split,
`transient_shaper.go:139-188`), MultibandCompressor (crossover tree +
per-band cores, `multiband.go:27-130`).

All processors are functional: `process(state, x, ...) -> (state, y)`,
vectorized over leading channel dims; metrics (input/output peak, min
gain) are returned per block rather than accumulated in hidden state.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu.effects.dynamics.core import (
    DynamicsConfig, DynamicsCore, Topology, DetectorMode,
    downward_expansion_gain, dynamics_env_scan, LOG2_OF_10_DIV_20)
from algodsp_tpu.filters.biquad import BiquadChain
from algodsp_tpu.filters.design.rbj import bandpass, highpass
from algodsp_tpu.filters.crossover import Crossover, MultiBand


@dataclasses.dataclass(frozen=True)
class BlockMetrics:
    """Per-block metering (`compressor.go:31-35`)."""
    input_peak: float
    output_peak: float
    gain_reduction: float


def _metrics(x, y, gain) -> BlockMetrics:
    return BlockMetrics(
        input_peak=float(jnp.max(jnp.abs(x))),
        output_peak=float(jnp.max(jnp.abs(y))),
        gain_reduction=float(jnp.min(gain)))


class Compressor:
    """Soft-knee compressor (`compressor.go:77-120` defaults)."""

    def __init__(self, sample_rate: float, *, threshold_db: float = -20.0,
                 ratio: float = 4.0, knee_db: float = 6.0,
                 attack_ms: float = 10.0, release_ms: float = 100.0,
                 makeup_gain_db: float = 0.0, auto_makeup: bool = False,
                 topology: Topology = Topology.FEEDFORWARD,
                 detector_mode: DetectorMode = DetectorMode.PEAK,
                 feedback_ratio_scale: bool = False,
                 rms_window_ms: float = 30.0,
                 sidechain_low_cut_hz: float = 0.0,
                 sidechain_high_cut_hz: float = 0.0):
        self.core = DynamicsCore(DynamicsConfig(
            sample_rate=sample_rate, topology=topology,
            detector_mode=detector_mode,
            feedback_ratio_scale=feedback_ratio_scale,
            threshold_db=threshold_db, ratio=ratio, knee_db=knee_db,
            attack_ms=attack_ms, release_ms=release_ms,
            rms_window_ms=rms_window_ms, auto_makeup=auto_makeup,
            makeup_gain_db=makeup_gain_db,
            sidechain_low_cut_hz=sidechain_low_cut_hz,
            sidechain_high_cut_hz=sidechain_high_cut_hz))

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return self.core.init_state(batch_shape, dtype)

    def process(self, state, x, sidechain=None, *, with_gain: bool = False):
        state, y, gain = self.core.process(state, x, sidechain)
        if with_gain:
            return state, y, gain
        return state, y

    def calculate_output_level(self, input_magnitude):
        """Steady-state output level (`compressor.go:369`)."""
        mag = jnp.abs(jnp.asarray(input_magnitude))
        gain = self.core.gain_for_level(mag)
        return mag * gain * self.core.makeup_gain_lin


class Limiter(Compressor):
    """Peak limiter: 100:1, 0.1 ms attack, hard knee (`limiter.go:11-43`)."""

    def __init__(self, sample_rate: float, *, threshold_db: float = -20.0,
                 release_ms: float = 100.0):
        super().__init__(sample_rate, threshold_db=threshold_db, ratio=100.0,
                         knee_db=0.0, attack_ms=0.1, release_ms=release_ms,
                         makeup_gain_db=0.0, auto_makeup=False)


class _ExpansionBase:
    """Shared machinery for downward expanders / gates."""

    def __init__(self, sample_rate: float, threshold_db: float, ratio: float,
                 knee_db: float, attack_ms: float, release_ms: float,
                 range_db: float, detector_mode: DetectorMode,
                 rms_window_ms: float):
        self.core = DynamicsCore(DynamicsConfig(
            sample_rate=sample_rate, threshold_db=threshold_db, ratio=ratio,
            knee_db=knee_db, attack_ms=attack_ms, release_ms=release_ms,
            detector_mode=detector_mode, rms_window_ms=rms_window_ms))
        self.range_db = range_db
        self.range_lin = 10.0 ** (range_db / 20.0)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return self.core.init_state(batch_shape, dtype)

    def _gain(self, level):
        c = self.core
        return downward_expansion_gain(
            level, c.threshold_log2, c.cfg.knee_db, c.knee_width_log2,
            c.inv_knee_width_log2, c.cfg.ratio, self.range_lin)


class Expander(_ExpansionBase):
    """Downward expander (`expander.go:66-120` defaults)."""

    def __init__(self, sample_rate: float, *, threshold_db: float = -40.0,
                 ratio: float = 2.0, knee_db: float = 6.0,
                 attack_ms: float = 5.0, release_ms: float = 50.0,
                 range_db: float = -60.0,
                 detector_mode: DetectorMode = DetectorMode.PEAK,
                 rms_window_ms: float = 30.0):
        super().__init__(sample_rate, threshold_db, ratio, knee_db,
                         attack_ms, release_ms, range_db, detector_mode,
                         rms_window_ms)

    def process(self, state, x, sidechain=None, *, with_gain: bool = False):
        x = jnp.asarray(x)
        sc = x if sidechain is None else jnp.asarray(sidechain)
        state, level = self.core.detector(state, sc)
        gain = self._gain(level)
        y = x * gain
        if with_gain:
            return state, y, gain
        return state, y


class Gate(_ExpansionBase):
    """Soft-knee noise gate with hold (`gate.go:83-376`)."""

    def __init__(self, sample_rate: float, *, threshold_db: float = -40.0,
                 ratio: float = 10.0, knee_db: float = 6.0,
                 attack_ms: float = 0.1, hold_ms: float = 50.0,
                 release_ms: float = 100.0, range_db: float = -80.0,
                 detector_mode: DetectorMode = DetectorMode.PEAK,
                 rms_window_ms: float = 30.0):
        super().__init__(sample_rate, threshold_db, ratio, knee_db,
                         attack_ms, release_ms, range_db, detector_mode,
                         rms_window_ms)
        self.hold_samples = int(hold_ms * 1e-3 * sample_rate)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        st = super().init_state(batch_shape, dtype)
        st["hold"] = jnp.zeros(batch_shape, jnp.int32)
        return st

    def process(self, state, x, sidechain=None, *, with_gain: bool = False):
        x = jnp.asarray(x)
        sc = x if sidechain is None else jnp.asarray(sidechain)
        state, level = self.core.detector(state, sc)
        gain = self._gain(level)
        # hold timer (`gate.go:360-367`): while gain >= 1 reset the
        # counter; otherwise hold unity gain until it expires. A tiny
        # integer scan over the precomputed gain trajectory.
        gs = jnp.moveaxis(gain, -1, 0)

        def step(hold, g):
            reset = g >= 1.0
            held = jnp.logical_and(~reset, hold > 0)
            g_out = jnp.where(held, 1.0, g)
            hold = jnp.where(reset, self.hold_samples,
                             jnp.maximum(hold - 1, 0))
            return hold, g_out

        hold_f, gated = jax.lax.scan(step, state["hold"], gs)
        gain = jnp.moveaxis(gated, 0, -1)
        state = dict(state)
        state["hold"] = hold_f
        y = x * gain
        if with_gain:
            return state, y, gain
        return state, y


class LookaheadLimiter:
    """Limiter with lookahead delay on the program path
    (`lookahead_limiter.go:23-36,185-210`): the detector runs
    lookahead_ms ahead of the delayed signal."""

    def __init__(self, sample_rate: float, *, lookahead_ms: float = 5.0,
                 threshold_db: float = -1.0, release_ms: float = 50.0):
        if lookahead_ms <= 0:
            raise ValueError("lookahead must be > 0 ms")
        self.delay = max(int(round(lookahead_ms * 1e-3 * sample_rate)), 1)
        self.comp = Limiter(sample_rate, threshold_db=threshold_db,
                            release_ms=release_ms)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {"core": self.comp.init_state(batch_shape, dtype),
                "delay": jnp.zeros(batch_shape + (self.delay,), dtype)}

    def process(self, state, x, sidechain=None):
        x = jnp.asarray(x)
        sc = x if sidechain is None else jnp.asarray(sidechain)
        cstate, _, gain = self.comp.core.process(state["core"], sc)
        ext = jnp.concatenate([state["delay"].astype(x.dtype), x], axis=-1)
        delayed = ext[..., :x.shape[-1]]
        y = delayed * gain
        return {"core": cstate, "delay": ext[..., x.shape[-1]:]}, y


class DeEsser:
    """Sibilance reducer (`deesser.go`): band-limited detector drives a
    compressor whose gain is applied to the high band (split mode) or
    the whole signal (wideband)."""

    def __init__(self, sample_rate: float, *, freq_hz: float = 6000.0,
                 q: float = 1.5, threshold_db: float = -20.0,
                 ratio: float = 4.0, knee_db: float = 3.0,
                 attack_ms: float = 0.5, release_ms: float = 20.0,
                 range_db: float = -24.0, split_band: bool = True,
                 detect_bandpass: bool = True, listen: bool = False):
        self.split_band = split_band
        self.listen = listen
        self.range_lin = 10.0 ** (range_db / 20.0)
        if detect_bandpass:
            self.detector_filter = BiquadChain(bandpass(freq_hz, q, sample_rate))
        else:
            self.detector_filter = BiquadChain(highpass(freq_hz, q, sample_rate))
        self.crossover = Crossover(freq_hz, 4, sample_rate) if split_band else None
        self.core = DynamicsCore(DynamicsConfig(
            sample_rate=sample_rate, threshold_db=threshold_db, ratio=ratio,
            knee_db=knee_db, attack_ms=attack_ms, release_ms=release_ms))

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        st = {"core": self.core.init_state(batch_shape, dtype),
              "det": self.detector_filter.init_state(batch_shape, dtype)}
        if self.crossover is not None:
            st["xo"] = self.crossover.init_state(batch_shape, dtype)
        return st

    def process(self, state, x):
        x = jnp.asarray(x)
        dstate, det = self.detector_filter.process_stream(state["det"], x)
        cstate, level = self.core.detector(state["core"], det)
        gain = jnp.maximum(self.core.gain_for_level(level),
                           self.range_lin)
        new_state = {"core": cstate, "det": dstate}
        if self.crossover is not None:
            xstate, (lo, hi) = self.crossover.process_stream(state["xo"], x)
            new_state["xo"] = xstate
            y = hi * gain if self.listen else lo + hi * gain
        else:
            y = x * gain
        return new_state, y


class TransientShaper:
    """Attack/sustain shaper (`transient_shaper.go:139-188`)."""

    def __init__(self, sample_rate: float, *, attack_amount: float = 0.0,
                 sustain_amount: float = 0.0, attack_ms: float = 1.0,
                 release_ms: float = 100.0):
        for v, name in [(attack_amount, "attack"), (sustain_amount, "sustain")]:
            if not (-1.0 <= v <= 1.0):
                raise ValueError(f"transient shaper {name} amount must be in [-1,1]: {v}")
        self.attack_amount = attack_amount
        self.sustain_amount = sustain_amount
        self.attack_coeff = self._coeff(attack_ms, sample_rate)
        self.release_coeff = self._coeff(release_ms, sample_rate)

    @staticmethod
    def _coeff(ms: float, sr: float) -> float:
        sec = ms / 1000.0
        if sec <= 0:
            return 1.0
        return 1.0 - math.exp(-1.0 / (sec * sr))

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return jnp.zeros(batch_shape, dtype)

    def process(self, state, x):
        x = jnp.asarray(x)
        xs = jnp.moveaxis(jnp.abs(x), -1, 0)
        a = jnp.asarray(self.attack_coeff, x.dtype)
        r = jnp.asarray(self.release_coeff, x.dtype)

        def step(env, s):
            coeff = jnp.where(s > env, a, r)
            new_env = env + coeff * (s - env)
            delta = new_env - env
            norm = jnp.minimum(jnp.abs(delta) / (env + 1e-9), 1.0)
            gain = 1.0 + jnp.where(delta >= 0,
                                   self.attack_amount * norm,
                                   self.sustain_amount * norm)
            return new_env, jnp.maximum(gain, 0.0)

        env_f, gains = jax.lax.scan(step, state, xs)
        return env_f, x * jnp.moveaxis(gains, 0, -1)


@dataclasses.dataclass(frozen=True)
class BandConfig:
    """Per-band compressor settings (`multiband.go:27-42`)."""
    threshold_db: float = -20.0
    ratio: float = 4.0
    knee_db: float = 6.0
    attack_ms: float = 10.0
    release_ms: float = 100.0
    makeup_gain_db: float = 0.0


class MultibandCompressor:
    """Crossover tree + per-band compressors (`multiband.go:92-160`)."""

    def __init__(self, freqs, order: int, sample_rate: float,
                 configs: list[BandConfig] | None = None):
        self.multiband = MultiBand(freqs, order, sample_rate)
        n_bands = self.multiband.num_bands
        if configs is None:
            configs = [BandConfig() for _ in range(n_bands)]
        if len(configs) != n_bands:
            raise ValueError(
                f"multiband: {len(configs)} configs for {n_bands} bands")
        self.bands = [Compressor(sample_rate,
                                 threshold_db=c.threshold_db, ratio=c.ratio,
                                 knee_db=c.knee_db, attack_ms=c.attack_ms,
                                 release_ms=c.release_ms,
                                 makeup_gain_db=c.makeup_gain_db)
                      for c in configs]

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {"xo": self.multiband.init_state(batch_shape, dtype),
                "bands": [b.init_state(batch_shape, dtype) for b in self.bands]}

    def process(self, state, x):
        xo_state, band_signals = self.multiband.process_stream(state["xo"], x)
        new_band_states = []
        y = None
        for comp, bstate, sig in zip(self.bands, state["bands"], band_signals):
            bstate, out = comp.process(bstate, sig)
            new_band_states.append(bstate)
            y = out if y is None else y + out
        return {"xo": xo_state, "bands": new_band_states}, y
