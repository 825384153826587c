"""Effect registry: node type -> runtime factory.

Capability parity with `dsp/effectchain/registry.go` +
`registry_defaults.go:48-300`: the full default set — modulation
(chorus/flanger/ringmod/phaser/tremolo), waveshaping (bitcrusher/
distortion/dist-cheb/transformer), widener, delays, 10 filter variants,
bass, pitch (time/spectral), spectral-freeze, granular, reverbs
(freeverb/fdn/conv), dynamics (compressor/limiter/lookahead/gate/
expander/deesser/transient/multiband), vocoder, split-freq. Parameter
keys follow the reference's camelCase JSON names (mix, rateHz,
thresholdDB, attackMs, ...).

Every runtime is a functional `NodeRuntime`: explicit state pytree,
`process(state, x, sidechain) -> (state, y)` — so a whole chain traces
into ONE XLA program (the TPU analog of `chain_process.go:11-33`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Context:
    sample_rate: float
    block_size: int = 512


@dataclasses.dataclass
class NodeRuntime:
    init_state: Callable          # (batch_shape, dtype) -> pytree
    process: Callable             # (state, x, sidechain) -> (state, y)
    n_outputs: int = 1            # split-freq has 2 ports


class Registry:
    def __init__(self):
        self._factories: dict[str, Callable[[Context, dict], NodeRuntime]] = {}

    def register(self, type_name: str,
                 factory: Callable[[Context, dict], NodeRuntime]):
        if type_name in self._factories:
            raise ValueError(f"registry: duplicate type {type_name!r}")
        self._factories[type_name] = factory

    def lookup(self, type_name: str):
        if type_name not in self._factories:
            raise KeyError(f"registry: unknown effect type {type_name!r}")
        return self._factories[type_name]

    def types(self):
        return sorted(self._factories)


def _num(p: dict, key: str, default: float) -> float:
    v = p.get(key, default)
    try:
        return float(v)
    except (TypeError, ValueError):
        return float(default)


def _stateless(fn) -> NodeRuntime:
    return NodeRuntime(
        init_state=lambda batch_shape=(), dtype=jnp.float32: {},
        process=lambda st, x, sc: (st, fn(x)))


def _stateful(fx, *, sidechain: bool = False) -> NodeRuntime:
    if sidechain:
        def proc(st, x, sc):
            return fx.process(st, x, sc if sc is not None else x)
    else:
        def proc(st, x, sc):
            return fx.process(st, x)
    return NodeRuntime(init_state=fx.init_state, process=proc)


def default_registry() -> Registry:
    """Build the default registry (registry_defaults.go:48-300)."""
    from algodsp_tpu.effects.modulation import (
        Chorus, Flanger, Phaser, Tremolo, RingModulator)
    from algodsp_tpu.effects.waveshape import (
        Distortion, DistortionMode, BitCrusher, TransformerSimulation,
        HarmonicBass)
    from algodsp_tpu.effects.delay_effect import Delay
    from algodsp_tpu.effects.spatial import StereoWidener
    from algodsp_tpu.effects.reverb import Freeverb, FDNReverb, ConvolutionReverb
    from algodsp_tpu.effects.dynamics import (
        Compressor, Limiter, LookaheadLimiter, Gate, Expander, DeEsser,
        TransientShaper, MultibandCompressor)
    from algodsp_tpu.effects.vocoder import Vocoder
    from algodsp_tpu.effects.pitch import SpectralPitchShifter, WSOLAPitchShifter
    from algodsp_tpu.effects.spectral import SpectralFreeze, Granular
    from algodsp_tpu.filters.biquad import BiquadChain
    from algodsp_tpu.filters.moog import MoogFilter
    from algodsp_tpu.filters.crossover import Crossover
    from algodsp_tpu.filters.design import rbj

    r = Registry()

    # -- modulation -------------------------------------------------------
    r.register("chorus", lambda ctx, p: _stateful(Chorus(
        ctx.sample_rate, speed_hz=_num(p, "rateHz", 0.8),
        depth_seconds=_num(p, "depth", 0.004),
        base_delay_seconds=_num(p, "baseDelay", 0.02),
        mix=_num(p, "mix", 0.5), stages=int(_num(p, "stages", 3)))))
    r.register("flanger", lambda ctx, p: _stateful(Flanger(
        ctx.sample_rate, rate_hz=_num(p, "rateHz", 0.25),
        depth_seconds=_num(p, "depth", 0.002),
        base_delay_seconds=_num(p, "baseDelay", 0.002),
        feedback=_num(p, "feedback", 0.5), mix=_num(p, "mix", 0.5))))
    r.register("ringmod", lambda ctx, p: _stateful(RingModulator(
        ctx.sample_rate, carrier_hz=_num(p, "freqHz", 440.0),
        mix=_num(p, "mix", 1.0))))
    r.register("phaser", lambda ctx, p: _stateful(Phaser(
        ctx.sample_rate, rate_hz=_num(p, "rateHz", 0.5),
        stages=int(_num(p, "stages", 4)),
        feedback=_num(p, "feedback", 0.5), mix=_num(p, "mix", 0.5))))
    r.register("tremolo", lambda ctx, p: _stateful(Tremolo(
        ctx.sample_rate, rate_hz=_num(p, "rateHz", 5.0),
        depth=_num(p, "depth", 0.5), mix=_num(p, "mix", 1.0),
        smoothing_ms=_num(p, "smoothingMs", 0.0))))

    # -- waveshaping ------------------------------------------------------
    r.register("bitcrusher", lambda ctx, p: _stateful(BitCrusher(
        ctx.sample_rate, bit_depth=_num(p, "bits", 8.0),
        downsample=int(_num(p, "downsample", 4)), mix=_num(p, "mix", 1.0))))
    r.register("distortion", lambda ctx, p: _stateful(Distortion(
        mode=DistortionMode(p.get("mode", "soft_clip")),
        drive=_num(p, "drive", 1.0), shape=_num(p, "shape", 0.5),
        output_level=_num(p, "output", 1.0), mix=_num(p, "mix", 1.0))))
    r.register("dist-cheb", lambda ctx, p: _stateful(Distortion(
        mode=DistortionMode.CHEBYSHEV, drive=_num(p, "drive", 1.0),
        chebyshev_order=int(_num(p, "order", 2)),
        chebyshev_gain=_num(p, "gain", 1.0), mix=_num(p, "mix", 1.0))))
    r.register("transformer", lambda ctx, p: _stateful(TransformerSimulation(
        ctx.sample_rate, drive=_num(p, "drive", 1.5),
        mix=_num(p, "mix", 1.0), output_level=_num(p, "output", 1.0))))
    r.register("bass", lambda ctx, p: _stateful(HarmonicBass(
        ctx.sample_rate, frequency=_num(p, "freqHz", 120.0),
        harmonic_bass_gain=_num(p, "gain", 1.0))))

    # -- spatial / delay --------------------------------------------------
    def _widener(ctx, p):
        # chain blocks are mono: a mono signal has no side component, so
        # M/S widening reduces to identity (the stereo path lives in
        # effects.spatial.StereoWidener); kept as a registered node for
        # graph compatibility (registry_defaults.go:104)
        return _stateless(lambda x: x)
    r.register("widener", _widener)
    r.register("delay", lambda ctx, p: _stateful(Delay(
        ctx.sample_rate, delay_seconds=_num(p, "time", 0.25),
        feedback=_num(p, "feedback", 0.35), mix=_num(p, "mix", 0.25))))

    def _delay_simple(ctx, p):
        delay = max(int(_num(p, "time", 0.1) * ctx.sample_rate), 1)

        def init_state(batch_shape=(), dtype=jnp.float32):
            return jnp.zeros(batch_shape + (delay,), dtype)

        def proc(st, x, sc):
            ext = jnp.concatenate([st.astype(x.dtype), x], axis=-1)
            return ext[..., -delay:], ext[..., :x.shape[-1]]
        return NodeRuntime(init_state=init_state, process=proc)
    r.register("delay-simple", _delay_simple)

    # -- filters ----------------------------------------------------------
    def _biquad_factory(designer_key):
        def make(ctx, p):
            freq = _num(p, "freqHz", 1000.0)
            q = _num(p, "q", 0.707)
            gain = _num(p, "gain", 0.0)
            sr = ctx.sample_rate
            if designer_key in ("lowpass", "filter"):
                sos = rbj.lowpass(freq, q, sr)
            elif designer_key == "highpass":
                sos = rbj.highpass(freq, q, sr)
            elif designer_key == "bandpass":
                sos = rbj.bandpass(freq, q, sr)
            elif designer_key == "notch":
                sos = rbj.notch(freq, q, sr)
            elif designer_key == "allpass":
                sos = rbj.allpass(freq, q, sr)
            elif designer_key == "peak":
                sos = rbj.peak(freq, gain, q, sr)
            elif designer_key == "lowshelf":
                sos = rbj.low_shelf(freq, gain, q, sr)
            else:  # highshelf
                sos = rbj.high_shelf(freq, gain, q, sr)
            if not np.any(sos):
                sos = np.array([1.0, 0.0, 0.0, 0.0, 0.0])
            chain = BiquadChain(sos)
            return NodeRuntime(init_state=chain.init_state,
                               process=lambda st, x, sc: chain.process_stream(st, x))
        return make

    for key in ["filter", "filter-lowpass", "filter-highpass", "filter-bandpass",
                "filter-notch", "filter-allpass", "filter-peak",
                "filter-lowshelf", "filter-highshelf"]:
        r.register(key, _biquad_factory(key.replace("filter-", "")
                                        if key != "filter" else "filter"))
    r.register("filter-moog", lambda ctx, p: _stateful(MoogFilter(
        ctx.sample_rate, cutoff_hz=_num(p, "freqHz", 1000.0),
        resonance=_num(p, "q", 0.8))))

    # -- pitch / spectral (one-shot processors wrapped stateless) ---------
    r.register("pitch-time", lambda ctx, p: _stateless(
        WSOLAPitchShifter(ctx.sample_rate, pitch_ratio=2.0 ** (
            _num(p, "semitones", 0.0) / 12.0)).process))
    r.register("pitch-spectral", lambda ctx, p: _stateless(
        SpectralPitchShifter(ctx.sample_rate, pitch_ratio=2.0 ** (
            _num(p, "semitones", 0.0) / 12.0)).process))
    r.register("spectral-freeze", lambda ctx, p: _stateless(
        SpectralFreeze(ctx.sample_rate, frozen=bool(p.get("frozen", True)),
                       mix=_num(p, "mix", 1.0)).process))
    r.register("granular", lambda ctx, p: _stateless(
        Granular(ctx.sample_rate, grain_seconds=_num(p, "grain", 0.08),
                 overlap=_num(p, "overlap", 0.5),
                 pitch=2.0 ** (_num(p, "semitones", 0.0) / 12.0),
                 spray_seconds=_num(p, "spray", 0.0),
                 mix=_num(p, "mix", 1.0)).process))

    # -- reverbs ----------------------------------------------------------
    def _freeverb(ctx, p):
        return _stateful(Freeverb(wet=_num(p, "wet", 0.22),
                                  dry=_num(p, "dry", 1.0),
                                  room_size=_num(p, "roomSize", 0.72),
                                  damp=_num(p, "damp", 0.45)))
    r.register("reverb", _freeverb)
    r.register("reverb-freeverb", _freeverb)
    r.register("reverb-fdn", lambda ctx, p: _stateful(FDNReverb(
        ctx.sample_rate, wet=_num(p, "wet", 0.2), dry=_num(p, "dry", 1.0),
        rt60_seconds=_num(p, "rt60", 1.8), damp=_num(p, "damp", 0.3))))

    def _reverb_conv(ctx, p):
        ir_len = int(_num(p, "irSeconds", 0.5) * ctx.sample_rate)
        rng = np.random.default_rng(int(_num(p, "seed", 7)))
        ir = (rng.standard_normal(max(ir_len, 256))
              * np.exp(-np.arange(max(ir_len, 256))
                       / max(0.1 * ctx.sample_rate, 1.0)))
        fx = ConvolutionReverb(ir, min_block_order=9,
                               wet=_num(p, "wet", 0.3), dry=_num(p, "dry", 1.0))
        return _stateful(fx)
    r.register("reverb-conv", _reverb_conv)

    # -- dynamics ---------------------------------------------------------
    r.register("dyn-compressor", lambda ctx, p: _stateful(Compressor(
        ctx.sample_rate, threshold_db=_num(p, "thresholdDB", -20.0),
        ratio=_num(p, "ratio", 4.0), knee_db=_num(p, "kneeDB", 6.0),
        attack_ms=_num(p, "attackMs", 10.0),
        release_ms=_num(p, "releaseMs", 100.0),
        makeup_gain_db=_num(p, "makeupGainDB", 0.0)), sidechain=True))
    r.register("dyn-limiter", lambda ctx, p: _stateful(Limiter(
        ctx.sample_rate, threshold_db=_num(p, "thresholdDB", -1.0),
        release_ms=_num(p, "releaseMs", 100.0)), sidechain=True))
    r.register("dyn-lookahead", lambda ctx, p: _stateful(LookaheadLimiter(
        ctx.sample_rate, lookahead_ms=_num(p, "lookaheadMs", 5.0),
        threshold_db=_num(p, "thresholdDB", -1.0),
        release_ms=_num(p, "releaseMs", 50.0)), sidechain=True))
    r.register("dyn-gate", lambda ctx, p: _stateful(Gate(
        ctx.sample_rate, threshold_db=_num(p, "thresholdDB", -40.0),
        ratio=_num(p, "ratio", 10.0), knee_db=_num(p, "kneeDB", 6.0),
        attack_ms=max(_num(p, "attackMs", 0.1), 0.01),
        hold_ms=_num(p, "holdMs", 50.0),
        release_ms=_num(p, "releaseMs", 100.0),
        range_db=_num(p, "rangeDB", -80.0)), sidechain=True))
    r.register("dyn-expander", lambda ctx, p: _stateful(Expander(
        ctx.sample_rate, threshold_db=_num(p, "thresholdDB", -40.0),
        ratio=_num(p, "ratio", 2.0),
        attack_ms=_num(p, "attackMs", 5.0),
        release_ms=_num(p, "releaseMs", 50.0),
        range_db=_num(p, "rangeDB", -60.0)), sidechain=True))
    r.register("dyn-deesser", lambda ctx, p: _stateful(DeEsser(
        ctx.sample_rate, freq_hz=_num(p, "freqHz", 6000.0),
        threshold_db=_num(p, "thresholdDB", -20.0),
        ratio=_num(p, "ratio", 4.0))))
    r.register("dyn-transient", lambda ctx, p: _stateful(TransientShaper(
        ctx.sample_rate, attack_amount=_num(p, "attack", 0.0),
        sustain_amount=_num(p, "sustain", 0.0))))
    r.register("dyn-multiband", lambda ctx, p: _stateful(MultibandCompressor(
        [250.0, 2500.0], 4, ctx.sample_rate)))

    # -- vocoder (sidechain = carrier) ------------------------------------
    def _vocoder(ctx, p):
        fx = Vocoder(ctx.sample_rate,
                     vocoded_level=_num(p, "vocoderLevel", 1.0),
                     input_level=_num(p, "inputLevel", 0.0),
                     synth_level=_num(p, "synthLevel", 0.0))

        def proc(st, x, sc):
            carrier = sc if sc is not None else x
            return fx.process(st, x, carrier)
        return NodeRuntime(init_state=fx.init_state, process=proc)
    r.register("vocoder", _vocoder)

    # -- split-freq (2 output ports: lo, hi) ------------------------------
    def _split_freq(ctx, p):
        xo = Crossover(_num(p, "freqHz", 1000.0),
                       int(_num(p, "order", 4)), ctx.sample_rate)

        def proc(st, x, sc):
            st2, (lo, hi) = xo.process_stream(st, x)
            return st2, (lo, hi)
        return NodeRuntime(init_state=xo.init_state, process=proc, n_outputs=2)
    r.register("split-freq", _split_freq)

    return r
