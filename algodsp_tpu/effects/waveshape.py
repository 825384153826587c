"""Waveshaping & lo-fi effects: Distortion, BitCrusher,
TransformerSimulation, HarmonicBass.

Capability parity with `dsp/effects/distortion.go` (15 modes incl.
Chebyshev polynomial harmonic shaping order 1-16 with parity control
and DC bypass), `bit_crusher.go` (fractional bit depth 1-32 +
sample-hold downsampling 1-256), `transformer_simulation.go`
(pre-emphasis HP + tanh/poly saturation + damping, quality
high=4x-oversampled / lightweight), and `harmonic_bass.go`
(psychoacoustic bass exciter: crossover, quadratic shaper, limiter).

TPU-first: every transfer curve is elementwise on the VPU; the
Chebyshev recurrence unrolls to a fixed-order polynomial evaluation;
sample-hold becomes a gather; the DC-bypass/limiter one-poles ride the
scan machinery. Only the harmonic-bass limiter keeps a tiny scan.
"""

from __future__ import annotations

import enum
import math

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu.ops import linrec
from algodsp_tpu.filters.biquad import BiquadChain
from algodsp_tpu.filters.design import rbj, cascades


class DistortionMode(enum.Enum):
    SOFT_CLIP = "soft_clip"
    HARD_CLIP = "hard_clip"
    TANH = "tanh"
    WAVESHAPER1 = "waveshaper1"
    WAVESHAPER2 = "waveshaper2"
    WAVESHAPER3 = "waveshaper3"
    WAVESHAPER4 = "waveshaper4"
    WAVESHAPER5 = "waveshaper5"
    WAVESHAPER6 = "waveshaper6"
    WAVESHAPER7 = "waveshaper7"
    WAVESHAPER8 = "waveshaper8"
    SATURATE = "saturate"
    SATURATE2 = "saturate2"
    SOFT_SAT = "soft_sat"
    CHEBYSHEV = "chebyshev"


class ChebyshevHarmonicMode(enum.Enum):
    ALL = "all"
    ODD = "odd"
    EVEN = "even"


_DC_BYPASS_POLE = 0.995


def _clamp_unit(x):
    return jnp.clip(x, -1.0, 1.0)


class Distortion:
    """Multi-mode waveshaper (`distortion.go:537-744`)."""

    def __init__(self, *, mode: DistortionMode = DistortionMode.SOFT_CLIP,
                 drive: float = 1.0, shape: float = 0.5, bias: float = 0.0,
                 clip_level: float = 1.0, output_level: float = 1.0,
                 mix: float = 1.0, chebyshev_order: int = 2,
                 chebyshev_mode: ChebyshevHarmonicMode = ChebyshevHarmonicMode.ALL,
                 chebyshev_weights=None, chebyshev_gain: float = 1.0,
                 chebyshev_invert: bool = False, chebyshev_dc_bypass: bool = True):
        if not (0.01 <= drive <= 20.0):
            raise ValueError(f"distortion drive must be in [0.01, 20]: {drive}")
        if not (-1.0 <= bias <= 1.0):
            raise ValueError(f"distortion bias must be in [-1, 1]: {bias}")
        if not (1 <= chebyshev_order <= 16):
            raise ValueError(f"chebyshev order must be in [1, 16]: {chebyshev_order}")
        if chebyshev_mode == ChebyshevHarmonicMode.ODD and chebyshev_order % 2 == 0:
            raise ValueError("chebyshev odd harmonic mode requires odd order")
        if chebyshev_mode == ChebyshevHarmonicMode.EVEN and chebyshev_order % 2 == 1:
            raise ValueError("chebyshev even harmonic mode requires even order")
        self.mode = mode
        self.drive = drive
        self.shape = shape
        self.bias = bias
        self.clip_level = clip_level
        self.output_level = output_level
        self.mix = mix
        self.chebyshev_order = chebyshev_order
        self.chebyshev_weights = (np.zeros(chebyshev_order)
                                  if chebyshev_weights is None
                                  else np.asarray(chebyshev_weights, np.float64))
        self.chebyshev_gain = chebyshev_gain
        self.chebyshev_invert = chebyshev_invert
        self.chebyshev_dc_bypass = chebyshev_dc_bypass

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {"dc_in": jnp.zeros(batch_shape, dtype),
                "dc_out": jnp.zeros(batch_shape, dtype)}

    def _shape(self, x):
        m, s = self.mode, self.shape
        if m == DistortionMode.SOFT_CLIP:
            return jnp.where(jnp.abs(x) < 1, 1.5 * (x - x ** 3 / 3.0),
                             jnp.sign(x))
        if m == DistortionMode.HARD_CLIP:
            return jnp.clip(x, -self.clip_level, self.clip_level) / self.clip_level
        if m == DistortionMode.TANH:
            return jnp.tanh(x)
        if m == DistortionMode.WAVESHAPER1:
            return _clamp_unit(x / (1 + s * jnp.abs(x)))
        if m == DistortionMode.WAVESHAPER2:
            return _clamp_unit((1 + s) * x / (1 + s * jnp.abs(x)))
        if m == DistortionMode.WAVESHAPER3:
            return _clamp_unit(x - s * x ** 3 / 3.0)
        if m == DistortionMode.WAVESHAPER4:
            return _clamp_unit(3 * x / (2 + jnp.abs(2 * x)))
        if m == DistortionMode.WAVESHAPER5:
            scale = 1 + 4 * s
            return _clamp_unit(jnp.arctan(x * scale) / math.atan(scale))
        if m == DistortionMode.WAVESHAPER6:
            return _clamp_unit((1 + s) * x / (1 + s * x * x))
        if m == DistortionMode.WAVESHAPER7:
            return jnp.tanh(x * (1 + 6 * s))
        if m == DistortionMode.WAVESHAPER8:
            a = 1 + 6 * s
            return _clamp_unit(jnp.sign(x) * (1 - jnp.exp(-jnp.abs(x) * a)))
        if m == DistortionMode.SATURATE:
            return _clamp_unit(x / (1 + jnp.abs(x)))
        if m == DistortionMode.SATURATE2:
            x2 = x * (1 + 2 * s)
            return jnp.where(jnp.abs(x2) < 1, 1.5 * (x2 - x2 ** 3 / 3.0),
                             jnp.sign(x2))
        if m == DistortionMode.SOFT_SAT:
            return _clamp_unit((2 / jnp.pi) * jnp.arctan((jnp.pi / 2) * x))
        if m == DistortionMode.CHEBYSHEV:
            return self._chebyshev(x)
        raise ValueError(f"unknown distortion mode {m}")

    def _chebyshev(self, x):
        """T_n recurrence with optional per-harmonic weights
        (`distortion.go:684-728`)."""
        x = jnp.clip(x, -1.0, 1.0)
        has_weights = bool(np.any(self.chebyshev_weights != 0))
        t0 = jnp.ones_like(x)
        t1 = x
        acc = self.chebyshev_weights[0] * t1 if has_weights else None
        tn = t1
        for n in range(2, self.chebyshev_order + 1):
            tn = 2 * x * t1 - t0
            if has_weights:
                acc = acc + self.chebyshev_weights[n - 1] * tn
            t0, t1 = t1, tn
        out = (acc if has_weights else tn) * self.chebyshev_gain
        if self.chebyshev_invert:
            out = -out
        return _clamp_unit(out)

    def process(self, state, x):
        x = jnp.asarray(x)
        wet = self._shape((x + self.bias) * self.drive) * self.output_level
        new_state = dict(state)
        if self.mode == DistortionMode.CHEBYSHEV and self.chebyshev_dc_bypass:
            # y_n = x_n - x_{n-1} + pole*y_{n-1}: first-order DC blocker
            xm1 = jnp.concatenate([state["dc_in"][..., None], wet[..., :-1]],
                                  axis=-1)
            f = (wet - xm1).at[..., 0].add(_DC_BYPASS_POLE * state["dc_out"])
            y = linrec.ar2_apply_scan(f, jnp.asarray(-_DC_BYPASS_POLE, x.dtype),
                                      jnp.asarray(0.0, x.dtype),
                                      jnp.zeros_like(state["dc_out"]),
                                      jnp.zeros_like(state["dc_out"]))
            new_state["dc_in"] = wet[..., -1]
            new_state["dc_out"] = y[..., -1]
            wet = y
        wet = jnp.where(jnp.isfinite(wet), wet, 0.0)
        return new_state, x * (1 - self.mix) + wet * self.mix


class BitCrusher:
    """Bit-depth quantizer + sample-hold downsampler
    (`bit_crusher.go:191-230`)."""

    def __init__(self, sample_rate: float, *, bit_depth: float = 8.0,
                 downsample: int = 4, mix: float = 1.0):
        if not (1.0 <= bit_depth <= 32.0):
            raise ValueError(f"bit depth must be in [1, 32]: {bit_depth}")
        if not (1 <= downsample <= 256):
            raise ValueError(f"downsample must be in [1, 256]: {downsample}")
        self.sample_rate = sample_rate
        self.bit_depth = bit_depth
        self.downsample = downsample
        self.mix = mix
        self.quant_levels = 2.0 ** (bit_depth - 1.0)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {"hold": jnp.zeros(batch_shape, dtype),
                "counter": jnp.zeros((), jnp.int32)}

    def _quantize(self, x):
        return jnp.round(x * self.quant_levels) / self.quant_levels

    def process(self, state, x):
        x = jnp.asarray(x)
        n = x.shape[-1]
        ds = self.downsample
        if ds == 1:
            wet = self._quantize(x)
            new_state = {"hold": wet[..., -1], "counter": state["counter"]}
            return new_state, x * (1 - self.mix) + wet * self.mix
        # update positions: counter increments then wraps at ds; an
        # update fires when the incremented counter reaches ds
        # (bit_crusher.go:193-198). Vectorized as a gather of the most
        # recent update index.
        cnt0 = state["counter"]
        counters = jnp.mod(cnt0 + 1 + jnp.arange(n), ds)
        fires = counters == 0
        idx = jnp.where(fires, jnp.arange(n), -1)
        last = jax.lax.cummax(idx)
        q = self._quantize(x)
        held = jnp.where(last[..., :] >= 0,
                         jnp.take(q, jnp.maximum(last, 0), axis=-1),
                         state["hold"][..., None])
        new_state = {"hold": held[..., -1], "counter": counters[-1]}
        return new_state, x * (1 - self.mix) + held * self.mix


class TransformerQuality(enum.Enum):
    HIGH = "high"
    LIGHTWEIGHT = "lightweight"


def _poly_saturate(x):
    """Odd polynomial tanh approximation (`transformer_simulation.go:488-501`)."""
    return jnp.where(x > 3, 1.0,
                     jnp.where(x < -3, -1.0,
                               jnp.clip(x * (27 + x * x) / (27 + 9 * x * x),
                                        -1.0, 1.0)))


class TransformerSimulation:
    """Transformer core saturation (`transformer_simulation.go:333-430`):
    pre-emphasis HP -> saturate (4x oversampled exact tanh in high
    quality, polynomial in lightweight) -> damping LP -> mix."""

    def __init__(self, sample_rate: float, *,
                 quality: TransformerQuality = TransformerQuality.HIGH,
                 drive: float = 1.5, mix: float = 1.0, output_level: float = 1.0,
                 highpass_hz: float = 20.0, damping_hz: float = 18000.0,
                 oversampling: int = 4):
        if sample_rate <= 0:
            raise ValueError("transformer: sample rate must be > 0")
        self.sample_rate = sample_rate
        self.quality = quality
        self.drive = drive
        self.mix = mix
        self.output_level = output_level
        self.oversampling = oversampling if quality == TransformerQuality.HIGH else 1
        self.pre_hp = BiquadChain(rbj.highpass(highpass_hz, 0.707, sample_rate))
        self.damp = BiquadChain(
            rbj.lowpass(min(damping_hz, 0.45 * sample_rate), 0.707, sample_rate))
        if self.oversampling > 1:
            os_sr = sample_rate * self.oversampling
            # anti-alias filters at the oversampled rate
            self.up_aa = BiquadChain(
                cascades.butterworth_lp(0.45 * sample_rate, 4, os_sr))
            self.down_aa = BiquadChain(
                cascades.butterworth_lp(0.45 * sample_rate, 4, os_sr))
            self.damp_os = BiquadChain(
                rbj.lowpass(min(damping_hz, 0.45 * sample_rate), 0.707, os_sr))

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        st = {"hp": self.pre_hp.init_state(batch_shape, dtype),
              "damp": self.damp.init_state(batch_shape, dtype)}
        if self.oversampling > 1:
            st["up_aa"] = self.up_aa.init_state(batch_shape, dtype)
            st["down_aa"] = self.down_aa.init_state(batch_shape, dtype)
            st["damp_os"] = self.damp_os.init_state(batch_shape, dtype)
        return st

    def process(self, state, x):
        x = jnp.asarray(x)
        new_state = dict(state)
        new_state["hp"], pre = self.pre_hp.process_stream(state["hp"], x)
        if self.oversampling > 1:
            os = self.oversampling
            # zero-stuff upsample scaled by the factor (transformer_simulation.go:404-409)
            up = jnp.zeros(x.shape[:-1] + (x.shape[-1] * os,), x.dtype)
            up = up.at[..., ::os].set(pre * os)
            new_state["up_aa"], u = self.up_aa.process_stream(state["up_aa"], up)
            u = jnp.tanh(u * self.drive)
            new_state["damp_os"], u = self.damp_os.process_stream(state["damp_os"], u)
            new_state["down_aa"], u = self.down_aa.process_stream(state["down_aa"], u)
            wet = u[..., os - 1::os]
        else:
            wet = _poly_saturate(pre * self.drive)
            new_state["damp"], wet = self.damp.process_stream(state["damp"], wet)
        wet = wet * self.output_level
        wet = jnp.where(jnp.isfinite(wet), wet, 0.0)
        return new_state, x * (1 - self.mix) + wet * self.mix


class HarmonicBass:
    """Psychoacoustic bass exciter (`harmonic_bass.go:262-300`):
    crossover split, quadratic shaper on the low band, HP + limiter on
    the harmonics, recombination."""

    def __init__(self, sample_rate: float, *, frequency: float = 120.0,
                 decay: float = 0.2, response_ms: float = 20.0,
                 input_level: float = 1.0, high_frequency_gain: float = 1.0,
                 original_bass_gain: float = 1.0, harmonic_bass_gain: float = 0.0):
        from algodsp_tpu.effects.dynamics import Limiter
        if sample_rate <= 0 or not math.isfinite(sample_rate):
            raise ValueError(f"harmonic bass sample rate must be positive: {sample_rate}")
        self.sample_rate = sample_rate
        self.frequency = frequency
        self.decay = decay
        self.input_level = input_level
        self.high_frequency_gain = high_frequency_gain
        self.original_bass_gain = original_bass_gain
        self.harmonic_bass_gain = harmonic_bass_gain
        self.lp = BiquadChain(cascades.butterworth_lp(frequency, 4, sample_rate))
        self.hp = BiquadChain(cascades.butterworth_hp(frequency, 4, sample_rate))
        self.harm_hp = BiquadChain(rbj.highpass(frequency / 2, 0.707, sample_rate))
        self.limiter = Limiter(sample_rate, threshold_db=0.0,
                               release_ms=response_ms)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {"lp": self.lp.init_state(batch_shape, dtype),
                "hp": self.hp.init_state(batch_shape, dtype),
                "hhp": self.harm_hp.init_state(batch_shape, dtype),
                "lim": self.limiter.init_state(batch_shape, dtype)}

    def process(self, state, x):
        x = jnp.asarray(x) * self.input_level
        new_state = dict(state)
        new_state["lp"], low = self.lp.process_stream(state["lp"], x)
        new_state["hp"], high = self.hp.process_stream(state["hp"], x)
        shaped = self.decay + low * (1 + low * (-2.0 * self.decay))
        new_state["hhp"], shaped = self.harm_hp.process_stream(state["hhp"], shaped)
        new_state["lim"], shaped = self.limiter.process(state["lim"], 4.0 * shaped)
        shaped = jnp.clip(0.5 * shaped, -1.0, 1.0)
        y = (self.original_bass_gain * low + self.harmonic_bass_gain * shaped
             + self.high_frequency_gain * high)
        return new_state, y
