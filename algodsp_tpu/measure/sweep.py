"""Farina log sweep measurement: generate / inverse filter / deconvolve /
harmonic IR extraction, plus the linear-sweep variant.

Capability parity with `measure/sweep/sweep.go`:
  * log sweep x(t) = sin(2*pi*f1*T/ln(r) * (e^{t*ln(r)/T} - 1))
    (`sweep.go:63-93`),
  * inverse filter = time-reversed sweep with -6 dB/oct amplitude
    compensation (`sweep.go:95-110`),
  * FFT deconvolution at next-pow2 length (`sweep.go:164-200`),
  * harmonic IRs at negative delays dt_k = T*ln(k)/ln(r)
    (`sweep.go:255-330`),
  * linear sweep generate/deconvolve (`sweep.go:349-480`).

Generation and deconvolution are batched jnp (FFTs on device); slicing
logic is host-side.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.core.numeric import next_pow2
from algodsp_tpu.utils.fftjit import irfft
from algodsp_tpu.utils.jitwrap import jit_method


class LogSweep:
    def __init__(self, start_hz: float, end_hz: float, duration_s: float,
                 sample_rate: float, *, amplitude: float = 1.0):
        if start_hz <= 0 or end_hz <= start_hz:
            raise ValueError("log sweep: need 0 < start < end")
        if duration_s <= 0 or sample_rate <= 0:
            raise ValueError("log sweep: duration and sample rate must be > 0")
        self.start_hz = start_hz
        self.end_hz = end_hz
        self.duration = duration_s
        self.sample_rate = sample_rate
        self.amplitude = amplitude
        self.samples = int(round(duration_s * sample_rate))
        self.ratio = end_hz / start_hz

    def generate(self, dtype=jnp.float64):
        """Exponential-phase sine (`sweep.go:63-93`)."""
        t = jnp.arange(self.samples, dtype=dtype) / self.sample_rate
        ln_r = math.log(self.ratio)
        phase = (2.0 * math.pi * self.start_hz * self.duration / ln_r
                 * (jnp.exp(t * ln_r / self.duration) - 1.0))
        return self.amplitude * jnp.sin(phase)

    def inverse_filter(self, dtype=jnp.float64):
        """Time-reversed sweep with -6 dB/oct compensation
        (`sweep.go:95-110`)."""
        sweep = self.generate(dtype)
        t = jnp.arange(self.samples, dtype=dtype) / self.sample_rate
        ln_r = math.log(self.ratio)
        # -6 dB/oct amplitude compensation: the reversed sweep starts at
        # its HIGH frequency, which must be attenuated by 1/r, ramping to
        # unity at the low end (Farina; sweep.go:95-110)
        env = jnp.exp((t - self.duration) * ln_r / self.duration)
        return sweep[::-1] * env

    @jit_method
    def deconvolve(self, response):
        """Extract the IR: conv(response, inverse)/N alignment such that
        the linear IR peak sits at index len(sweep)-1 (`sweep.go:164-200`)."""
        response = jnp.asarray(response)
        inv = self.inverse_filter().astype(response.dtype)
        n = response.shape[-1] + self.samples - 1
        size = next_pow2(n)
        spec = jnp.fft.rfft(response, size) * jnp.fft.rfft(inv, size)
        full = irfft(spec, size)[..., :n]
        # normalize so a perfect loopback yields a unit impulse
        ref = irfft(
            jnp.fft.rfft(self.generate().astype(response.dtype), size)
            * jnp.fft.rfft(inv, size), size)
        scale = jnp.max(jnp.abs(ref))
        return full / jnp.where(scale > 0, scale, 1.0)

    def harmonic_delay_samples(self, k: int) -> float:
        """Harmonic k IR appears dt_k = T*ln(k)/ln(r) BEFORE the linear
        IR (`sweep.go:255-280`)."""
        return self.duration * math.log(k) / math.log(self.ratio) * self.sample_rate

    def extract_harmonic_irs(self, deconvolved, max_harmonics: int,
                             ir_length: int | None = None):
        """Slice per-harmonic IRs (`sweep.go:255-330`). Returns a list
        [h1, h2, ..., hK] of equal-length windows; h1 is the linear IR."""
        d = np.asarray(deconvolved)
        linear_pos = self.samples - 1
        if ir_length is None:
            if max_harmonics >= 2:
                ir_length = max(int(self.harmonic_delay_samples(2) * 0.5), 64)
            else:
                ir_length = min(d.shape[-1] - linear_pos, self.samples)
        out = []
        for k in range(1, max_harmonics + 1):
            pos = linear_pos - (0 if k == 1 else int(round(self.harmonic_delay_samples(k))))
            start = max(pos - ir_length // 4, 0)
            seg = d[..., start:start + ir_length]
            if seg.shape[-1] < ir_length:
                pad = ir_length - seg.shape[-1]
                seg = np.concatenate(
                    [seg, np.zeros(seg.shape[:-1] + (pad,), seg.dtype)], axis=-1)
            out.append(seg)
        return out


class LinearSweep:
    """Linear-frequency sweep measurement (`sweep.go:349-480`)."""

    def __init__(self, start_hz: float, end_hz: float, duration_s: float,
                 sample_rate: float, *, amplitude: float = 1.0):
        if start_hz < 0 or end_hz <= start_hz:
            raise ValueError("linear sweep: need 0 <= start < end")
        if duration_s <= 0 or sample_rate <= 0:
            raise ValueError("linear sweep: duration and sample rate must be > 0")
        self.start_hz = start_hz
        self.end_hz = end_hz
        self.duration = duration_s
        self.sample_rate = sample_rate
        self.amplitude = amplitude
        self.samples = int(round(duration_s * sample_rate))

    def generate(self, dtype=jnp.float64):
        t = jnp.arange(self.samples, dtype=dtype) / self.sample_rate
        k = (self.end_hz - self.start_hz) / self.duration
        phase = 2.0 * math.pi * (self.start_hz * t + 0.5 * k * t * t)
        return self.amplitude * jnp.sin(phase)

    @jit_method
    def deconvolve(self, response, *, epsilon: float = 1e-8):
        """Regularized spectral division by the sweep spectrum."""
        response = jnp.asarray(response)
        sweep = self.generate().astype(response.dtype)
        n = response.shape[-1]
        size = next_pow2(n + self.samples - 1)
        sf = jnp.fft.rfft(response, size)
        kf = jnp.fft.rfft(sweep, size)
        k2 = jnp.abs(kf) ** 2
        # regularization relative to the sweep's peak spectral power, so
        # out-of-band bins (where the sweep has no energy) stay tame
        eps = epsilon * jnp.max(k2)
        ir = irfft(sf * jnp.conj(kf) / (k2 + eps), size)
        return ir[..., :n]
