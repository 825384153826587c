"""Spectral descriptors from magnitude (or complex) spectra.

Capability parity with `stats/frequency/stats.go`: spectral centroid,
spread, flatness (Wiener entropy), rolloff, 3 dB bandwidth
(`stats.go:58-148`). Pure jnp reductions, batched over leading dims.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FrequencyStats:
    centroid_hz: float
    spread_hz: float
    flatness: float
    rolloff_hz: float
    bandwidth_3db_hz: float


def calculate(magnitude, sample_rate: float, *,
              rolloff_fraction: float = 0.85) -> FrequencyStats:
    """Descriptors from a one-sided magnitude spectrum (`stats.go:58-148`).

    magnitude: (bins,) for an FFT of size 2*(bins-1).
    """
    mag = jnp.asarray(magnitude)
    if mag.ndim != 1 or mag.size == 0:
        raise ValueError("frequency stats: need a 1-D non-empty magnitude spectrum")
    if jnp.iscomplexobj(mag):
        mag = jnp.abs(mag)
    bins = mag.shape[-1]
    fft_size = 2 * (bins - 1) if bins > 1 else 1
    freqs = jnp.arange(bins) * (sample_rate / fft_size)

    power = mag * mag
    total_p = jnp.sum(power)
    total_m = jnp.sum(mag)

    centroid = jnp.where(total_p > 0,
                         jnp.sum(freqs * power) / jnp.where(total_p > 0, total_p, 1.0),
                         0.0)
    spread = jnp.sqrt(jnp.where(
        total_p > 0,
        jnp.sum((freqs - centroid) ** 2 * power) / jnp.where(total_p > 0, total_p, 1.0),
        0.0))

    # flatness: geometric mean / arithmetic mean of the power spectrum
    safe_p = jnp.maximum(power, 1e-30)
    log_gm = jnp.mean(jnp.log(safe_p))
    am = jnp.mean(power)
    flatness = jnp.where(am > 0, jnp.exp(log_gm) / jnp.where(am > 0, am, 1.0), 0.0)

    # rolloff: lowest frequency below which `rolloff_fraction` of power lies
    csum = jnp.cumsum(power)
    target = rolloff_fraction * total_p
    roll_idx = jnp.argmax(csum >= target)
    rolloff = freqs[roll_idx]

    # 3 dB bandwidth around the peak
    peak = jnp.max(mag)
    above = mag >= peak / jnp.sqrt(2.0)
    idx = jnp.arange(bins)
    lo = jnp.min(jnp.where(above, idx, bins))
    hi = jnp.max(jnp.where(above, idx, -1))
    bw = jnp.where(hi >= lo, (hi - lo).astype(freqs.dtype) * (sample_rate / fft_size),
                   0.0)

    return FrequencyStats(
        centroid_hz=float(centroid), spread_hz=float(spread),
        flatness=float(flatness), rolloff_hz=float(rolloff),
        bandwidth_3db_hz=float(bw))


# -- standalone helpers (stats.go:148-287) -----------------------------------

def _freqs(bins: int, sample_rate: float):
    fft_size = 2 * (bins - 1) if bins > 1 else 1
    return jnp.arange(bins) * (sample_rate / fft_size)


def centroid(magnitude, sample_rate: float):
    """Spectral centroid in Hz (`stats.go:148`)."""
    mag = jnp.abs(jnp.asarray(magnitude))
    if mag.shape[-1] < 2:
        return jnp.zeros(mag.shape[:-1])
    p = jnp.square(mag)
    tot = jnp.sum(p, axis=-1)
    w = jnp.sum(p * _freqs(mag.shape[-1], sample_rate), axis=-1)
    return jnp.where(tot > 0, w / jnp.where(tot > 0, tot, 1.0), 0.0)


def flatness(magnitude):
    """Wiener entropy: geometric/arithmetic mean of power (`stats.go:198`)."""
    mag = jnp.abs(jnp.asarray(magnitude))
    p = jnp.square(mag)
    am = jnp.mean(p, axis=-1)
    # 1e-30 floor like calculate(): representable in f32 (1e-300 would
    # underflow to 0 and defeat the clamp)
    gm = jnp.exp(jnp.mean(jnp.log(jnp.maximum(p, 1e-30)), axis=-1))
    return jnp.where(am > 0, gm / jnp.where(am > 0, am, 1.0), 0.0)


def rolloff(magnitude, sample_rate: float, percent: float = 0.85):
    """Lowest frequency below which `percent` of power lies (`stats.go:246`)."""
    mag = jnp.abs(jnp.asarray(magnitude))
    if mag.shape[-1] < 2:
        return jnp.zeros(mag.shape[:-1])
    p = jnp.square(mag)
    csum = jnp.cumsum(p, axis=-1)
    target = percent * csum[..., -1:]
    idx = jnp.argmax(csum >= target, axis=-1)
    return _freqs(mag.shape[-1], sample_rate)[idx]


def bandwidth(magnitude, sample_rate: float):
    """3 dB bandwidth around the spectral peak (`stats.go:283`)."""
    mag = jnp.abs(jnp.asarray(magnitude))
    if mag.shape[-1] < 2:
        return jnp.zeros(mag.shape[:-1])
    bins = mag.shape[-1]
    fft_size = 2 * (bins - 1)
    pk = jnp.max(mag, axis=-1, keepdims=True)
    above = mag >= pk / jnp.sqrt(2.0)
    idx = jnp.arange(bins)
    lo = jnp.min(jnp.where(above, idx, bins), axis=-1)
    hi = jnp.max(jnp.where(above, idx, -1), axis=-1)
    return jnp.where(hi >= lo, (hi - lo) * (sample_rate / fft_size), 0.0)
