"""Spectrum extraction utilities.

Capability parity with `dsp/spectrum/spectrum.go`: magnitude / power /
phase from complex bins, phase unwrapping (`spectrum.go:180-205`), group
delay from unwrapped phase (`:209-260`), piecewise-linear curve
resampling (`:264-303`), and 1/N-fractional-octave smoothing
(`:305-350`).

TPU-first notes:
  * All functions are pure jnp ops over the *last* axis and broadcast
    over leading channel/batch dims — the Go scratch-pool machinery
    (`spectrum.go:16-48`) has no analog; XLA fuses the elementwise math.
  * `unwrap_phase` replaces the sequential offset accumulation with a
    cumulative sum of jump corrections (parallel on the VPU).
  * `smooth_fractional_octave` turns the per-bin band averaging into
    prefix sums + two vectorized `searchsorted` lookups: O(N log N)
    instead of the Go O(N·band).
"""

from __future__ import annotations

import jax.numpy as jnp


def magnitude(bins):
    """|X[k]| per complex bin (`spectrum.go:70-90`)."""
    return jnp.abs(jnp.asarray(bins))


def magnitude_from_parts(re, im):
    """sqrt(re^2 + im^2) fast path (`spectrum.go:93-101`)."""
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    return jnp.sqrt(re * re + im * im)


def power(bins):
    """|X[k]|^2 per complex bin (`spectrum.go:113-133`)."""
    bins = jnp.asarray(bins)
    return jnp.real(bins) ** 2 + jnp.imag(bins) ** 2


def power_from_parts(re, im):
    """re^2 + im^2 fast path (`spectrum.go:139-143`)."""
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    return re * re + im * im


def phase(bins):
    """arg(X[k]) in radians (`spectrum.go:160-175`)."""
    bins = jnp.asarray(bins)
    return jnp.angle(bins)


def unwrap_phase(ph):
    """Remove ±2π discontinuities along the last axis (`spectrum.go:180-205`).

    The reference carries a running offset sample-by-sample; here the
    per-step jump corrections are computed elementwise and accumulated
    with a parallel cumsum — identical output, log-depth on device.
    """
    ph = jnp.asarray(ph)
    if ph.shape[-1] == 0:
        return ph
    d = jnp.diff(ph, axis=-1)
    two_pi = 2.0 * jnp.pi
    step = jnp.where(d > jnp.pi, -two_pi, jnp.where(d < -jnp.pi, two_pi, 0.0))
    offset = jnp.cumsum(step, axis=-1)
    pad = jnp.zeros(ph.shape[:-1] + (1,), dtype=ph.dtype)
    return ph + jnp.concatenate([pad, offset.astype(ph.dtype)], axis=-1)


def group_delay_from_phase(unwrapped, fft_size: int):
    """Group delay in samples from unwrapped phase (`spectrum.go:209-248`).

    Centered differences for interior bins, one-sided at the endpoints.
    """
    u = jnp.asarray(unwrapped)
    if u.shape[-1] < 2:
        raise ValueError(f"group delay requires at least 2 phase points: {u.shape[-1]}")
    if fft_size <= 0:
        raise ValueError(f"group delay fft_size must be > 0: {fft_size}")
    dw = 2.0 * jnp.pi / fft_size
    first = u[..., 1:2] - u[..., 0:1]
    last = u[..., -1:] - u[..., -2:-1]
    mid = (u[..., 2:] - u[..., :-2]) / 2.0
    dphi = jnp.concatenate([first, mid, last], axis=-1)
    return -dphi / dw


def group_delay_seconds(unwrapped, fft_size: int, sample_rate: float):
    """Group delay in seconds (`spectrum.go:251-263`)."""
    if sample_rate <= 0:
        raise ValueError(f"sample_rate must be > 0: {sample_rate}")
    return group_delay_from_phase(unwrapped, fft_size) / sample_rate


def interpolate_linear(x, y, query_x):
    """Piecewise-linear interpolation with edge clamping (`spectrum.go:266-303`)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    q = jnp.asarray(query_x)
    if x.shape[-1] != y.shape[-1]:
        raise ValueError(f"x/y length mismatch: {x.shape[-1]} != {y.shape[-1]}")
    return jnp.interp(q, x, y)


def smooth_fractional_octave(freq_hz, values, fraction: int):
    """1/N-octave arithmetic-mean smoothing (`spectrum.go:305-350`).

    For each bin i with frequency f, averages values over bins whose
    frequency lies in [f/2^(1/2N), f*2^(1/2N)] (inclusive low edge,
    inclusive high edge — matching the Go sort.Search conditions).
    """
    f = jnp.asarray(freq_hz)
    v = jnp.asarray(values)
    if f.shape[-1] != v.shape[-1]:
        raise ValueError(f"length mismatch: {f.shape[-1]} != {v.shape[-1]}")
    if fraction <= 0:
        raise ValueError(f"fraction must be > 0: {fraction}")
    half_band = 2.0 ** (1.0 / (2.0 * fraction))
    lo = f / half_band
    hi = f * half_band
    # i0 = first index with freq >= lo ; i1 = first index with freq > hi.
    i0 = jnp.searchsorted(f, lo, side="left")
    i1 = jnp.searchsorted(f, hi, side="right")
    csum = jnp.concatenate([jnp.zeros(v.shape[:-1] + (1,), v.dtype),
                            jnp.cumsum(v, axis=-1)], axis=-1)
    count = i1 - i0
    band_sum = jnp.take(csum, i1, axis=-1) - jnp.take(csum, i0, axis=-1)
    safe = jnp.maximum(count, 1)
    return jnp.where(count > 0, band_sum / safe, v)
