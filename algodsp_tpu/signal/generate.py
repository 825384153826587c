"""Deterministic signal generators and utilities.

Capability parity with `dsp/signal/generate.go`: sine, multisine,
impulse, linear/log sweep, white/pink noise, Normalize, Clip, RemoveDC,
EnvelopeFollower.

TPU-first notes:
  * All generators are closed-form over a sample-index vector — pure
    jnp, jit-able, differentiable, and free to fuse.
  * Noise uses `jax.random` (threefry) rather than Go's math/rand —
    deterministic per seed but a different stream; tests relying on
    noise assert statistics, not bit-parity (matching the reference's
    own testing style for noise).
  * Pink noise keeps the Voss–McCartney 5-band structure
    (`generate.go:210-250`) but expresses the per-band
    "update-band-b-and-hold" as a segmented gather: each band's
    held value at sample i is its most recent update, found with
    searchsorted over the update positions — no sequential loop.
  * `envelope_follower` is the one truly sequential recurrence
    (branching attack/release, `generate.go:322-350`); it delegates to
    the shared scan in `ops.envscan` which runs channels on VPU lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from algodsp_tpu.ops.envscan import envelope_scan


def _time_index(samples: int, dtype):
    return jnp.arange(samples, dtype=dtype)


def sine(freq_hz: float, amplitude: float, samples: int, sample_rate: float,
         dtype=jnp.float32):
    """Sine wave: amplitude * sin(2*pi*f*i/sr) (`generate.go:76-96`)."""
    if samples <= 0:
        raise ValueError(f"sine samples must be > 0: {samples}")
    if sample_rate <= 0:
        raise ValueError(f"sine sample rate must be > 0: {sample_rate}")
    step = 2.0 * np.pi * freq_hz / sample_rate
    return amplitude * jnp.sin(step * _time_index(samples, dtype))


def multisine(freqs_hz, amplitude: float, samples: int, sample_rate: float,
              dtype=jnp.float32):
    """Equal-weighted sum of tones (`generate.go:99-125`)."""
    freqs = np.atleast_1d(np.asarray(freqs_hz, dtype=np.float64))
    if samples <= 0:
        raise ValueError(f"multisine samples must be > 0: {samples}")
    if freqs.size == 0:
        raise ValueError("multisine frequencies must not be empty")
    if sample_rate <= 0:
        raise ValueError(f"multisine sample rate must be > 0: {sample_rate}")
    steps = jnp.asarray(2.0 * np.pi * freqs / sample_rate, dtype=dtype)
    i = _time_index(samples, dtype)
    tones = jnp.sin(steps[:, None] * i[None, :])
    return (amplitude / freqs.size) * jnp.sum(tones, axis=0)


def impulse(amplitude: float, samples: int, pos: int = 0, dtype=jnp.float32):
    """Unit impulse at pos (`generate.go:128-141`)."""
    if samples <= 0:
        raise ValueError(f"impulse samples must be > 0: {samples}")
    if pos < 0 or pos >= samples:
        raise ValueError(f"impulse position out of range: pos={pos} samples={samples}")
    return jnp.zeros((samples,), dtype=dtype).at[pos].set(amplitude)


def linear_sweep(start_hz: float, end_hz: float, amplitude: float, samples: int,
                 sample_rate: float, dtype=jnp.float32):
    """Linear-frequency sweep (`generate.go:143-163`)."""
    if samples <= 0:
        raise ValueError(f"linear sweep samples must be > 0: {samples}")
    if sample_rate <= 0:
        raise ValueError(f"linear sweep sample rate must be > 0: {sample_rate}")
    duration = samples / sample_rate
    k = (end_hz - start_hz) / duration
    t = _time_index(samples, dtype) / sample_rate
    phase = 2.0 * np.pi * (start_hz * t + 0.5 * k * t * t)
    return amplitude * jnp.sin(phase)


def log_sweep(start_hz: float, end_hz: float, amplitude: float, samples: int,
              sample_rate: float, dtype=jnp.float32):
    """Exponential-frequency sweep (`generate.go:166-185`)."""
    if samples <= 0:
        raise ValueError(f"log sweep samples must be > 0: {samples}")
    if sample_rate <= 0:
        raise ValueError(f"log sweep sample rate must be > 0: {sample_rate}")
    if start_hz <= 0 or end_hz <= 0:
        raise ValueError(f"log sweep frequencies must be > 0: start={start_hz} end={end_hz}")
    duration = samples / sample_rate
    k = np.log(end_hz / start_hz) / duration
    if k == 0:
        return sine(start_hz, amplitude, samples, sample_rate, dtype)
    t = _time_index(samples, dtype) / sample_rate
    phase = 2.0 * np.pi * start_hz * ((jnp.exp(k * t) - 1.0) / k)
    return amplitude * jnp.sin(phase)


def white_noise(amplitude: float, samples: int, seed: int = 1, dtype=jnp.float32):
    """Uniform white noise in [-amplitude, amplitude] (`generate.go:188-205`)."""
    if samples <= 0:
        raise ValueError(f"noise samples must be > 0: {samples}")
    if amplitude < 0:
        raise ValueError(f"noise amplitude must be >= 0: {amplitude}")
    key = jax.random.PRNGKey(seed)
    return jax.random.uniform(key, (samples,), dtype=dtype,
                              minval=-amplitude, maxval=amplitude)


# Voss–McCartney band weights / cumulative thresholds (generate.go:219-221).
_PINK_A = np.array([0.23980, 0.18727, 0.16380, 0.194685, 0.214463])
_PINK_PSUM = np.array([0.00198, 0.01478, 0.06378, 0.23378, 0.91578])


def pink_noise(amplitude: float, samples: int, seed: int = 1, dtype=jnp.float32):
    """Pink noise (~-3 dB/oct) via Voss–McCartney (`generate.go:210-250`).

    Parallel formulation: sample (band_select, value) per step; for each
    band, its held contribution at step i is the value at its latest
    update index <= i. That "latest update" is a running maximum over
    update positions — computed with a cumulative max per band instead
    of a sequential hold loop.
    """
    if samples <= 0:
        raise ValueError(f"noise samples must be > 0: {samples}")
    if amplitude < 0:
        raise ValueError(f"noise amplitude must be >= 0: {amplitude}")
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    ur1 = jax.random.uniform(k1, (samples,), dtype=jnp.float32)
    val = jax.random.uniform(k2, (samples,), dtype=jnp.float32) * 2.0 - 1.0

    psum = jnp.asarray(_PINK_PSUM, dtype=jnp.float32)
    # band b updates when ur1 <= psum[b] and b is the first such band;
    # ur1 > psum[-1] updates nothing.
    band = jnp.searchsorted(psum, ur1, side="left")  # (samples,) in [0,5]
    weights = jnp.asarray(_PINK_A, dtype=jnp.float32)

    def held_contribution(b):
        hit = band == b
        v = jnp.where(hit, val * weights[b], 0.0)
        # forward-fill: value persists until the next hit
        idx = jnp.where(hit, jnp.arange(samples), -1)
        last = jax.lax.cummax(idx)
        filled = jnp.where(last >= 0, v[jnp.maximum(last, 0)], 0.0)
        return filled

    total = sum(held_contribution(b) for b in range(5))
    return (total * amplitude).astype(dtype)


def normalize(x, target_peak: float):
    """Scale to target peak amplitude (`generate.go:253-283`)."""
    if target_peak < 0:
        raise ValueError(f"normalize target peak must be >= 0: {target_peak}")
    x = jnp.asarray(x)
    max_abs = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(max_abs > 0, target_peak / jnp.where(max_abs > 0, max_abs, 1.0), 0.0)
    return x * scale


def clip(x, min_val: float, max_val: float):
    """Hard clip to [min_val, max_val] (`generate.go:286-302`)."""
    if min_val > max_val:
        raise ValueError(f"clip min must be <= max: min={min_val} max={max_val}")
    return jnp.clip(jnp.asarray(x), min_val, max_val)


def remove_dc(x):
    """Subtract the mean along time (`generate.go:305-319`)."""
    x = jnp.asarray(x)
    return x - jnp.mean(x, axis=-1, keepdims=True)


def envelope_follower(x, attack: float, release: float):
    """Peak envelope with instant-branch attack/release (`generate.go:322-350`).

    env += coeff * (|x| - env), coeff = attack when rising else release.
    """
    if not (0 <= attack <= 1):
        raise ValueError(f"attack must be in [0,1]: {attack}")
    if not (0 <= release <= 1):
        raise ValueError(f"release must be in [0,1]: {release}")
    x = jnp.asarray(x)
    env0 = jnp.zeros(x.shape[:-1], dtype=x.dtype)
    _, env = envelope_scan(jnp.abs(x), env0, attack, release)
    return env
