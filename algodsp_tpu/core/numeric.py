"""Numeric helpers: clamping, dB conversions, denormal flushing.

Behavior parity with the Go reference `dsp/core/numeric.go:8-101`
(Clamp, NearlyEqual, FlushDenormals, DBToLinear/LinearToDB,
DBPowerToLinear/LinearPowerToDB). All functions are jnp-traceable and
work elementwise on arrays of any shape; scalars go through the same
path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DEFAULT_EPSILON = 1e-12
_DENORMAL_EPSILON = 1e-30


def clamp(value, min_value, max_value):
    """Limit value to the inclusive range [min_value, max_value].

    Like the reference (`numeric.go:8-24`), a reversed range is swapped
    rather than rejected.
    """
    lo = jnp.minimum(min_value, max_value)
    hi = jnp.maximum(min_value, max_value)
    return jnp.clip(value, lo, hi)


def nearly_equal(a, b, eps: float = 0.0):
    """Absolute-or-relative equality within eps (`numeric.go:27-44`)."""
    eps = eps if eps > 0 else _DEFAULT_EPSILON
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    diff = jnp.abs(a - b)
    largest = jnp.maximum(jnp.abs(a), jnp.abs(b))
    rel_ok = jnp.where(largest == 0, diff <= eps, diff / jnp.where(largest == 0, 1.0, largest) <= eps)
    return jnp.logical_or(diff <= eps, rel_ok)


def flush_denormals(x):
    """Zero out magnitudes below 1e-30 (`numeric.go:48-56`).

    TPUs flush denormals in hardware; this exists for exact behavioral
    parity in float64 host paths and as a feedback-loop squelch.
    """
    x = jnp.asarray(x)
    return jnp.where(jnp.abs(x) < _DENORMAL_EPSILON, jnp.zeros_like(x), x)


def db_to_linear(db):
    """dB → linear amplitude, 20*log10 convention (`numeric.go:59-61`)."""
    db = jnp.asarray(db)
    return jnp.power(jnp.asarray(10.0, db.dtype), db / 20.0)


def linear_to_db(linear):
    """Linear amplitude → dB. -inf for 0, NaN for negatives (`numeric.go:64-76`)."""
    linear = jnp.asarray(linear)
    out = 20.0 * jnp.log10(jnp.where(linear > 0, linear, 1.0))
    out = jnp.where(linear == 0, -jnp.inf, out)
    return jnp.where(linear < 0, jnp.nan, out)


def db_power_to_linear(db):
    """dB → linear power, 10*log10 convention (`numeric.go:79-81`)."""
    db = jnp.asarray(db)
    return jnp.power(jnp.asarray(10.0, db.dtype), db / 10.0)


def linear_power_to_db(power):
    """Linear power → dB. -inf for 0, NaN for negatives (`numeric.go:84-96`)."""
    power = jnp.asarray(power)
    out = 10.0 * jnp.log10(jnp.where(power > 0, power, 1.0))
    out = jnp.where(power == 0, -jnp.inf, out)
    return jnp.where(power < 0, jnp.nan, out)


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (host-side helper for FFT sizing)."""
    if n <= 1:
        return 1
    return 1 << (int(n - 1).bit_length())


def best_float():
    """float64 when x64 is enabled, else float32 — the widest dtype
    that will not be silently truncated (with a UserWarning) by JAX.
    Use as the default for f64-preferring state (meters, oracles)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
