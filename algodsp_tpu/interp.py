"""Fractional-sample interpolation kernels.

Capability parity with `dsp/interp/interp.go`: Linear2, Hermite4,
Lagrange4, LanczosN/Lanczos6, SincInterp (Blackman-windowed),
Thiran first-order allpass coefficient, and mode enum.

All kernels are elementwise jnp expressions over broadcastable arrays:
`t` and each sample point may be scalars or arrays — the per-sample Go
loops become single fused VPU expressions. Gather-based users
(`delayline.py`) assemble the sample points with vectorized takes.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class Mode(enum.Enum):
    LINEAR = "linear"
    HERMITE = "hermite"
    LAGRANGE3 = "lagrange3"
    LANCZOS3 = "lanczos3"
    SINC = "sinc"
    ALLPASS = "allpass"


def linear2(t, x0, x1):
    """2-point linear interpolation (`interp.go:44-46`)."""
    return x0 + t * (x1 - x0)


def hermite4(t, xm1, x0, x1, x2):
    """4-point cubic Hermite (Catmull-Rom style) (`interp.go:51-59`)."""
    c0 = x0
    c1 = 0.5 * (x1 - xm1)
    c2 = xm1 - 2.5 * x0 + 2.0 * x1 - 0.5 * x2
    c3 = 0.5 * (x2 - xm1) + 1.5 * (x0 - x1)
    return ((c3 * t + c2) * t + c1) * t + c0


def lagrange4(t, xm1, x0, x1, x2):
    """4-point 3rd-order Lagrange (`interp.go:63-75`)."""
    d0 = t
    d1 = t - 1.0
    d2 = t + 1.0
    l0 = -d0 * d1 * (t - 2.0) / 6.0
    l1 = d2 * d1 * (t - 2.0) / 2.0
    l2 = -d2 * d0 * (t - 2.0) / 2.0
    l3 = d2 * d0 * d1 / 6.0
    return l0 * xm1 + l1 * x0 + l2 * x1 + l3 * x2


def sinc_normalized(x):
    px = jnp.pi * x
    safe = jnp.where(x == 0, 1.0, px)
    return jnp.where(x == 0, 1.0, jnp.sin(safe) / safe)


def lanczos_window(x, a: int):
    inside = jnp.logical_and(x > -a, x < a)
    return jnp.where(inside, sinc_normalized(x / a), 0.0)


def lanczos_n(t, samples, a: int):
    """Lanczos windowed-sinc over 2a points (`interp.go:104-122`).

    samples: (..., 2a) stacked on the last axis; samples[..., a-1] and
    samples[..., a] bracket t.
    """
    samples = jnp.asarray(samples)
    t = jnp.asarray(t)[..., None]
    i = jnp.arange(2 * a)
    d = (i - (a - 1)) - t
    w = sinc_normalized(d) * lanczos_window(d, a)
    wsum = jnp.sum(w, axis=-1)
    out = jnp.sum(w * samples, axis=-1)
    return jnp.where(wsum == 0, 0.0, out / jnp.where(wsum == 0, 1.0, wsum))


def lanczos6(t, samples):
    """Lanczos a=3 over 6 points (`interp.go:124-126`)."""
    return lanczos_n(t, samples, 3)


def sinc_interp(t, samples, n: int):
    """Blackman-windowed sinc over 2n points (`interp.go:134-155`)."""
    samples = jnp.asarray(samples)
    t = jnp.asarray(t)[..., None]
    taps = 2 * n
    i = jnp.arange(taps)
    d = (i - (n - 1)) - t
    wn = (i + (1.0 - t)) / taps
    bw = 0.42 - 0.5 * jnp.cos(2 * jnp.pi * wn) + 0.08 * jnp.cos(4 * jnp.pi * wn)
    w = sinc_normalized(d) * bw
    wsum = jnp.sum(w, axis=-1)
    out = jnp.sum(w * samples, axis=-1)
    return jnp.where(wsum == 0, 0.0, out / jnp.where(wsum == 0, 1.0, wsum))


def allpass_coeff(t):
    """Thiran first-order allpass coefficient (`interp.go:163-165`)."""
    return (1.0 - t) / (1.0 + t)


def allpass_tick(t, x0, x1, state):
    """One allpass interpolation step; returns (out, new_state)
    (`interp.go:171-177`)."""
    eta = allpass_coeff(t)
    out = x1 + eta * (x0 - state)
    return out, out


def points_needed(mode: Mode, sinc_half_width: int = 8) -> tuple[int, int]:
    """(points_before_bracket, total_points) for each mode: how many
    integer sample points around the bracket the mode consumes."""
    if mode == Mode.LINEAR or mode == Mode.ALLPASS:
        return 0, 2
    if mode in (Mode.HERMITE, Mode.LAGRANGE3):
        return 1, 4
    if mode == Mode.LANCZOS3:
        return 2, 6
    if mode == Mode.SINC:
        return sinc_half_width - 1, 2 * sinc_half_width
    raise ValueError(f"unknown mode {mode}")


class LagrangeInterpolator:
    """Configurable-order fractional interpolator (the legacy wrapper,
    `interp.go:188-228`): order 1 = linear over samples[0:2]; order 3 =
    4-point Hermite-style over samples[0:4] (bracket samples[1:3]);
    other orders fall back to linear, matching the reference."""

    def __init__(self, order: int = 3):
        self.order = order

    def interpolate(self, samples, frac):
        samples = jnp.asarray(samples)
        n = samples.shape[-1]
        if n == 0:
            raise ValueError("interp: empty samples")
        if self.order == 3 and n >= 4:
            return hermite4(frac, samples[..., 0], samples[..., 1],
                            samples[..., 2], samples[..., 3])
        if n < 2:
            return samples[..., 0]
        return linear2(frac, samples[..., 0], samples[..., 1])
