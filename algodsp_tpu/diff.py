"""Differentiable (traced-coefficient) filter design and runtime.

The main designers (`filters.design.*`) follow the reference's contract
(`dsp/filter/design/design.go:37-225`): host-side float64 NumPy with
edge-case conventions (invalid params -> zero coefficients), producing
*constant* coefficients that the runtime engines fold into Toeplitz /
FDL kernels. That is the right shape for processing, but it makes the
design parameters opaque to `jax.grad`.

This module is the TPU-native extra the Go reference has no analog
for: the same RBJ cookbook math written in jnp over *traced* scalars,
plus traced-coefficient response evaluation and a differentiable SOS
runtime. Together with the custom-VJP'd kernels (ops/envscan.py,
ops/pallas_kernels.py, ops/fdlconv.py) this makes gradient-based
design possible end to end:

    params -> rbj.peak(...) -> sos_response / sos_filter -> loss
    `jax.grad(loss)` reaches the center frequencies, Qs and gains.

See examples/gradient_eq_fit.py for a complete EQ-matching fit.

Notes on intent: these designers do NOT reproduce the host designers'
invalid-parameter conventions (zero coefficients, default-Q fallback) —
those are data-dependent branches that would put `cond`s in the middle
of an optimization landscape. Callers keep parameters in range
(`constrain()` provides the standard smooth reparameterization). For
valid parameters the outputs match `filters.design` to f64 roundoff
(asserted in tests/test_diff.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Smooth parameter constraints
# ---------------------------------------------------------------------------

def constrain(raw, lo, hi):
    """Smooth sigmoid reparameterization of an unconstrained scalar onto
    (lo, hi) — keeps gradient-descent iterates inside valid design
    ranges (frequencies inside (0, Nyquist), Q > 0) without clipping.
    Uses jax.nn.sigmoid so both the primal and the gradient stay finite
    for arbitrarily large-magnitude `raw` (a naive 1/(1+exp(-raw))
    overflows to inf and its gradient to NaN for raw << 0)."""
    return lo + (hi - lo) * jax.nn.sigmoid(raw)


# ---------------------------------------------------------------------------
# RBJ cookbook designers over traced scalars
# ---------------------------------------------------------------------------

def _wa(freq, q, sample_rate):
    w0 = 2.0 * jnp.pi * freq / sample_rate
    cw, sw = jnp.cos(w0), jnp.sin(w0)
    return cw, sw, sw / (2.0 * q)


def _norm(b0, b1, b2, a0, a1, a2):
    inv = 1.0 / a0
    return jnp.stack([b0 * inv, b1 * inv, b2 * inv, a1 * inv, a2 * inv])


def lowpass(freq, q, sample_rate):
    """Traced RBJ lowpass; math of `filters.design.lowpass`."""
    cw, sw, alpha = _wa(freq, q, sample_rate)
    return _norm((1 - cw) / 2, 1 - cw, (1 - cw) / 2,
                 1 + alpha, -2 * cw, 1 - alpha)


def highpass(freq, q, sample_rate):
    cw, sw, alpha = _wa(freq, q, sample_rate)
    return _norm((1 + cw) / 2, -(1 + cw), (1 + cw) / 2,
                 1 + alpha, -2 * cw, 1 - alpha)


def bandpass(freq, q, sample_rate):
    cw, sw, alpha = _wa(freq, q, sample_rate)
    return _norm(sw / 2, jnp.zeros_like(sw), -sw / 2,
                 1 + alpha, -2 * cw, 1 - alpha)


def notch(freq, q, sample_rate):
    cw, sw, alpha = _wa(freq, q, sample_rate)
    one = jnp.ones_like(cw)
    return _norm(one, -2 * cw, one, 1 + alpha, -2 * cw, 1 - alpha)


def allpass(freq, q, sample_rate):
    cw, sw, alpha = _wa(freq, q, sample_rate)
    return _norm(1 - alpha, -2 * cw, 1 + alpha,
                 1 + alpha, -2 * cw, 1 - alpha)


def peak(freq, gain_db, q, sample_rate):
    cw, sw, alpha = _wa(freq, q, sample_rate)
    a = 10.0 ** (gain_db / 40.0)
    return _norm(1 + alpha * a, -2 * cw, 1 - alpha * a,
                 1 + alpha / a, -2 * cw, 1 - alpha / a)


def low_shelf(freq, gain_db, q, sample_rate):
    cw, sw, alpha = _wa(freq, q, sample_rate)
    a = 10.0 ** (gain_db / 40.0)
    beta = 2.0 * jnp.sqrt(a) * alpha
    return _norm(a * ((a + 1) - (a - 1) * cw + beta),
                 2 * a * ((a - 1) - (a + 1) * cw),
                 a * ((a + 1) - (a - 1) * cw - beta),
                 (a + 1) + (a - 1) * cw + beta,
                 -2 * ((a - 1) + (a + 1) * cw),
                 (a + 1) + (a - 1) * cw - beta)


def high_shelf(freq, gain_db, q, sample_rate):
    cw, sw, alpha = _wa(freq, q, sample_rate)
    a = 10.0 ** (gain_db / 40.0)
    beta = 2.0 * jnp.sqrt(a) * alpha
    return _norm(a * ((a + 1) + (a - 1) * cw + beta),
                 -2 * a * ((a - 1) + (a + 1) * cw),
                 a * ((a + 1) + (a - 1) * cw - beta),
                 (a + 1) - (a - 1) * cw + beta,
                 2 * ((a - 1) - (a + 1) * cw),
                 (a + 1) - (a - 1) * cw - beta)


# ---------------------------------------------------------------------------
# Traced response evaluation and SOS runtime
# ---------------------------------------------------------------------------

def _sos_response_parts(sos, freqs, sample_rate):
    """(re, im) of the cascade response, in pure real arithmetic.

    Real trig instead of complex exp both keeps everything on the VPU's
    native f32 path and sidesteps backends where eager complex ops are
    unavailable (the axon TPU relay)."""
    sos = jnp.atleast_2d(jnp.asarray(sos))
    w = 2.0 * jnp.pi * jnp.asarray(freqs) / sample_rate      # (F,)
    c1, s1 = jnp.cos(w), jnp.sin(w)                          # e^{-iw} = c1 - i s1
    c2, s2 = jnp.cos(2 * w), jnp.sin(2 * w)
    b0, b1, b2, a1, a2 = (sos[:, i][:, None] for i in range(5))
    nre = b0 + b1 * c1 + b2 * c2
    nim = -(b1 * s1 + b2 * s2)
    dre = 1.0 + a1 * c1 + a2 * c2
    dim = -(a1 * s1 + a2 * s2)
    dmag = dre * dre + dim * dim
    hre = (nre * dre + nim * dim) / dmag                     # (S, F)
    him = (nim * dre - nre * dim) / dmag

    def mul(acc, h):
        (are, aim), (bre, bim) = acc, h
        return are * bre - aim * bim, are * bim + aim * bre

    re, im = hre[0], him[0]
    for k in range(1, hre.shape[0]):
        re, im = mul((re, im), (hre[k], him[k]))
    return re, im


def sos_response(sos, freqs, sample_rate):
    """Complex frequency response of a traced (S, 5) [or (5,)] SOS
    stack at `freqs` Hz — jnp mirror of `filters.biquad.sos_response`,
    differentiable w.r.t. the coefficients (and through them the design
    parameters)."""
    re, im = _sos_response_parts(sos, freqs, sample_rate)
    return jax.lax.complex(re, im)


def sos_magnitude_db(sos, freqs, sample_rate, floor_db: float = -200.0):
    """|H| in dB with a differentiable floor (avoids log(0) at exact
    response nulls). Complex-free: runs eagerly on every backend."""
    re, im = _sos_response_parts(sos, freqs, sample_rate)
    p = re * re + im * im
    return 10.0 * jnp.log10(p + 10.0 ** (floor_db / 10.0))


def sos_filter(sos, x, state=None):
    """Apply a traced-coefficient SOS cascade along the last axis
    (Direct Form II Transposed, the `section.go:47-53` recurrence).

    Unlike `BiquadChain` (host-constant coefficients compiled into
    Toeplitz block kernels) this keeps the coefficients as traced
    arrays, so `jax.grad` reaches them. It runs as a lax.scan — the
    right tool for *fitting* (short excerpt losses), not for bulk
    processing: once fitted, freeze the coefficients into a
    `BiquadChain` for the fast engines.

    Args:
      sos: (S, 5) or (5,) traced coefficients [b0 b1 b2 a1 a2].
      x: (..., T) signal.
      state: optional (..., S, 2) DF2T state [d0, d1]; zeros when None.

    Returns:
      (y, new_state) with y (..., T) and new_state (..., S, 2).
    """
    sos = jnp.atleast_2d(jnp.asarray(sos))
    x = jnp.asarray(x)
    s = sos.shape[0]
    lead = x.shape[:-1]
    dtype = jnp.result_type(x.dtype, sos.dtype)
    x = x.astype(dtype)
    sos = sos.astype(dtype)
    if state is None:
        state = jnp.zeros(lead + (s, 2), dtype)
    else:
        state = jnp.asarray(state, dtype)

    b0, b1, b2, a1, a2 = (sos[:, i] for i in range(5))
    xs = jnp.moveaxis(x, -1, 0)                              # (T, ...)

    def step(d, xt):
        # run the S sections sequentially (S is small and static)
        v = xt
        new_d = []
        for k in range(s):
            y = b0[k] * v + d[..., k, 0]
            d0 = b1[k] * v - a1[k] * y + d[..., k, 1]
            d1 = b2[k] * v - a2[k] * y
            new_d.append(jnp.stack([d0, d1], axis=-1))
            v = y
        return jnp.stack(new_d, axis=-2), v

    new_state, ys = jax.lax.scan(step, state, xs)
    return jnp.moveaxis(ys, 0, -1), new_state


def fir_filter(taps, x):
    """Causal FIR of a traced tap vector along the last axis (zero
    initial state), differentiable in both arguments. One XLA
    convolution (MXU) over the flattened channels rather than a scan."""
    lax = jax.lax
    taps = jnp.asarray(taps)
    x = jnp.asarray(x)
    dtype = jnp.result_type(x.dtype, taps.dtype)
    m = taps.shape[-1]
    lead = x.shape[:-1]
    n = x.shape[-1]
    xp = jnp.pad(x.reshape(-1, 1, n).astype(dtype),
                 ((0, 0), (0, 0), (m - 1, 0)))
    k = jnp.flip(taps, -1).reshape(1, 1, m).astype(dtype)
    y = lax.conv_general_dilated(xp, k, window_strides=(1,),
                                 precision=lax.Precision.HIGHEST,
                                 padding="VALID")
    return y.reshape(lead + (n,))
