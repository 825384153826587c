"""Cross/auto-correlation.

Capability parity with `dsp/conv/correlate.go`: direct & FFT
cross-correlation (full length N+M-1), auto- and normalized variants,
peak finding, lag <-> index mapping.

Correlation convention (as in the reference): corr[k] covers lags
-(len_b-1) .. len_a-1; corr = conv(a, reverse(b)).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.conv.conv import direct, fftconvolve, FFT_THRESHOLD


def _rev(b):
    return jnp.asarray(b).reshape(-1)[::-1]


def correlate_direct(a, b):
    """Time-domain cross-correlation (`correlate.go:31-43`)."""
    return direct(a, _rev(b))


def correlate_fft(a, b):
    """FFT cross-correlation (`correlate.go:111-187`)."""
    return fftconvolve(a, _rev(b))


def correlate(a, b):
    """Auto-selecting cross-correlation (`correlate.go:16-29`)."""
    m = jnp.asarray(b).reshape(-1).shape[-1]
    if m >= FFT_THRESHOLD:
        return correlate_fft(a, b)
    return correlate_direct(a, b)


def auto_correlate(a):
    """Auto-correlation (`correlate.go:57-61`)."""
    return correlate(a, a)


def auto_correlate_normalized(a):
    """Auto-correlation scaled so the zero-lag value is 1
    (`correlate.go:63-84`)."""
    ac = auto_correlate(a)
    n = jnp.asarray(a).shape[-1]
    zero_lag = ac[..., n - 1:n]
    return ac / jnp.where(zero_lag == 0, 1.0, zero_lag)


def correlate_normalized(a, b):
    """Cross-correlation normalized by ||a||*||b|| (`correlate.go:86-109`)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = correlate(a, b)
    norm = (jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True))
            * jnp.sqrt(jnp.sum(b * b, axis=-1)))
    return c / jnp.where(norm == 0, 1.0, norm)


def find_peak(corr):
    """(index, value) of the maximum correlation (`correlate.go:200-219`)."""
    corr = jnp.asarray(corr)
    idx = jnp.argmax(corr, axis=-1)
    val = jnp.take_along_axis(corr, idx[..., None], axis=-1)[..., 0]
    return idx, val


def lag_from_index(index, len_b: int):
    """Correlation index -> signal lag (`correlate.go:221-225`)."""
    return index - (len_b - 1)


def index_from_lag(lag, len_b: int):
    """Signal lag -> correlation index (`correlate.go:227-231`)."""
    return lag + (len_b - 1)
