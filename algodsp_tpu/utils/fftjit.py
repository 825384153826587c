"""Inverse-FFT entry points that work in eager mode on the TPU relay.

The axon TPU backend executes forward FFTs (fft/rfft) op-by-op, but
the INVERSE transforms (ifft/irfft) are UNIMPLEMENTED as standalone
eager ops — the same computation compiles fine under jit. These
wrappers jit the inverse transforms with static (n, axis): inside an
existing trace the inner jit folds away (no behavior change for every
jitted pipeline); in eager use it is a per-shape cached compile that
makes library calls like `OverlapSave.process` or `istft` work
directly on the TPU backend.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n", "axis"))
def _irfft(a, *, n=None, axis=-1):
    return jnp.fft.irfft(a, n=n, axis=axis)


@partial(jax.jit, static_argnames=("n", "axis"))
def _ifft(a, *, n=None, axis=-1):
    return jnp.fft.ifft(a, n=n, axis=axis)


def irfft(a, n=None, axis=-1):
    return _irfft(a, n=n, axis=axis)


def ifft(a, n=None, axis=-1):
    return _ifft(a, n=n, axis=axis)
