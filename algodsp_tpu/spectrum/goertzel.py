"""Goertzel single/multi-bin tone analysis — as a matmul.

Capability parity with `dsp/spectrum/goertzel.go` (NewGoertzel,
ProcessSample/ProcessBlock, Power/Magnitude/PowerDB, MultiGoertzel,
AnalyzeBlock).

TPU-first reformulation: the Goertzel recurrence
    s_n = x_n + 2cos(w)*s_{n-1} - s_{n-2}          (goertzel.go:72-76)
is a constant-coefficient linear recurrence, so its end state after a
block has the closed form

    s0 = sum_j x_j * U_{N-1-j}(cos w)
    s1 = sum_j x_j * U_{N-2-j}(cos w)

with U_k the Chebyshev polynomials of the second kind
(U_k(cos w) = sin((k+1)w)/sin(w)). Instead of iterating per sample, we
precompute the two basis vectors per target frequency and take dot
products — one (..., N) x (N, 2K) matmul on the MXU for K frequencies,
bit-for-bit the same quantity as the sequential loop up to FP rounding.
Streaming continuity across blocks is an exact 2x2 state propagation
A^N = [[U_N, -U_{N-1}], [U_{N-1}, -U_{N-2}]].

Power = s0^2 + s1^2 - coeff*s0*s1 (`goertzel.go:95-97`).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

_TINY_SIN = 1e-12


def _cheb_u(ks: np.ndarray, omega: np.ndarray) -> np.ndarray:
    """U_k(cos w) = sin((k+1)w)/sin(w), vectorized; k=-1 gives 0.

    Degenerate w (sin w ~ 0, i.e. DC/Nyquist): U_k(±1) = (k+1)(±1)^k.
    ks: (...,) ints; omega: broadcastable.
    """
    ks = np.asarray(ks, dtype=np.float64)
    omega = np.asarray(omega, dtype=np.float64)
    s = np.sin(omega)
    degenerate = np.abs(s) < _TINY_SIN
    safe_s = np.where(degenerate, 1.0, s)
    regular = np.sin((ks + 1.0) * omega) / safe_s
    sign = np.where(np.cos(omega) >= 0, 1.0, (-1.0) ** np.mod(ks, 2))
    limit = (ks + 1.0) * sign
    return np.where(degenerate, limit, regular)


@lru_cache(maxsize=64)
def _basis_cached(freqs_key: tuple[float, ...], sample_rate: float, n: int):
    """Basis (N, K, 2) with [:, :, 0] -> s0 weights, [:, :, 1] -> s1 weights,
    plus the per-frequency 2x2 block propagation matrices (K, 2, 2)."""
    freqs = np.asarray(freqs_key, dtype=np.float64)
    omega = 2.0 * np.pi * freqs / sample_rate  # (K,)
    j = np.arange(n, dtype=np.float64)[:, None]  # (N, 1)
    u0 = _cheb_u(n - 1 - j, omega[None, :])  # U_{N-1-j}
    u1 = _cheb_u(n - 2 - j, omega[None, :])  # U_{N-2-j}; j=N-1 -> U_{-1}=0
    basis = np.stack([u0, u1], axis=-1)  # (N, K, 2)

    un = _cheb_u(np.asarray([n, n - 1, n - 2], dtype=np.float64)[:, None], omega[None, :])
    prop = np.empty((freqs.size, 2, 2), dtype=np.float64)
    prop[:, 0, 0] = un[0]
    prop[:, 0, 1] = -un[1]
    prop[:, 1, 0] = un[1]
    prop[:, 1, 1] = -un[2]
    return basis, prop


def _validate(freqs: np.ndarray, sample_rate: float):
    if not (sample_rate > 0) or not np.isfinite(sample_rate):
        raise ValueError(f"goertzel: sample rate must be > 0: {sample_rate}")
    if np.any(freqs < 0) or np.any(freqs > sample_rate / 2) or not np.all(np.isfinite(freqs)):
        raise ValueError("goertzel: frequency must be between 0 and sampleRate/2")


class Goertzel:
    """Multi-frequency Goertzel analyzer with streaming state.

    One object covers both `Goertzel` and `MultiGoertzel` from the
    reference: pass one or many target frequencies. State is an explicit
    (..., K, 2) array so it vmaps/shards over channels.
    """

    def __init__(self, frequencies, sample_rate: float):
        freqs = np.atleast_1d(np.asarray(frequencies, dtype=np.float64))
        _validate(freqs, float(sample_rate))
        self.frequencies = freqs
        self.sample_rate = float(sample_rate)
        self._coeff = 2.0 * np.cos(2.0 * np.pi * freqs / sample_rate)

    @property
    def coeff(self) -> np.ndarray:
        return self._coeff

    def init_state(self, batch_shape: tuple[int, ...] = (), dtype=jnp.float32):
        return jnp.zeros(batch_shape + (self.frequencies.size, 2), dtype=dtype)

    def process_block(self, state, x):
        """Fold a block of samples (last axis = time) into the state.

        Equivalent to per-sample iteration of `goertzel.go:72-88`, but
        evaluated as a basis matmul + 2x2 state propagation.
        """
        x = jnp.asarray(x)
        n = x.shape[-1]
        basis, prop = _basis_cached(tuple(self.frequencies), self.sample_rate, n)
        basis = jnp.asarray(basis, dtype=x.dtype)  # (N, K, 2)
        prop = jnp.asarray(prop, dtype=x.dtype)    # (K, 2, 2)
        driven = jnp.einsum("...n,nks->...ks", x, basis,
                            precision=jax.lax.Precision.HIGHEST)
        carried = jnp.einsum("kst,...kt->...ks", prop,
                             state.astype(x.dtype),
                             precision=jax.lax.Precision.HIGHEST)
        return carried + driven

    def power(self, state):
        """|X|^2 from state (`goertzel.go:95-97`)."""
        s0 = state[..., 0]
        s1 = state[..., 1]
        coeff = jnp.asarray(self._coeff, dtype=state.dtype)
        return s0 * s0 + s1 * s1 - coeff * s0 * s1

    def magnitude(self, state):
        p = self.power(state)
        return jnp.sqrt(jnp.maximum(p, 0.0))

    def power_db(self, state):
        """Power in dB floored at -300 (`goertzel.go:109-115`)."""
        p = self.power(state)
        return jnp.where(p <= 1e-30, -300.0, 10.0 * jnp.log10(jnp.maximum(p, 1e-300)))


def goertzel_power(x, frequencies, sample_rate: float):
    """One-shot block power, the analog of `AnalyzeBlock` (`goertzel.go:149-158`).

    x: (..., N); frequencies: scalar or (K,). Returns (...,) or (..., K).
    """
    g = Goertzel(frequencies, sample_rate)
    x = jnp.asarray(x)
    state = g.init_state(x.shape[:-1], dtype=x.dtype)
    state = g.process_block(state, x)
    p = g.power(state)
    if np.isscalar(frequencies) or np.ndim(frequencies) == 0:
        return p[..., 0]
    return p


def goertzel_magnitude(x, frequencies, sample_rate: float):
    p = goertzel_power(x, frequencies, sample_rate)
    return jnp.sqrt(jnp.maximum(p, 0.0))


def goertzel_power_db(x, frequencies, sample_rate: float):
    p = goertzel_power(x, frequencies, sample_rate)
    return jnp.where(p <= 1e-30, -300.0, 10.0 * jnp.log10(jnp.maximum(p, 1e-300)))
