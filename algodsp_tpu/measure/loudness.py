"""EBU R128 / ITU-R BS.1770 loudness metering.

Capability parity with `measure/loudness/meter.go`: per-channel
K-weighting = RBJ high-shelf (1500 Hz, +4 dB) + highpass (38 Hz)
(`meter.go:11-17,78-93`), 400 ms momentary and 3 s short-term
mean-square windows (`meter.go:37-49`), integrated loudness with
-70 LUFS absolute + -10 LU relative gating over 75%-overlap 400 ms
blocks (`meter.go:22-27,245`), LUFS = -0.691 + 10*log10(mean square)
(`meter.go:297-302`), per-channel sample peak.

TPU-first: the Go per-sample ring buffers become batched filtering
(blocked-scan biquads over all channels) + framed means (gather +
reduction). The meter is buffer-oriented: feed blocks, loudness values
come from the carried weighted-square history.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.filters.biquad import BiquadChain
from algodsp_tpu.filters.design import rbj

K_SHELF_FREQ = 1500.0
K_SHELF_GAIN = 4.0
K_HPF_FREQ = 38.0
MOMENTARY_S = 0.4
SHORT_TERM_S = 3.0
ABS_THRESHOLD = -70.0
REL_THRESHOLD = -10.0
BLOCK_OVERLAP = 0.75


def _lufs(mean_square: float) -> float:
    if mean_square <= 0:
        return -math.inf
    return -0.691 + 10.0 * math.log10(mean_square)


@dataclasses.dataclass(frozen=True)
class LoudnessReading:
    momentary_lufs: float
    short_term_lufs: float
    integrated_lufs: float
    sample_peaks: np.ndarray  # per channel


class Meter:
    """Multi-channel loudness meter with explicit streaming state."""

    def __init__(self, sample_rate: float = 48000.0, channels: int = 2):
        if sample_rate <= 0 or channels <= 0:
            raise ValueError("loudness: invalid sample rate / channels")
        self.sample_rate = sample_rate
        self.channels = channels
        q = 1.0 / math.sqrt(2.0)
        sos = np.stack([rbj.high_shelf(K_SHELF_FREQ, K_SHELF_GAIN, q, sample_rate),
                        rbj.highpass(K_HPF_FREQ, q, sample_rate)])
        self.k_chain = BiquadChain(sos)
        self.mom_win = int(round(MOMENTARY_S * sample_rate))
        self.short_win = int(round(SHORT_TERM_S * sample_rate))
        self.block_len = self.mom_win
        self.block_step = max(int(round(self.block_len * (1 - BLOCK_OVERLAP))), 1)

    def init_state(self, dtype=jnp.float64):
        return {
            "filters": self.k_chain.init_state((self.channels,), dtype),
            # weighted-square history (short-term window is the longest)
            "history": jnp.zeros((self.channels, self.short_win), dtype),
            "peaks": jnp.zeros((self.channels,), dtype),
            # gating blocks accumulated on host (analysis metadata)
            "blocks": [],
            "pending": np.zeros((0,)),  # leftover squared-mean stream
        }

    def process(self, state, x):
        """Feed a (channels, N) block; returns (state, LoudnessReading)."""
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[0] != self.channels:
            raise ValueError(
                f"loudness: expected {self.channels} channels, got {x.shape[0]}")
        fstate, weighted = self.k_chain.process_stream(state["filters"], x)
        sq = weighted * weighted
        history = jnp.concatenate([state["history"], sq], axis=-1)[..., -self.short_win:]
        peaks = jnp.maximum(state["peaks"], jnp.max(jnp.abs(x), axis=-1))

        # momentary / short-term: mean over trailing windows, summed over
        # channels (meter.go:225-260)
        mom_ms = float(jnp.sum(jnp.mean(history[..., -self.mom_win:], axis=-1)))
        short_ms = float(jnp.sum(jnp.mean(history, axis=-1)))

        # integrated gating blocks: 400 ms windows at 75% overlap over the
        # *newly appended* region (block centers stride block_step)
        pending = np.concatenate([state["pending"],
                                  np.asarray(jnp.sum(sq, axis=0))])
        blocks = list(state["blocks"])
        pos = 0
        while pos + self.block_len <= pending.size:
            blocks.append(float(pending[pos:pos + self.block_len].mean()))
            pos += self.block_step
        pending = pending[pos:]

        new_state = {"filters": fstate, "history": history, "peaks": peaks,
                     "blocks": blocks, "pending": pending}
        return new_state, LoudnessReading(
            momentary_lufs=_lufs(mom_ms),
            short_term_lufs=_lufs(short_ms),
            integrated_lufs=self._integrated(blocks),
            sample_peaks=np.asarray(peaks))

    @staticmethod
    def _integrated(blocks) -> float:
        """Two-stage gated mean (`meter.go:245-295`)."""
        if not blocks:
            return -math.inf
        b = np.asarray(blocks, dtype=np.float64)
        l_blocks = np.array([_lufs(v) for v in b])
        gated = b[l_blocks > ABS_THRESHOLD]
        if gated.size == 0:
            return -math.inf
        rel_gate = _lufs(float(gated.mean())) + REL_THRESHOLD
        final = b[(l_blocks > ABS_THRESHOLD) & (l_blocks > rel_gate)]
        if final.size == 0:
            return -math.inf
        return _lufs(float(final.mean()))


def measure(x, sample_rate: float = 48000.0) -> LoudnessReading:
    """One-shot measurement of a (channels, N) or (N,) buffer."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[None, :]
    meter = Meter(sample_rate, x.shape[0])
    state = meter.init_state(dtype=x.dtype)
    _, reading = meter.process(state, x)
    return reading
