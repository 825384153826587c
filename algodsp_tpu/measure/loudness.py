"""EBU R128 / ITU-R BS.1770 loudness metering.

Capability parity with `measure/loudness/meter.go`: per-channel
K-weighting = RBJ high-shelf (1500 Hz, +4 dB) + highpass (38 Hz)
(`meter.go:11-17,78-93`), 400 ms momentary and 3 s short-term
mean-square windows (`meter.go:37-49`), integrated loudness with
-70 LUFS absolute + -10 LU relative gating over 75%-overlap 400 ms
blocks (`meter.go:22-27,245`), LUFS = -0.691 + 10*log10(mean square)
(`meter.go:297-302`), per-channel sample peak, and 4x-oversampled
true peak (left as a TODO in the reference, `meter.go:60-61` — here
implemented through the polyphase resampler). Beyond the reference:
loudness range (LRA, EBU Tech 3342) from the distribution of gated
short-term loudness values (-70 LUFS absolute gate, -20 LU relative
gate, 95th minus 10th percentile).

TPU-first: the meter is FULLY device-resident and jittable —
`process(state, x) -> (state, reading)` is a pure function over a
fixed-shape pytree, so the meter can sit inside a jitted effect chain
like every other processor. Gating blocks live in a fixed-capacity
on-device energy buffer (dynamic-slice append + masked reductions
replace the reference's per-sample ring buffers and the previous
Python-list implementation); block boundaries that span process calls
are carried in a summed-square tail buffer.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
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
TRUE_PEAK_OVERSAMPLE = 4
LRA_REL_THRESHOLD = -20.0   # Tech 3342 relative gate (LU below gated mean)
LRA_LOW_PCT = 0.10
LRA_HIGH_PCT = 0.95


def _lufs(ms):
    """-0.691 + 10 log10(ms), -inf at zero power (`meter.go:297-302`)."""
    ms = jnp.asarray(ms)
    safe = jnp.maximum(ms, jnp.finfo(ms.dtype).tiny)
    return jnp.where(ms > 0, -0.691 + 10.0 * jnp.log10(safe), -jnp.inf)


class LoudnessReading(NamedTuple):
    """Device-resident reading: scalars are 0-d jax arrays under jit."""
    momentary_lufs: jax.Array
    short_term_lufs: jax.Array
    integrated_lufs: jax.Array
    sample_peaks: jax.Array   # (channels,)
    true_peaks: jax.Array     # (channels,) linear; 0 when disabled


class Meter:
    """Multi-channel loudness meter with explicit streaming state."""

    def __init__(self, sample_rate: float = 48000.0, channels: int = 2,
                 *, max_blocks: int = 36000, true_peak: bool = True,
                 lra: bool = True, channel_weights=None):
        if sample_rate <= 0 or channels <= 0:
            raise ValueError("loudness: invalid sample rate / channels")
        self.sample_rate = sample_rate
        self.channels = channels
        # BS.1770-4 channel weights G_i (1.0 front, 1.41 surround);
        # the reference meter weighs all channels equally (meter.go:80-93)
        if channel_weights is None:
            self.channel_weights = np.ones(channels)
        else:
            self.channel_weights = np.asarray(channel_weights, np.float64)
            if self.channel_weights.shape != (channels,):
                raise ValueError(
                    f"loudness: channel_weights must have shape ({channels},)")
            if np.any(self.channel_weights < 0):
                raise ValueError("loudness: channel weights must be >= 0")
        q = 1.0 / math.sqrt(2.0)
        sos = np.stack([rbj.high_shelf(K_SHELF_FREQ, K_SHELF_GAIN, q, sample_rate),
                        rbj.highpass(K_HPF_FREQ, q, sample_rate)])
        self.k_chain = BiquadChain(sos)
        self.mom_win = int(round(MOMENTARY_S * sample_rate))
        self.short_win = int(round(SHORT_TERM_S * sample_rate))
        self.block_len = self.mom_win
        self.block_step = max(int(round(self.block_len * (1 - BLOCK_OVERLAP))), 1)
        # fixed gating-block capacity: 0.1 s stride -> default 1 h of audio
        self.max_blocks = int(max_blocks)
        self.true_peak = bool(true_peak)
        # LRA needs a short-term energy append per call (a cumsum over
        # ~short_win samples); opt out for latency-critical streaming
        # meters that only need R128 integrated loudness
        self.lra = bool(lra)
        if self.true_peak:
            from algodsp_tpu.resample import Resampler, Quality
            self._tp_resampler = Resampler(TRUE_PEAK_OVERSAMPLE, 1,
                                           quality=Quality.BEST)

    def init_state(self, dtype=None):
        if dtype is None:
            from algodsp_tpu.core.numeric import best_float
            dtype = best_float()
        state = {
            "filters": self.k_chain.init_state((self.channels,), dtype),
            # weighted-square history (short-term window is the longest)
            "history": jnp.zeros((self.channels, self.short_win), dtype),
            "peaks": jnp.zeros((self.channels,), dtype),
            # fixed-capacity gating-block energy buffer + counters
            "block_energies": jnp.zeros((self.max_blocks,), dtype),
            "block_count": jnp.zeros((), jnp.int32),
            "sample_count": jnp.zeros((), jnp.int32),
            # summed-square tail covering a partially-filled gating block
            "sq_tail": jnp.zeros((self.block_len,), dtype),
            "true_peaks": jnp.zeros((self.channels,), dtype),
        }
        if self.lra:
            # short-term (3 s) loudness values at the gating stride, for
            # LRA (EBU Tech 3342) — the history buffer doubles as tail
            state["st_energies"] = jnp.zeros((self.max_blocks,), dtype)
            state["st_count"] = jnp.zeros((), jnp.int32)
        if self.true_peak:
            state["tp_hist"] = self._tp_resampler.init_state(
                (self.channels,), dtype)
        return state

    def process(self, state, x):
        """Feed a (channels, N) block; returns (state, LoudnessReading).

        Jittable: fixed shapes per N, no host syncs. The energy of every
        gating block (400 ms at 75% overlap, `meter.go:22-27`) whose end
        falls inside this call is appended on device.
        """
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[0] != self.channels:
            raise ValueError(
                f"loudness: expected {self.channels} channels, got {x.shape[0]}")
        n = x.shape[-1]
        dtype = state["history"].dtype
        xw = x.astype(dtype)
        fstate, weighted = self.k_chain.process_stream(state["filters"], xw)
        sq = weighted * weighted \
            * jnp.asarray(self.channel_weights, dtype)[:, None]
        history = jnp.concatenate([state["history"], sq],
                                  axis=-1)[..., -self.short_win:]
        peaks = jnp.maximum(state["peaks"],
                            jnp.max(jnp.abs(xw), axis=-1))

        # momentary / short-term: trailing-window means summed over
        # channels (meter.go:225-260)
        mom_ms = jnp.sum(jnp.mean(history[..., -self.mom_win:], axis=-1))
        short_ms = jnp.sum(jnp.mean(history, axis=-1))

        # --- integrated gating blocks, device-resident ------------------
        # concat[j] = summed-square at absolute sample t0 - block_len + j
        t0 = state["sample_count"]
        sum_sq = jnp.sum(sq, axis=0)
        concat = jnp.concatenate([state["sq_tail"], sum_sq])
        block_energies, block_count = self._append_energies(
            state["block_energies"], state["block_count"],
            concat, self.block_len, t0, n)

        new_state = {
            "filters": fstate, "history": history, "peaks": peaks,
            "block_energies": block_energies, "block_count": block_count,
            "sample_count": t0 + n,
            "sq_tail": concat[-self.block_len:],
        }

        if self.lra:
            # --- short-term (3 s) loudness values at the same stride,
            # for LRA (Tech 3342): the pre-update history IS the tail
            st_concat = jnp.concatenate(
                [jnp.sum(state["history"], axis=0), sum_sq])
            st_energies, st_count = self._append_energies(
                state["st_energies"], state["st_count"],
                st_concat, self.short_win, t0, n)
            new_state["st_energies"] = st_energies
            new_state["st_count"] = st_count

        # --- true peak: 4x oversampled |max| (beats meter.go:60-61 TODO)
        if self.true_peak:
            tp_hist, up = self._tp_resampler.process_stream(
                state["tp_hist"], xw)
            true_peaks = jnp.maximum(state["true_peaks"],
                                     jnp.max(jnp.abs(up), axis=-1))
            new_state["tp_hist"] = tp_hist
        else:
            true_peaks = state["true_peaks"]
        new_state["true_peaks"] = true_peaks

        return new_state, LoudnessReading(
            momentary_lufs=_lufs(mom_ms),
            short_term_lufs=_lufs(short_ms),
            integrated_lufs=self._integrated(block_energies, block_count),
            sample_peaks=peaks,
            true_peaks=true_peaks)

    def flush_true_peak(self, state):
        """Final true-peak value including the oversampler's tail.

        The 4x polyphase filter delays its output by ~taps/2 input
        samples, so inter-sample peaks in the last few input samples
        have not yet appeared in any `process` call's oversampled
        stream. Feeding one filter-memory's worth of zeros flushes
        them; call once at end-of-measurement (one-shot `measure` does).
        """
        if not self.true_peak:
            return state["true_peaks"]
        hist = state["tp_hist"]
        zeros = jnp.zeros((self.channels, self._tp_resampler.max_phase_len),
                          hist.dtype)
        _, up = self._tp_resampler.process_stream(hist, zeros)
        return jnp.maximum(state["true_peaks"],
                           jnp.max(jnp.abs(up), axis=-1))

    def _append_energies(self, buf, count, concat, win, t0, n):
        """Masked append of every `win`-long mean-square window (at the
        gating stride) whose end falls inside this call.

        concat[j] = summed-square at absolute sample t0 - win + j; window
        b covers absolute samples [b*step, b*step + win). Invalid slots
        scatter out of bounds and are dropped (duplicate-index .at[].set
        ordering is undefined, so aliasing them onto a real slot would
        be nondeterministic).
        """
        dtype = buf.dtype
        cs = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(concat)])
        kmax = n // self.block_step + 1
        b_idx = count + jnp.arange(kmax, dtype=jnp.int32)
        starts = b_idx * self.block_step - t0 + win
        valid = (b_idx * self.block_step + win <= t0 + n) \
            & (b_idx < self.max_blocks)
        starts_c = jnp.clip(starts, 0, concat.shape[0] - win)
        energies = (jnp.take(cs, starts_c + win)
                    - jnp.take(cs, starts_c)) / win
        n_new = jnp.sum(valid.astype(jnp.int32))
        pos = jnp.where(valid, b_idx, jnp.int32(self.max_blocks))
        return (buf.at[pos].set(energies, mode="drop"),
                jnp.minimum(count + n_new, self.max_blocks))

    def loudness_range(self, state):
        """LRA in LU (EBU Tech 3342): 95th minus 10th percentile of the
        gated short-term loudness distribution (-70 LUFS absolute gate,
        then -20 LU below the gated energy mean). Jittable; returns a
        0-d array, 0.0 until two short-term values pass the gates.
        """
        if not self.lra:
            raise ValueError("loudness: meter built with lra=False")
        energies = state["st_energies"]
        have = jnp.arange(self.max_blocks) < state["st_count"]
        l_st = _lufs(energies)
        m_abs = have & (l_st > ABS_THRESHOLD)
        n_abs = jnp.sum(m_abs)
        mean_abs = jnp.sum(jnp.where(m_abs, energies, 0.0)) \
            / jnp.maximum(n_abs, 1)
        rel_gate = _lufs(mean_abs) + LRA_REL_THRESHOLD
        m_rel = m_abs & (l_st >= rel_gate)
        n_rel = jnp.sum(m_rel)
        ranked = jnp.sort(jnp.where(m_rel, l_st, jnp.inf))
        lo = jnp.round(LRA_LOW_PCT * (n_rel - 1)).astype(jnp.int32)
        hi = jnp.round(LRA_HIGH_PCT * (n_rel - 1)).astype(jnp.int32)
        lra = jnp.take(ranked, jnp.maximum(hi, 0)) \
            - jnp.take(ranked, jnp.maximum(lo, 0))
        return jnp.where(n_rel >= 2, lra, 0.0)

    def _integrated(self, energies, count):
        """Two-stage gated mean (`meter.go:245-295`) as masked reductions."""
        have = jnp.arange(self.max_blocks) < count
        l_blocks = _lufs(energies)
        m_abs = have & (l_blocks > ABS_THRESHOLD)
        n_abs = jnp.sum(m_abs)
        mean_abs = jnp.sum(jnp.where(m_abs, energies, 0.0)) \
            / jnp.maximum(n_abs, 1)
        rel_gate = _lufs(mean_abs) + REL_THRESHOLD
        m_rel = m_abs & (l_blocks > rel_gate)
        n_rel = jnp.sum(m_rel)
        mean_rel = jnp.sum(jnp.where(m_rel, energies, 0.0)) \
            / jnp.maximum(n_rel, 1)
        return jnp.where(n_rel > 0, _lufs(mean_rel), -jnp.inf)


def measure(x, sample_rate: float = 48000.0,
            true_peak: bool = True) -> LoudnessReading:
    """One-shot measurement of a (channels, N) or (N,) buffer."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[None, :]
    meter = Meter(sample_rate, x.shape[0],
                  max_blocks=max(x.shape[-1] // meter_step(sample_rate) + 2, 16),
                  true_peak=true_peak)
    state = meter.init_state()
    state, reading = meter.process(state, x)
    if true_peak:
        reading = reading._replace(true_peaks=meter.flush_true_peak(state))
    return reading


def loudness_range(x, sample_rate: float = 48000.0):
    """One-shot LRA (LU, EBU Tech 3342) of a (channels, N) or (N,) buffer."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[None, :]
    meter = Meter(sample_rate, x.shape[0],
                  max_blocks=max(x.shape[-1] // meter_step(sample_rate) + 2, 16),
                  true_peak=False)
    state, _ = meter.process(meter.init_state(), x)
    return meter.loudness_range(state)


def meter_step(sample_rate: float) -> int:
    """Gating-block stride in samples (100 ms at 48 kHz)."""
    block_len = int(round(MOMENTARY_S * sample_rate))
    return max(int(round(block_len * (1 - BLOCK_OVERLAP))), 1)
