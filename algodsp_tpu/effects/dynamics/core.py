"""Shared dynamics engine: detector + log2-domain soft-knee gain computer.

Capability parity with `dsp/effects/dynamics/core.go`: topology
feedforward/feedback (`core.go:19-26`), peak / windowed-RMS detector
(`core.go:361-388`), branching one-pole envelope with coefficients
1-exp(-ln2/(ms*sr)) (`core.go:486-495`), log2-domain soft-knee gain
computer with quadratic knee (`core.go:288-329`), auto-makeup
(`core.go:530-537`), one-pole sidechain low/high-cut prefilters
(`core.go:600-662`), and the legacy feedback-ratio-scale variant.

TPU-first dataflow for the feedforward topology (the default):

  prefilter (first-order IIR, blocked-scan) -> |x| -> RMS box filter
  (an XLA conv) -> envelope scan (the one sequential op; channels ride
  VPU lanes) -> gain computer (pure elementwise log2/exp2 on the VPU)
  -> multiply.

Only the feedback topology — where the detector reads the *previous
output* — is inherently per-sample; it runs as a dedicated lax.scan.
"""

from __future__ import annotations

import dataclasses
import enum
import math

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu.ops import linrec

LOG2_OF_10_DIV_20 = math.log2(10.0) / 20.0
_MIN_FEEDBACK_GAIN = 1e-9


class Topology(enum.Enum):
    FEEDFORWARD = "feedforward"
    FEEDBACK = "feedback"


class DetectorMode(enum.Enum):
    PEAK = "peak"
    RMS = "rms"


@dataclasses.dataclass(frozen=True)
class DynamicsConfig:
    sample_rate: float
    topology: Topology = Topology.FEEDFORWARD
    detector_mode: DetectorMode = DetectorMode.PEAK
    feedback_ratio_scale: bool = False
    threshold_db: float = -20.0
    ratio: float = 4.0
    knee_db: float = 6.0
    attack_ms: float = 10.0
    release_ms: float = 100.0
    rms_window_ms: float = 30.0
    auto_makeup: bool = False
    makeup_gain_db: float = 0.0
    sidechain_low_cut_hz: float = 0.0
    sidechain_high_cut_hz: float = 0.0

    def __post_init__(self):
        if self.sample_rate <= 0 or not math.isfinite(self.sample_rate):
            raise ValueError(f"dynamics: invalid sample rate {self.sample_rate}")
        if self.ratio < 1.0:
            raise ValueError(f"dynamics: ratio must be >= 1: {self.ratio}")
        if self.attack_ms <= 0 or self.release_ms <= 0:
            raise ValueError("dynamics: attack/release must be > 0")
        nyq = self.sample_rate / 2
        for hz, name in [(self.sidechain_low_cut_hz, "low-cut"),
                         (self.sidechain_high_cut_hz, "high-cut")]:
            if hz > 0 and not (1.0 <= hz < nyq):
                raise ValueError(f"dynamics: sidechain {name} out of range: {hz}")


def compression_gain(level, threshold_log2, knee_db, knee_width_log2,
                     inv_knee_width_log2, compression_factor):
    """Log2-domain soft-knee compression gain (`core.go:288-329`).

    Elementwise over level arrays; level <= 0 -> unity.
    """
    level = jnp.asarray(level)
    safe = jnp.where(level > 0, level, 1.0)
    overshoot = jnp.log2(safe) - threshold_log2
    if knee_db <= 0:
        gain_log2 = jnp.where(overshoot > 0, -overshoot * compression_factor, 0.0)
    else:
        half = knee_width_log2 * 0.5
        scratch = overshoot + half
        knee_os = scratch * scratch * 0.5 * inv_knee_width_log2
        eff = jnp.where(overshoot > half, overshoot,
                        jnp.where(overshoot < -half, 0.0, knee_os))
        gain_log2 = -eff * compression_factor
    gain = jnp.exp2(gain_log2)
    return jnp.where(level > 0, gain, 1.0)


def downward_expansion_gain(level, threshold_log2, knee_db, knee_width_log2,
                            inv_knee_width_log2, ratio, range_lin):
    """Downward expansion / gate gain (`expander.go:358-411`)."""
    level = jnp.asarray(level)
    safe = jnp.where(level > 0, level, 1.0)
    undershoot = threshold_log2 - jnp.log2(safe)
    factor = ratio - 1.0
    if knee_db <= 0:
        gain_log2 = jnp.where(undershoot > 0, -undershoot * factor, 0.0)
    else:
        half = knee_width_log2 * 0.5
        scratch = undershoot + half
        knee_us = scratch * scratch * 0.5 * inv_knee_width_log2
        eff = jnp.where(undershoot > half, undershoot,
                        jnp.where(undershoot < -half, 0.0, knee_us))
        gain_log2 = -eff * factor
    gain = jnp.maximum(jnp.exp2(gain_log2), range_lin)
    return jnp.where(level > 0, gain, range_lin)


def dynamics_env_scan(src, env0, attack_coeff, release_coeff, *, unroll: int = 8):
    """The core envelope recurrence (`core.go:339-359`):
    rising: env += (src-env)*attack ; falling: env = src + (env-src)*release.

    The falling branch rewrites to env += (src-env)*(1-release), so on
    TPU 2-D batches this runs through the fused Pallas envelope kernel
    with release' = 1-release — exactly the same recurrence.
    """
    from algodsp_tpu.ops.envscan import envelope_scan
    x = jnp.asarray(src)
    # envelope_scan owns the backend dispatch (fused Pallas kernel on
    # TPU) and the custom VJP, so dynamics processors stay
    # differentiable on either backend.
    return envelope_scan(x, env0, attack_coeff, 1.0 - release_coeff,
                         unroll=unroll)


class DynamicsCore:
    """Functional dynamics engine used by all dynamics processors."""

    def __init__(self, cfg: DynamicsConfig):
        self.cfg = cfg
        sr = cfg.sample_rate
        self.attack_coeff = 1.0 - math.exp(-math.log(2.0) / (cfg.attack_ms * 1e-3 * sr))
        self.release_coeff = math.exp(-math.log(2.0) / (cfg.release_ms * 1e-3 * sr))
        if cfg.feedback_ratio_scale:
            self.fb_attack_coeff = 1.0 - math.exp(
                -math.log(2.0) / (cfg.attack_ms * 1e-3 * sr * cfg.ratio))
            self.fb_release_coeff = math.exp(
                -math.log(2.0) / (cfg.release_ms * 1e-3 * sr * cfg.ratio))
        else:
            self.fb_attack_coeff = self.attack_coeff
            self.fb_release_coeff = self.release_coeff
        self.threshold_log2 = cfg.threshold_db * LOG2_OF_10_DIV_20
        self.knee_width_log2 = cfg.knee_db * LOG2_OF_10_DIV_20
        self.inv_knee_width_log2 = (1.0 / self.knee_width_log2
                                    if cfg.knee_db > 0 else 0.0)
        if cfg.auto_makeup:
            self.makeup_gain_db = -cfg.threshold_db * (1.0 - 1.0 / cfg.ratio)
        else:
            self.makeup_gain_db = cfg.makeup_gain_db
        self.makeup_gain_lin = 10.0 ** (self.makeup_gain_db / 20.0)
        self.rms_window = max(int(round(cfg.rms_window_ms * 1e-3 * sr)), 1)
        # one-pole prefilter coefficients: state += c*(x - state)
        self.lp_coeff = (1.0 - math.exp(-2.0 * math.pi * cfg.sidechain_high_cut_hz / sr)
                         if cfg.sidechain_high_cut_hz > 0 else 0.0)
        self.hp_coeff = (1.0 - math.exp(-2.0 * math.pi * cfg.sidechain_low_cut_hz / sr)
                         if cfg.sidechain_low_cut_hz > 0 else 0.0)

    # -- state ------------------------------------------------------------
    def init_state(self, batch_shape: tuple[int, ...] = (), dtype=jnp.float32):
        st = {"envelope": jnp.zeros(batch_shape, dtype)}
        if self.cfg.detector_mode == DetectorMode.RMS:
            st["rms_hist"] = jnp.zeros(batch_shape + (self.rms_window - 1,), dtype)
        if self.lp_coeff > 0:
            st["lp"] = jnp.zeros(batch_shape, dtype)
        if self.hp_coeff > 0:
            st["hp_lp"] = jnp.zeros(batch_shape, dtype)
        if self.cfg.topology == Topology.FEEDBACK:
            st["prev_gain"] = jnp.ones(batch_shape, dtype)
            st["prev_abs"] = jnp.zeros(batch_shape, dtype)
        return st

    # -- helpers -----------------------------------------------------------
    def _one_pole_lp(self, state_val, x, coeff):
        """Vectorized one-pole smoothing via the first-order blocked scan:
        s_n = (1-c) s_{n-1} + c x_n."""
        a1 = -(1.0 - coeff)
        f = coeff * x
        f = f.at[..., 0].add(-a1 * state_val)  # fold carry into the drive
        y = linrec.ar2_apply_scan(f, jnp.asarray(a1, x.dtype),
                                  jnp.asarray(0.0, x.dtype),
                                  jnp.zeros_like(state_val),
                                  jnp.zeros_like(state_val))
        return y[..., -1], y

    def _prefilter(self, state, x):
        """Sidechain detector prefilter (`core.go:600-662`)."""
        new_state = dict(state)
        y = x
        if self.lp_coeff > 0:
            last, y = self._one_pole_lp(state["lp"], y, self.lp_coeff)
            new_state["lp"] = last
        if self.hp_coeff > 0:
            last, lp_out = self._one_pole_lp(state["hp_lp"], y, self.hp_coeff)
            new_state["hp_lp"] = last
            y = y - lp_out
        return new_state, y

    def _rms(self, state, src):
        """Moving-RMS over the window; the Go ring buffer
        (`core.go:361-388`) becomes a box-FIR over [history, src^2]."""
        new_state = dict(state)
        if self.cfg.detector_mode != DetectorMode.RMS or self.rms_window <= 1:
            return new_state, src
        sq = src * src
        hist = state["rms_hist"].astype(src.dtype)
        ext = jnp.concatenate([hist, sq], axis=-1)
        w = self.rms_window
        csum = jnp.cumsum(ext, axis=-1)
        csum = jnp.concatenate(
            [jnp.zeros(ext.shape[:-1] + (1,), ext.dtype), csum], axis=-1)
        n = src.shape[-1]
        hi = jnp.arange(w - 1, w - 1 + n) + 1
        lo = hi - w
        mean = (jnp.take(csum, hi, axis=-1) - jnp.take(csum, lo, axis=-1)) / w
        new_state["rms_hist"] = ext[..., -(w - 1):]
        return new_state, jnp.sqrt(jnp.maximum(mean, 0.0))

    def gain_for_level(self, level):
        """Elementwise gain computer (`core.go:288-329`)."""
        cf = 1.0 - 1.0 / self.cfg.ratio
        if self.cfg.topology == Topology.FEEDBACK and self.cfg.feedback_ratio_scale:
            cf = self.cfg.ratio - 1.0
        return compression_gain(level, self.threshold_log2, self.cfg.knee_db,
                                self.knee_width_log2, self.inv_knee_width_log2, cf)

    # -- processing --------------------------------------------------------
    def detector(self, state, sidechain):
        """Feedforward detector chain: prefilter -> |.| -> RMS -> envelope.

        Returns (new_state, level trajectory)."""
        state, pre = self._prefilter(state, sidechain)
        src = jnp.abs(pre)
        state, src = self._rms(state, src)
        a = self.attack_coeff
        r = self.release_coeff
        if self.cfg.topology == Topology.FEEDBACK and self.cfg.feedback_ratio_scale:
            a, r = self.fb_attack_coeff, self.fb_release_coeff
        env_f, env = dynamics_env_scan(src, state["envelope"], a, r)
        state = dict(state)
        state["envelope"] = env_f
        return state, env

    def process(self, state, x, sidechain=None):
        """(state, x[, sidechain]) -> (state, y, gain).

        Feedforward: fully vectorized. Feedback: per-sample lax.scan
        (`core.go:274-286` semantics).
        """
        x = jnp.asarray(x)
        sc = x if sidechain is None else jnp.asarray(sidechain)
        if self.cfg.topology == Topology.FEEDFORWARD:
            state, level = self.detector(state, sc)
            gain = self.gain_for_level(level)
            y = x * gain * jnp.asarray(self.makeup_gain_lin, x.dtype)
            return state, y, gain
        return self._process_feedback(state, x, sc)

    def _process_feedback(self, state, x, sc):
        a = jnp.asarray(self.fb_attack_coeff if self.cfg.feedback_ratio_scale
                        else self.attack_coeff, x.dtype)
        r = jnp.asarray(self.fb_release_coeff if self.cfg.feedback_ratio_scale
                        else self.release_coeff, x.dtype)
        makeup = jnp.asarray(self.makeup_gain_lin, x.dtype)

        xs = jnp.moveaxis(x, -1, 0)

        def step(carry, xv):
            env, prev_abs = carry
            src = prev_abs
            rising = env + (src - env) * a
            falling = src + (env - src) * r
            env = jnp.where(src > env, rising, falling)
            gain = self.gain_for_level(env)
            y = xv * gain * makeup
            return (env, jnp.abs(y)), (y, gain)

        (env_f, prev_abs_f), (ys, gains) = jax.lax.scan(
            step, (state["envelope"], state["prev_abs"]), xs)
        state = dict(state)
        state["envelope"] = env_f
        state["prev_abs"] = prev_abs_f
        state["prev_gain"] = jnp.maximum(gains[-1], _MIN_FEEDBACK_GAIN)
        return state, jnp.moveaxis(ys, 0, -1), jnp.moveaxis(gains, 0, -1)
