"""ctypes bindings for the native C++ runtime (`native/`).

The native layer plays the role the reference gives to its hand-written
NEON kernel and wasm host shim (SURVEY.md §2.3, §3.6): float64 golden
per-sample kernels (the oracle the blocked JAX kernels are verified
against) and a lock-free SPSC ring buffer for real-time block streaming
on the host side of the host<->TPU boundary.

Build with `make -C native` (plain g++; no pybind11 required). All
entry points degrade gracefully: `available()` is False when the
library hasn't been built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "native", "libalgodsp_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(os.path.dirname(_LIB_PATH), "algodsp_native.cpp")
    stale = (os.path.exists(_LIB_PATH) and os.path.exists(src)
             and os.path.getmtime(_LIB_PATH) < os.path.getmtime(src))
    if not os.path.exists(_LIB_PATH) or stale:
        # best-effort (re)build — a stale .so would otherwise miss
        # newly added kernels and break the binding step below
        try:
            subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    try:
        dp = ctypes.POINTER(ctypes.c_double)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.biquad_df2t_process.argtypes = [dp, dp, ctypes.c_int, ctypes.c_double,
                                            dp, ctypes.c_long]
        lib.fir_process.argtypes = [dp, ctypes.c_int, dp, dp, dp, ctypes.c_long]
        lib.envelope_process.restype = ctypes.c_double
        lib.envelope_process.argtypes = [dp, dp, ctypes.c_long, ctypes.c_double,
                                         ctypes.c_double, ctypes.c_double]
        lib.moog_process.argtypes = [ctypes.c_int, dp, ctypes.c_int, ctypes.c_int,
                                     dp, dp, dp, ctypes.c_long]
        lib.dynamics_ff_process.argtypes = (
            [dp, dp, dp, dp, ctypes.c_long]
            + [ctypes.c_double] * 2 + [ctypes.c_int]
            + [ctypes.c_double] * 8 + [dp])
        lib.resample_polyphase_process.argtypes = [
            dp, ctypes.c_int, ctypes.c_int, ctypes.c_int, dp, dp, ctypes.c_long,
            dp, ctypes.c_long]
        lib.dynamics_fb_process.argtypes = (
            [dp, dp, dp, ctypes.c_long] + [ctypes.c_double] * 8 + [dp])
        lib.dynamics_expand_process.argtypes = (
            [dp, dp, dp, dp, ctypes.c_long]
            + [ctypes.c_double] * 2 + [ctypes.c_int]
            + [ctypes.c_double] * 8 + [dp])
        ip = ctypes.POINTER(ctypes.c_int)
        lib.hilbert_process.argtypes = [dp, ctypes.c_int, dp, dp, dp, dp,
                                        ctypes.c_long]
        lib.wsola_stretch.restype = ctypes.c_long
        lib.wsola_stretch.argtypes = [dp, ctypes.c_long, ctypes.c_long,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_double, dp]
        lib.granular_process.restype = ctypes.c_int
        lib.granular_process.argtypes = [dp, ctypes.c_long, dp, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int,
                                         ctypes.c_double, dp, ctypes.c_double,
                                         ctypes.c_double, dp]
        lib.vocoder_process.argtypes = ([dp, dp, ctypes.c_int]
                                        + [ctypes.c_double] * 5
                                        + [dp, dp, dp, dp, dp, dp,
                                           ctypes.c_long])
        lib.phaser_process.argtypes = ([ctypes.c_int] + [ctypes.c_double] * 6
                                       + [dp, dp, dp, ctypes.c_long])
        lib.flanger_process.argtypes = ([ctypes.c_int] + [ctypes.c_double] * 6
                                        + [dp, dp, dp, ctypes.c_long])
        lib.chorus_process.restype = ctypes.c_int
        lib.chorus_process.argtypes = ([ctypes.c_int, ctypes.c_int]
                                       + [ctypes.c_double] * 5
                                       + [dp, dp, dp, ctypes.c_long])
        lib.autowah_process.argtypes = ([ctypes.c_double] * 8
                                        + [dp, dp, dp, ctypes.c_long])
        lib.freeverb_process.restype = ctypes.c_long
        lib.freeverb_process.argtypes = (
            [ip, ctypes.c_int, ip, ctypes.c_int] + [ctypes.c_double] * 6
            + [dp, dp, dp, ctypes.c_long, dp, dp, ctypes.c_long])
        lib.fdn_process.restype = ctypes.c_long
        lib.fdn_process.argtypes = [dp, dp, dp, dp, dp, ctypes.c_long, dp, dp,
                                    ctypes.c_long]
        lib.tremolo_process.argtypes = ([ctypes.c_double] * 5
                                        + [dp, dp, dp, ctypes.c_long])
        lib.ringmod_process.argtypes = ([ctypes.c_double] * 3
                                        + [dp, dp, dp, ctypes.c_long])
        lib.bitcrusher_process.argtypes = ([ctypes.c_double, ctypes.c_int,
                                            ctypes.c_double]
                                           + [dp, dp, dp, ctypes.c_long])
        lib.transient_process.argtypes = ([ctypes.c_double] * 4
                                          + [dp, dp, dp, ctypes.c_long])
        lib.lookahead_process.argtypes = ([dp, dp, dp, ctypes.c_long,
                                           ctypes.c_int]
                                          + [ctypes.c_double] * 7 + [dp])
        lib.deesser_process.argtypes = ([dp, dp, ctypes.c_int, dp, ctypes.c_int]
                                        + [ctypes.c_double] * 8
                                        + [ctypes.c_int, ctypes.c_int,
                                           dp, dp, ctypes.c_long, dp])
        lib.multiband_process.argtypes = ([dp, ctypes.c_int, ctypes.c_int]
                                          + [dp] * 8
                                          + [dp, dp, ctypes.c_long, dp, dp])
        lib.dither_fir_process.argtypes = [dp, dp, dp, ctypes.c_long, dp,
                                           ctypes.c_int, ctypes.c_int,
                                           ctypes.c_double, ctypes.c_double, dp]
        lib.dither_iir_process.argtypes = [dp, dp, dp, ctypes.c_long, dp,
                                           ctypes.c_int, ctypes.c_double,
                                           ctypes.c_double, dp]
        lib.widener_process.argtypes = [dp, ctypes.c_int, dp, ctypes.c_int,
                                        ctypes.c_double, dp, dp, dp, dp,
                                        ctypes.c_long, dp]
        lib.crosstalk_cancel_process.argtypes = [ctypes.c_int, ip, dp, dp,
                                                 dp, dp, dp, dp,
                                                 ctypes.c_long, dp]
        lib.crosstalk_sim_process.argtypes = [ctypes.c_int, dp,
                                              ctypes.c_double, ctypes.c_int,
                                              dp, dp, dp, dp,
                                              ctypes.c_long, dp]
        lib.crosstalk_hrtf_process.argtypes = [dp, ctypes.c_int, dp,
                                               ctypes.c_int, dp, ctypes.c_int,
                                               dp, ctypes.c_int, ctypes.c_int,
                                               dp, dp, dp, dp, ctypes.c_long]
        lib.transformer_process.argtypes = ([ctypes.c_int, ctypes.c_int,
                                             dp, dp, ctypes.c_int, dp]
                                            + [ctypes.c_double] * 3
                                            + [dp, dp, ctypes.c_long, dp])
        lib.freqshift_process.restype = ctypes.c_int
        lib.freqshift_process.argtypes = [dp, ctypes.c_int, ctypes.c_double,
                                          ctypes.c_double, dp, dp, dp, dp,
                                          ctypes.c_long]
        lib.gate_hold_process.argtypes = (
            [dp, dp, dp, dp, ctypes.c_long]
            + [ctypes.c_double] * 2 + [ctypes.c_int]
            + [ctypes.c_double] * 8 + [ctypes.c_long, dp])
        lib.distortion_process.argtypes = ([ctypes.c_int]
                                           + [ctypes.c_double] * 6
                                           + [ctypes.c_int, dp, ctypes.c_double,
                                              ctypes.c_int, ctypes.c_int,
                                              dp, dp, dp, ctypes.c_long])
        lib.harmonic_bass_process.argtypes = ([dp, dp, ctypes.c_int, dp]
                                              + [ctypes.c_double] * 9
                                              + [dp, dp, ctypes.c_long, dp])
        lib.delay_effect_process.argtypes = ([ctypes.c_int]
                                             + [ctypes.c_double] * 4
                                             + [dp, dp, dp, ctypes.c_long])
        lib.spectral_freeze_process.restype = ctypes.c_int
        lib.spectral_freeze_process.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, dp, dp, ctypes.c_long, dp]
        lib.pitch_binshift_process.restype = ctypes.c_int
        lib.pitch_binshift_process.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            dp, dp, ctypes.c_long, dp]
        lib.pitch_stretch_process.restype = ctypes.c_int
        lib.pitch_stretch_process.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            dp, dp, ctypes.c_long, dp]
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_long]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        for name in ("ring_readable", "ring_writable"):
            getattr(lib, name).restype = ctypes.c_long
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.ring_write.restype = ctypes.c_long
        lib.ring_write.argtypes = [ctypes.c_void_p, fp, ctypes.c_long]
        lib.ring_read.restype = ctypes.c_long
        lib.ring_read.argtypes = [ctypes.c_void_p, fp, ctypes.c_long]
    except AttributeError:
        # a stale library missing newly added kernels: degrade to
        # unavailable instead of raising out of available()
        return None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def biquad_df2t(sos, state, x, gain: float = 1.0):
    """Golden DF2T cascade. Returns (new_state, y); float64 throughout."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available (run `make -C native`)")
    sos = np.ascontiguousarray(sos, dtype=np.float64).reshape(-1, 5)
    st = np.ascontiguousarray(state, dtype=np.float64).reshape(-1, 2).copy()
    if st.shape[0] != sos.shape[0]:
        raise ValueError("state rows must match sections")
    buf = np.ascontiguousarray(x, dtype=np.float64).copy()
    lib.biquad_df2t_process(_dptr(sos), _dptr(st), sos.shape[0],
                            ctypes.c_double(gain), _dptr(buf), buf.size)
    return st, buf


def fir(taps, hist, x):
    """Golden causal FIR with history. Returns (new_hist, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    taps = np.ascontiguousarray(taps, dtype=np.float64)
    hist = np.ascontiguousarray(hist, dtype=np.float64).copy()
    if hist.size != taps.size - 1:
        raise ValueError("history length must be taps-1")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    lib.fir_process(_dptr(taps), taps.size, _dptr(hist), _dptr(xin),
                    _dptr(out), xin.size)
    return hist, out


def envelope(x, attack: float, release: float, env0: float = 0.0):
    """Golden branching envelope follower. Returns (env_final, trajectory)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    env = lib.envelope_process(_dptr(xin), _dptr(out), xin.size,
                               ctypes.c_double(attack), ctypes.c_double(release),
                               ctypes.c_double(env0))
    return float(env), out


_MOOG_VARIANT_CODES = {
    "classic": 0, "classic_lightweight": 1, "improved_classic": 2,
    "improved_classic_lightweight": 3, "huovilainen": 4, "zdf": 5,
}


def moog(filt, state8, x):
    """Golden per-sample Moog ladder, all 6 variants + oversampling
    (oracle for `filters.moog.MoogFilter`; semantics parity with
    `dsp/filter/moog/moog.go:39-62`). `filt` is a MoogFilter; `state8`
    is the flat [stage0..3, tanh0..2, prev_out] state. Returns
    (new_state8, y); float64 throughout."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    code = _MOOG_VARIANT_CODES[filt.variant.value]
    if code == 5:
        p0 = filt.zdf_gk
    else:
        p0 = filt.coefficient * (2 * filt.thermal_voltage
                                 if code in (2, 3) else 1.0)
    params = np.ascontiguousarray(
        [p0, filt.drive_scale, filt.feedback, filt.input_gain,
         filt.output_scale], dtype=np.float64)
    st = np.ascontiguousarray(state8, dtype=np.float64).copy()
    if st.size != 8:
        raise ValueError("moog state must have 8 entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    lib.moog_process(code, _dptr(params), filt.oversampling,
                     filt.newton_iters, _dptr(st), _dptr(xin), _dptr(out),
                     xin.size)
    return st, out


def dynamics_feedforward(core, x, state=None, sidechain=None):
    """Golden per-sample feedforward dynamics path: sidechain one-pole
    prefilters -> peak/windowed-RMS detector -> branching envelope ->
    log2 soft-knee gain -> makeup (oracle for
    `effects.dynamics.DynamicsCore.process`; semantics parity with
    `dsp/effects/dynamics/core.go:274-495`). `state` is the flat
    [lp, hp_lp, env, rms_ring...] vector (None = zeros). Returns
    (new_state, y, gains)."""
    from algodsp_tpu.effects.dynamics.core import DetectorMode, Topology
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    if core.cfg.topology is not Topology.FEEDFORWARD:
        raise ValueError("golden kernel covers the feedforward topology")
    w = (core.rms_window
         if core.cfg.detector_mode == DetectorMode.RMS else 1)
    n_state = 3 + max(w - 1, 0)
    if state is None:
        state = np.zeros(n_state)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != n_state:
        raise ValueError(f"dynamics state must have {n_state} entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    sc = (xin if sidechain is None
          else np.ascontiguousarray(sidechain, dtype=np.float64))
    out = np.empty_like(xin)
    gains = np.empty_like(xin)
    cf = 1.0 - 1.0 / core.cfg.ratio
    lib.dynamics_ff_process(
        _dptr(xin), _dptr(sc), _dptr(out), _dptr(gains), xin.size,
        ctypes.c_double(core.lp_coeff), ctypes.c_double(core.hp_coeff),
        int(w), ctypes.c_double(core.attack_coeff),
        ctypes.c_double(core.release_coeff),
        ctypes.c_double(core.threshold_log2),
        ctypes.c_double(core.cfg.knee_db),
        ctypes.c_double(core.knee_width_log2),
        ctypes.c_double(core.inv_knee_width_log2), ctypes.c_double(cf),
        ctypes.c_double(core.makeup_gain_lin), _dptr(st))
    return st, out, gains


def dynamics_feedback(core, x, state=None):
    """Golden per-sample FEEDBACK-topology dynamics (oracle for
    `DynamicsCore._process_feedback`; semantics parity with
    `core.go:274-286`): the detector reads the previous output's
    magnitude. `state` = [env, prev_abs] (None = zeros). Returns
    (new_state, y, gains)."""
    from algodsp_tpu.effects.dynamics.core import Topology
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    if core.cfg.topology is not Topology.FEEDBACK:
        raise ValueError("golden kernel covers the feedback topology")
    if state is None:
        state = np.zeros(2)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    gains = np.empty_like(xin)
    fb_scale = core.cfg.feedback_ratio_scale
    a = core.fb_attack_coeff if fb_scale else core.attack_coeff
    r = core.fb_release_coeff if fb_scale else core.release_coeff
    cf = (core.cfg.ratio - 1.0) if fb_scale else (1.0 - 1.0 / core.cfg.ratio)
    lib.dynamics_fb_process(
        _dptr(xin), _dptr(out), _dptr(gains), xin.size,
        ctypes.c_double(a), ctypes.c_double(r),
        ctypes.c_double(core.threshold_log2),
        ctypes.c_double(core.cfg.knee_db),
        ctypes.c_double(core.knee_width_log2),
        ctypes.c_double(core.inv_knee_width_log2), ctypes.c_double(cf),
        ctypes.c_double(core.makeup_gain_lin), _dptr(st))
    return st, out, gains


def dynamics_expansion(proc, x, state=None, sidechain=None):
    """Golden per-sample downward expander / gate (oracle for
    `effects.dynamics.{Expander,Gate}`; semantics parity with
    `expander.go:358-411`): feedforward detector chain + expansion
    gain computer floored at range_lin. `proc` is an Expander or Gate;
    state layout matches `dynamics_feedforward`. Returns
    (new_state, y, gains)."""
    from algodsp_tpu.effects.dynamics.core import DetectorMode
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    core = proc.core
    w = (core.rms_window
         if core.cfg.detector_mode == DetectorMode.RMS else 1)
    n_state = 3 + max(w - 1, 0)
    if state is None:
        state = np.zeros(n_state)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != n_state:
        raise ValueError(f"dynamics state must have {n_state} entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    sc = (xin if sidechain is None
          else np.ascontiguousarray(sidechain, dtype=np.float64))
    out = np.empty_like(xin)
    gains = np.empty_like(xin)
    lib.dynamics_expand_process(
        _dptr(xin), _dptr(sc), _dptr(out), _dptr(gains), xin.size,
        ctypes.c_double(core.lp_coeff), ctypes.c_double(core.hp_coeff),
        int(w), ctypes.c_double(core.attack_coeff),
        ctypes.c_double(core.release_coeff),
        ctypes.c_double(core.threshold_log2),
        ctypes.c_double(core.cfg.knee_db),
        ctypes.c_double(core.knee_width_log2),
        ctypes.c_double(core.inv_knee_width_log2),
        ctypes.c_double(core.cfg.ratio),
        ctypes.c_double(proc.range_lin), _dptr(st))
    return st, out, gains


def resample_polyphase(rs, x, hist=None, n_out=None):
    """Golden per-output-sample polyphase resampler: phase select
    (m*down) mod up, anchor floor(m*down/up) (oracle for
    `resample.Resampler`; semantics parity with
    `dsp/resample/resample.go:249-292`). `hist` = last phase_len-1
    inputs, oldest first (None = stream start). Returns (new_hist, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    bank = np.ascontiguousarray(rs._bank, dtype=np.float64)
    up, phase_len = bank.shape
    if hist is None:
        hist = np.zeros(phase_len - 1)
    h = np.ascontiguousarray(hist, dtype=np.float64).copy()
    if h.size != phase_len - 1:
        raise ValueError("history length must be phase_len-1")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    if n_out is None:
        n_out = rs.output_len(xin.size)
    out = np.empty(n_out, dtype=np.float64)
    lib.resample_polyphase_process(_dptr(bank), int(up), int(rs.down),
                                   int(phase_len), _dptr(h), _dptr(xin),
                                   xin.size, _dptr(out), int(n_out))
    return h, out


def hilbert(ht, x, state=None):
    """Golden full-rate per-sample Hilbert transformer (oracle for the
    polyphase `filters.hilbert.HilbertTransformer`; semantics parity
    with `hilbert64.go:298-300`). Each coefficient is a first-order
    allpass in z^-2 evaluated at the full rate — an independent check
    of the substream/deinterleave routing. `state` is the flat
    [x_delay, 4*nA, 4*nB] register vector (None = zeros). Returns
    (new_state, a, b)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    coeffs = np.ascontiguousarray(ht.coeffs, dtype=np.float64)
    nA = (coeffs.size + 1) // 2
    nB = coeffs.size // 2
    n_state = 1 + 4 * (nA + nB)
    if state is None:
        state = np.zeros(n_state)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != n_state:
        raise ValueError(f"hilbert state must have {n_state} entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    a = np.empty_like(xin)
    b = np.empty_like(xin)
    lib.hilbert_process(_dptr(coeffs), coeffs.size, _dptr(st), _dptr(xin),
                        _dptr(a), _dptr(b), xin.size)
    return st, a, b


def wsola(ws, x):
    """Golden per-segment WSOLA pitch shift (oracle for
    `effects.pitch.WSOLAPitchShifter`; semantics parity with
    `dsp/effects/pitch/pitch_shifter.go` music preset, fixed-grid
    deviation included): C++ stretch per channel, then the golden
    polyphase resampler. Returns y with the JAX engine's
    output-length contract (== input length)."""
    from algodsp_tpu.effects.pitch.wsola import _ratio_to_fraction
    from algodsp_tpu.resample import Resampler
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    x2 = np.ascontiguousarray(x, dtype=np.float64)
    batch = x2.shape[:-1]
    n = x2.shape[-1]
    r = ws.pitch_ratio
    if r == 1.0:
        return x2.copy()
    seq, ov, seek = ws.sequence, ws.overlap, ws.seek
    if n < seq + seek + 1:
        raise ValueError(
            f"wsola golden needs at least seq+seek+1 = {seq + seek + 1} "
            f"samples, got {n}")
    flat = seq - ov
    # stretch rate 1/r lengthens to ~n*r before the 1/r resample
    # (`pitch_shifter.go:225-240`; see WSOLAPitchShifter.process).
    # Segment count comes from the TARGET length and late reads are
    # zero-extended (pitchSampleZero) — mirrored by zero-padding the
    # input until the C++ kernel's internal segment count matches.
    rate = 1.0 / r
    target_len = max(int(round(n / rate)), 1)
    S = max(-(-(target_len - seq) // flat) + 1, 1)
    out_len = (S - 1) * flat + seq
    n_pad = max(n, int(S * flat * rate) + seq + seek + 1)
    while int((n_pad - seq - seek) / (flat * rate)) < S:
        n_pad += 1
    while int((n_pad - seq - seek) / (flat * rate)) > S and n_pad > n:
        n_pad -= 1
    flat_in = x2.reshape((-1, n))
    stretched = np.empty((flat_in.shape[0], out_len))
    for c in range(flat_in.shape[0]):
        xi = np.zeros(n_pad)
        xi[:n] = flat_in[c]
        got = lib.wsola_stretch(_dptr(xi), n_pad, n, seq, ov, seek,
                                ctypes.c_double(rate), _dptr(stretched[c]))
        if got != out_len:
            raise RuntimeError(f"wsola_stretch length {got} != {out_len}")
    rs = Resampler(*_ratio_to_fraction(1.0 / r),
                   quality=ws.resample_quality)
    outs = []
    for c in range(stretched.shape[0]):
        _, y = resample_polyphase(rs, stretched[c])
        if y.size >= n:
            outs.append(y[:n])
        else:
            outs.append(np.concatenate([y, np.zeros(n - y.size)]))
    return np.stack(outs).reshape(batch + (n,))


def granular(gr, x):
    """Golden per-grain granular resynthesis (oracle for
    `effects.spectral.Granular`; semantics parity with
    `granular.go:218-280`): same grain schedule and spray stream,
    explicit per-grain loop with linear-interp reads, OLA +
    envelope normalization. Returns y."""
    from algodsp_tpu.effects.spectral import _NORM_FLOOR
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    x2 = np.ascontiguousarray(x, dtype=np.float64)
    batch, n = x2.shape[:-1], x2.shape[-1]
    g, hop = gr.grain, gr.hop
    n_grains = max((n - g) // hop + 1, 1)
    rng = np.random.default_rng(gr.seed)
    spray = (rng.integers(-gr.spray, gr.spray + 1, n_grains)
             if gr.spray > 0 else np.zeros(n_grains, dtype=np.int64))
    starts = np.ascontiguousarray(np.clip(
        np.arange(n_grains) * hop + spray, 0, max(n - g, 0)), np.float64)
    env = np.ascontiguousarray(gr.env, np.float64)
    flat = x2.reshape((-1, n))
    out = np.empty_like(flat)
    for c in range(flat.shape[0]):
        xi = np.ascontiguousarray(flat[c])
        rc = lib.granular_process(
            _dptr(xi), n, _dptr(starts), n_grains, g, hop,
            ctypes.c_double(gr.pitch), _dptr(env), ctypes.c_double(gr.mix),
            ctypes.c_double(_NORM_FLOOR), _dptr(out[c]))
        if rc != 0:
            raise MemoryError("granular_process: allocation failed")
    return out.reshape(batch + (n,))


def phaser(ph, x, state=None):
    """Golden per-sample phaser (oracle for
    `effects.modulation.Phaser`'s (2S+1)-dim affine-scan formulation;
    semantics parity with `dsp/effects/phaser.go:268-285`). One
    channel. `state` = flat [x1 (S,), y1 (S,), fb, phase] (None =
    zeros). Returns (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    S = ph.stages
    if state is None:
        state = np.zeros(2 * S + 2)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != 2 * S + 2:
        raise ValueError(f"phaser state must have {2 * S + 2} entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    lib.phaser_process(S, ctypes.c_double(ph.sample_rate),
                       ctypes.c_double(ph.rate_hz),
                       ctypes.c_double(ph.min_freq),
                       ctypes.c_double(ph.max_freq),
                       ctypes.c_double(ph.feedback),
                       ctypes.c_double(ph.mix), _dptr(st), _dptr(xin),
                       _dptr(out), xin.size)
    return st, out


def flanger(fl, x, state=None):
    """Golden per-sample flanger (oracle for
    `effects.modulation.Flanger`'s blocked contiguous-slice
    formulation; semantics parity with `dsp/effects/flanger.go:
    259-282`). One channel. `state` = flat [buf (L,), phase, write]
    (None = zeros). Returns (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    L = fl.buf_len
    if state is None:
        state = np.zeros(L + 2)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != L + 2:
        raise ValueError(f"flanger state must have {L + 2} entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    lib.flanger_process(L, ctypes.c_double(fl.sample_rate),
                        ctypes.c_double(fl.rate_hz),
                        ctypes.c_double(fl.depth),
                        ctypes.c_double(fl.base_delay),
                        ctypes.c_double(fl.feedback),
                        ctypes.c_double(fl.mix), _dptr(st), _dptr(xin),
                        _dptr(out), xin.size)
    return st, out


def chorus(ch, x, state=None):
    """Golden per-sample multi-voice chorus (oracle for
    `effects.modulation.Chorus`'s walking-slice formulation; semantics
    parity with `chorus.go:136-165`): Hermite-interpolated modulated
    reads on the history-extended timeline, voice-averaged wet. One
    channel. `state` = flat [hist (H,), phase] (None = zeros). Returns
    (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    H = int(np.asarray(ch.delayline.init_state()).shape[-1])
    if state is None:
        state = np.zeros(H + 1)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != H + 1:
        raise ValueError(f"chorus state must have {H + 1} entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    rc = lib.chorus_process(ch.stages, H, ctypes.c_double(ch.sample_rate),
                            ctypes.c_double(ch.speed_hz),
                            ctypes.c_double(ch.depth),
                            ctypes.c_double(ch.base_delay),
                            ctypes.c_double(ch.mix), _dptr(st), _dptr(xin),
                            _dptr(out), xin.size)
    if rc != 0:
        raise MemoryError("chorus_process: allocation failed")
    return st, out


def autowah(aw, x, state=None):
    """Golden per-sample auto-wah (oracle for
    `effects.modulation.AutoWah`'s time-varying affine-scan
    formulation; semantics parity with
    `auto_wah.go:315-334,455-482`). One channel. `state` =
    [env, z1, z2] (None = zeros). Returns (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    if state is None:
        state = np.zeros(3)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != 3:
        raise ValueError("autowah state must have 3 entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    lib.autowah_process(ctypes.c_double(aw.sample_rate),
                        ctypes.c_double(aw.min_freq),
                        ctypes.c_double(aw.max_freq),
                        ctypes.c_double(aw.q),
                        ctypes.c_double(aw.sensitivity),
                        ctypes.c_double(aw.attack_coeff),
                        ctypes.c_double(aw.release_coeff),
                        ctypes.c_double(aw.mix), _dptr(st), _dptr(xin),
                        _dptr(out), xin.size)
    return st, out


def vocoder(voc, modulator, carrier, state=None):
    """Golden per-sample channel vocoder (oracle for
    `effects.vocoder.Vocoder`; semantics parity with
    `dsp/effects/vocoder.go`): per-band analysis bandpass -> branching
    envelope -> envelope-scaled synthesis bandpass, with level mixing.
    One channel. `state` is (a_state (B,2), s_state (B,2), env (B,))
    f64 (None = zeros). Returns (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    nb = voc.num_bands
    a_sos = np.ascontiguousarray(voc.analysis.sos[:, 0, :], np.float64)
    s_sos = np.ascontiguousarray(voc.synthesis.sos[:, 0, :], np.float64)
    if state is None:
        state = (np.zeros((nb, 2)), np.zeros((nb, 2)), np.zeros(nb))
    a_st, s_st, env = (np.ascontiguousarray(a, np.float64).copy()
                       for a in state)
    m = np.ascontiguousarray(modulator, dtype=np.float64)
    c = np.ascontiguousarray(carrier, dtype=np.float64)
    if m.ndim != 1 or m.shape != c.shape:
        raise ValueError("vocoder golden takes matching 1-D signals")
    out = np.empty_like(m)
    lib.vocoder_process(_dptr(a_sos), _dptr(s_sos), nb,
                        ctypes.c_double(voc.attack_coeff),
                        ctypes.c_double(voc.release_coeff),
                        ctypes.c_double(voc.input_level),
                        ctypes.c_double(voc.synth_level),
                        ctypes.c_double(voc.vocoded_level),
                        _dptr(env), _dptr(a_st), _dptr(s_st), _dptr(m),
                        _dptr(c), _dptr(out), m.size)
    return (a_st, s_st, env), out


def freeverb(fv, x, state=None, step: int = 0):
    """Golden per-sample Freeverb (oracle for
    `effects.reverb.Freeverb`; semantics parity with
    `dsp/effects/reverb/reverb.go:118-166`). `state` is
    (combs_flat, fstore, allp_flat) f64 arrays (None = zeros). Returns
    (new_state, new_step, y)."""
    from algodsp_tpu.effects.reverb.freeverb import (ALLPASS_TUNINGS,
                                                     COMB_TUNINGS)
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    csz = np.asarray(COMB_TUNINGS, np.int32)
    asz = np.asarray(ALLPASS_TUNINGS, np.int32)
    if state is None:
        state = (np.zeros(int(csz.sum())), np.zeros(csz.size),
                 np.zeros(int(asz.sum())))
    combs, fstore, allp = (np.ascontiguousarray(a, np.float64).copy()
                           for a in state)
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    new_step = lib.freeverb_process(
        iptr(csz), csz.size, iptr(asz), asz.size,
        ctypes.c_double(fv.input_gain), ctypes.c_double(fv.comb_feedback),
        ctypes.c_double(fv.allpass_feedback), ctypes.c_double(fv.damp),
        ctypes.c_double(fv.wet), ctypes.c_double(fv.dry),
        _dptr(combs), _dptr(fstore), _dptr(allp), int(step),
        _dptr(xin), _dptr(out), xin.size)
    return (combs, fstore, allp), int(new_step), out


def fdn(rv, x, state=None, step: int = 0):
    """Golden per-sample FDN reverb (oracle for
    `effects.reverb.FDNReverb`; semantics parity with
    `dsp/effects/reverb/fdn_reverb.go:196-259`). `state` is
    (lines (8, L), pre (P,), filt (8,), lfo scalar) f64 (None = zeros).
    Returns (new_state, new_step, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    L, P = rv.line_len, rv.pre_len
    if state is None:
        state = (np.zeros((8, L)), np.zeros(P), np.zeros(8), 0.0)
    lines = np.ascontiguousarray(state[0], np.float64).copy().reshape(8, L)
    pre = np.ascontiguousarray(state[1], np.float64).copy()
    filt = np.ascontiguousarray(state[2], np.float64).copy()
    lfo = np.asarray([float(state[3])], np.float64)
    dphase = 2.0 * np.pi * rv.mod_rate / rv.sample_rate
    params = np.ascontiguousarray(np.concatenate([
        [L, P, rv.pre_delay, rv.mod_depth, dphase, rv.gain, rv.damp,
         rv.wet, rv.dry], rv.base_delays, rv.feedback_gains]), np.float64)
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    new_step = lib.fdn_process(_dptr(params), _dptr(lines), _dptr(pre),
                               _dptr(filt), _dptr(lfo), int(step),
                               _dptr(xin), _dptr(out), xin.size)
    return (lines, pre, filt, float(lfo[0])), int(new_step), out


def tremolo(tr, x, state=None):
    """Golden per-sample tremolo (oracle for
    `effects.modulation.Tremolo`; semantics parity with
    `tremolo.go:201-294`): LFO amplitude modulation with one-pole
    smoothing. One channel. `state` = [phase, mod] (None = zeros).
    Returns (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    if state is None:
        state = np.zeros(2)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != 2:
        raise ValueError("tremolo state must have 2 entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    lib.tremolo_process(ctypes.c_double(tr.sample_rate),
                        ctypes.c_double(tr.rate_hz),
                        ctypes.c_double(tr.depth), ctypes.c_double(tr.mix),
                        ctypes.c_double(tr.smoothing_coeff), _dptr(st),
                        _dptr(xin), _dptr(out), xin.size)
    return st, out


def ringmod(rm, x, state=None):
    """Golden per-sample ring modulator (oracle for
    `effects.modulation.RingModulator`; semantics parity with
    `ring_modulator.go:143-153`). `state` = [phase]. Returns
    (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    if state is None:
        state = np.zeros(1)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != 1:
        raise ValueError("ringmod state must have 1 entry")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    lib.ringmod_process(ctypes.c_double(rm.sample_rate),
                        ctypes.c_double(rm.carrier_hz),
                        ctypes.c_double(rm.mix), _dptr(st), _dptr(xin),
                        _dptr(out), xin.size)
    return st, out


def bitcrusher(bc, x, state=None):
    """Golden per-sample bit crusher (oracle for
    `effects.waveshape.BitCrusher`; semantics parity with
    `bit_crusher.go:191-230`): quantize + sample-hold downsample.
    `state` = [hold, counter] (None = zeros). Returns (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    if state is None:
        state = np.zeros(2)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != 2:
        raise ValueError("bitcrusher state must have 2 entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    lib.bitcrusher_process(ctypes.c_double(bc.quant_levels),
                           int(bc.downsample), ctypes.c_double(bc.mix),
                           _dptr(st), _dptr(xin), _dptr(out), xin.size)
    return st, out


def transient(ts, x, state=None):
    """Golden per-sample transient shaper (oracle for
    `effects.dynamics.TransientShaper`; semantics parity with
    `transient_shaper.go:139-188`). `state` = [env]. Returns
    (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    if state is None:
        state = np.zeros(1)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != 1:
        raise ValueError("transient state must have 1 entry")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    lib.transient_process(ctypes.c_double(ts.attack_coeff),
                          ctypes.c_double(ts.release_coeff),
                          ctypes.c_double(ts.attack_amount),
                          ctypes.c_double(ts.sustain_amount), _dptr(st),
                          _dptr(xin), _dptr(out), xin.size)
    return st, out


def lookahead(ll, x, sidechain=None, state=None):
    """Golden per-sample lookahead limiter (oracle for
    `effects.dynamics.LookaheadLimiter`; semantics parity with
    `lookahead_limiter.go:23-36,185-210`): early limiter-core detector,
    program path delayed by the lookahead. `state` = flat
    [env, delay buffer (delay,)] (None = zeros). Returns
    (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    core = ll.comp.core
    d = ll.delay
    if state is None:
        state = np.zeros(1 + d)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != 1 + d:
        raise ValueError(f"lookahead state must have {1 + d} entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    sc = (xin if sidechain is None
          else np.ascontiguousarray(sidechain, dtype=np.float64))
    out = np.empty_like(xin)
    cf = 1.0 - 1.0 / core.cfg.ratio
    lib.lookahead_process(
        _dptr(xin), _dptr(sc), _dptr(out), xin.size, int(d),
        ctypes.c_double(core.attack_coeff),
        ctypes.c_double(core.release_coeff),
        ctypes.c_double(core.threshold_log2),
        ctypes.c_double(core.cfg.knee_db),
        ctypes.c_double(core.knee_width_log2),
        ctypes.c_double(core.inv_knee_width_log2), ctypes.c_double(cf),
        _dptr(st))
    return st, out


def deesser(de, x, state=None):
    """Golden per-sample de-esser (oracle for
    `effects.dynamics.DeEsser`; semantics parity with `deesser.go`):
    band-limited detector -> envelope -> range-floored compressor gain
    applied to the crossover high band (split) or wideband. `state` =
    flat [det(2), lo(2*n_lo), hi(2*n_hi), env] (None = zeros). Returns
    (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    core = de.core
    det_sos = np.ascontiguousarray(de.detector_filter.sos, np.float64)
    if de.crossover is not None:
        lo = np.ascontiguousarray(de.crossover.lp.sos, np.float64)
        hi = np.ascontiguousarray(de.crossover.hp.sos, np.float64)
    else:
        lo = np.zeros((0, 5))
        hi = np.zeros((0, 5))
    n_lo, n_hi = lo.shape[0], hi.shape[0]
    n_state = 2 + 2 * n_lo + 2 * n_hi + 1
    if state is None:
        state = np.zeros(n_state)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != n_state:
        raise ValueError(f"deesser state must have {n_state} entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    cf = 1.0 - 1.0 / core.cfg.ratio
    lib.deesser_process(
        _dptr(det_sos), _dptr(lo), n_lo, _dptr(hi), n_hi,
        ctypes.c_double(core.attack_coeff),
        ctypes.c_double(core.release_coeff),
        ctypes.c_double(core.threshold_log2),
        ctypes.c_double(core.cfg.knee_db),
        ctypes.c_double(core.knee_width_log2),
        ctypes.c_double(core.inv_knee_width_log2), ctypes.c_double(cf),
        ctypes.c_double(de.range_lin),
        int(de.crossover is not None), int(de.listen),
        _dptr(xin), _dptr(out), xin.size, _dptr(st))
    return st, out


def multiband(mb, x, state=None):
    """Golden per-sample multiband compressor (oracle for
    `effects.dynamics.MultibandCompressor`; semantics parity with
    `multiband.go:27-160`): LR crossover tree + per-band feedforward
    cores summed. `state` = flat [per-stage lp/hp regs, band envs]
    (None = zeros). Returns (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    stages = mb.multiband.stages
    n_stages = len(stages)
    n_sec = stages[0].lp.sos.shape[0]
    xo = np.ascontiguousarray(np.concatenate(
        [np.concatenate([st.lp.sos, st.hp.sos]) for st in stages]),
        np.float64)
    cores = [b.core for b in mb.bands]
    arr = lambda vals: np.ascontiguousarray(vals, np.float64)
    attack = arr([c.attack_coeff for c in cores])
    release = arr([c.release_coeff for c in cores])
    thr = arr([c.threshold_log2 for c in cores])
    knee = arr([c.cfg.knee_db for c in cores])
    kw = arr([c.knee_width_log2 for c in cores])
    ikw = arr([c.inv_knee_width_log2 for c in cores])
    cf = arr([1.0 - 1.0 / c.cfg.ratio for c in cores])
    mk = arr([c.makeup_gain_lin for c in cores])
    n_bands = n_stages + 1
    n_state = 4 * n_sec * n_stages + n_bands
    if state is None:
        state = np.zeros(n_state)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != n_state:
        raise ValueError(f"multiband state must have {n_state} entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    bands = np.empty(n_bands)
    lib.multiband_process(_dptr(xo), n_stages, n_sec, _dptr(attack),
                          _dptr(release), _dptr(thr), _dptr(knee),
                          _dptr(kw), _dptr(ikw), _dptr(cf), _dptr(mk),
                          _dptr(xin), _dptr(out), xin.size, _dptr(st),
                          _dptr(bands))
    return st, out


def quantize(qz, x, noise, state=None):
    """Golden per-sample dither quantizer (oracle for
    `dither.Quantizer._process_codes`; semantics parity with
    `quantizer.go:87-120` + `shaper_fir.go:5-59` / `shaper_iir.go:20-57`):
    FIR or IIR-shelf error-feedback shaping with floor quantization and
    limiting. The dither noise (drawn by the JAX PRNG in the engine) is
    passed in explicitly so the shaping loop is compared on identical
    noise. `state` = err history (order,) for FIR, [d0, d1, last_err]
    for IIR. Returns (new_state, integer codes as f64)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    nz = np.ascontiguousarray(noise, dtype=np.float64)
    if nz.shape != xin.shape:
        raise ValueError("noise must match the signal shape")
    scaled = qz.bit_mul * xin
    out = np.empty_like(xin)
    if qz.iir_shelf_sos is not None:
        if state is None:
            state = np.zeros(3)
        st = np.ascontiguousarray(state, np.float64).copy()
        if st.size != 3:
            raise ValueError("IIR dither state must have 3 entries")
        sos = np.ascontiguousarray(qz.iir_shelf_sos, np.float64)
        lib.dither_iir_process(_dptr(scaled), _dptr(nz), _dptr(out),
                               xin.size, _dptr(sos), int(qz.limit),
                               ctypes.c_double(qz.limit_lo),
                               ctypes.c_double(qz.limit_hi), _dptr(st))
        return st, out
    coeffs = np.ascontiguousarray(qz.shaper_coeffs, np.float64)
    order = coeffs.size
    if state is None:
        state = np.zeros(max(order, 1))
    st = np.ascontiguousarray(state, np.float64).copy()
    if st.size != max(order, 1):
        raise ValueError(f"FIR dither state must have {max(order, 1)} entries")
    lib.dither_fir_process(_dptr(scaled), _dptr(nz), _dptr(out), xin.size,
                           _dptr(coeffs), order, int(qz.limit),
                           ctypes.c_double(qz.limit_lo),
                           ctypes.c_double(qz.limit_hi), _dptr(st))
    return st, out


def widener(w, x, state=None):
    """Golden per-sample stereo widener (oracle for
    `effects.spatial.StereoWidener`; semantics parity with
    `stereo_widener.go:142-178`). x: (2, N). `state` = flat
    [lpL, lpR, hpL, hpR] biquad regs (None = zeros). Returns
    (new_state, y (2, N))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    if w.lp is not None:
        lp = np.ascontiguousarray(w.lp.sos, np.float64)
        hp = np.ascontiguousarray(w.hp.sos, np.float64)
    else:
        lp = np.zeros((0, 5))
        hp = np.zeros((0, 5))
    n_lp, n_hp = lp.shape[0], hp.shape[0]
    n_state = 4 * n_lp + 4 * n_hp
    if state is None:
        state = np.zeros(max(n_state, 1))
    st = np.ascontiguousarray(state, np.float64).copy()
    if st.size != max(n_state, 1):
        raise ValueError(f"widener state must have {max(n_state, 1)} entries")
    x2 = np.ascontiguousarray(x, dtype=np.float64)
    if x2.ndim != 2 or x2.shape[0] != 2:
        raise ValueError("widener golden takes (2, N) stereo")
    out = np.empty_like(x2)
    lib.widener_process(_dptr(lp), n_lp, _dptr(hp), n_hp,
                        ctypes.c_double(w.width),
                        _dptr(np.ascontiguousarray(x2[0])),
                        _dptr(np.ascontiguousarray(x2[1])),
                        _dptr(out[0]), _dptr(out[1]), x2.shape[-1],
                        _dptr(st))
    return st, out


def crosstalk_cancel(cc, x, state=None):
    """Golden per-sample crosstalk canceller (oracle for
    `effects.spatial.CrosstalkCanceller`; semantics parity with
    `crosstalk_canceller.go:204-218`): staged delayed + shelved
    crossfeed subtraction. x: (2, N). `state` = flat per-stage
    [dbufL(d), dbufR(d), shelfL(2), shelfR(2)] (None = zeros). Returns
    (new_state, y (2, N))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    delays = np.ascontiguousarray(cc.stage_delays, np.int32)
    gains = np.ascontiguousarray(cc.stage_gains, np.float64)
    shelf = np.ascontiguousarray(
        np.concatenate([s.sos for s in cc.shelves]), np.float64)
    n_state = int(sum(2 * d + 4 for d in cc.stage_delays))
    if state is None:
        state = np.zeros(n_state)
    st = np.ascontiguousarray(state, np.float64).copy()
    if st.size != n_state:
        raise ValueError(f"canceller state must have {n_state} entries")
    x2 = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(x2)
    iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    lib.crosstalk_cancel_process(
        cc.stages, iptr(delays), _dptr(gains), _dptr(shelf),
        _dptr(np.ascontiguousarray(x2[0])),
        _dptr(np.ascontiguousarray(x2[1])),
        _dptr(out[0]), _dptr(out[1]), x2.shape[-1], _dptr(st))
    return st, out


def crosstalk_sim(cs, x, state=None):
    """Golden per-sample crosstalk simulator, parametric mode (oracle
    for `effects.spatial.CrosstalkSimulator`; semantics parity with
    `crosstalk_simulator.go:171-185`). x: (2, N). `state` = flat
    [dbufL(d), dbufR(d), shelfL(2), shelfR(2)] (None = zeros). Returns
    (new_state, y (2, N))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    if cs.hrtf is not None or cs.hrtf_set is not None:
        raise ValueError("parametric golden; use crosstalk_hrtf for IR modes")
    d = cs.delay
    shelf = np.ascontiguousarray(cs.shelf.sos, np.float64)
    n_state = 2 * d + 4
    if state is None:
        state = np.zeros(n_state)
    st = np.ascontiguousarray(state, np.float64).copy()
    if st.size != n_state:
        raise ValueError(f"crosstalk sim state must have {n_state} entries")
    x2 = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(x2)
    lib.crosstalk_sim_process(
        int(d), _dptr(shelf), ctypes.c_double(cs.mix), int(cs.invert),
        _dptr(np.ascontiguousarray(x2[0])),
        _dptr(np.ascontiguousarray(x2[1])),
        _dptr(out[0]), _dptr(out[1]), x2.shape[-1], _dptr(st))
    return st, out


def crosstalk_hrtf(cs, x):
    """Golden crosstalk simulator, HRTF-set mode (oracle for
    `CrosstalkSimulator._process_hrtf_set`; semantics parity with
    `crosstalk_simulator_hrtf.go:121-137`): per-sample 4-path FIR
    routing, whole-signal/zero-state like the engine. x: (2, N).
    Returns y (2, N)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    if cs.hrtf_set is None:
        raise ValueError("crosstalk_hrtf needs an HRTF IR set")
    irs = {k: np.ascontiguousarray(v, np.float64)
           for k, v in cs.hrtf_set.items()}
    x2 = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(x2)
    lib.crosstalk_hrtf_process(
        _dptr(irs["left_direct"]), irs["left_direct"].size,
        _dptr(irs["left_cross"]), irs["left_cross"].size,
        _dptr(irs["right_direct"]), irs["right_direct"].size,
        _dptr(irs["right_cross"]), irs["right_cross"].size,
        int(cs.hrtf_mode == "complete"),
        _dptr(np.ascontiguousarray(x2[0])),
        _dptr(np.ascontiguousarray(x2[1])),
        _dptr(out[0]), _dptr(out[1]), x2.shape[-1])
    return out


def transformer(tf, x, state=None):
    """Golden per-sample transformer simulation (oracle for
    `effects.waveshape.TransformerSimulation`; semantics parity with
    `transformer_simulation.go:333-430`): HP pre-emphasis, 4x
    oversampled exact tanh (high) or odd-poly saturation (lightweight),
    damping, mix. `state` = flat [hp(2), up_aa(2*n_aa), damp_os(2),
    down_aa(2*n_aa)] (high) or [hp(2), damp(2)] (lightweight).
    Returns (new_state, y)."""
    from algodsp_tpu.effects.waveshape import TransformerQuality
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    high = tf.quality == TransformerQuality.HIGH
    hp = np.ascontiguousarray(tf.pre_hp.sos, np.float64)
    if high:
        aa = np.ascontiguousarray(tf.up_aa.sos, np.float64)
        damp = np.ascontiguousarray(tf.damp_os.sos, np.float64)
        n_aa = aa.shape[0]
        n_state = 2 + 4 * n_aa + 2
    else:
        aa = np.zeros((0, 5))
        damp = np.ascontiguousarray(tf.damp.sos, np.float64)
        n_aa = 0
        n_state = 4
    if state is None:
        state = np.zeros(n_state)
    st = np.ascontiguousarray(state, np.float64).copy()
    if st.size != n_state:
        raise ValueError(f"transformer state must have {n_state} entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    lib.transformer_process(int(high), int(tf.oversampling), _dptr(hp),
                            _dptr(aa), n_aa, _dptr(damp),
                            ctypes.c_double(tf.drive),
                            ctypes.c_double(tf.mix),
                            ctypes.c_double(tf.output_level),
                            _dptr(xin), _dptr(out), xin.size, _dptr(st))
    return st, out


def freqshift(fs, x, phase: float = 0.0):
    """Golden per-sample frequency shifter (oracle for
    `effects.modulation.FrequencyShifter`; semantics parity with
    `frequency_shifter.go:78-210`): full-rate Hilbert analytic pair
    (zero-state, matching the engine's one-shot) x quadrature carrier.
    One channel. Returns (new_phase, up, down)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    coeffs = np.ascontiguousarray(fs.hilbert.coeffs, np.float64)
    xin = np.ascontiguousarray(x, dtype=np.float64)
    up = np.empty_like(xin)
    down = np.empty_like(xin)
    ph = np.asarray([float(phase)], np.float64)
    rc = lib.freqshift_process(_dptr(coeffs), coeffs.size,
                               ctypes.c_double(fs.sample_rate),
                               ctypes.c_double(fs.shift_hz), _dptr(ph),
                               _dptr(xin), _dptr(up), _dptr(down),
                               xin.size)
    if rc != 0:
        raise MemoryError("freqshift_process: allocation failed")
    return float(ph[0]), up, down


def gate_hold(gate, x, state=None, sidechain=None):
    """Golden per-sample Gate with hold timer (oracle for
    `effects.dynamics.Gate.process`; semantics parity with
    `gate.go:83-376`): feedforward expansion gain + reset/countdown
    hold. `state` layout = `dynamics_expansion`'s flat vector with the
    hold counter appended. Returns (new_state, y, gains)."""
    from algodsp_tpu.effects.dynamics.core import DetectorMode
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    core = gate.core
    w = (core.rms_window
         if core.cfg.detector_mode == DetectorMode.RMS else 1)
    n_state = 3 + max(w - 1, 0) + 1
    if state is None:
        state = np.zeros(n_state)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != n_state:
        raise ValueError(f"gate state must have {n_state} entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    sc = (xin if sidechain is None
          else np.ascontiguousarray(sidechain, dtype=np.float64))
    out = np.empty_like(xin)
    gains = np.empty_like(xin)
    lib.gate_hold_process(
        _dptr(xin), _dptr(sc), _dptr(out), _dptr(gains), xin.size,
        ctypes.c_double(core.lp_coeff), ctypes.c_double(core.hp_coeff),
        int(w), ctypes.c_double(core.attack_coeff),
        ctypes.c_double(core.release_coeff),
        ctypes.c_double(core.threshold_log2),
        ctypes.c_double(core.cfg.knee_db),
        ctypes.c_double(core.knee_width_log2),
        ctypes.c_double(core.inv_knee_width_log2),
        ctypes.c_double(core.cfg.ratio),
        ctypes.c_double(gate.range_lin), int(gate.hold_samples),
        _dptr(st))
    return st, out, gains


_DIST_MODE_CODES = {
    "soft_clip": 0, "hard_clip": 1, "tanh": 2, "waveshaper1": 3,
    "waveshaper2": 4, "waveshaper3": 5, "waveshaper4": 6,
    "waveshaper5": 7, "waveshaper6": 8, "waveshaper7": 9,
    "waveshaper8": 10, "saturate": 11, "saturate2": 12, "soft_sat": 13,
    "chebyshev": 14,
}


def distortion(ds, x, state=None):
    """Golden per-sample distortion (oracle for
    `effects.waveshape.Distortion`; semantics parity with
    `distortion.go:537-744`): all 15 waveshaper modes incl. Chebyshev
    harmonic shaping with its DC-bypass one-pole. `state` =
    [dc_in, dc_out]. Returns (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    if state is None:
        state = np.zeros(2)
    st = np.ascontiguousarray(state, dtype=np.float64).copy()
    if st.size != 2:
        raise ValueError("distortion state must have 2 entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    w = np.ascontiguousarray(ds.chebyshev_weights, np.float64)
    lib.distortion_process(
        _DIST_MODE_CODES[ds.mode.value], ctypes.c_double(ds.drive),
        ctypes.c_double(ds.shape), ctypes.c_double(ds.bias),
        ctypes.c_double(ds.clip_level), ctypes.c_double(ds.output_level),
        ctypes.c_double(ds.mix), int(ds.chebyshev_order), _dptr(w),
        ctypes.c_double(ds.chebyshev_gain), int(ds.chebyshev_invert),
        int(ds.chebyshev_dc_bypass), _dptr(st), _dptr(xin), _dptr(out),
        xin.size)
    return st, out


def harmonic_bass(hb, x, state=None):
    """Golden per-sample harmonic bass exciter (oracle for
    `effects.waveshape.HarmonicBass`; semantics parity with
    `harmonic_bass.go:262-300`): crossover split, quadratic shaper,
    harmonics HP + limiter-core gain, recombination. `state` = flat
    [lp regs, hp regs, hhp(2), env] (None = zeros). Returns
    (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    lp = np.ascontiguousarray(hb.lp.sos, np.float64)
    hp = np.ascontiguousarray(hb.hp.sos, np.float64)
    hhp = np.ascontiguousarray(hb.harm_hp.sos, np.float64)
    n_sec = lp.shape[0]
    n_state = 4 * n_sec + 3
    if state is None:
        state = np.zeros(n_state)
    st = np.ascontiguousarray(state, np.float64).copy()
    if st.size != n_state:
        raise ValueError(f"harmonic bass state must have {n_state} entries")
    core = hb.limiter.core
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    lib.harmonic_bass_process(
        _dptr(lp), _dptr(hp), n_sec, _dptr(hhp),
        ctypes.c_double(hb.input_level), ctypes.c_double(hb.decay),
        ctypes.c_double(hb.high_frequency_gain),
        ctypes.c_double(hb.original_bass_gain),
        ctypes.c_double(hb.harmonic_bass_gain),
        ctypes.c_double(core.attack_coeff),
        ctypes.c_double(core.release_coeff),
        ctypes.c_double(core.threshold_log2),
        ctypes.c_double(1.0 - 1.0 / core.cfg.ratio),
        _dptr(xin), _dptr(out), xin.size, _dptr(st))
    return st, out


def delay_effect(dl, x, state=None, target=None):
    """Golden per-sample feedback delay (oracle for
    `effects.delay_effect.Delay`; semantics parity with
    `delay.go:140-206`): smoothed-lag fractional read, feedback write,
    wet/dry mix. `state` = flat [buf (buf_len,), write, current]
    (None = fresh). Returns (new_state, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    L = dl.buf_len
    if state is None:
        state = np.concatenate([np.zeros(L),
                                [0.0, float(dl.delay_samples)]])
    st = np.ascontiguousarray(state, np.float64).copy()
    if st.size != L + 2:
        raise ValueError(f"delay state must have {L + 2} entries")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(xin)
    tgt = float(dl.delay_samples if target is None else target)
    lib.delay_effect_process(int(L), ctypes.c_double(dl.feedback),
                             ctypes.c_double(dl.mix), ctypes.c_double(tgt),
                             ctypes.c_double(dl.smooth_coeff), _dptr(st),
                             _dptr(xin), _dptr(out), xin.size)
    return st, out


def spectral_freeze(fz, x):
    """Golden per-frame STFT freeze (oracle for
    `effects.spectral.SpectralFreeze`; semantics parity with
    `spectral_freeze.go:193-320`): an independent radix-2 FFT drives
    the freeze/advance resynthesis and WOLA. One channel. Returns y."""
    from algodsp_tpu.effects.spectral import FreezePhaseMode, _NORM_FLOOR
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    w = np.ascontiguousarray(fz.window, np.float64)
    out = np.empty_like(xin)
    rc = lib.spectral_freeze_process(
        int(fz.frame_size), int(fz.hop_size), int(fz.frozen),
        int(fz.phase_mode == FreezePhaseMode.ADVANCE),
        ctypes.c_double(fz.mix), ctypes.c_double(_NORM_FLOOR),
        _dptr(w), _dptr(xin), xin.size, _dptr(out))
    if rc != 0:
        raise MemoryError("spectral_freeze_process: allocation failed")
    return out


def spectral_pitch(ps, x):
    """Golden phase-vocoder pitch shift (oracle for
    `effects.pitch.SpectralPitchShifter`; semantics parity with
    `pitch_shift_spectral.go:20-36`): bin-shift path for small ratios,
    identity-phase-locked time-stretch + golden polyphase resample for
    large ones — all through the independent C++ FFT. One channel.
    Returns y (input length)."""
    from algodsp_tpu.effects.pitch.spectral import _NORM_FLOOR
    from algodsp_tpu.resample import Resampler
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    xin = np.ascontiguousarray(x, dtype=np.float64)
    n = xin.size
    if ps.pitch_ratio == 1.0:
        return xin.copy()
    w = np.ascontiguousarray(ps.window, np.float64)
    fs, ha = ps.frame_size, ps.analysis_hop
    if ps._use_bin_shift():
        out = np.empty_like(xin)
        rc = lib.pitch_binshift_process(
            int(fs), int(ha), ctypes.c_double(ps.pitch_ratio),
            ctypes.c_double(_NORM_FLOOR), _dptr(w), _dptr(xin), n,
            _dptr(out))
        if rc != 0:
            raise MemoryError("pitch_binshift_process: allocation failed")
        return out
    hs = ps.synthesis_hop
    nf = max(1 + (n - fs) // ha, 1)
    stretched = np.empty((nf - 1) * hs + fs, np.float64)
    rc = lib.pitch_stretch_process(
        int(fs), int(ha), int(hs), ctypes.c_double(_NORM_FLOOR),
        _dptr(w), _dptr(xin), n, _dptr(stretched))
    if rc != 0:
        raise MemoryError("pitch_stretch_process: allocation failed")
    rs = Resampler(ha, hs, quality=ps.resample_quality)
    _, y = resample_polyphase(rs, stretched)
    if y.size >= n:
        return y[:n]
    return np.concatenate([y, np.zeros(n - y.size)])


class RingBuffer:
    """Lock-free SPSC ring for real-time block hand-off (float32)."""

    def __init__(self, capacity: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not available")
        self._lib = lib
        self._handle = lib.ring_create(capacity)
        if not self._handle:
            raise MemoryError("ring_create failed")
        self.capacity = capacity

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.ring_destroy(self._handle)
            self._handle = None

    @property
    def readable(self) -> int:
        return self._lib.ring_readable(self._handle)

    @property
    def writable(self) -> int:
        return self._lib.ring_writable(self._handle)

    def write(self, samples) -> int:
        a = np.ascontiguousarray(samples, dtype=np.float32)
        return self._lib.ring_write(
            self._handle, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            a.size)

    def read(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.float32)
        return out[:self.read_into(out)]

    def read_into(self, out: np.ndarray) -> int:
        """Drain up to out.size samples directly into a caller-provided
        float32 staging buffer (e.g. from `core.Pool`); returns the
        count read. Zero-copy on the Python side."""
        if out.dtype != np.float32 or not out.flags["C_CONTIGUOUS"]:
            raise ValueError("read_into needs a C-contiguous float32 array")
        return self._lib.ring_read(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.size)
