"""Native C++ layer tests: golden kernels vs the JAX blocked engine
(the cross-implementation equivalence layer, SURVEY.md §4.4), and the
SPSC ring buffer."""

import threading

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu import native
from algodsp_tpu.filters import BiquadChain, FIRFilter, design
from algodsp_tpu.ops.envscan import envelope_scan
from tests.conftest import snr_db

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_native_biquad_matches_jax_blocked():
    sos = design.butterworth_lp(2000.0, 6, 48000.0)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(1024)
    st, y_native = native.biquad_df2t(sos, np.zeros((sos.shape[0], 2)), x)
    y_jax = np.asarray(BiquadChain(sos).process(jnp.asarray(x)))
    assert snr_db(y_native, y_jax) > 200


def test_native_biquad_streaming_state():
    sos = design.lowpass(1000.0, 2.0, 48000.0)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(600)
    st = np.zeros((1, 2))
    st, y1 = native.biquad_df2t(sos, st, x[:300])
    st, y2 = native.biquad_df2t(sos, st, x[300:])
    _, y_once = native.biquad_df2t(sos, np.zeros((1, 2)), x)
    np.testing.assert_allclose(np.concatenate([y1, y2]), y_once, atol=1e-12)


def test_native_fir_matches_numpy():
    rng = np.random.default_rng(3)
    taps = rng.standard_normal(17)
    x = rng.standard_normal(256)
    _, y = native.fir(taps, np.zeros(16), x)
    np.testing.assert_allclose(y, np.convolve(x, taps)[:256], atol=1e-12)


def test_native_envelope_matches_jax():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(512)
    env_f, traj = native.envelope(x, 0.3, 0.05)
    jf, jtraj = envelope_scan(jnp.abs(jnp.asarray(x)), jnp.asarray(0.0),
                              0.3, 0.05)
    np.testing.assert_allclose(traj, np.asarray(jtraj), atol=1e-12)
    assert abs(env_f - float(jf)) < 1e-12


def test_ring_buffer_basic():
    rb = native.RingBuffer(16)
    assert rb.writable == 16
    assert rb.write(np.arange(10, dtype=np.float32)) == 10
    assert rb.readable == 10
    out = rb.read(4)
    np.testing.assert_array_equal(out, [0, 1, 2, 3])
    # wrap-around
    assert rb.write(np.arange(10, dtype=np.float32) + 100) == 10
    out = rb.read(16)
    np.testing.assert_array_equal(
        out, [4, 5, 6, 7, 8, 9, 100, 101, 102, 103, 104, 105, 106, 107, 108, 109])
    # overfull write is truncated
    assert rb.write(np.zeros(100, dtype=np.float32)) == 16


def test_ring_buffer_threaded():
    rb = native.RingBuffer(1024)
    total = 100_000
    received = []

    def producer():
        sent = 0
        data = np.arange(total, dtype=np.float32)
        while sent < total:
            sent += rb.write(data[sent:sent + 256])

    def consumer():
        got = 0
        while got < total:
            chunk = rb.read(256)
            if chunk.size:
                received.append(chunk)
                got += chunk.size

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start()
    tp.join(timeout=30); tc.join(timeout=30)
    out = np.concatenate(received)
    np.testing.assert_array_equal(out, np.arange(total, dtype=np.float32))


def test_ring_read_into_staging():
    """read_into drains directly into caller staging (core.Pool path in
    the demo server) and rejects non-float32 buffers."""
    rb = native.RingBuffer(32)
    rb.write(np.arange(10, dtype=np.float32))
    out = np.empty(6, np.float32)
    assert rb.read_into(out) == 6
    np.testing.assert_array_equal(out, np.arange(6, dtype=np.float32))
    big = np.empty(100, np.float32)
    assert rb.read_into(big) == 4
    np.testing.assert_array_equal(big[:4], np.arange(6, 10, dtype=np.float32))
    with pytest.raises(ValueError):
        rb.read_into(np.empty(4, np.float64))


# ---------------------------------------------------------------------------
# Round-4 golden families: Moog (6 variants), dynamics ballistics,
# polyphase resampler — the independent per-sample oracles the blocked
# JAX engines are asserted against (>=120 dB, SURVEY.md §4.4).
# ---------------------------------------------------------------------------

from algodsp_tpu.filters.moog import MoogFilter, MoogVariant


def _moog_state8(st):
    return np.concatenate([np.asarray(st["stage"], np.float64),
                           np.asarray(st["tanh_last"], np.float64),
                           np.atleast_1d(np.asarray(st["prev_out"],
                                                    np.float64))])


@pytest.mark.parametrize("variant", list(MoogVariant),
                         ids=[v.value for v in MoogVariant])
def test_native_moog_matches_jax_all_variants(variant):
    filt = MoogFilter(48000.0, variant=variant, cutoff_hz=1800.0,
                      resonance=2.4, drive=2.0)
    rng = np.random.default_rng(20)
    x = rng.standard_normal(512) * 0.5
    st_j = filt.init_state(dtype=jnp.float64)
    _, y_jax = filt.process(st_j, jnp.asarray(x))
    _, y_gold = native.moog(filt, np.zeros(8), x)
    assert snr_db(y_gold, np.asarray(y_jax)) > 120


def test_native_moog_oversampled_and_streaming():
    """os=4 Huovilainen: zero-stuff/decimate ticks match, and two
    half-block golden calls equal one (state carry)."""
    filt = MoogFilter(48000.0, variant=MoogVariant.HUOVILAINEN,
                      cutoff_hz=3000.0, resonance=3.0, oversampling=4)
    rng = np.random.default_rng(21)
    x = rng.standard_normal(256) * 0.4
    st_j = filt.init_state(dtype=jnp.float64)
    _, y_jax = filt.process(st_j, jnp.asarray(x))
    st, y1 = native.moog(filt, np.zeros(8), x[:128])
    st, y2 = native.moog(filt, st, x[128:])
    y_gold = np.concatenate([y1, y2])
    assert snr_db(y_gold, np.asarray(y_jax)) > 120


def test_native_moog_zdf_newton_iters():
    filt = MoogFilter(48000.0, variant=MoogVariant.ZDF, cutoff_hz=900.0,
                      resonance=3.6, drive=4.0, newton_iters=2)
    rng = np.random.default_rng(22)
    x = rng.standard_normal(300) * 0.3
    st_j = filt.init_state(dtype=jnp.float64)
    _, y_jax = filt.process(st_j, jnp.asarray(x))
    _, y_gold = native.moog(filt, np.zeros(8), x)
    assert snr_db(y_gold, np.asarray(y_jax)) > 120


from algodsp_tpu.effects.dynamics.core import (DetectorMode, DynamicsConfig,
                                               DynamicsCore, Topology)


@pytest.mark.parametrize("detector,prefilter", [
    ("peak", False), ("rms", False), ("rms", True)],
    ids=["peak", "rms", "rms+prefilters"])
def test_native_dynamics_ballistics_matches_jax(detector, prefilter):
    kw = dict(sample_rate=48000.0, threshold_db=-16.0, ratio=4.0,
              knee_db=6.0, attack_ms=2.0, release_ms=60.0,
              makeup_gain_db=1.5)
    if detector == "rms":
        kw.update(detector_mode=DetectorMode.RMS, rms_window_ms=5.0)
    if prefilter:
        kw.update(sidechain_low_cut_hz=100.0, sidechain_high_cut_hz=8000.0)
    core = DynamicsCore(DynamicsConfig(**kw))
    rng = np.random.default_rng(23)
    x = rng.standard_normal(2048) * 0.6
    st_j = core.init_state((), jnp.float64)
    _, y_jax, g_jax = core.process(st_j, jnp.asarray(x))
    _, y_gold, g_gold = native.dynamics_feedforward(core, x)
    assert snr_db(y_gold, np.asarray(y_jax)) > 120
    assert snr_db(g_gold, np.asarray(g_jax)) > 120


def test_native_dynamics_streaming_state_carry():
    core = DynamicsCore(DynamicsConfig(
        sample_rate=48000.0, detector_mode=DetectorMode.RMS,
        rms_window_ms=3.0, sidechain_low_cut_hz=120.0, threshold_db=-20.0,
        ratio=6.0, attack_ms=1.0, release_ms=40.0))
    rng = np.random.default_rng(24)
    x = rng.standard_normal(1600) * 0.5
    _, y_once, _ = native.dynamics_feedforward(core, x)
    st, y1, _ = native.dynamics_feedforward(core, x[:700])
    st, y2, _ = native.dynamics_feedforward(core, x[700:], state=st)
    np.testing.assert_allclose(np.concatenate([y1, y2]), y_once, atol=1e-12)


def test_native_dynamics_external_sidechain():
    core = DynamicsCore(DynamicsConfig(sample_rate=48000.0,
                                       threshold_db=-24.0, ratio=8.0))
    rng = np.random.default_rng(25)
    x = rng.standard_normal(1024)
    sc = rng.standard_normal(1024) * 0.3
    st_j = core.init_state((), jnp.float64)
    _, y_jax, _ = core.process(st_j, jnp.asarray(x), jnp.asarray(sc))
    _, y_gold, _ = native.dynamics_feedforward(core, x, sidechain=sc)
    assert snr_db(y_gold, np.asarray(y_jax)) > 120


from algodsp_tpu.resample import Quality, Resampler


@pytest.mark.parametrize("up,down", [(2, 1), (3, 2), (147, 160), (1, 3)],
                         ids=["2:1", "3:2", "147:160", "1:3"])
def test_native_resampler_matches_jax(up, down):
    """Per-output-sample polyphase branch-select loop vs the strided-conv
    JAX engine (the two formulations derive the same sample map)."""
    rs = Resampler(up, down, quality=Quality.BALANCED)
    rng = np.random.default_rng(26)
    x = rng.standard_normal(1000)
    y_jax = np.asarray(rs.process(jnp.asarray(x, jnp.float64)))
    _, y_gold = native.resample_polyphase(rs, x)
    assert y_gold.size == y_jax.size
    assert snr_db(y_gold, y_jax) > 120


def test_native_resampler_streaming_matches_jax_stream():
    rs = Resampler(4, 3, quality=Quality.FAST)
    rng = np.random.default_rng(27)
    x = rng.standard_normal(1200)
    st_j = rs.init_state(dtype=jnp.float64)
    st_j, yj1 = rs.process_stream(st_j, jnp.asarray(x[:600], jnp.float64))
    st_j, yj2 = rs.process_stream(st_j, jnp.asarray(x[600:], jnp.float64))
    y_jax = np.concatenate([np.asarray(yj1), np.asarray(yj2)])
    h, yg1 = native.resample_polyphase(rs, x[:600], n_out=600 * 4 // 3)
    h, yg2 = native.resample_polyphase(rs, x[600:], hist=h,
                                       n_out=600 * 4 // 3)
    y_gold = np.concatenate([yg1, yg2])
    assert snr_db(y_gold, y_jax) > 120


from algodsp_tpu.effects.reverb import Freeverb, FDNReverb


def test_native_freeverb_matches_jax_blocked():
    """Per-sample comb/allpass golden vs the blocked Toeplitz engine
    (`effects/reverb/freeverb.py`), zero state, 1.5 blocks + tail."""
    fv = Freeverb(wet=0.3, dry=0.7, room_size=0.8, damp=0.4)
    rng = np.random.default_rng(30)
    x = rng.standard_normal(1000) * 0.5
    st = fv.init_state(dtype=jnp.float64)
    _, y_jax = fv.process(st, jnp.asarray(x))
    _, _, y_gold = native.freeverb(fv, x)
    assert snr_db(y_gold, np.asarray(y_jax)) > 120


def test_native_freeverb_streaming_state_carry():
    fv = Freeverb()
    rng = np.random.default_rng(31)
    x = rng.standard_normal(2000)
    _, _, y_once = native.freeverb(fv, x)
    st, n, y1 = native.freeverb(fv, x[:900])
    st, n, y2 = native.freeverb(fv, x[900:], state=st, step=n)
    np.testing.assert_allclose(np.concatenate([y1, y2]), y_once, atol=1e-12)


def test_native_fdn_matches_jax_blocked():
    """Per-sample FDN golden (modulated fractional reads, Hadamard
    feedback, pre-delay) vs the blocked engine
    (`effects/reverb/fdn.py`)."""
    rv = FDNReverb(48000.0, wet=0.4, dry=0.6, rt60_seconds=1.2,
                   damp=0.25, mod_depth_seconds=0.001, mod_rate_hz=0.3)
    rng = np.random.default_rng(32)
    x = rng.standard_normal(3000) * 0.5
    st = rv.init_state(dtype=jnp.float64)
    _, y_jax = rv.process(st, jnp.asarray(x))
    _, _, y_gold = native.fdn(rv, x)
    assert snr_db(y_gold, np.asarray(y_jax)) > 120


def test_native_fdn_streaming_state_carry():
    rv = FDNReverb(48000.0)
    rng = np.random.default_rng(33)
    x = rng.standard_normal(4000)
    _, _, y_once = native.fdn(rv, x)
    st, n, y1 = native.fdn(rv, x[:1700])
    st, n, y2 = native.fdn(rv, x[1700:], state=st, step=n)
    np.testing.assert_allclose(np.concatenate([y1, y2]), y_once, atol=1e-12)


from algodsp_tpu.filters.hilbert import HilbertTransformer


@pytest.mark.parametrize("ncoef", [7, 8], ids=["odd", "even"])
def test_native_hilbert_matches_polyphase(ncoef):
    """Full-rate z^-2 allpass cascade vs the polyphase/deinterleaved
    JAX engine — exercises the substream routing and the A/B output
    tap selection for both coefficient parities."""
    ht = HilbertTransformer(ncoef, 0.05)
    rng = np.random.default_rng(40)
    x = rng.standard_normal(2048)
    a_jax, b_jax = ht.process(jnp.asarray(x, jnp.float64))
    _, a_gold, b_gold = native.hilbert(ht, x)
    assert snr_db(a_gold, np.asarray(a_jax)) > 120
    assert snr_db(b_gold, np.asarray(b_jax)) > 120


def test_native_hilbert_analytic_pair():
    """The golden a/b pair forms an analytic signal: for a passband
    tone, b lags a by ~90 degrees and the envelope is ~constant."""
    ht = HilbertTransformer(12, 0.02)
    sr = 48000.0
    t = np.arange(1 << 14) / sr
    x = np.sin(2 * np.pi * 1000.0 * t)
    _, a, b = native.hilbert(ht, x)
    env = np.hypot(a, b)[2048:]
    assert abs(env.mean() - 1.0) < 0.01
    assert env.std() < 0.01


from algodsp_tpu.effects.pitch import WSOLAPitchShifter


@pytest.mark.parametrize("semitones", [3.0, -4.0], ids=["up3", "down4"])
def test_native_wsola_matches_jax(semitones):
    """Per-segment C++ WSOLA (alignment search with the f32 energy
    prefix mirrored, sequential tail crossfade, golden resampler) vs
    the batched-correlation JAX engine."""
    ws = WSOLAPitchShifter(48000.0, pitch_ratio=2.0 ** (semitones / 12.0))
    rng = np.random.default_rng(50)
    # band-limited-ish material: smoothed noise (correlation peaks are
    # well separated, so both implementations choose identical offsets)
    x = np.convolve(rng.standard_normal(1 << 15), np.ones(8) / 8.0,
                    mode="same").reshape(1, -1)
    x = np.concatenate([x, np.roll(x, 100, axis=-1)], axis=0)
    y_jax = np.asarray(ws.process(jnp.asarray(x, jnp.float64)))
    y_gold = native.wsola(ws, x)
    assert y_gold.shape == y_jax.shape
    assert snr_db(y_gold, y_jax) > 120


def test_native_granular_matches_jax():
    """Per-grain loop vs the vectorized gather/scatter engine, with
    pitch != 1 (fractional reads past the grain) and spray jitter."""
    from algodsp_tpu.effects.spectral import Granular
    gr = Granular(48000.0, grain_seconds=0.03, overlap=0.6, pitch=1.5,
                  spray_seconds=0.005, mix=0.8, seed=7)
    rng = np.random.default_rng(60)
    x = rng.standard_normal((2, 1 << 14))
    y_jax = np.asarray(gr.process(jnp.asarray(x, jnp.float64)))
    y_gold = native.granular(gr, x)
    assert snr_db(y_gold, y_jax) > 120


def test_native_granular_identity_regime():
    """pitch=1, no spray, full mix: the normalized OLA of enveloped
    grains reconstructs the interior of the signal."""
    from algodsp_tpu.effects.spectral import Granular
    gr = Granular(48000.0, grain_seconds=0.02, overlap=0.75, pitch=1.0,
                  mix=1.0)
    t = np.arange(1 << 14) / 48000.0
    x = np.sin(2 * np.pi * 440.0 * t)
    y = native.granular(gr, x)
    mid = slice(2048, (1 << 14) - 2048)
    assert snr_db(x[mid], y[mid]) > 40


def test_native_vocoder_matches_jax():
    """Per-sample per-band loop (DF2T bandpasses + branching envelope)
    vs the banded-engine JAX vocoder, both band layouts."""
    from algodsp_tpu.effects.vocoder import BandLayout, Vocoder
    rng = np.random.default_rng(70)
    n = 8192
    mod = rng.standard_normal(n) * 0.5
    car = rng.standard_normal(n) * 0.5
    for layout in (BandLayout.THIRD_OCTAVE, BandLayout.BARK):
        voc = Vocoder(48000.0, layout=layout, input_level=0.1,
                      synth_level=0.05, vocoded_level=1.0)
        st = voc.init_state((), jnp.float64)
        _, y_jax = voc.process(st, jnp.asarray(mod), jnp.asarray(car))
        _, y_gold = native.vocoder(voc, mod, car)
        assert snr_db(y_gold, np.asarray(y_jax)) > 120


def test_native_vocoder_streaming_state_carry():
    from algodsp_tpu.effects.vocoder import Vocoder
    voc = Vocoder(48000.0)
    rng = np.random.default_rng(71)
    mod = rng.standard_normal(4096)
    car = rng.standard_normal(4096)
    _, y_once = native.vocoder(voc, mod, car)
    st, y1 = native.vocoder(voc, mod[:1500], car[:1500])
    st, y2 = native.vocoder(voc, mod[1500:], car[1500:], state=st)
    np.testing.assert_allclose(np.concatenate([y1, y2]), y_once, atol=1e-12)


from algodsp_tpu.effects.modulation import Flanger, Phaser


@pytest.mark.parametrize("stages", [2, 4, 8])
def test_native_phaser_matches_jax(stages):
    """Per-sample allpass-cascade loop vs the (2S+1)-dim log-depth
    affine-scan engine."""
    ph = Phaser(48000.0, stages=stages, rate_hz=1.2, feedback=0.6,
                mix=0.7)
    rng = np.random.default_rng(80)
    x = rng.standard_normal(4096) * 0.5
    st = ph.init_state((), jnp.float64)
    _, y_jax = ph.process(st, jnp.asarray(x))
    _, y_gold = native.phaser(ph, x)
    assert snr_db(y_gold, np.asarray(y_jax)) > 120


def test_native_phaser_streaming_state_carry():
    ph = Phaser(48000.0)
    rng = np.random.default_rng(81)
    x = rng.standard_normal(3000)
    _, y_once = native.phaser(ph, x)
    st, y1 = native.phaser(ph, x[:1300])
    st, y2 = native.phaser(ph, x[1300:], state=st)
    np.testing.assert_allclose(np.concatenate([y1, y2]), y_once, atol=1e-12)


def test_native_flanger_matches_jax():
    """Per-sample modulated-delay ring loop vs the blocked
    contiguous-slice engine, including LFO phase continuity."""
    fl = Flanger(48000.0, rate_hz=0.8, depth_seconds=0.0015,
                 base_delay_seconds=0.003, feedback=0.4, mix=0.6)
    rng = np.random.default_rng(82)
    x = rng.standard_normal(4096) * 0.5
    st = fl.init_state((), jnp.float64)
    _, y_jax = fl.process(st, jnp.asarray(x))
    _, y_gold = native.flanger(fl, x)
    assert snr_db(y_gold, np.asarray(y_jax)) > 120


@pytest.mark.parametrize("fb_scale", [False, True],
                         ids=["plain", "ratio-scaled"])
def test_native_dynamics_feedback_matches_jax(fb_scale):
    """Feedback-topology compressor (detector on the previous output)
    vs the per-sample JAX scan, both legacy variants."""
    core = DynamicsCore(DynamicsConfig(
        sample_rate=48000.0, topology=Topology.FEEDBACK,
        feedback_ratio_scale=fb_scale, threshold_db=-20.0, ratio=4.0,
        knee_db=6.0, attack_ms=3.0, release_ms=80.0))
    rng = np.random.default_rng(90)
    x = rng.standard_normal(2048) * 0.6
    st = core.init_state((), jnp.float64)
    _, y_jax, g_jax = core.process(st, jnp.asarray(x))
    _, y_gold, g_gold = native.dynamics_feedback(core, x)
    assert snr_db(y_gold, np.asarray(y_jax)) > 120
    assert snr_db(g_gold, np.asarray(g_jax)) > 120


@pytest.mark.parametrize("kind", ["expander", "gate"])
def test_native_expansion_matches_jax(kind):
    """Downward expander / gate gain computer (undershoot knee +
    range floor) vs the JAX engine, RMS detector + sidechain."""
    from algodsp_tpu.effects.dynamics import Expander, Gate
    cls = Expander if kind == "expander" else Gate
    proc = cls(48000.0, threshold_db=-30.0, ratio=3.0, knee_db=4.0,
               attack_ms=2.0, release_ms=40.0,
               detector_mode=DetectorMode.RMS, rms_window_ms=5.0)
    rng = np.random.default_rng(91)
    # material crossing the threshold both ways
    x = rng.standard_normal(4096) * np.concatenate(
        [np.full(2048, 0.5), np.full(2048, 0.005)])
    st = proc.init_state((), jnp.float64)
    _, y_jax, g_jax = proc.process(st, jnp.asarray(x), with_gain=True)
    _, y_gold, g_gold = native.dynamics_expansion(proc, x)
    assert snr_db(g_gold, np.asarray(g_jax)) > 120
    assert snr_db(y_gold + 1e-30, np.asarray(y_jax) + 1e-30) > 100


def test_native_chorus_matches_jax():
    """Per-sample Hermite-interp voice loop vs the walking-slice
    chorus engine, incl. LFO phase continuity over two calls."""
    from algodsp_tpu.effects.modulation import Chorus
    ch = Chorus(48000.0, speed_hz=1.1, depth_seconds=0.003,
                base_delay_seconds=0.015, mix=0.6, stages=3)
    rng = np.random.default_rng(95)
    x = rng.standard_normal(4096) * 0.5
    st = ch.init_state((), jnp.float64)
    st, y1_jax = ch.process(st, jnp.asarray(x[:2048]))
    st, y2_jax = ch.process(st, jnp.asarray(x[2048:]))
    y_jax = np.concatenate([np.asarray(y1_jax), np.asarray(y2_jax)])
    g, y1 = native.chorus(ch, x[:2048])
    g, y2 = native.chorus(ch, x[2048:], state=g)
    y_gold = np.concatenate([y1, y2])
    assert snr_db(y_gold, y_jax) > 120


def test_native_autowah_matches_jax():
    """Per-sample envelope + DF2T time-varying bandpass vs the
    affine2_scan engine, streamed over two calls."""
    from algodsp_tpu.effects.modulation import AutoWah
    aw = AutoWah(48000.0, sensitivity=8.0, q=3.0, mix=0.9)
    rng = np.random.default_rng(96)
    x = rng.standard_normal(4096) * np.concatenate(
        [np.full(2048, 0.6), np.full(2048, 0.05)])
    st = aw.init_state((), jnp.float64)
    st, y1_jax = aw.process(st, jnp.asarray(x[:2048]))
    st, y2_jax = aw.process(st, jnp.asarray(x[2048:]))
    y_jax = np.concatenate([np.asarray(y1_jax), np.asarray(y2_jax)])
    g, y1 = native.autowah(aw, x[:2048])
    g, y2 = native.autowah(aw, x[2048:], state=g)
    y_gold = np.concatenate([y1, y2])
    assert snr_db(y_gold, y_jax) > 120


# ---------------------------------------------------------------------------
# Round-5 oracle families: composite dynamics, dither shapers,
# remaining modulation, spatial trio, transformer, bitcrusher.
# ---------------------------------------------------------------------------


def test_native_tremolo_matches_jax():
    from algodsp_tpu.effects.modulation import Tremolo
    tr = Tremolo(48000.0, rate_hz=6.5, depth=0.8, mix=0.9, smoothing_ms=3.0)
    rng = np.random.default_rng(101)
    x = rng.standard_normal(4096)
    st = tr.init_state((), jnp.float64)
    st, y1 = tr.process(st, jnp.asarray(x[:2048]))
    st, y2 = tr.process(st, jnp.asarray(x[2048:]))
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)])
    g, z1 = native.tremolo(tr, x[:2048])
    g, z2 = native.tremolo(tr, x[2048:], state=g)
    assert snr_db(np.concatenate([z1, z2]), y_jax) > 120


def test_native_ringmod_matches_jax():
    from algodsp_tpu.effects.modulation import RingModulator
    rm = RingModulator(48000.0, carrier_hz=317.0, mix=0.7)
    rng = np.random.default_rng(102)
    x = rng.standard_normal(3000)
    st = rm.init_state((), jnp.float64)
    st, y1 = rm.process(st, jnp.asarray(x[:1500]))
    st, y2 = rm.process(st, jnp.asarray(x[1500:]))
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)])
    g, z1 = native.ringmod(rm, x[:1500])
    g, z2 = native.ringmod(rm, x[1500:], state=g)
    assert snr_db(np.concatenate([z1, z2]), y_jax) > 120


def test_native_bitcrusher_matches_jax():
    from algodsp_tpu.effects.waveshape import BitCrusher
    bc = BitCrusher(48000.0, bit_depth=8.3, downsample=5, mix=0.75)
    rng = np.random.default_rng(103)
    x = rng.standard_normal(2051) * 0.8
    st = bc.init_state((), jnp.float64)
    st, y1 = bc.process(st, jnp.asarray(x[:1024]))
    st, y2 = bc.process(st, jnp.asarray(x[1024:]))
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)])
    g, z1 = native.bitcrusher(bc, x[:1024])
    g, z2 = native.bitcrusher(bc, x[1024:], state=g)
    np.testing.assert_allclose(np.concatenate([z1, z2]), y_jax, atol=1e-12)


def test_native_transient_matches_jax():
    from algodsp_tpu.effects.dynamics import TransientShaper
    ts = TransientShaper(48000.0, attack_amount=0.6, sustain_amount=-0.4,
                         attack_ms=1.0, release_ms=80.0)
    rng = np.random.default_rng(104)
    x = rng.standard_normal(4096) * np.concatenate(
        [np.full(1024, 0.05), np.full(1024, 0.9),
         np.full(1024, 0.1), np.full(1024, 0.6)])
    st = ts.init_state((), jnp.float64)
    st, y1 = ts.process(st, jnp.asarray(x[:2048]))
    st, y2 = ts.process(st, jnp.asarray(x[2048:]))
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)])
    g, z1 = native.transient(ts, x[:2048])
    g, z2 = native.transient(ts, x[2048:], state=g)
    assert snr_db(np.concatenate([z1, z2]), y_jax) > 120


def test_native_lookahead_matches_jax():
    """Delayed program path + early detector
    (`lookahead_limiter.go:23-36`)."""
    from algodsp_tpu.effects.dynamics import LookaheadLimiter
    ll = LookaheadLimiter(48000.0, lookahead_ms=3.0, threshold_db=-6.0,
                          release_ms=30.0)
    rng = np.random.default_rng(105)
    x = rng.standard_normal(4096) * np.concatenate(
        [np.full(2048, 1.5), np.full(2048, 0.1)])
    st = ll.init_state((), jnp.float64)
    st, y1 = ll.process(st, jnp.asarray(x[:2048]))
    st, y2 = ll.process(st, jnp.asarray(x[2048:]))
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)])
    g, z1 = native.lookahead(ll, x[:2048])
    g, z2 = native.lookahead(ll, x[2048:], state=g)
    assert snr_db(np.concatenate([z1, z2]) + 1e-30, y_jax + 1e-30) > 120


@pytest.mark.parametrize("split,listen", [(True, False), (True, True),
                                          (False, False)])
def test_native_deesser_matches_jax(split, listen):
    from algodsp_tpu.effects.dynamics import DeEsser
    de = DeEsser(48000.0, freq_hz=6000.0, q=1.5, threshold_db=-30.0,
                 ratio=4.0, knee_db=3.0, attack_ms=0.5, release_ms=20.0,
                 range_db=-24.0, split_band=split, listen=listen)
    rng = np.random.default_rng(106)
    t = np.arange(4096) / 48000.0
    x = (0.3 * np.sin(2 * np.pi * 400.0 * t)
         + 0.4 * np.sin(2 * np.pi * 7200.0 * t)
         + 0.05 * rng.standard_normal(4096))
    st = de.init_state((), jnp.float64)
    st, y1 = de.process(st, jnp.asarray(x[:2048]))
    st, y2 = de.process(st, jnp.asarray(x[2048:]))
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)])
    g, z1 = native.deesser(de, x[:2048])
    g, z2 = native.deesser(de, x[2048:], state=g)
    assert snr_db(np.concatenate([z1, z2]), y_jax) > 120


def test_native_multiband_matches_jax():
    from algodsp_tpu.effects.dynamics import MultibandCompressor, BandConfig
    mb = MultibandCompressor([250.0, 3000.0], 4, 48000.0, configs=[
        BandConfig(threshold_db=-25.0, ratio=3.0, attack_ms=15.0),
        BandConfig(threshold_db=-18.0, ratio=5.0, knee_db=2.0),
        BandConfig(threshold_db=-30.0, ratio=2.0, makeup_gain_db=1.5),
    ])
    rng = np.random.default_rng(107)
    x = rng.standard_normal(4096) * np.concatenate(
        [np.full(2048, 0.6), np.full(2048, 0.05)])
    st = mb.init_state((), jnp.float64)
    st, y1 = mb.process(st, jnp.asarray(x[:2048]))
    st, y2 = mb.process(st, jnp.asarray(x[2048:]))
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)])
    g, z1 = native.multiband(mb, x[:2048])
    g, z2 = native.multiband(mb, x[2048:], state=g)
    assert snr_db(np.concatenate([z1, z2]), y_jax) > 120


def _engine_noise(qz, x):
    """Replicate the engine's per-call noise draw so the oracle shapes
    identical dither (the PRNG itself is JAX-side)."""
    import jax
    st = qz.init_state((), jnp.float64)
    key, sub = jax.random.split(st["key"])
    return st, np.asarray(qz._noise(sub, jnp.asarray(x).shape, jnp.float64))


@pytest.mark.parametrize("preset_kind", ["none", "fir", "iir"])
def test_native_dither_quantizer_matches_jax(preset_kind):
    """Error-feedback shaping loop on identical noise: codes must agree
    exactly (`quantizer.go:87-120`, `shaper_fir.go`, `shaper_iir.go`)."""
    from algodsp_tpu.dither.quantizer import Quantizer, Preset, DitherType
    kw = dict(bit_depth=12, dither_type=DitherType.TRIANGULAR, seed=7)
    if preset_kind == "none":
        qz = Quantizer(48000.0, preset=Preset.NONE, **kw)
    elif preset_kind == "fir":
        qz = Quantizer(48000.0, preset=Preset.FC9, **kw)
    else:
        qz = Quantizer(48000.0, iir_shelf_freq=8000.0, **kw)
    rng = np.random.default_rng(108)
    x = np.clip(rng.standard_normal(4096) * 0.3, -1.0, 1.0)
    st, noise = _engine_noise(qz, x)
    _, q_jax = qz.process_integer(st, jnp.asarray(x))
    _, q_gold = native.quantize(qz, x, noise)
    np.testing.assert_array_equal(q_gold, np.asarray(q_jax, np.float64))


@pytest.mark.parametrize("bass_mono", [0.0, 200.0])
def test_native_widener_matches_jax(bass_mono):
    from algodsp_tpu.effects.spatial import StereoWidener
    w = StereoWidener(48000.0, width=1.8, bass_mono_hz=bass_mono)
    rng = np.random.default_rng(109)
    x = rng.standard_normal((2, 4096))
    st = w.init_state((), jnp.float64)
    st, y1 = w.process(st, jnp.asarray(x[:, :2048]))
    st, y2 = w.process(st, jnp.asarray(x[:, 2048:]))
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    g, z1 = native.widener(w, x[:, :2048])
    g, z2 = native.widener(w, x[:, 2048:], state=g)
    assert snr_db(np.concatenate([z1, z2], axis=-1), y_jax) > 120


def test_native_crosstalk_canceller_matches_jax():
    from algodsp_tpu.effects.spatial import CrosstalkCanceller
    cc = CrosstalkCanceller(48000.0, stages=3, attenuation=0.5)
    rng = np.random.default_rng(110)
    x = rng.standard_normal((2, 4096))
    st = cc.init_state((), jnp.float64)
    st, y1 = cc.process(st, jnp.asarray(x[:, :2048]))
    st, y2 = cc.process(st, jnp.asarray(x[:, 2048:]))
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    g, z1 = native.crosstalk_cancel(cc, x[:, :2048])
    g, z2 = native.crosstalk_cancel(cc, x[:, 2048:], state=g)
    assert snr_db(np.concatenate([z1, z2], axis=-1), y_jax) > 120


def test_native_crosstalk_sim_parametric_matches_jax():
    from algodsp_tpu.effects.spatial import CrosstalkSimulator
    cs = CrosstalkSimulator(48000.0, crossfeed_mix=0.4,
                            invert_polarity=True)
    rng = np.random.default_rng(111)
    x = rng.standard_normal((2, 4096))
    st = cs.init_state((), jnp.float64)
    st, y1 = cs.process(st, jnp.asarray(x[:, :2048]))
    st, y2 = cs.process(st, jnp.asarray(x[:, 2048:]))
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    g, z1 = native.crosstalk_sim(cs, x[:, :2048])
    g, z2 = native.crosstalk_sim(cs, x[:, 2048:], state=g)
    assert snr_db(np.concatenate([z1, z2], axis=-1), y_jax) > 120


@pytest.mark.parametrize("mode", ["crossfeed_only", "complete"])
def test_native_crosstalk_hrtf_matches_jax(mode):
    """4-path HRTF routing (`crosstalk_simulator_hrtf.go:121-137`):
    per-sample direct convolution vs the engine's FFT path."""
    from algodsp_tpu.effects.spatial import CrosstalkSimulator
    from algodsp_tpu.utils.irlib import hrtf_ir_set
    irs = hrtf_ir_set(48000.0)
    cs = CrosstalkSimulator(48000.0, hrtf_irs=irs, hrtf_mode=mode)
    rng = np.random.default_rng(112)
    x = rng.standard_normal((2, 2048))
    _, y_jax = cs.process(cs.init_state((), jnp.float64), jnp.asarray(x))
    y_gold = native.crosstalk_hrtf(cs, x)
    assert snr_db(y_gold, np.asarray(y_jax)) > 120


@pytest.mark.parametrize("quality", ["high", "lightweight"])
def test_native_transformer_matches_jax(quality):
    from algodsp_tpu.effects.waveshape import (TransformerSimulation,
                                               TransformerQuality)
    q = (TransformerQuality.HIGH if quality == "high"
         else TransformerQuality.LIGHTWEIGHT)
    tf = TransformerSimulation(48000.0, quality=q, drive=2.0, mix=0.8)
    rng = np.random.default_rng(113)
    x = rng.standard_normal(4096) * 0.7
    st = tf.init_state((), jnp.float64)
    st, y1 = tf.process(st, jnp.asarray(x[:2048]))
    st, y2 = tf.process(st, jnp.asarray(x[2048:]))
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)])
    g, z1 = native.transformer(tf, x[:2048])
    g, z2 = native.transformer(tf, x[2048:], state=g)
    assert snr_db(np.concatenate([z1, z2]), y_jax) > 120


@pytest.mark.parametrize("shift_hz", [150.0, -90.0])
def test_native_freqshift_matches_jax(shift_hz):
    from algodsp_tpu.effects.modulation import FrequencyShifter
    fs = FrequencyShifter(48000.0, shift_hz=shift_hz)
    rng = np.random.default_rng(114)
    x = rng.standard_normal(4096)
    st = fs.init_state((), jnp.float64)
    _, (up_jax, down_jax) = fs.process(st, jnp.asarray(x))
    _, up, down = native.freqshift(fs, x)
    assert snr_db(up, np.asarray(up_jax)) > 120
    assert snr_db(down, np.asarray(down_jax)) > 120


def test_native_wsola_short_input_guard():
    """ADVICE fix: inputs shorter than seq+seek must raise, not read
    out of bounds."""
    from algodsp_tpu.effects.pitch import WSOLAPitchShifter
    ws = WSOLAPitchShifter(48000.0, pitch_ratio=1.2)
    with pytest.raises(ValueError, match="seq\\+seek"):
        native.wsola(ws, np.zeros(64))


@pytest.mark.parametrize("mode", ["soft_clip", "hard_clip", "tanh",
                                  "waveshaper1", "waveshaper5",
                                  "waveshaper8", "saturate2", "soft_sat"])
def test_native_distortion_modes_match_jax(mode):
    from algodsp_tpu.effects.waveshape import Distortion, DistortionMode
    ds = Distortion(mode=DistortionMode(mode), drive=3.0, shape=0.6,
                    bias=0.1, mix=0.8, output_level=0.9)
    rng = np.random.default_rng(120)
    x = rng.standard_normal(4096) * 0.7
    st = ds.init_state((), jnp.float64)
    _, y = ds.process(st, jnp.asarray(x))
    _, g = native.distortion(ds, x)
    assert snr_db(g, np.asarray(y)) > 140


def test_native_distortion_chebyshev_matches_jax():
    from algodsp_tpu.effects.waveshape import (Distortion, DistortionMode,
                                               ChebyshevHarmonicMode)
    ds = Distortion(mode=DistortionMode.CHEBYSHEV, drive=1.2,
                    chebyshev_order=5,
                    chebyshev_weights=[0.5, 0.0, 0.3, 0.0, 0.2],
                    chebyshev_gain=0.8, mix=1.0)
    rng = np.random.default_rng(121)
    x = rng.standard_normal(4096) * 0.6
    st = ds.init_state((), jnp.float64)
    st, y1 = ds.process(st, jnp.asarray(x[:2048]))
    st, y2 = ds.process(st, jnp.asarray(x[2048:]))
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)])
    g, z1 = native.distortion(ds, x[:2048])
    g, z2 = native.distortion(ds, x[2048:], state=g)
    assert snr_db(np.concatenate([z1, z2]), y_jax) > 120


def test_native_harmonic_bass_matches_jax():
    from algodsp_tpu.effects.waveshape import HarmonicBass
    hb = HarmonicBass(48000.0, frequency=120.0, harmonic_bass_gain=0.8,
                      original_bass_gain=0.9, high_frequency_gain=1.0)
    rng = np.random.default_rng(122)
    t = np.arange(8192) / 48000.0
    x = (0.6 * np.sin(2 * np.pi * 60.0 * t)
         + 0.2 * rng.standard_normal(8192))
    st = hb.init_state((), jnp.float64)
    st, y1 = hb.process(st, jnp.asarray(x[:4096]))
    st, y2 = hb.process(st, jnp.asarray(x[4096:]))
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)])
    g, z1 = native.harmonic_bass(hb, x[:4096])
    g, z2 = native.harmonic_bass(hb, x[4096:], state=g)
    assert snr_db(np.concatenate([z1, z2]), y_jax) > 110


def test_native_delay_effect_matches_jax():
    """Feedback delay incl. smoothed lag retarget
    (`delay.go:140-166`)."""
    from algodsp_tpu.effects.delay_effect import Delay
    dl = Delay(48000.0, delay_seconds=0.02, feedback=0.5, mix=0.5,
               smooth_ms=5.0)
    rng = np.random.default_rng(123)
    x = rng.standard_normal(4096)
    st = dl.init_state((), jnp.float64)
    st, y1 = dl.process(st, jnp.asarray(x[:2048]))
    # retarget mid-stream: the smoothing trajectory must match
    tgt = 0.03 * 48000.0
    st, y2 = dl.process(st, jnp.asarray(x[2048:]),
                        target_delay_samples=tgt)
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)])
    g, z1 = native.delay_effect(dl, x[:2048])
    g, z2 = native.delay_effect(dl, x[2048:], state=g, target=tgt)
    assert snr_db(np.concatenate([z1, z2]), y_jax) > 120


def test_native_gate_hold_matches_jax():
    """Gate hold timer (`gate.go:360-367`): unity gain held through
    short dips, counter resets when the gate reopens."""
    from algodsp_tpu.effects.dynamics import Gate
    g = Gate(48000.0, threshold_db=-30.0, ratio=10.0, knee_db=3.0,
             attack_ms=0.2, hold_ms=4.0, release_ms=30.0, range_db=-60.0)
    rng = np.random.default_rng(130)
    # bursts with gaps shorter AND longer than the hold window
    env = np.concatenate([
        np.full(800, 0.8), np.full(120, 0.001),   # dip < hold (held)
        np.full(800, 0.8), np.full(800, 0.001),   # dip > hold (closes)
        np.full(800, 0.6), np.full(776, 0.001)])
    x = rng.standard_normal(4096) * env
    st = g.init_state((), jnp.float64)
    st, y1 = g.process(st, jnp.asarray(x[:2048]))
    st, y2 = g.process(st, jnp.asarray(x[2048:]))
    y_jax = np.concatenate([np.asarray(y1), np.asarray(y2)])
    gs, z1, _ = native.gate_hold(g, x[:2048])
    gs, z2, _ = native.gate_hold(g, x[2048:], state=gs)
    assert snr_db(np.concatenate([z1, z2]) + 1e-30, y_jax + 1e-30) > 120


@pytest.mark.parametrize("frozen,mode", [(False, "advance"),
                                         (True, "hold"),
                                         (True, "advance")])
def test_native_spectral_freeze_matches_jax(frozen, mode):
    """Independent radix-2 FFT vs jnp.fft through the freeze/WOLA path."""
    from algodsp_tpu.effects.spectral import SpectralFreeze, FreezePhaseMode
    fz = SpectralFreeze(48000.0, frame_size=512, hop_size=128,
                        frozen=frozen, mix=0.9,
                        phase_mode=(FreezePhaseMode.ADVANCE
                                    if mode == "advance"
                                    else FreezePhaseMode.HOLD))
    rng = np.random.default_rng(140)
    t = np.arange(5000) / 48000.0
    x = np.sin(2 * np.pi * 750.0 * t) + 0.1 * rng.standard_normal(5000)
    y_jax = np.asarray(fz.process(jnp.asarray(x)))
    y_gold = native.spectral_freeze(fz, x)
    assert snr_db(y_gold, y_jax) > 120


@pytest.mark.parametrize("ratio", [1.1, 1.5, 0.7])
def test_native_spectral_pitch_matches_jax(ratio):
    """Bin-shift (1.1) and identity-phase-locked stretch (1.5 / 0.7)
    paths vs the batched-JAX phase vocoder."""
    from algodsp_tpu.effects.pitch import SpectralPitchShifter
    ps = SpectralPitchShifter(48000.0, pitch_ratio=ratio,
                              frame_size=512, analysis_hop=128)
    rng = np.random.default_rng(141)
    t = np.arange(12000) / 48000.0
    x = (np.sin(2 * np.pi * 440.0 * t)
         + 0.05 * rng.standard_normal(12000))
    y_jax = np.asarray(ps.process(jnp.asarray(x)))
    y_gold = native.spectral_pitch(ps, x)
    assert snr_db(y_gold, y_jax) > 110


@pytest.mark.parametrize("n,ratio", [
    (12000, 1.3), (20000, 0.8), (16384, 1.189), (30000, 0.707),
    (9500, 2.0)])
def test_native_wsola_grid_property(n, ratio):
    """Property sweep over lengths and ratios for the round-5 grid:
    full-length output, engine==golden, and output energy within 3 dB
    of input energy (no collapse, no blow-up)."""
    ws = WSOLAPitchShifter(48000.0, pitch_ratio=ratio)
    if n < ws.sequence + ws.seek + int(ws.sequence * ratio) + 1:
        pytest.skip("below the engine's documented minimum length")
    rng = np.random.default_rng(int(n + ratio * 1000))
    x = np.convolve(rng.standard_normal(n), np.ones(8) / 8.0,
                    mode="same").reshape(1, -1)
    y = np.asarray(ws.process(jnp.asarray(x)))
    g = native.wsola(ws, x)
    assert y.shape == (1, n) and g.shape == (1, n)
    assert snr_db(g, y) > 110, (n, ratio)
    e_ratio = float(np.sum(y ** 2)) / float(np.sum(x ** 2))
    assert 0.5 < e_ratio < 2.0, (n, ratio, e_ratio)
