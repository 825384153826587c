"""Spectrum tests with analytic oracles (mirrors `spectrum_test.go`)."""

import pytest
import numpy as np
import jax.numpy as jnp

from algodsp_tpu import spectrum


def test_magnitude_power_phase():
    bins = np.array([3 + 4j, 0 + 1j, -1 + 0j, 0 + 0j])
    np.testing.assert_allclose(spectrum.magnitude(bins), [5.0, 1.0, 1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(spectrum.power(bins), [25.0, 1.0, 1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(spectrum.phase(bins),
                               [np.arctan2(4, 3), np.pi / 2, np.pi, 0.0], atol=1e-12)


def test_from_parts():
    re = np.array([3.0, 0.0])
    im = np.array([4.0, 2.0])
    np.testing.assert_allclose(spectrum.magnitude_from_parts(re, im), [5.0, 2.0], atol=1e-12)
    np.testing.assert_allclose(spectrum.power_from_parts(re, im), [25.0, 4.0], atol=1e-12)


def test_unwrap_phase_matches_numpy():
    rng = np.random.default_rng(7)
    ph = np.cumsum(rng.uniform(-2.0, 2.0, size=256))
    wrapped = np.angle(np.exp(1j * ph))
    ours = np.asarray(spectrum.unwrap_phase(wrapped))
    theirs = np.unwrap(wrapped)
    np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_unwrap_batched():
    ph = np.stack([np.linspace(0, 20, 100), np.linspace(0, -20, 100)])
    wrapped = np.angle(np.exp(1j * ph))
    out = np.asarray(spectrum.unwrap_phase(wrapped))
    expected = np.unwrap(wrapped, axis=-1)
    np.testing.assert_allclose(out, expected, atol=1e-9)


def test_group_delay_linear_phase():
    # pure delay of D samples: phase = -2*pi*k*D/N -> group delay = D everywhere
    n = 512
    d = 7.0
    k = np.arange(n // 2 + 1)
    ph = -2 * np.pi * k * d / n
    gd = np.asarray(spectrum.group_delay_from_phase(ph, n))
    np.testing.assert_allclose(gd, d, atol=1e-9)
    gds = np.asarray(spectrum.group_delay_seconds(ph, n, 48000.0))
    np.testing.assert_allclose(gds, d / 48000.0, atol=1e-12)


def test_interpolate_linear():
    x = np.array([0.0, 1.0, 2.0])
    y = np.array([0.0, 10.0, 20.0])
    q = np.array([-1.0, 0.5, 1.5, 3.0])
    out = np.asarray(spectrum.interpolate_linear(x, y, q))
    np.testing.assert_allclose(out, [0.0, 5.0, 15.0, 20.0], atol=1e-12)


def test_smooth_fractional_octave_flat_is_identity():
    f = np.geomspace(20.0, 20000.0, 200)
    v = np.full(200, 3.0)
    out = np.asarray(spectrum.smooth_fractional_octave(f, v, 3))
    np.testing.assert_allclose(out, v, atol=1e-12)


def test_smooth_fractional_octave_matches_naive():
    rng = np.random.default_rng(3)
    f = np.geomspace(20.0, 20000.0, 300)
    v = rng.uniform(0.0, 1.0, 300)
    frac = 6
    out = np.asarray(spectrum.smooth_fractional_octave(f, v, frac))

    # naive reference implementation (as in spectrum.go:305-350)
    half = 2 ** (1 / (2 * frac))
    expected = np.empty_like(v)
    for i, fc in enumerate(f):
        lo, hi = fc / half, fc * half
        i0 = np.searchsorted(f, lo, side="left")
        i1 = np.searchsorted(f, hi, side="right")
        expected[i] = v[i0:i1].mean() if i1 > i0 else v[i]
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_spectrum_of_sine_peak_bin():
    # End-to-end: Hann-windowed FFT of a bin-centered sine puts the peak
    # at the right bin with amplitude ~ A*N*CG/2.
    from algodsp_tpu import window, signal
    n = 4096
    sr = 48000.0
    bin_idx = 100
    freq = bin_idx * sr / n
    x = signal.sine(freq, 1.0, n, sr, dtype=jnp.float64)
    xw = window.apply(x, window.WindowType.HANN, periodic=True)
    mag = np.asarray(spectrum.magnitude(jnp.fft.rfft(xw)))
    assert np.argmax(mag) == bin_idx
    np.testing.assert_allclose(mag[bin_idx], 0.5 * n * 0.5, rtol=1e-3)


# -- public STFT / WOLA inverse (beyond the reference: its spectral
# effects frame privately, `spectral_freeze.go:36-60`) ----------------

def test_stft_istft_roundtrip_exact():
    from algodsp_tpu.spectrum import stft, istft
    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 10000)).astype(np.float32)
    # (512, 192) exercises the scatter-add fallback (hop not a divisor)
    for frame, hop in [(1024, 256), (2048, 512), (512, 128), (512, 192)]:
        spec = stft(jnp.asarray(x), frame, hop)
        y = np.asarray(istft(spec, hop, length=x.shape[-1]))
        err = np.abs(y - x).max()
        assert err < 2e-5, (frame, hop, err)
    # hop == frame needs a window with no zeros (Hann is not COLA there)
    from algodsp_tpu.window import WindowType
    spec = stft(jnp.asarray(x), 256, 256, window=WindowType.RECTANGULAR)
    y = np.asarray(istft(spec, 256, window=WindowType.RECTANGULAR,
                         length=x.shape[-1]))
    assert np.abs(y - x).max() < 2e-5


def test_stft_frame_centering_and_shape():
    from algodsp_tpu.spectrum import stft
    sr, n = 48000.0, 8192
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * 3000.0 * t).astype(np.float32)
    spec = stft(jnp.asarray(x), 1024, 256)
    assert spec.shape == (1 + 8192 // 256, 513)
    mag = np.abs(np.asarray(spec))
    # tone bin = 3000/48000*1024 = 64 in every interior frame
    assert (mag[4:-4].argmax(axis=-1) == 64).all()


def test_spectrogram_db_floor_and_peak():
    from algodsp_tpu.spectrum import spectrogram
    sr, n = 48000.0, 8192
    x = 0.5 * np.sin(2 * np.pi * 3000.0 * np.arange(n) / sr)
    sg = np.asarray(spectrogram(jnp.asarray(x, jnp.float32), 1024, 256,
                                floor_db=-120.0))
    assert sg.min() >= -120.0
    assert sg[8].argmax() == 64


def test_stft_invalid_params():
    from algodsp_tpu.spectrum import stft
    with pytest.raises(ValueError):
        stft(jnp.zeros(64), 128, 256)   # hop > frame
    with pytest.raises(ValueError):
        stft(jnp.zeros(64), 128, 0)


# -- mel filterbank / MFCC (beyond the reference) ----------------------

def test_mel_scale_roundtrip_and_anchors():
    from algodsp_tpu.spectrum import hz_to_mel, mel_to_hz
    f = np.array([0.0, 440.0, 1000.0, 8000.0, 20000.0])
    for htk in (False, True):
        np.testing.assert_allclose(
            mel_to_hz(hz_to_mel(f, htk=htk), htk=htk), f, rtol=1e-10)
    # HTK anchor: 1 kHz ~ 1000 mel (2595*log10(1+1000/700) = 1000.2)
    assert abs(hz_to_mel(1000.0, htk=True) - 1000.0) < 1.0


def test_mel_filterbank_shapes_and_coverage():
    from algodsp_tpu.spectrum import mel_filterbank
    fb = mel_filterbank(40, 2048, 48000.0)
    assert fb.shape == (1025, 40)
    assert fb.min() >= 0.0
    # every band has support; interior bins are covered by >= 1 band
    assert (fb.sum(axis=0) > 0).all()
    center_bins = slice(10, 900)
    assert (fb[center_bins].sum(axis=1) > 0).all()
    with pytest.raises(ValueError):
        mel_filterbank(40, 2048, 48000.0, fmin=30000.0)


def test_mel_spectrogram_tone_lands_in_right_band():
    from algodsp_tpu.spectrum import mel_spectrogram, mel_filterbank
    sr, n = 48000.0, 1 << 14
    tone_hz = 2000.0
    x = np.sin(2 * np.pi * tone_hz * np.arange(n) / sr).astype(np.float32)
    m = np.asarray(mel_spectrogram(jnp.asarray(x), sr, n_mels=40,
                                   frame_size=1024, hop_size=256))
    fb = mel_filterbank(40, 1024, sr)
    freqs = np.arange(513) * sr / 1024
    # the band the tone's FFT bin feeds most strongly
    expect = int(fb[np.argmin(np.abs(freqs - tone_hz))].argmax())
    assert (m[4:-4].argmax(axis=-1) == expect).all()


def test_mfcc_shapes_and_dct_orthonormality():
    from algodsp_tpu.spectrum import mfcc
    from algodsp_tpu.spectrum.mel import dct_matrix
    d = dct_matrix(20, 20, dtype=np.float64)
    np.testing.assert_allclose(d.T @ d, np.eye(20), atol=1e-12)
    x = np.random.default_rng(0).standard_normal((2, 8192)).astype(np.float32)
    c = mfcc(jnp.asarray(x), 48000.0, n_mfcc=13, n_mels=40,
             frame_size=1024, hop_size=256)
    assert c.shape == (2, 1 + 8192 // 256, 13)
    with pytest.raises(ValueError):
        mfcc(jnp.asarray(x), 48000.0, n_mfcc=64, n_mels=40)


def test_streaming_stft_matches_oneshot():
    from algodsp_tpu.spectrum import stft, StreamingSTFT
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    eng = StreamingSTFT(1024, 256)
    state = eng.init_state((2,))
    frames = []
    for i in range(0, 8192, 2048):
        state, f = eng.process(state, jnp.asarray(x[:, i:i + 2048]))
        frames.append(np.asarray(f))
    got = np.concatenate(frames, axis=-2)
    # one-shot equivalent: left-pad by the carried tail length
    ref = np.asarray(stft(jnp.asarray(
        np.pad(x, [(0, 0), (1024 - 256, 0)])), 1024, 256, center=False))
    np.testing.assert_allclose(got, ref[:, :got.shape[-2]], atol=1e-4)


def test_streaming_istft_delayed_identity():
    from algodsp_tpu.spectrum import StreamingSTFT, StreamingISTFT
    rng = np.random.default_rng(10)
    x = rng.standard_normal((2, 12288)).astype(np.float32)
    ana = StreamingSTFT(1024, 256)
    syn = StreamingISTFT(1024, 256)
    sa, ss = ana.init_state((2,)), syn.init_state((2,))
    outs = []
    for i in range(0, 12288, 1024):
        sa, f = ana.process(sa, jnp.asarray(x[:, i:i + 1024]))
        ss, y = syn.process(ss, f)
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=-1)
    lag = 1024 - 256  # analysis tail + synthesis carry = one lag total
    err = np.abs(y[:, lag + 1024:] - x[:, 1024:-lag]).max()
    assert err < 1e-4, err


def test_streaming_istft_rejects_non_cola():
    from algodsp_tpu.spectrum import StreamingISTFT
    from algodsp_tpu.window import WindowType
    with pytest.raises(ValueError):
        StreamingISTFT(256, 256)  # Hann at hop == frame: zero overlap
    StreamingISTFT(256, 256, window=WindowType.RECTANGULAR)  # fine
