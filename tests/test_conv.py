"""Convolution family tests vs NumPy float64 oracles (the analog of the
reference's streaming-vs-Direct equivalence tests, SURVEY.md §4.4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu import conv
from tests.conftest import snr_db


def test_direct_full_same_valid():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(100)
    b = rng.standard_normal(17)
    full = np.asarray(conv.direct(jnp.asarray(a), b, "full"))
    assert snr_db(np.convolve(a, b, "full"), full) > 200
    same = np.asarray(conv.direct(jnp.asarray(a), b, "same"))
    assert snr_db(np.convolve(a, b, "same"), same) > 200
    valid = np.asarray(conv.direct(jnp.asarray(a), b, "valid"))
    assert snr_db(np.convolve(a, b, "valid"), valid) > 200


def test_direct_circular():
    rng = np.random.default_rng(2)
    a = rng.standard_normal(64)
    b = rng.standard_normal(16)
    got = np.asarray(conv.direct_circular(jnp.asarray(a), b))
    # circular convolution oracle via FFT
    expected = np.fft.ifft(np.fft.fft(a) * np.fft.fft(b, 64)).real
    assert snr_db(expected, got) > 200


def test_fftconvolve_matches_direct():
    rng = np.random.default_rng(3)
    a = rng.standard_normal(1000)
    b = rng.standard_normal(128)
    got = np.asarray(conv.fftconvolve(jnp.asarray(a), b))
    assert snr_db(np.convolve(a, b), got) > 200


def test_convolve_auto_select():
    rng = np.random.default_rng(4)
    a = rng.standard_normal(256)
    for m in [8, 31, 32, 100]:
        b = rng.standard_normal(m)
        got = np.asarray(conv.convolve(jnp.asarray(a), b))
        assert snr_db(np.convolve(a, b), got) > 180, m


def test_convolve_batched():
    rng = np.random.default_rng(5)
    a = rng.standard_normal((3, 200))
    b = rng.standard_normal(64)
    got = np.asarray(conv.fftconvolve(jnp.asarray(a), b))
    for ch in range(3):
        assert snr_db(np.convolve(a[ch], b), got[ch]) > 200


def test_overlap_save_one_shot():
    rng = np.random.default_rng(6)
    a = rng.standard_normal(1000)
    b = rng.standard_normal(100)
    got = np.asarray(conv.overlap_save_convolve(jnp.asarray(a), b, fft_size=256))
    assert snr_db(np.convolve(a, b), got) > 200


def test_overlap_add_one_shot():
    rng = np.random.default_rng(7)
    a = rng.standard_normal(777)
    b = rng.standard_normal(55)
    got = np.asarray(conv.overlap_add_convolve(jnp.asarray(a), b, block_size=128))
    assert snr_db(np.convolve(a, b), got) > 200


def test_overlap_save_streaming():
    rng = np.random.default_rng(8)
    x = rng.standard_normal(2048)
    h = rng.standard_normal(64)
    osv = conv.OverlapSave(h, 256)
    expected = np.convolve(x, h)[:2048]
    state = osv.init_state(dtype=jnp.float64)
    outs = []
    for lo, hi in [(0, 512), (512, 1000), (1000, 2048)]:
        state, y = osv.process_stream(state, jnp.asarray(x[lo:hi]))
        outs.append(np.asarray(y))
    assert snr_db(expected, np.concatenate(outs)) > 200


def test_overlap_add_streaming():
    rng = np.random.default_rng(9)
    x = rng.standard_normal(2048)
    h = rng.standard_normal(100)
    oa = conv.OverlapAdd(h, 256)
    expected = np.convolve(x, h)[:2048]
    state = oa.init_state(dtype=jnp.float64)
    outs = []
    for blk in x.reshape(4, 512):
        state, y = oa.process_stream(state, jnp.asarray(blk))
        outs.append(np.asarray(y))
    assert snr_db(expected, np.concatenate(outs)) > 200


def test_overlap_validation():
    with pytest.raises(ValueError):
        conv.OverlapSave([], 256)
    with pytest.raises(ValueError):
        conv.OverlapSave(np.ones(300), 256)  # fft too small
    with pytest.raises(ValueError):
        conv.OverlapAdd(np.ones(10), 0)


def test_partitioned_matches_direct():
    rng = np.random.default_rng(10)
    ir = rng.standard_normal(1000)  # not a multiple of block
    x = rng.standard_normal(2048)
    pc = conv.PartitionedConvolver(ir, min_block_order=7)  # block=128
    assert pc.latency == 128
    y = np.asarray(pc.process(jnp.asarray(x)))
    expected = np.convolve(x, ir)[:2048]
    assert snr_db(expected, y) > 200


def test_partitioned_streaming_blocks():
    rng = np.random.default_rng(11)
    ir = rng.standard_normal(300)
    x = rng.standard_normal(1024)
    pc = conv.PartitionedConvolver(ir, 6)  # block=64
    expected = np.convolve(x, ir)[:1024]
    state = pc.init_state(dtype=jnp.float64)
    outs = []
    for blk in x.reshape(-1, 64):
        state, y = pc.process_block(state, jnp.asarray(blk))
        outs.append(np.asarray(y))
    assert snr_db(expected, np.concatenate(outs)) > 200


def test_partitioned_batched_channels():
    rng = np.random.default_rng(12)
    ir = rng.standard_normal(256)
    x = rng.standard_normal((8, 512))
    pc = conv.PartitionedConvolver(ir, 7)
    y = np.asarray(pc.process(jnp.asarray(x)))
    for ch in range(8):
        assert snr_db(np.convolve(x[ch], ir)[:512], y[ch]) > 200


def test_partitioned_validation():
    with pytest.raises(ValueError):
        conv.PartitionedConvolver([], 7)
    with pytest.raises(ValueError):
        conv.PartitionedConvolver(np.ones(100), 0)


def test_correlate_matches_numpy():
    rng = np.random.default_rng(13)
    a = rng.standard_normal(100)
    b = rng.standard_normal(40)
    got = np.asarray(conv.correlate(jnp.asarray(a), b))
    expected = np.correlate(a, b, "full")
    assert snr_db(expected, got) > 180
    got_d = np.asarray(conv.correlate_direct(jnp.asarray(a), b))
    assert snr_db(expected, got_d) > 200
    got_f = np.asarray(conv.correlate_fft(jnp.asarray(a), b))
    assert snr_db(expected, got_f) > 200


def test_correlate_peak_and_lag():
    # delayed copy: peak at the delay lag
    rng = np.random.default_rng(14)
    b = rng.standard_normal(64)
    delay = 17
    a = np.concatenate([np.zeros(delay), b, np.zeros(19)])
    c = np.asarray(conv.correlate(jnp.asarray(a), b))
    idx, val = conv.find_peak(c)
    lag = int(conv.lag_from_index(int(idx), len(b)))
    assert lag == delay
    assert int(conv.index_from_lag(lag, len(b))) == int(idx)


def test_autocorrelate_normalized():
    rng = np.random.default_rng(15)
    a = rng.standard_normal(128)
    ac = np.asarray(conv.auto_correlate_normalized(jnp.asarray(a)))
    assert abs(ac[127] - 1.0) < 1e-9  # zero-lag = 1
    assert np.all(np.abs(ac) <= 1.0 + 1e-9)


def test_correlate_normalized_bounds():
    rng = np.random.default_rng(16)
    a = rng.standard_normal(100)
    c = np.asarray(conv.correlate_normalized(jnp.asarray(a), a))
    assert abs(np.max(c) - 1.0) < 1e-9


def test_deconvolve_regularized_recovers():
    from algodsp_tpu.conv.deconvolve import DeconvOptions
    rng = np.random.default_rng(17)
    x = rng.standard_normal(500)
    h = np.array([1.0, 0.5, 0.25, 0.125])
    y = np.convolve(x, h)
    rec = np.asarray(conv.deconvolve(jnp.asarray(y), h,
                                     DeconvOptions(epsilon=1e-10)))
    assert conv.snr(x, rec[:500]) > 80


def test_deconvolve_naive_and_errors():
    from algodsp_tpu.conv.deconvolve import DeconvOptions, DeconvMethod, DivisionByZeroError
    rng = np.random.default_rng(18)
    x = rng.standard_normal(256)
    h = np.array([1.0, 0.3])
    y = np.convolve(x, h)
    rec = np.asarray(conv.deconvolve(jnp.asarray(y), h,
                                     DeconvOptions(method=DeconvMethod.NAIVE)))
    assert conv.snr(x, rec[:256]) > 100
    # kernel with a spectral null -> naive raises
    with pytest.raises(DivisionByZeroError):
        conv.deconvolve(jnp.asarray(y), np.array([1.0, -1.0]),
                        DeconvOptions(method=DeconvMethod.NAIVE))


def test_deconvolve_wiener():
    from algodsp_tpu.conv.deconvolve import DeconvOptions, DeconvMethod
    rng = np.random.default_rng(19)
    x = rng.standard_normal(500)
    h = np.array([1.0, 0.6, 0.2])
    y = np.convolve(x, h) + 0.001 * rng.standard_normal(502)
    rec = np.asarray(conv.deconvolve(jnp.asarray(y), h,
                                     DeconvOptions(method=DeconvMethod.WIENER,
                                                   noise_variance=1e-6,
                                                   signal_variance=1.0)))
    assert conv.snr(x, rec[:500]) > 30


def test_inverse_filter():
    h = np.array([1.0, 0.5])
    inv = conv.inverse_filter(h, 128, epsilon=1e-9)
    # conv(h, inv) ~ delta
    d = np.convolve(h, inv)[:128]
    assert abs(d[0] - 1.0) < 1e-3
    assert np.max(np.abs(d[1:])) < 1e-3


def test_partitioned_bulk_matches_scan():
    rng = np.random.default_rng(20)
    ir = rng.standard_normal(700)
    x = rng.standard_normal((3, 1024))
    pc = conv.PartitionedConvolver(ir, 7)
    y_bulk = np.asarray(pc.process(jnp.asarray(x)))
    y_scan = np.asarray(pc.process_scan(jnp.asarray(x)))
    assert snr_db(y_scan, y_bulk) > 180


def test_partitioned_process_stream_matches_blocks():
    rng = np.random.default_rng(20)
    ir = rng.standard_normal(5000)
    pc = conv.PartitionedConvolver(ir, min_block_order=9)
    x1 = jnp.asarray(rng.standard_normal((2, 2048)))
    x2 = jnp.asarray(rng.standard_normal((2, 1536)))
    sA = pc.init_state((2,), jnp.float64)
    sB = pc.init_state((2,), jnp.float64)
    ya = []
    yb = []
    for xx in (x1, x2):
        sA, y = pc.process_stream(sA, xx)
        ya.append(np.asarray(y))
        for b in range(xx.shape[-1] // 512):
            sB, y = pc.process_block(sB, xx[..., b * 512:(b + 1) * 512])
            yb.append(np.asarray(y))
    ya = np.concatenate(ya, axis=-1)
    yb = np.concatenate(yb, axis=-1)
    np.testing.assert_allclose(ya, yb, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(sA["fdl"]), np.asarray(sB["fdl"]))
    full = np.stack([np.convolve(
        np.concatenate([np.asarray(x1)[c], np.asarray(x2)[c]]), ir)[:3584]
        for c in range(2)])
    assert snr_db(full, ya) > 200


def test_partitioned_bulk_fdl_matches_big_fft():
    """The bulk FDL formulation (internal repartitioning) must equal the
    big-FFT path exactly — both are the causal convolution."""
    from algodsp_tpu.conv import PartitionedConvolver
    rng = np.random.default_rng(21)
    ir = rng.standard_normal(6000) * np.exp(-np.arange(6000) / 1500.0)
    pc = PartitionedConvolver(ir, min_block_order=9)
    x = jnp.asarray(rng.standard_normal((3, 8192)), jnp.float64)
    y_fft = np.asarray(pc.process(x, bulk_block_order=0))
    y_fdl = np.asarray(pc.process(x, bulk_block_order=10))
    np.testing.assert_allclose(y_fdl, y_fft, rtol=1e-9, atol=1e-9)
    y_fdl12 = np.asarray(pc.process(x, bulk_block_order=12))
    np.testing.assert_allclose(y_fdl12, y_fft, rtol=1e-9, atol=1e-9)
