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
