"""Hermitian-packed batched real FFT (ops/packfft.py).

The packing is the TPU analog of what the reference delegates to its
FFT dependency (`github.com/cwbudde/algo-fft`, SURVEY.md §0): two real
rows ride one complex FFT. These tests assert exactness against
jnp.fft for every row-parity / padding case the conv engines hit.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.ops.packfft import (
    rfft_packed, irfft_packed, rfft_batched, irfft_batched)
from algodsp_tpu.testutil import snr_db


@pytest.mark.parametrize("k", [1, 2, 3, 8, 9])
@pytest.mark.parametrize("n,m", [(16, 16), (64, 48), (256, 200)])
def test_rfft_packed_matches_rfft(k, n, m):
    rng = np.random.default_rng(7 * k + n)
    x = rng.standard_normal((k, m))
    got = np.asarray(rfft_packed(jnp.asarray(x), n))
    want = np.fft.rfft(x, n)
    assert np.abs(got - want).max() < 1e-10


@pytest.mark.parametrize("k", [1, 2, 5, 8])
@pytest.mark.parametrize("n", [16, 128])
def test_irfft_packed_roundtrip(k, n):
    rng = np.random.default_rng(k * 31 + n)
    x = rng.standard_normal((k, n))
    spec = jnp.asarray(np.fft.rfft(x, n))
    got = np.asarray(irfft_packed(spec, n))
    assert snr_db(x, got) > 200


def test_leading_batch_dims():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 5, 32))
    got = np.asarray(rfft_packed(jnp.asarray(x), 32))
    want = np.fft.rfft(x, 32)
    assert np.abs(got - want).max() < 1e-10
    back = np.asarray(irfft_packed(jnp.asarray(want), 32))
    assert snr_db(x, back) > 200


def test_batched_dispatch_default_fallthrough():
    # packing defaults off (measured a wash on v5e — see module doc);
    # the dispatchers must fall through to plain jnp.fft
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 64))
    got = np.asarray(rfft_batched(jnp.asarray(x), 64))
    assert np.abs(got - np.fft.rfft(x, 64)).max() < 1e-10
    spec = np.fft.rfft(x, 64)
    back = np.asarray(irfft_batched(jnp.asarray(spec), 64))
    assert snr_db(x, back) > 200


def test_1d_input_dispatch():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(128)
    got = np.asarray(rfft_batched(jnp.asarray(x), 128))
    assert np.abs(got - np.fft.rfft(x, 128)).max() < 1e-10


@pytest.mark.parametrize("m", [32768, 30000])
def test_rfft_mx_matches_numpy(m):
    from algodsp_tpu.ops.packfft import rfft_mx
    n = 32768
    rng = np.random.default_rng(m)
    x = rng.standard_normal((4, m)).astype(np.float32)
    got = np.asarray(rfft_mx(jnp.asarray(x), n))
    want = np.fft.rfft(x.astype(np.float64), n)
    snr = -20 * np.log10(np.linalg.norm(got - want) / np.linalg.norm(want))
    assert snr > 120


def test_irfft_mx_roundtrip():
    from algodsp_tpu.ops.packfft import rfft_mx, irfft_mx
    n = 32768
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, n)).astype(np.float32)
    spec = rfft_mx(jnp.asarray(x), n)
    back = np.asarray(irfft_mx(spec, n))
    assert snr_db(x, back) > 110
    # and against numpy's irfft of the same spectrum
    want = np.fft.irfft(np.asarray(spec), n)
    assert snr_db(want, back) > 110
