"""Reverb tests: Go-loop oracles for Freeverb/FDN; conv reverb vs direct."""

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.effects.reverb import Freeverb, FDNReverb, ConvolutionReverb
from algodsp_tpu.effects.reverb.freeverb import COMB_TUNINGS, ALLPASS_TUNINGS, FIXED_GAIN
from tests.conftest import snr_db


def freeverb_oracle(x, wet=0.22, dry=1.0, room=0.72, damp=0.45):
    """Per-sample float64 port of reverb.go:33-200."""
    combs = [np.zeros(n) for n in COMB_TUNINGS]
    fstore = np.zeros(len(COMB_TUNINGS))
    allp = [np.zeros(n) for n in ALLPASS_TUNINGS]
    idx_c = [0] * len(COMB_TUNINGS)
    idx_a = [0] * len(ALLPASS_TUNINGS)
    out = np.empty_like(x)
    for n, v in enumerate(x):
        inp = FIXED_GAIN * v
        acc = 0.0
        for i, size in enumerate(COMB_TUNINGS):
            o = combs[i][idx_c[i]]
            fs = o * (1 - damp) + fstore[i] * damp
            if abs(fs) < 1e-23:
                fs = 0.0
            fstore[i] = fs
            combs[i][idx_c[i]] = inp + fs * room
            idx_c[i] = (idx_c[i] + 1) % size
            acc += o
        for i, size in enumerate(ALLPASS_TUNINGS):
            bo = allp[i][idx_a[i]]
            o = bo - acc
            allp[i][idx_a[i]] = acc + bo * 0.5
            idx_a[i] = (idx_a[i] + 1) % size
            acc = o
        out[n] = acc * wet + v * dry
    return out


def test_freeverb_matches_oracle():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4000)
    rv = Freeverb()
    state = rv.init_state(dtype=jnp.float64)
    _, y = rv.process(state, jnp.asarray(x))
    expected = freeverb_oracle(x)
    assert snr_db(expected, np.asarray(y)) > 150


def test_freeverb_streaming():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(3000)
    rv = Freeverb()
    state = rv.init_state(dtype=jnp.float64)
    outs = []
    for blk in x.reshape(3, 1000):
        state, y = rv.process(state, jnp.asarray(blk))
        outs.append(np.asarray(y))
    expected = freeverb_oracle(x)
    assert snr_db(expected, np.concatenate(outs)) > 150


def test_freeverb_impulse_decays():
    rv = Freeverb(dry=0.0, wet=1.0)
    x = np.zeros(20000)
    x[0] = 1.0
    state = rv.init_state(dtype=jnp.float64)
    _, y = rv.process(state, jnp.asarray(x))
    y = np.asarray(y)
    early = np.abs(y[1000:3000]).max()
    late = np.abs(y[18000:]).max()
    assert early > 0
    assert late < early  # decaying tail


def test_fdn_impulse_response_decay():
    sr = 44100.0
    rv = FDNReverb(sr, dry=0.0, wet=1.0, rt60_seconds=0.5,
                   pre_delay_seconds=0.0, mod_depth_seconds=0.0)
    n = 44100
    x = np.zeros(n)
    x[0] = 1.0
    state = rv.init_state(dtype=jnp.float64)
    _, y = rv.process(state, jnp.asarray(x))
    y = np.asarray(y)
    assert np.all(np.isfinite(y))
    # energy in second half-second is far below the first 100ms
    e1 = np.sum(y[:4410] ** 2)
    e2 = np.sum(y[22050:] ** 2)
    assert e1 > 0
    assert e2 < e1 * 1e-3


def test_fdn_rt60_gains():
    rv = FDNReverb(44100.0, rt60_seconds=1.8)
    ds = rv.base_delays / 44100.0
    np.testing.assert_allclose(rv.feedback_gains, 10 ** (-3 * ds / 1.8))
    with pytest.raises(ValueError):
        FDNReverb(-1.0)
    with pytest.raises(ValueError):
        FDNReverb(44100.0, rt60_seconds=0.0)


def test_convolution_reverb_exact():
    rng = np.random.default_rng(3)
    ir = rng.standard_normal(500)
    x = rng.standard_normal(1024)
    rv = ConvolutionReverb(ir, min_block_order=8, wet=1.0, dry=0.0)
    assert rv.latency == 256
    state = rv.init_state(dtype=jnp.float64)
    _, y = rv.process(state, jnp.asarray(x))
    expected = np.convolve(x, ir)[:1024]
    assert snr_db(expected, np.asarray(y)) > 180


def test_convolution_reverb_wet_dry():
    rng = np.random.default_rng(4)
    ir = np.zeros(64)
    ir[0] = 1.0  # identity IR
    x = rng.standard_normal(256)
    rv = ConvolutionReverb(ir, min_block_order=6, wet=0.5, dry=0.5)
    state = rv.init_state(dtype=jnp.float64)
    _, y = rv.process(state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), x, rtol=1e-9)


def test_freeverb_blocked_matches_scan_streaming():
    rv = Freeverb()
    rng = np.random.default_rng(11)
    x1 = jnp.asarray(rng.standard_normal((3, 1000)))
    x2 = jnp.asarray(rng.standard_normal((3, 555)))
    s1, s2 = rv.init_state((3,), jnp.float64), rv.init_state((3,), jnp.float64)
    s1, y1 = rv.process(s1, x1)
    s2, y2 = rv.process_scan(s2, x1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-12)
    s1, y1 = rv.process(s1, x2)
    s2, y2 = rv.process_scan(s2, x2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s1["filter_store"]),
                               np.asarray(s2["filter_store"]), atol=1e-12)


def test_fdn_blocked_matches_scan_streaming():
    for sr, pre in [(48000.0, 0.01), (44100.0, 0.0), (48000.0, 0.0005)]:
        rv = FDNReverb(sr, pre_delay_seconds=pre)
        rng = np.random.default_rng(12)
        x1 = jnp.asarray(rng.standard_normal((2, 777)))
        x2 = jnp.asarray(rng.standard_normal((2, 300)))
        s1 = rv.init_state((2,), jnp.float64)
        s2 = rv.init_state((2,), jnp.float64)
        s1, y1 = rv.process(s1, x1)
        s2, y2 = rv.process_scan(s2, x1)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-12)
        s1, y1 = rv.process(s1, x2)
        s2, y2 = rv.process_scan(s2, x2)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-12)
        np.testing.assert_allclose(np.asarray(s1["lines"]),
                                   np.asarray(s2["lines"]), atol=1e-12)


def test_fdn_process_blocks_matches_scan_blocks(rng):
    """The FDN's single-scan streamed driver (one ring<->linear
    conversion for the whole run) matches generic scan_blocks over
    `process` — same per-block algebra."""
    import functools
    import jax
    from algodsp_tpu.streaming import scan_blocks
    rv = FDNReverb(48000.0)
    B = rv._block
    x = jnp.asarray(rng.standard_normal((2, B * 6)) * 0.5, jnp.float64)
    st = rv.init_state((2,), jnp.float64)
    _, y_ref = jax.jit(functools.partial(
        scan_blocks, rv.process, block_size=2 * B))(st, x)
    st_b, y_b = jax.jit(functools.partial(
        rv.process_blocks, block_size=2 * B))(st, x)
    assert snr_db(np.asarray(y_ref), np.asarray(y_b)) > 200.0
    # streamed driver in two calls == one call (state carry exact)
    st1, y1 = jax.jit(rv.process_blocks)(st, x[:, :3 * B])
    st2, y2 = jax.jit(rv.process_blocks)(st1, x[:, 3 * B:])
    stitched = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    assert snr_db(np.asarray(y_b), stitched) > 200.0


def test_fdn_process_blocks_validation(rng):
    rv = FDNReverb(48000.0)
    st = rv.init_state((1,), jnp.float64)
    with pytest.raises(ValueError, match="multiple of the internal"):
        rv.process_blocks(st, jnp.zeros((1, rv._block * 2)),
                          block_size=rv._block + 1)


def test_freeverb_process_blocks_matches_scan_blocks(rng):
    """Freeverb's single-scan streamed driver (layout conversions once
    per run) matches generic scan_blocks over `process`."""
    import functools
    import jax
    from algodsp_tpu.streaming import scan_blocks
    fv = Freeverb()
    x = jnp.asarray(rng.standard_normal((2, 128 * 12)) * 0.5, jnp.float64)
    st = fv.init_state((2,), jnp.float64)
    _, y_ref = jax.jit(functools.partial(
        scan_blocks, fv.process, block_size=256))(st, x)
    st_b, y_b = jax.jit(functools.partial(
        fv.process_blocks, block_size=256))(st, x)
    np.testing.assert_array_equal(np.asarray(y_b), np.asarray(y_ref))
    st1, y1 = jax.jit(fv.process_blocks)(st, x[:, :128 * 6])
    _, y2 = jax.jit(fv.process_blocks)(st1, x[:, 128 * 6:])
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1),
        np.asarray(y_b))
    with pytest.raises(ValueError, match="multiple of the internal"):
        fv.process_blocks(st, x, block_size=100)
