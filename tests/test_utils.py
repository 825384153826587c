"""utils: checkpoint, irlib, profiling helpers."""

import io
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.utils.checkpoint import save_state, load_state
from algodsp_tpu.utils.irlib import write_irlib, read_irlib, builtin_irs
from algodsp_tpu.utils.profiling import (
    measure_op, biquad_cascade_flops, fft_conv_flops)
from algodsp_tpu.filters import BiquadChain, design


def test_checkpoint_roundtrip_chain_state():
    chain = BiquadChain(design.butterworth_lp(1000.0, 6, 48000.0))
    state = chain.init_state((4,), dtype=jnp.float64)
    rng = np.random.default_rng(1)
    state, _ = chain.process_stream(state, jnp.asarray(rng.standard_normal((4, 512))))

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "state.npz")
        save_state(path, state)
        restored = load_state(path, chain.init_state((4,), dtype=jnp.float64))
    np.testing.assert_array_equal(np.asarray(state), np.asarray(restored))
    # resumed processing is identical
    x = jnp.asarray(rng.standard_normal((4, 256)))
    _, y1 = chain.process_stream(state, x)
    _, y2 = chain.process_stream(restored, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_checkpoint_nested_dict_state():
    from algodsp_tpu.effects.dynamics import Compressor
    comp = Compressor(48000.0)
    state = comp.init_state((2,), dtype=jnp.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "c.npz")
        save_state(path, state)
        restored = load_state(path, comp.init_state((2,), dtype=jnp.float32))
    for a, b in zip(jnp.asarray(state["envelope"]), restored["envelope"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_irlib_roundtrip():
    rng = np.random.default_rng(2)
    irs = {"a": (48000.0, rng.standard_normal(100).astype(np.float32)),
           "b äö": (44100.0, rng.standard_normal(7).astype(np.float32))}
    buf = io.BytesIO()
    write_irlib(buf, irs)
    buf.seek(0)
    back = read_irlib(buf)
    assert set(back) == {"a", "b äö"}
    for k in irs:
        assert back[k][0] == irs[k][0]
        np.testing.assert_array_equal(back[k][1], irs[k][1])


def test_irlib_bad_magic():
    import pytest
    with pytest.raises(ValueError):
        read_irlib(io.BytesIO(b"NOPE" + b"\x00" * 16))


def test_builtin_irs_usable_in_reverb():
    irs = builtin_irs(48000.0)
    assert "large-hall" in irs
    sr, ir = irs["small-room"]
    assert sr == 48000.0
    assert np.abs(ir).max() <= 1.0
    from algodsp_tpu.effects.reverb import ConvolutionReverb
    rv = ConvolutionReverb(ir, min_block_order=9)
    state = rv.init_state(dtype=jnp.float64)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(1024))
    _, y = rv.process(state, x)
    assert np.all(np.isfinite(np.asarray(y)))


def test_measure_op_and_flop_models():
    import jax
    f = jax.jit(lambda x: x * 2.0)
    m = measure_op(f, jnp.ones(1024), reps=2, flops=1024,
                   bytes_accessed=8192)
    assert m.seconds > 0
    assert m.achieved_flops > 0
    assert m.flops_roofline_pct is not None
    assert biquad_cascade_flops(8, 48000, 10) == 2 * 8 * 48000 * 10 * 128
    assert fft_conv_flops(8, 1 << 17, 2048) > 0


def test_testutil_helpers():
    from algodsp_tpu import testutil
    s = testutil.sine(1000.0, 48000.0, 480)
    assert abs(s[12]) <= 1.0
    n1 = testutil.seeded_noise(64, seed=5)
    n2 = testutil.seeded_noise(64, seed=5)
    np.testing.assert_array_equal(n1, n2)
    assert testutil.impulse(8, 3)[3] == 1.0
    assert testutil.snr_db(s, s) == np.inf
    assert testutil.max_abs_diff([1.0], [1.5]) == 0.5
    import pytest
    with pytest.raises(AssertionError):
        testutil.require_slice_nearly_equal([0.0], [1.0], 1e-9)


def test_lagrange_interpolator_wrapper():
    from algodsp_tpu.interp import LagrangeInterpolator
    li1 = LagrangeInterpolator(1)
    assert abs(float(li1.interpolate(jnp.asarray([2.0, 4.0]), 0.25)) - 2.5) < 1e-12
    li3 = LagrangeInterpolator(3)
    pts = jnp.asarray([0.0, 1.0, 2.0, 3.0])
    assert abs(float(li3.interpolate(pts, 0.5)) - 1.5) < 1e-12


def test_donated_jit_state_stream():
    from algodsp_tpu.utils import donated_jit
    from algodsp_tpu.filters import BiquadChain, design
    chain = BiquadChain(design.lowpass(1000.0, 1.0, 48000.0))
    proc = donated_jit(chain.process_stream)
    state = chain.init_state((2,), dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 256)),
                    jnp.float32)
    state, y1 = proc(state, x)
    state, y2 = proc(state, x)
    assert np.asarray(y2).shape == (2, 256)
