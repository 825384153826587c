"""On-device multi-block streaming (`algodsp_tpu/streaming.py`).

The contract: `scan_blocks(fn, state, x, block_size=B)` produces the
SAME floats as the block-at-a-time loop the reference prescribes
(`dsp/conv/partitioned.go:348-396` fixed-latency streaming), for every
stateful processor — feedback reverbs, delays, dynamics ballistics,
two-signal processors, and whole effect-chain graphs.
"""

import functools
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from algodsp_tpu.streaming import scan_blocks, split_blocks, merge_blocks

SR = 48000.0


def run_blockwise(process_fn, state, *signals, block_size):
    """Reference driver: the plain Python per-block loop."""
    n = signals[0].shape[-1]
    outs = []
    for i in range(0, n, block_size):
        blocks = tuple(s[..., i:i + block_size] for s in signals)
        state, y = process_fn(state, *blocks)
        outs.append(np.asarray(y))
    return state, np.concatenate(outs, axis=-1)


def assert_states_equal(a, b):
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_split_merge_roundtrip():
    x = jnp.arange(2 * 3 * 12, dtype=jnp.float32).reshape(2, 3, 12)
    xb = split_blocks(x, 4)
    assert xb.shape == (3, 2, 3, 4)
    np.testing.assert_array_equal(np.asarray(merge_blocks(xb)), np.asarray(x))
    with pytest.raises(ValueError):
        split_blocks(x, 5)


@pytest.mark.parametrize("make", [
    lambda: __import__("algodsp_tpu.effects.reverb", fromlist=["Freeverb"]
                       ).Freeverb(),
    lambda: __import__("algodsp_tpu.effects.reverb", fromlist=["FDNReverb"]
                       ).FDNReverb(SR),
], ids=["freeverb", "fdn"])
def test_reverb_streaming_exact(make, rng):
    """Feedback reverbs: comb/allpass rings carried across blocks."""
    fx = make()
    x = jnp.asarray(rng.standard_normal((4, 8 * 512)) * 0.3, jnp.float32)
    s0 = fx.init_state((4,))
    s_ref, y_ref = run_blockwise(jax.jit(fx.process), s0, x, block_size=512)
    f = jax.jit(functools.partial(scan_blocks, fx.process, block_size=512))
    s_got, y_got = f(s0, x)
    np.testing.assert_array_equal(np.asarray(y_got), y_ref)
    assert_states_equal(s_got, s_ref)


def test_delay_streaming_exact(rng):
    from algodsp_tpu.effects.delay_effect import Delay
    dl = Delay(SR)
    x = jnp.asarray(rng.standard_normal((2, 16 * 256)), jnp.float32)
    s0 = dl.init_state((2,))
    s_ref, y_ref = run_blockwise(jax.jit(dl.process), s0, x, block_size=256)
    f = jax.jit(functools.partial(scan_blocks, dl.process, block_size=256))
    s_got, y_got = f(s0, x)
    np.testing.assert_array_equal(np.asarray(y_got), y_ref)
    assert_states_equal(s_got, s_ref)


def test_compressor_streaming_exact(rng):
    """Dynamics ballistics (branching envelope) carried across blocks."""
    from algodsp_tpu.effects.dynamics import Compressor
    comp = Compressor(SR)
    x = jnp.asarray(rng.standard_normal((8, 8 * 1024)), jnp.float32)
    s0 = comp.init_state((8,))
    step = lambda s, xb: comp.process(s, xb)
    s_ref, y_ref = run_blockwise(jax.jit(step), s0, x, block_size=1024)
    f = jax.jit(functools.partial(scan_blocks, step, block_size=1024))
    s_got, y_got = f(s0, x)
    np.testing.assert_array_equal(np.asarray(y_got), y_ref)
    assert_states_equal(s_got, s_ref)


def test_vocoder_two_signal_streaming(rng):
    """Multi-input processors: modulator + carrier both block-split."""
    from algodsp_tpu.effects.vocoder import Vocoder
    voc = Vocoder(SR)
    mod = jnp.asarray(rng.standard_normal((2, 4 * 1024)), jnp.float32)
    car = jnp.asarray(rng.standard_normal((2, 4 * 1024)), jnp.float32)
    s0 = voc.init_state((2,))
    s_ref, y_ref = run_blockwise(jax.jit(voc.process), s0, mod, car,
                                 block_size=1024)
    f = jax.jit(functools.partial(scan_blocks, voc.process, block_size=1024))
    s_got, y_got = f(s0, mod, car)
    np.testing.assert_array_equal(np.asarray(y_got), y_ref)
    assert_states_equal(s_got, s_ref)


def test_chain_process_blocks_config4(rng):
    """BASELINE config 4 (compressor + Freeverb + chorus + feedback
    delay) streamed as one program == block-at-a-time `process`."""
    from algodsp_tpu.chain import Chain
    c = Chain(SR, block_size=512)
    c.load_graph(json.dumps({
        "nodes": [
            {"id": "comp", "type": "dyn-compressor",
             "params": {"thresholdDB": -20.0, "ratio": 4.0}},
            {"id": "rev", "type": "reverb-freeverb",
             "params": {"wet": 0.2, "dry": 1.0}},
            {"id": "cho", "type": "chorus", "params": {"mix": 0.4}},
            {"id": "del", "type": "delay",
             "params": {"time": 0.1, "feedback": 0.3, "mix": 0.25}},
        ],
        "connections": [
            {"from": "_input", "to": "comp"},
            {"from": "comp", "to": "rev"},
            {"from": "rev", "to": "cho"},
            {"from": "cho", "to": "del"},
            {"from": "del", "to": "_output"},
        ]}))
    x = jnp.asarray(rng.standard_normal((4, 16 * 512)) * 0.3, jnp.float32)
    s0 = c.init_state((4,))
    s_ref, y_ref = run_blockwise(jax.jit(c.process), s0, x, block_size=512)
    f = jax.jit(c.process_blocks)
    s_got, y_got = f(s0, x)
    # the chorus's fractional-delay interpolation picks up f32 roundoff
    # from different XLA fusion inside the scan body vs the standalone
    # jit; the semantics (carried state, block boundaries) are identical
    np.testing.assert_allclose(np.asarray(y_got), y_ref, atol=2e-5)
    for la, lb in zip(jax.tree_util.tree_leaves(s_got),
                      jax.tree_util.tree_leaves(s_ref)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=2e-5)


def test_chain_process_blocks_sidechain(rng):
    """Sidechain edges survive the scan (the compressor keys off a
    separate node's output inside every block)."""
    from algodsp_tpu.chain import Chain
    c = Chain(SR, block_size=256)
    c.load_graph(json.dumps({
        "nodes": [
            {"id": "key", "type": "filter-lowpass",
             "params": {"freq": 200.0}},
            {"id": "comp", "type": "dyn-compressor",
             "params": {"thresholdDB": -30.0, "ratio": 8.0}},
        ],
        "connections": [
            {"from": "_input", "to": "comp"},
            {"from": "_input", "to": "key"},
            {"from": "key", "to": "comp", "toPort": 1},
            {"from": "comp", "to": "_output"},
        ]}))
    x = jnp.asarray(rng.standard_normal((2, 8 * 256)), jnp.float32)
    s0 = c.init_state((2,))
    s_ref, y_ref = run_blockwise(jax.jit(c.process), s0, x, block_size=256)
    s_got, y_got = jax.jit(c.process_blocks)(s0, x)
    np.testing.assert_array_equal(np.asarray(y_got), y_ref)
    assert_states_equal(s_got, s_ref)


def test_unroll_is_equivalent(rng):
    from algodsp_tpu.effects.reverb import Freeverb
    fv = Freeverb()
    x = jnp.asarray(rng.standard_normal((2, 8 * 512)) * 0.3, jnp.float32)
    s0 = fv.init_state((2,))
    _, y1 = jax.jit(functools.partial(
        scan_blocks, fv.process, block_size=512, unroll=1))(s0, x)
    _, y4 = jax.jit(functools.partial(
        scan_blocks, fv.process, block_size=512, unroll=4))(s0, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y4), atol=1e-6)
