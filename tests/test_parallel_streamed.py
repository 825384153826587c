"""Streaming x sharding composition (parallel/streamed.py).

Exactness contracts on the 8-device CPU mesh:
  * channel-DP streamed chain == single-device scan_blocks (same floats)
  * time-SP streaming convolution == unsharded causal convolution
  * time-SP streamed compressor == unsharded engine on the full signal

The reference's streaming state carry (`dsp/conv/partitioned.go:348-396`,
`overlap_save.go:47,92`) mapped onto channel/time sharding — the
SURVEY.md §2.9 SP row composed with the multi-block streaming driver.
"""

import json
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import snr_db
from algodsp_tpu.parallel import (
    make_mesh, scan_blocks_channel_sharded, compressor_stream_time_sharded,
    StreamingConvTimeSharded)
from algodsp_tpu.streaming import scan_blocks


def _config4_chain(sr=48000.0, block=512):
    from algodsp_tpu.chain import Chain
    c = Chain(sr, block_size=block)
    c.load_graph(json.dumps({
        "nodes": [
            {"id": "comp", "type": "dyn-compressor",
             "params": {"thresholdDB": -20.0, "ratio": 4.0}},
            {"id": "rev", "type": "reverb-freeverb",
             "params": {"wet": 0.2, "dry": 1.0}},
            {"id": "cho", "type": "chorus", "params": {"mix": 0.4}},
            {"id": "del", "type": "delay",
             "params": {"time": 0.05, "feedback": 0.3, "mix": 0.25}},
        ],
        "connections": [
            {"from": "_input", "to": "comp"},
            {"from": "comp", "to": "rev"},
            {"from": "rev", "to": "cho"},
            {"from": "cho", "to": "del"},
            {"from": "del", "to": "_output"},
        ]}))
    return c


def test_channel_dp_streamed_chain_exact(rng):
    """config-4 chain, 8 channels over an 8-way channel mesh, 8 blocks
    per dispatch — same floats as the single-device streamed run."""
    chain = _config4_chain(block=256)
    mesh = make_mesh({"channel": 8})
    x = jnp.asarray(rng.standard_normal((8, 256 * 8)) * 0.5, jnp.float32)
    st = chain.init_state((8,))

    st_ref, y_ref = jax.jit(functools.partial(
        scan_blocks, chain.process, block_size=256))(st, x)

    f = jax.jit(functools.partial(
        scan_blocks_channel_sharded, chain.process, mesh=mesh,
        block_size=256))
    st_sh, y_sh = f(st, x)
    np.testing.assert_array_equal(np.asarray(y_sh), np.asarray(y_ref))
    for a, b in zip(jax.tree_util.tree_leaves(st_sh),
                    jax.tree_util.tree_leaves(st_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_channel_dp_streamed_effect_exact(rng):
    """Freeverb under a 4-way channel mesh (channels > shards: 2 rows
    per device)."""
    from algodsp_tpu.effects.reverb import Freeverb
    fv = Freeverb()
    mesh = make_mesh({"channel": 4}, devices=jax.devices()[:4])
    x = jnp.asarray(rng.standard_normal((8, 512 * 6)) * 0.3, jnp.float32)
    st = fv.init_state((8,))
    _, y_ref = jax.jit(functools.partial(
        scan_blocks, fv.process, block_size=512))(st, x)
    _, y_sh = jax.jit(functools.partial(
        scan_blocks_channel_sharded, fv.process, mesh=mesh,
        block_size=512))(st, x)
    np.testing.assert_array_equal(np.asarray(y_sh), np.asarray(y_ref))


def test_channel_dp_streamed_vocoder_two_signals(rng):
    """Two-signal processors (modulator + carrier) stream sharded too."""
    from algodsp_tpu.effects.vocoder import Vocoder
    voc = Vocoder(48000.0)
    mesh = make_mesh({"channel": 8})
    x = jnp.asarray(rng.standard_normal((8, 256 * 4)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((8, 256 * 4)), jnp.float32)
    st = voc.init_state((8,))
    _, y_ref = jax.jit(functools.partial(
        scan_blocks, voc.process, block_size=256))(st, x, c)
    _, y_sh = jax.jit(functools.partial(
        scan_blocks_channel_sharded, voc.process, mesh=mesh,
        block_size=256))(st, x, c)
    # banded f32 ops get shape-dependent XLA codegen at local batch 1,
    # so parity is ulp-level, not bit-exact like the chain/Freeverb
    assert snr_db(np.asarray(y_ref), np.asarray(y_sh)) > 120.0


@pytest.mark.parametrize("klen,block,nblocks", [
    (64, 512, 4),      # kernel < shard slice
    (700, 512, 4),     # kernel spans multiple shards' slices
    (2000, 512, 5),    # kernel longer than a whole block (tail carries
                       # across several scan steps)
])
def test_time_sp_streaming_conv_exact(rng, klen, block, nblocks):
    mesh = make_mesh({"channel": 2, "time": 4})
    k = rng.standard_normal(klen) * np.exp(-np.arange(klen) / (klen / 4))
    x = rng.standard_normal((4, block * nblocks))
    conv = StreamingConvTimeSharded(k, mesh)
    st = conv.init_state((4,), dtype=jnp.float64)
    f = jax.jit(functools.partial(conv.stream, block_size=block))
    _, y = f(st, jnp.asarray(x))
    ref = np.stack([np.convolve(x[c], k)[:x.shape[-1]]
                    for c in range(x.shape[0])])
    assert snr_db(ref, y) > 200.0


def test_time_sp_streaming_conv_block_by_block_matches_stream(rng):
    """One-dispatch scan == per-block process calls (state carry is the
    same floats)."""
    mesh = make_mesh({"time": 8})
    k = rng.standard_normal(300)
    x = jnp.asarray(rng.standard_normal((2, 256 * 3)))
    conv = StreamingConvTimeSharded(k, mesh, channel_axis_name=None)
    st = conv.init_state((2,), dtype=jnp.float64)
    _, y_stream = jax.jit(functools.partial(
        conv.stream, block_size=256))(st, x)
    st2 = conv.init_state((2,), dtype=jnp.float64)
    proc = jax.jit(conv.process)
    outs = []
    for b in range(3):
        st2, yb = proc(st2, x[:, b * 256:(b + 1) * 256])
        outs.append(np.asarray(yb))
    np.testing.assert_array_equal(np.concatenate(outs, axis=-1),
                                  np.asarray(y_stream))


@pytest.mark.parametrize("detector", ["peak", "rms"])
def test_time_sp_streamed_compressor_matches_engine(rng, detector):
    from algodsp_tpu.effects.dynamics import Compressor
    from algodsp_tpu.effects.dynamics.core import DetectorMode
    sr = 48000.0
    kw = dict(threshold_db=-18.0, ratio=3.0, attack_ms=2.0,
              release_ms=40.0)
    if detector == "rms":
        kw.update(detector_mode=DetectorMode.RMS, rms_window_ms=4.0)
    comp = Compressor(sr, **kw)
    mesh = make_mesh({"channel": 2, "time": 4})
    x = jnp.asarray(
        rng.standard_normal((4, 512 * 4)) *
        np.concatenate([np.full(512 * 2, 1.0), np.full(512 * 2, 0.05)]),
        jnp.float64)
    st_ref, y_ref = jax.jit(comp.process)(
        comp.init_state((4,), dtype=jnp.float64), x)
    st = comp.init_state((4,), dtype=jnp.float64)
    f = jax.jit(functools.partial(
        compressor_stream_time_sharded, comp, mesh=mesh, block_size=512))
    st_out, y = f(st, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_out["envelope"]),
                               np.asarray(st_ref["envelope"]),
                               rtol=1e-9, atol=1e-12)


def test_streamed_sharded_pipeline_conv_then_compressor(rng):
    """The flagship streamed shape: folded-IR streaming conv feeding a
    streamed time-SP compressor, all per-step collectives inside one
    scanned program."""
    from algodsp_tpu.effects.dynamics import Compressor
    mesh = make_mesh({"channel": 2, "time": 4})
    sr = 48000.0
    klen, block, nb = 900, 512, 4
    k = (rng.standard_normal(klen)
         * np.exp(-np.arange(klen) / 200.0)) * 0.2
    comp = Compressor(sr, threshold_db=-20.0, ratio=4.0)
    conv = StreamingConvTimeSharded(k, mesh)
    x = jnp.asarray(rng.standard_normal((4, block * nb)), jnp.float64)

    from algodsp_tpu.parallel import compressor_time_sharded

    def step(st, xb):
        cst, y = conv.process(st["conv"], xb)
        dst, y = compressor_time_sharded(comp, st["comp"], y, mesh)
        return {"conv": cst, "comp": dst}, y

    st0 = {"conv": conv.init_state((4,), dtype=jnp.float64),
           "comp": comp.init_state((4,), dtype=jnp.float64)}
    _, y = jax.jit(functools.partial(
        scan_blocks, step, block_size=block))(st0, x)

    ref = np.stack([np.convolve(np.asarray(x)[c], k)[:x.shape[-1]]
                    for c in range(x.shape[0])])
    _, y_ref = jax.jit(comp.process)(
        comp.init_state((4,), dtype=jnp.float64), jnp.asarray(ref))
    assert snr_db(np.asarray(y_ref), np.asarray(y)) > 180.0
