"""Chain LTI fusion pass: runs of LTI nodes collapse to one FIR.

Oracle: the same graph processed unfused. The pass must (a) keep
output within f32 roundoff of the unfused chain, (b) preserve
streaming continuity, (c) refuse to fuse across non-LTI nodes,
fan-out, and sidechain taps.
"""

import json

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.chain import Chain
from algodsp_tpu.testutil import snr_db


def _graph(nodes, connections):
    return json.dumps({"nodes": nodes, "connections": connections})


def _run(chain, x):
    st = chain.init_state(x.shape[:-1], x.dtype)
    _, y = chain.process(st, x)
    return np.asarray(y, np.float64)


def _filters_and_reverb():
    return _graph(
        [{"id": "lp", "type": "filter-lowpass",
          "params": {"freq": 3000, "order": 4}},
         {"id": "pk", "type": "filter-peak",
          "params": {"freq": 800, "gain": 5, "q": 1.2}},
         {"id": "verb", "type": "reverb-conv",
          "params": {"irSeconds": 0.05, "seed": 3, "wet": 0.4, "dry": 0.9}}],
        [{"from": "_input", "to": "lp"}, {"from": "lp", "to": "pk"},
         {"from": "pk", "to": "verb"}, {"from": "verb", "to": "_output"}])


def test_fuse_filters_and_conv_reverb_matches_unfused():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    plain = Chain(48000.0)
    plain.load_graph(_filters_and_reverb(), auto_fuse=False)
    fused = Chain(48000.0)
    fused.load_graph(_filters_and_reverb(), auto_fuse=False)
    report = fused.fuse_lti()
    assert len(report) == 1
    members, klen = report[0]
    assert members == ["lp", "pk", "verb"]
    assert klen > 1000  # carries the reverb IR
    assert snr_db(_run(plain, x), _run(fused, x)) > 100.0


def test_fused_streaming_continuity():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((3, 2048)), jnp.float32)
    fused = Chain(48000.0)
    fused.load_graph(_filters_and_reverb(), auto_fuse=False)
    fused.fuse_lti()
    st = fused.init_state(x.shape[:-1], x.dtype)
    _, y_once = fused.process(st, x)
    st2 = fused.init_state(x.shape[:-1], x.dtype)
    st2, y1 = fused.process(st2, x[..., :1024])
    _, y2 = fused.process(st2, x[..., 1024:])
    stitched = jnp.concatenate([y1, y2], axis=-1)
    assert snr_db(np.asarray(y_once, np.float64),
                  np.asarray(stitched, np.float64)) > 120.0


def test_non_lti_node_breaks_run():
    g = _graph(
        [{"id": "lp", "type": "filter-lowpass", "params": {"freq": 3000}},
         {"id": "comp", "type": "dyn-compressor",
          "params": {"thresholdDB": -20}},
         {"id": "hp", "type": "filter-highpass", "params": {"freq": 100}}],
        [{"from": "_input", "to": "lp"}, {"from": "lp", "to": "comp"},
         {"from": "comp", "to": "hp"}, {"from": "hp", "to": "_output"}])
    c = Chain(48000.0)
    assert c.load_graph(g) == []  # auto-fuse: single-node runs left alone
    assert c.fuse_lti() == []


def test_sidechain_tap_prevents_fusion():
    g = _graph(
        [{"id": "lp", "type": "filter-lowpass", "params": {"freq": 3000}},
         {"id": "pk", "type": "filter-peak", "params": {"freq": 800}},
         {"id": "comp", "type": "dyn-compressor", "params": {}}],
        [{"from": "_input", "to": "lp"}, {"from": "lp", "to": "pk"},
         {"from": "pk", "to": "comp"},
         # lp's output also keys the compressor sidechain: fan-out
         {"from": "lp", "to": "comp", "toPortIndex": 1},
         {"from": "comp", "to": "_output"}])
    c = Chain(48000.0)
    assert c.load_graph(g) == []  # auto-fuse finds nothing either
    assert c.fuse_lti() == []


def test_bypassed_node_joins_run():
    def graph():
        return _graph(
            [{"id": "lp", "type": "filter-lowpass",
              "params": {"freq": 3000, "order": 4}},
             {"id": "comp", "type": "dyn-compressor", "bypassed": True,
              "params": {}},
             {"id": "hp", "type": "filter-highpass",
              "params": {"freq": 120, "order": 2}}],
            [{"from": "_input", "to": "lp"}, {"from": "lp", "to": "comp"},
             {"from": "comp", "to": "hp"}, {"from": "hp", "to": "_output"}])
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4096)), jnp.float32)
    plain = Chain(48000.0)
    plain.load_graph(graph(), auto_fuse=False)
    fused = Chain(48000.0)
    fused.load_graph(graph(), auto_fuse=False)
    report = fused.fuse_lti()
    assert len(report) == 1 and report[0][0] == ["lp", "hp"]
    assert snr_db(_run(plain, x), _run(fused, x)) > 100.0


def test_delay_nodes_fold():
    def graph():
        return _graph(
            [{"id": "d1", "type": "delay-simple", "params": {"delayMs": 5}},
             {"id": "echo", "type": "delay",
              "params": {"time": 0.02, "feedback": 0.5, "mix": 0.3}}],
            [{"from": "_input", "to": "d1"}, {"from": "d1", "to": "echo"},
             {"from": "echo", "to": "_output"}])
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 8192)), jnp.float32)
    plain = Chain(48000.0)
    plain.load_graph(graph(), auto_fuse=False)
    fused = Chain(48000.0)
    fused.load_graph(graph(), auto_fuse=False)
    report = fused.fuse_lti()
    assert len(report) == 1
    assert snr_db(_run(plain, x), _run(fused, x)) > 100.0


def test_max_kernel_len_leaves_run_unfused():
    c = Chain(48000.0)
    c.load_graph(_graph(
        [{"id": "e1", "type": "delay",
          "params": {"time": 1.0, "feedback": 0.9, "mix": 0.5}},
         {"id": "e2", "type": "delay",
          "params": {"time": 0.5, "feedback": 0.9, "mix": 0.5}}],
        [{"from": "_input", "to": "e1"}, {"from": "e1", "to": "e2"},
         {"from": "e2", "to": "_output"}], ), auto_fuse=False)
    assert c.fuse_lti(max_kernel_len=4096) == []


def test_load_graph_auto_fuses_by_default():
    """Round 5: JSON graphs get the fused formulation by default; the
    opt-out keeps the reference's node-by-node execution and matches
    within f32 roundoff."""
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    auto = Chain(48000.0)
    report = auto.load_graph(_filters_and_reverb())
    assert len(report) == 1 and report[0][0] == ["lp", "pk", "verb"]
    manual = Chain(48000.0)
    assert manual.load_graph(_filters_and_reverb(), auto_fuse=False) == []
    assert snr_db(_run(manual, x), _run(auto, x)) > 100.0
