"""LTI fusion: collapse whole linear pipelines into one convolution.

Two levels of the same algebra:

1. `conv.folded_convolver` — fold an IIR biquad chain directly into a
   following convolution's kernel (the headline bench formulation:
   cascade + conv reverb = ONE fused FDL pass, 2.9 -> 3.8 Gsamples/s on
   a v5e chip).
2. `Chain.fuse_lti()` — the effect-graph compiler pass: straight-line
   runs of LTI nodes (filters, delays, conv reverb, bypassed nodes)
   collapse into a single FIR node; dynamics/sidechains break runs.

Reference contrast: the Go library always executes nodes one by one
(`dsp/effectchain/chain_process.go:24-30`).

Run: python examples/lti_fusion.py        (CPU or TPU)
"""

import json
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.chain import Chain
from algodsp_tpu.conv import PartitionedConvolver, folded_convolver
from algodsp_tpu.filters import BiquadChain, design
from algodsp_tpu.testutil import snr_db


def main():
    sr = 48000.0
    rng = np.random.default_rng(7)

    # -- 1: chain + reverb folded into one convolver ----------------------
    chain = BiquadChain(design.butterworth_lp(2000.0, 6, sr))
    ir = rng.standard_normal(8192) * np.exp(-np.arange(8192) / 1500.0)
    unfused = PartitionedConvolver(ir, min_block_order=8)
    fused = folded_convolver(chain, ir, min_block_order=8)

    x = jnp.asarray(rng.standard_normal((4, 8192)), jnp.float32)
    y_ref = unfused.process(chain.process(x))
    y_fold = fused.process(x)
    print(f"folded convolver: kernel {fused.kernel_len} taps, "
          f"SNR vs unfused = {snr_db(np.asarray(y_ref, np.float64), np.asarray(y_fold, np.float64)):.0f} dB")

    # -- 2: the graph-compiler pass ---------------------------------------
    graph = json.dumps({
        "nodes": [
            {"id": "rumble", "type": "filter-highpass",
             "params": {"freq": 40, "order": 2}},
            {"id": "presence", "type": "filter-peak",
             "params": {"freq": 3000, "gain": 2.5, "q": 1.0}},
            {"id": "slap", "type": "delay",
             "params": {"time": 0.08, "feedback": 0.3, "mix": 0.2}},
            {"id": "comp", "type": "dyn-compressor",
             "params": {"thresholdDB": -18}},
        ],
        "connections": [
            {"from": "_input", "to": "rumble"},
            {"from": "rumble", "to": "presence"},
            {"from": "presence", "to": "slap"},
            {"from": "slap", "to": "comp"},
            {"from": "comp", "to": "_output"},
        ]})

    # auto_fuse=False keeps the baseline genuinely unfused — round 5
    # made load_graph apply fuse_lti by default
    plain = Chain(sr)
    plain.load_graph(graph, auto_fuse=False)
    opt = Chain(sr)
    report = opt.load_graph(graph)      # auto-fused; returns the report
    for members, klen in report:
        print(f"fused run: {' -> '.join(members)}  ({klen}-tap FIR)")

    xs = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    st_p = plain.init_state(xs.shape[:-1], xs.dtype)
    st_o = opt.init_state(xs.shape[:-1], xs.dtype)
    _, y_p = plain.process(st_p, xs)
    _, y_o = opt.process(st_o, xs)
    snr = snr_db(np.asarray(y_p, np.float64), np.asarray(y_o, np.float64))
    print(f"fused graph == unfused graph: SNR {snr:.0f} dB "
          f"(compressor left unfused, as it must be)")


if __name__ == "__main__":
    main()
