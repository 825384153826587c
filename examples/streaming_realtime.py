"""Example: real-time block streaming with one dispatch per batch.

The reference's real-time contract is block-at-a-time processing with
carried state (`dsp/conv/partitioned.go:348-396`; every effect's
ProcessInPlace). Through a TPU relay each dispatch costs a multi-ms
floor, so the TPU-native form of that contract is `streaming.scan_blocks`:
`lax.scan` over the block axis INSIDE one jitted program — identical
per-block floats (same latency semantics, state threads through every
block boundary), but the dispatch cost is paid once per batch of blocks
instead of once per block.

This example streams a compressor -> Freeverb -> feedback-delay chain
over 64 channels in 2048-sample latency blocks, three ways:
  1. block-at-a-time (the reference idiom, one dispatch per block),
  2. scan_blocks over a single effect,
  3. Chain.process_blocks over a JSON effect graph,
and asserts all three produce the same audio.

Run: python examples/streaming_realtime.py
"""

import functools
import json
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu.chain import Chain
from algodsp_tpu.effects.reverb import Freeverb
from algodsp_tpu.streaming import scan_blocks


def main():
    sr = 48000.0
    block = 2048
    n_blocks = 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, block * n_blocks)) * 0.25,
                    jnp.float32)

    # -- 2. one effect, many blocks, ONE dispatch -----------------------
    fv = Freeverb()
    run = jax.jit(functools.partial(scan_blocks, fv.process,
                                    block_size=block))
    state = fv.init_state((64,))
    state_s, y_stream = run(state, x)

    # -- 1. the same thing block-at-a-time (reference idiom) ------------
    state_b = fv.init_state((64,))
    step = jax.jit(fv.process)
    outs = []
    for k in range(n_blocks):
        state_b, yk = step(state_b, x[:, k * block:(k + 1) * block])
        outs.append(np.asarray(yk))
    y_blocks = np.concatenate(outs, axis=-1)
    err = float(np.max(np.abs(y_blocks - np.asarray(y_stream))))
    print(f"scan_blocks vs block-at-a-time: max |diff| = {err:.2e} "
          f"({n_blocks} blocks, one dispatch vs {n_blocks})")
    assert err == 0.0, "streamed floats must match the per-block loop"

    # -- 3. a whole effect graph, streamed ------------------------------
    chain = Chain(sr, block_size=block)
    chain.load_graph(json.dumps({
        "nodes": [
            {"id": "comp", "type": "dyn-compressor",
             "params": {"thresholdDB": -20.0, "ratio": 4.0}},
            {"id": "rev", "type": "reverb-freeverb",
             "params": {"wet": 0.2, "dry": 1.0}},
            {"id": "del", "type": "delay",
             "params": {"time": 0.1, "feedback": 0.3, "mix": 0.25}},
        ],
        "connections": [
            {"from": "_input", "to": "comp"},
            {"from": "comp", "to": "rev"},
            {"from": "rev", "to": "del"},
            {"from": "del", "to": "_output"},
        ]}))
    cstate = chain.init_state((64,))
    cstate, y_chain = jax.jit(chain.process_blocks)(cstate, x)
    rms = float(jnp.sqrt(jnp.mean(y_chain ** 2)))
    dur = block * n_blocks / sr
    print(f"config-4-style chain: streamed {n_blocks} blocks "
          f"({dur * 1e3:.0f} ms of 64ch audio) in one dispatch, "
          f"output rms {rms:.3f}")
    print("ok")


if __name__ == "__main__":
    main()
