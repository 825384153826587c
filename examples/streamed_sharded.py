"""Example: real-time streaming COMPOSED with mesh sharding.

The pod deployment shape: many latency blocks per dispatch
(`streaming.scan_blocks`, the reference's block-at-a-time contract
amortized) AND the work sharded over a device mesh (SURVEY.md §2.9).
`parallel/streamed.py` provides both compositions:

  * channel-DP — `scan_blocks_channel_sharded` runs the scan INSIDE
    `shard_map`; each device owns a channel shard of every processor's
    state and the result is bit-identical to the single-device stream
    (channels never communicate — the reference's array-of-mono-
    processors pattern, `measure/loudness/meter.go:80-93`);
  * time-SP — `StreamingConvTimeSharded` shards each block across the
    mesh time axis, exchanging in-block overlap via `ppermute` and
    carrying the block's outgoing tail (psum across the axis) to the
    next scan step — the overlap-save history contract
    (`conv/overlap_save.go:47,92`) made distributed; the streamed
    time-SP compressor runs its selection-fixpoint envelope carry
    every step.

Run: python examples/streamed_sharded.py
(uses however many JAX devices exist; tests force an 8-device CPU mesh)
"""

import functools
import json
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from algodsp_tpu.chain import Chain
    from algodsp_tpu.parallel import (
        make_mesh, scan_blocks_channel_sharded, StreamingConvTimeSharded,
        compressor_stream_time_sharded)
    from algodsp_tpu.streaming import scan_blocks
    from algodsp_tpu.effects.dynamics import Compressor

    sr = 48000.0
    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)

    # ---- channel-DP streamed chain -----------------------------------
    chain = Chain(sr, block_size=512)
    chain.load_graph(json.dumps({
        "nodes": [
            {"id": "comp", "type": "dyn-compressor",
             "params": {"thresholdDB": -20.0, "ratio": 4.0}},
            {"id": "rev", "type": "reverb-freeverb",
             "params": {"wet": 0.2, "dry": 1.0}},
        ],
        "connections": [
            {"from": "_input", "to": "comp"},
            {"from": "comp", "to": "rev"},
            {"from": "rev", "to": "_output"}]}))
    mesh_dp = make_mesh({"channel": n_dev})
    channels = 2 * n_dev
    x = jnp.asarray(rng.standard_normal((channels, 512 * 8)) * 0.5,
                    jnp.float32)
    st = chain.init_state((channels,))
    _, y_sh = jax.jit(functools.partial(
        scan_blocks_channel_sharded, chain.process, mesh=mesh_dp,
        block_size=512))(st, x)
    _, y_ref = jax.jit(functools.partial(
        scan_blocks, chain.process, block_size=512))(st, x)
    diff = float(jnp.max(jnp.abs(y_sh - y_ref)))
    print(f"channel-DP streamed chain over {n_dev} devices: "
          f"max |sharded - single| = {diff} (bit-exact)")
    assert diff == 0.0

    # ---- time-SP streamed convolution + compressor -------------------
    mesh = (make_mesh({"channel": 2, "time": n_dev // 2})
            if n_dev % 2 == 0 and n_dev > 2
            else make_mesh({"time": n_dev}))
    klen = 700
    kernel = rng.standard_normal(klen) * np.exp(-np.arange(klen) / 200.0)
    conv = StreamingConvTimeSharded(kernel, mesh,
                                    channel_axis_name=(
                                        "channel" if "channel" in mesh.shape
                                        else None))
    comp = Compressor(sr, threshold_db=-18.0, ratio=3.0)
    n_time = mesh.shape["time"]
    block = 128 * n_time
    xs = jnp.asarray(rng.standard_normal((4, block * 4)), jnp.float32)

    def step(stt, xb):
        cst, y = conv.process(stt["conv"], xb)
        from algodsp_tpu.parallel import compressor_time_sharded
        dst, y = compressor_time_sharded(
            comp, stt["comp"], y, mesh,
            channel_axis_name=("channel" if "channel" in mesh.shape
                               else None))
        return {"conv": cst, "comp": dst}, y

    st0 = {"conv": conv.init_state((4,)),
           "comp": comp.init_state((4,))}
    _, y = jax.jit(functools.partial(
        scan_blocks, step, block_size=block))(st0, xs)

    ref = np.stack([np.convolve(np.asarray(xs, np.float64)[c],
                                kernel)[:xs.shape[-1]]
                    for c in range(4)])
    _, y_serial = jax.jit(comp.process)(
        comp.init_state((4,)), jnp.asarray(ref, jnp.float32))
    err = np.asarray(y, np.float64) - np.asarray(y_serial, np.float64)
    snr = 10 * np.log10(np.sum(np.asarray(y_serial, np.float64) ** 2)
                        / max(np.sum(err ** 2), 1e-300))
    print(f"time-SP streamed conv+compressor over mesh {dict(mesh.shape)}: "
          f"{snr:.1f} dB vs the serial oracle")
    assert snr > 100.0
    print("ok")


if __name__ == "__main__":
    main()
