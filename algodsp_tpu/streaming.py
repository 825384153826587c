"""On-device multi-block streaming: run MANY latency blocks per dispatch.

The real-time contract of the reference is block-at-a-time processing
with carried state (`dsp/conv/partitioned.go:348-396` fixed-latency
block streaming; every effect's `ProcessInPlace` + `Reset`). On a CPU
that shape is free; through the TPU relay each dispatch costs a ~3-6 ms
floor, so a 64ch x 2048 block (2.7e6 samples of work, ~microseconds of
compute) runs at ~20-30 Msamples/s — dispatch-bound, not compute-bound.

This module keeps the reference's block semantics but amortizes the
floor the TPU-native way: `lax.scan` over the block axis INSIDE one
jitted program, threading each processor's state pytree through the
carry exactly as the per-block driver would. Feedback paths (reverb
combs, delay feedback, envelope ballistics) are preserved bit-for-bit
because the scanned step IS the per-block step — exactness vs the
block-at-a-time loop is asserted in tests/test_streaming.py.

Latency is unchanged (the block size still bounds it); what changes is
how many blocks ride one host<->device round trip. A host feeding audio
in real time would batch the blocks it has ready (or pipeline input
upload with device compute); offline/faster-than-real-time render gets
the full amortization.

Typical use:

    fv = Freeverb()
    state = fv.init_state((64,))
    run = jax.jit(functools.partial(scan_blocks, fv.process,
                                    block_size=2048))
    state, y = run(state, x)            # x: (64, 2048*256) -> 256 blocks

or for an effect chain: `Chain.process_blocks` (chain/chain.py), which
wraps this around the whole compiled graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_blocks(x, block_size: int):
    """(..., N) -> (nb, ..., block_size) with N % block_size == 0."""
    x = jnp.asarray(x)
    n = x.shape[-1]
    if n % block_size:
        raise ValueError(
            f"streaming: signal length {n} is not a multiple of the "
            f"block size {block_size} — pad or trim on the host")
    lead = x.shape[:-1]
    nb = n // block_size
    return jnp.moveaxis(x.reshape(lead + (nb, block_size)), -2, 0)


def merge_blocks(yb):
    """(nb, ..., B) -> (..., nb*B): inverse of `split_blocks`."""
    nb, b = yb.shape[0], yb.shape[-1]
    y = jnp.moveaxis(yb, 0, -2)
    return y.reshape(y.shape[:-2] + (nb * b,))


def scan_blocks(process_fn, state, *signals, block_size: int,
                unroll: int = 1):
    """Stream `process_fn` over consecutive blocks in ONE traced program.

    Args:
      process_fn: `(state, *block_signals) -> (new_state, out)` — any
        stateful per-block processor (effect `.process`, chain
        `.process`, vocoder with its carrier, ...). `out` may be a
        single (..., B) array or a pytree of them (multi-port nodes).
      state: the processor's carry pytree (structure must be
        block-invariant, which every runtime in this package satisfies).
      *signals: one or more (..., N) inputs, split along the last axis
        into N // block_size blocks each (all must share N).
      block_size: the latency block length (the reference's
        2^minBlockOrder contract, `partitioned.go:410`).
      unroll: `lax.scan` unroll factor — a few steps unrolled lets XLA
        overlap the small per-block ops; keep modest to bound code size.

    Returns:
      (final_state, outputs) with every output leaf reassembled to
      (..., nb * block_size) in block order — identical (same floats)
      to calling `process_fn` block by block and concatenating.
    """
    xs = tuple(split_blocks(s, block_size) for s in signals)

    def step(st, blocks):
        return process_fn(st, *blocks)

    final_state, ys = jax.lax.scan(step, state, xs, unroll=unroll)
    return final_state, jax.tree_util.tree_map(merge_blocks, ys)
