"""Convolution reverb: partitioned FDL engine + wet/dry mix.

Capability parity with `dsp/effects/reverb/convolution.go:16-76`:
streaming block convolution with arbitrary-length IRs at latency
2^min_block_order, wet/dry controls.
"""

from __future__ import annotations

import jax.numpy as jnp

from algodsp_tpu.conv.partitioned import PartitionedConvolver


class ConvolutionReverb:
    def __init__(self, kernel, min_block_order: int = 9, *,
                 wet: float = 1.0, dry: float = 1.0):
        self.engine = PartitionedConvolver(kernel, min_block_order)
        self.wet = float(wet)
        self.dry = float(dry)

    @property
    def latency(self) -> int:
        return self.engine.latency

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return self.engine.init_state(batch_shape, dtype)

    def process_block(self, state, x):
        """One latency-block (`convolution.go:59-76`)."""
        state, rev = self.engine.process_block(state, x)
        return state, self.dry * jnp.asarray(x) + self.wet * rev

    def process(self, state, x):
        """Arbitrary multiple-of-block lengths; runs the engine's
        vectorized streaming path (block-axis depthwise FIR) — exact
        per-block semantics without a sequential block scan."""
        x = jnp.asarray(x)
        state, rev = self.engine.process_stream(state, x)
        return state, self.dry * x + self.wet * rev
