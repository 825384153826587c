"""Example: streaming FFT convolution engines agree with direct conv.

The three streaming convolvers (`dsp/conv` parity: overlap-save
`overlap_save.go:126`, overlap-add `overlap_add.go:44`, and the
fixed-latency partitioned FDL engine `partitioned.go:335`) process a
signal in independent chunks with explicit carried state, and every
one reconstructs the single-shot direct convolution exactly.

Run: python examples/streaming_convolution.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.conv import (OverlapSave, OverlapAdd, PartitionedConvolver,
                              convolve)


def main():
    rng = np.random.default_rng(11)
    kernel = rng.standard_normal(257).astype(np.float32) * 0.05
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    ref = np.asarray(convolve(jnp.asarray(x), jnp.asarray(kernel),
                              mode="full"))[:, :8192]

    for name, eng in [("overlap-save", OverlapSave(kernel)),
                      ("overlap-add", OverlapAdd(kernel, block_size=1024))]:
        state = eng.init_state((2,))
        outs = []
        for i in range(0, 8192, 1024):
            state, y = eng.process_stream(state, jnp.asarray(x[:, i:i + 1024]))
            outs.append(np.asarray(y))
        err = np.abs(np.concatenate(outs, -1) - ref).max()
        print(f"{name:<14} streamed == direct: {err < 1e-4}")

    part = PartitionedConvolver(kernel, min_block_order=8)
    state = part.init_state((2,))
    outs = []
    for i in range(0, 8192, 256):
        state, y = part.process_block(state, jnp.asarray(x[:, i:i + 256]))
        outs.append(np.asarray(y))
    got = np.concatenate(outs, -1)
    err = np.abs(got - ref[:, :got.shape[-1]]).max()
    print(f"partitioned    streamed == direct: {err < 1e-4} "
          f"(latency {part.latency} samples)")


if __name__ == "__main__":
    main()
# Output:
# overlap-save   streamed == direct: True
# overlap-add    streamed == direct: True
# partitioned    streamed == direct: True (latency 256 samples)
