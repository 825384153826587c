"""f32 precision on slow-pole filters: blocked engines vs sequential.

A 60 Hz rumble filter at 48 kHz has complex poles at radius ~0.996 —
the classic worst case for float32 IIR evaluation. This example
measures SNR against a float64 oracle for:

  - the sequential per-sample recurrence in f32 (what the Go reference
    computes when compiled for f32),
  - the blocked Toeplitz engine (modal carry basis + residual drive),
  - the whole-cascade block engine.

The blocked engines come out MORE accurate than the sequential loop:
the Toeplitz matmul accumulates in full precision and the modal carry
basis removes the pole-adjacent cancellations (see ARCHITECTURE.md and
tests/test_precision.py).

Run: python examples/precision_engineering.py        (CPU or TPU)
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.conv.ltifold import chain_impulse_response
from algodsp_tpu.filters import BiquadChain, design
from algodsp_tpu.testutil import snr_db


def _sequential_f32(sos, x):
    """The reference's DF2T recurrence (`section.go:47-53`), in f32."""
    y = np.asarray(x, np.float32).copy()
    for b0, b1, b2, a1, a2 in np.asarray(sos, np.float32):
        d0 = d1 = np.float32(0)
        for i in range(y.size):
            xi = y[i]
            yi = np.float32(b0 * xi + d0)
            d0 = np.float32(b1 * xi - a1 * yi + d1)
            d1 = np.float32(b2 * xi - a2 * yi)
            y[i] = yi
    return y.astype(np.float64)


def main():
    rng = np.random.default_rng(2)
    n = 1 << 14
    x = rng.standard_normal(n)
    xj = jnp.asarray(x, jnp.float32)

    for name, sos in [
            ("60 Hz highpass, order 4", design.butterworth_hp(60.0, 4, 48000.0)),
            ("100 Hz low shelf +6 dB",
             design.butterworth_low_shelf(48000.0, 100.0, 6.0, 4))]:
        ch = BiquadChain(sos)
        ref = np.convolve(x, chain_impulse_response(ch, n))[:n]
        seq = snr_db(ref, _sequential_f32(sos, x))
        blk = snr_db(ref, np.asarray(ch.process(xj, mode="blocked"), np.float64))
        casc = snr_db(ref, np.asarray(ch.process(xj, mode="cascade"), np.float64))
        print(f"{name}:")
        print(f"  sequential f32 loop : {seq:5.1f} dB")
        print(f"  blocked engine      : {blk:5.1f} dB")
        print(f"  whole-cascade engine: {casc:5.1f} dB")


if __name__ == "__main__":
    main()
