"""Example: rational polyphase resampling 44.1 kHz -> 48 kHz.

The resampler rationalizes the ratio by continued fractions
(160/147 here), builds a Kaiser-sinc polyphase bank, and runs it as
one strided convolution (`dsp/resample/resample.go:153-292` parity).

Run: python examples/resampling.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.resample import Resampler


def main():
    r = Resampler.for_rates(44100.0, 48000.0)
    print(f"ratio: {r.up}/{r.down}")

    n = 44100
    t = np.arange(n) / 44100.0
    x = jnp.asarray(np.sin(2 * np.pi * 1000.0 * t), jnp.float32)
    y = np.asarray(r.process(x))
    print(f"in {n} samples at 44.1k -> out {y.size} samples at 48k")

    # the 1 kHz tone survives: check frequency by zero-crossing count
    mid = y[2000:-2000]
    zc = np.sum(np.abs(np.diff(np.signbit(mid).astype(int))))
    f_est = zc / 2 * 48000.0 / mid.size
    print(f"tone after resample: {f_est:.0f} Hz")


if __name__ == "__main__":
    main()
# Output:
# ratio: 160/147
# in 44100 samples at 44.1k -> out 48000 samples at 48k
# tone after resample: 1000 Hz
