"""Example: multirate octave analyzer band levels.

Pink noise has equal energy per octave, so an octave analyzer reads
roughly flat band levels (within the noise realization and band-edge
effects) — the classic sanity check for the analyzer
(`dsp/filter/bank/analyzer.go:136-346` semantics: per-band-group
decimation, per-band envelope followers).

Run: python examples/octave_analyzer.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.filters.bank import MultirateOctaveAnalyzer
from algodsp_tpu import signal


def main():
    sr = 48000.0
    an = MultirateOctaveAnalyzer(1, sr)
    x = signal.pink_noise(1.0, 1 << 16, seed=7).astype(jnp.float32)[None]
    state = an.init_state((1,))
    state, levels = an.process(state, x)
    levels_db = 20 * np.log10(np.maximum(np.asarray(levels)[0], 1e-9))
    centers = [b.center_hz for b in an.band_info]
    rates = sorted({b.sample_rate for b in an.band_info})
    spread = float(levels_db[2:].max() - levels_db[2:].min())
    print(f"bands: {len(centers)}  "
          f"centers: {centers[0]:.1f}..{centers[-1]:.0f} Hz  "
          f"band rates: {len(rates)}")
    print(f"mid/high-band spread for pink noise: {spread:.1f} dB "
          f"(roughly flat)")


if __name__ == "__main__":
    main()
# Output:
# bands: 10
