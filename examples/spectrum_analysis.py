"""Example: windowed spectrum analysis of a multitone signal.

The analog of the reference's runnable `example_test.go` files
(SURVEY.md §4.5): each example is a small script with checked output.

Run: python examples/spectrum_analysis.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu import window, spectrum, signal

SR = 48000.0
N = 4096

x = signal.multisine([1000.0, 3000.0, 8000.0], 1.0, N, SR, dtype=jnp.float64)
xw = window.apply(x, window.WindowType.BLACKMAN_HARRIS_4TERM, periodic=True)
mag = np.asarray(spectrum.magnitude(jnp.fft.rfft(xw)))
freqs = np.fft.rfftfreq(N, 1 / SR)

peaks = sorted(freqs[np.argsort(mag)[-3:]])
print("detected tones:", [f"{p:.0f} Hz" for p in peaks])

meta = window.info(window.WindowType.BLACKMAN_HARRIS_4TERM)
print(f"window: {meta.name}, ENBW {meta.enbw} bins, sidelobe {meta.highest_sidelobe} dB")
# Output:
# detected tones: ['996 Hz', '3000 Hz', '8004 Hz']
# window: Blackman-Harris 4T, ENBW 2.004 bins, sidelobe -92.0 dB
