"""Example: time- and frequency-domain signal statistics.

The single-pass moment statistics (`stats/time/stats.go:66-170`
parity: DC, RMS, crest, zero crossings, kurtosis) and spectral
descriptors (`stats/frequency/stats.go:58-148`: centroid, flatness)
separate three very different signals — a sine, white noise, and a
square wave — plus the mergeable streaming variant.

Run: python examples/signal_stats.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.stats import time as tstats
from algodsp_tpu.stats import frequency as fstats
from algodsp_tpu import window as win
from algodsp_tpu.signal import white_noise


def main():
    sr, n = 48000.0, 1 << 14
    t = np.arange(n) / sr
    sine = np.sin(2 * np.pi * 1000.0 * t)
    square = np.sign(np.sin(2 * np.pi * 1000.0 * t))
    noise = np.asarray(white_noise(1.0, n, seed=3))

    print(f"{'signal':<8} {'rms':>6} {'crest':>6} {'kurt':>6} "
          f"{'centroid':>9} {'flatness':>9}")
    for name, x in [("sine", sine), ("square", square), ("noise", noise)]:
        ts = tstats.calculate(jnp.asarray(x))
        w = win.generate(win.WindowType.HANN, n)
        mag = jnp.abs(jnp.fft.rfft(jnp.asarray(x) * w))
        fs = fstats.calculate(mag, sr)
        print(f"{name:<8} {float(ts.rms):>6.3f} {float(ts.crest):>6.2f} "
              f"{float(ts.kurtosis):>6.2f} {float(fs.centroid_hz):>8.0f}  "
              f"{float(fs.flatness):>8.3f}")

    # streaming stats fold blocks in and merge == one shot
    # (stats.go:285-410 semantics; Chan parallel moment merging)
    a = tstats.StreamingStats()
    b = tstats.StreamingStats()
    for i in range(0, n // 2, 4096):
        a.update(noise[i:i + 4096])
    for i in range(n // 2, n, 4096):
        b.update(noise[i:i + 4096])
    merged = a.merge(b).result()
    one = tstats.calculate(jnp.asarray(noise))
    print(f"streaming merge == one-shot rms: "
          f"{abs(merged.rms - float(one.rms)) < 1e-6}")


if __name__ == "__main__":
    main()
# Output:
# sine      0.707   1.41   1.50     1000     0.000
# square    1.000   1.00   1.00     2025     0.005
# noise     0.582   1.72   1.79    12190     0.561
# streaming merge == one-shot rms: True
