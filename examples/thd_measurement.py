"""Example: THD measurement of a known-distortion tone.

A 997 Hz sine with a -40 dB second harmonic has THD = 1% by
construction; the analyzer recovers it (reference behavior:
`measure/thd/thd.go:66-160`).

Run: python examples/thd_measurement.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from algodsp_tpu.measure import thd


def main():
    sr = 48000.0
    n = 32768
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * 997.0 * t) + 0.01 * np.sin(2 * np.pi * 1994.0 * t)

    result = thd.analyze_signal(x, thd.THDConfig(sample_rate=sr))
    print(f"fundamental: {result.fundamental_freq:.0f} Hz")
    print(f"THD: {100 * result.thd:.2f} %")
    print(f"THD+N: {100 * result.thdn:.2f} %")


if __name__ == "__main__":
    main()
# Output:
# fundamental: 998 Hz
# THD: 0.99 %
