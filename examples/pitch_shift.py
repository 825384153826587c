"""Example: pitch-shift a tone +7 semitones, two algorithms.

WSOLA (time-domain, `pitch_shifter.go:10-44` semantics) and the
phase-vocoder spectral shifter (`pitch_shift_spectral.go:20-36`) both
move 440 Hz to ~659 Hz (a perfect fifth); the dominant output
frequency is read back with a Goertzel sweep.

Run: python examples/pitch_shift.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.effects.pitch import WSOLAPitchShifter, SpectralPitchShifter
from algodsp_tpu.spectrum import goertzel_power


def dominant_hz(y, sr):
    cands = np.arange(430.0, 900.0, 2.0)
    p = np.asarray(goertzel_power(jnp.asarray(y), cands, sr))
    return float(cands[int(np.argmax(p))])


def main():
    sr = 48000.0
    n = 1 << 16
    t = np.arange(n) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 440.0 * t), jnp.float32)[None, :]
    ratio = 2 ** (7.0 / 12.0)
    target = 440.0 * ratio                      # 659.3 Hz

    for name, shifter in (
            ("wsola", WSOLAPitchShifter(sr, pitch_ratio=ratio)),
            ("spectral", SpectralPitchShifter(sr, pitch_ratio=ratio))):
        y = np.asarray(shifter.process(x))[0]
        got = dominant_hz(y[n // 4: 3 * n // 4], sr)
        ok = abs(got - target) < 6.0
        print(f"{name}: dominant {got:.0f} Hz (target {target:.0f}) "
              f"within 6 Hz: {ok}")


if __name__ == "__main__":
    main()

# Output:
# wsola: dominant 660 Hz (target 659) within 6 Hz: True
# spectral: dominant 660 Hz (target 659) within 6 Hz: True
