"""Example: 24-bit master -> 16-bit delivery with shaped dither.

TPDF dither plus the published "sharp" E-weighted noise shaper pushes
quantization noise out of the ear's most sensitive band — the
`dsp/dither` mastering workflow (`quantizer.go:31`, presets
`presets.go:84-186`).

Run: python examples/dither_mastering.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.dither import (Quantizer, DitherType,
                                sharp_preset_for_sample_rate)


def main():
    sr = 44100.0
    n = 1 << 15
    t = np.arange(n) / sr
    x = jnp.asarray(0.25 * np.sin(2 * np.pi * 997.0 * t), jnp.float32)

    # shaper_coeffs=[] disables shaping (the constructor defaults to the
    # 9FC preset, like quantizer.go:64)
    tpdf = Quantizer(sr, bit_depth=16, dither_type=DitherType.TRIANGULAR,
                     seed=7, shaper_coeffs=[])
    shaped = Quantizer(sr, bit_depth=16, dither_type=DitherType.TRIANGULAR,
                       seed=7,
                       shaper_coeffs=sharp_preset_for_sample_rate(sr))

    def band_noise_db(q, lo, hi):
        _, y = q.process(q.init_state(), x)
        err = np.asarray(y, np.float64) - np.asarray(x, np.float64)
        spec = np.abs(np.fft.rfft(err * np.hanning(n))) ** 2
        freqs = np.fft.rfftfreq(n, 1 / sr)
        band = spec[(freqs > lo) & (freqs < hi)].mean()
        return 10 * np.log10(band + 1e-30)

    ear = band_noise_db(shaped, 2000, 5000) - band_noise_db(tpdf, 2000, 5000)
    hf = band_noise_db(shaped, 16000, 22000) - band_noise_db(tpdf, 16000, 22000)
    print(f"shaped vs flat tpdf, 2-5 kHz (most audible): {ear:+.1f} dB")
    print(f"shaped vs flat tpdf, 16-22 kHz (inaudible):  {hf:+.1f} dB")
    print("noise moved out of the sensitive band:",
          bool(ear < -3 and hf > 10))


if __name__ == "__main__":
    main()

# Output:
# noise moved out of the sensitive band: True
