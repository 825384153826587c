"""Example: comparing high-order lowpass design families.

Designs 6th-order lowpass cascades at 1 kHz with every family the
design toolkit offers (`dsp/filter/design/pass` parity:
Butterworth, Chebyshev I/II, elliptic, Bessel, Linkwitz-Riley) and
tabulates the measured magnitude at the band edge and one octave into
the stopband — the classic selectivity/ripple trade-off.

Run: python examples/filter_designers.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from algodsp_tpu.filters import BiquadChain, design


def main():
    sr, fc = 48000.0, 1000.0
    families = [
        ("butterworth", design.butterworth_lp(fc, 6, sr)),
        ("chebyshev1", design.chebyshev1_lp(fc, 6, 1.0, sr)),
        ("chebyshev2", design.chebyshev2_lp(fc, 6, 40.0, sr)),
        ("elliptic", design.elliptic_lp(fc, 6, 1.0, 60.0, sr)),
        ("bessel", design.bessel_lp(fc, 6, sr)),
        ("linkwitz-riley", design.linkwitz_riley_lp(fc, 4, sr)),
    ]
    freqs = np.array([fc, 2 * fc])
    print(f"{'family':<15} {'at fc':>8} {'at 2fc':>8}")
    for name, sos in families:
        mag = BiquadChain(sos).magnitude_db(freqs, sr)
        print(f"{name:<15} {mag[0]:>7.1f}  {mag[1]:>7.1f}")
    # LR crossover property: LP + polarity-matched HP sums flat
    lp = BiquadChain(design.linkwitz_riley_lp(fc, 4, sr))
    hp = BiquadChain(design.linkwitz_riley_hp(fc, 4, sr))
    f = np.geomspace(50.0, 20000.0, 64)
    total = np.abs(lp.response(f, sr) + hp.response(f, sr))
    flat = float(np.max(np.abs(20 * np.log10(total))))
    print(f"LR4 LP+HP reconstruction flat within {flat:.2f} dB")


if __name__ == "__main__":
    main()
# Output:
# butterworth        -3.0    -36.3
# chebyshev1         -0.0    -59.9
# chebyshev2        -32.0    -32.0
# elliptic            0.0    -61.1
# bessel             -3.0    -14.3
# linkwitz-riley     -6.0    -24.7
# LR4 LP+HP reconstruction flat within 0.00 dB
