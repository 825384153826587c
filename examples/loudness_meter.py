"""Example: EBU R128 loudness of a calibrated stereo tone.

BS.1770: a 997 Hz sine at -18 dBFS in both channels measures
-18.0 LUFS integrated (-0.691 - 18 - 3.01 dB sine-to-ms, +3.01 dB
for two channels, +0.7 dB K-weighting shelf at 997 Hz). The meter
runs fully on-device (`measure/loudness/meter.go:225-295` parity,
jittable, incl. 4x-oversampled true peak).

Run: python examples/loudness_meter.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.measure.loudness import Meter


def main():
    sr = 48000.0
    n = 57600  # 1.2 s: six 400 ms gating blocks at 75% overlap
    t = np.arange(n) / sr
    amp = 10.0 ** (-18.0 / 20.0)
    x = jnp.asarray(np.tile(amp * np.sin(2 * np.pi * 997.0 * t), (2, 1)),
                    jnp.float32)

    meter = Meter(sr, channels=2)
    state = meter.init_state()
    state, reading = meter.process(state, x)
    print(f"integrated: {float(reading.integrated_lufs):.1f} LUFS")
    print(f"sample peak: {20*np.log10(float(reading.sample_peaks.max())):.1f} dBFS")
    print(f"true peak:   {20*np.log10(float(reading.true_peaks.max())):.1f} dBTP")

    # loudness range (EBU Tech 3342 — beyond the reference meter):
    # a -20/-30 dBFS tone sequence spans 10 LU
    from algodsp_tpu.measure.loudness import loudness_range
    seg = np.sin(2 * np.pi * 997.0 * np.arange(int(8 * sr)) / sr)
    seq = np.concatenate([10 ** (-20 / 20.0) * seg, 10 ** (-30 / 20.0) * seg])
    lra = float(loudness_range(jnp.asarray(np.tile(seq, (2, 1)),
                                           jnp.float32), sr))
    print(f"LRA of -20/-30 sequence: {lra:.1f} LU")


if __name__ == "__main__":
    main()
# Output:
# integrated: -18.0 LUFS
# sample peak: -18.0 dBFS
# true peak:   -18.0 dBTP
# LRA of -20/-30 sequence: 10.0 LU
