"""Example: three reverb architectures measured with the IR analyzer.

Feeds an impulse through Freeverb (Schroeder combs + allpasses,
`dsp/effects/reverb/reverb.go` parity) and the FDN (8-line Hadamard
feedback network, `fdn_reverb.go`), then runs the room-acoustics
analyzer (`measure/ir/ir.go`) on the captured tails: the FDN's T60 is
prescribed by construction, so the measured value must track the
`rt60_seconds` parameter.

Run: python examples/reverb_comparison.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.effects.reverb import Freeverb, FDNReverb
from algodsp_tpu.measure.ir import Analyzer


def main():
    sr = 48000.0
    n = int(3.5 * sr)
    impulse = np.zeros((1, n), np.float32)
    impulse[0, 0] = 1.0
    x = jnp.asarray(impulse)

    fv = Freeverb(wet=1.0, dry=0.0)
    _, tail_fv = fv.process(fv.init_state((1,)), x)

    fdn = FDNReverb(sr, wet=1.0, dry=0.0, rt60_seconds=1.2, damp=0.0,
                    mod_depth_seconds=0.0)
    _, tail_fdn = fdn.process(fdn.init_state((1,)), x)

    an = Analyzer(sr)
    m_fv = an.analyze(np.asarray(tail_fv[0], np.float64))
    m_fdn = an.analyze(np.asarray(tail_fdn[0], np.float64))

    print(f"freeverb: T20 {m_fv.t20:.2f} s, C80 {m_fv.c80:+.1f} dB")
    print(f"fdn (rt60=1.2): T30 within 15% of prescribed: "
          f"{abs(m_fdn.t30 - 1.2) / 1.2 < 0.15}")
    print(f"fdn tail outlasts freeverb's fixed tuning: "
          f"{m_fdn.t30 > m_fv.t30}")


if __name__ == "__main__":
    main()
# Output:
# freeverb: T20 0.46 s, C80 +12.8 dB
# fdn (rt60=1.2): T30 within 15% of prescribed: True
# fdn tail outlasts freeverb's fixed tuning: True
