"""Example: AM envelope extraction with the polyphase IIR Hilbert
transformer.

A 1 kHz carrier amplitude-modulated at 5 Hz: the analytic-signal
magnitude recovers the modulation envelope (reference:
`dsp/filter/hilbert/hilbert64.go:115,152`, closed-form allpass
designer `designer.go:18`).

Run: python examples/hilbert_envelope.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.filters.hilbert import HilbertTransformer, attenuation_from_order_tbw


def main():
    sr = 48000.0
    n = 1 << 15
    t = np.arange(n) / sr
    mod = 0.6 + 0.4 * np.sin(2 * np.pi * 5.0 * t)          # 5 Hz AM
    x = jnp.asarray(mod * np.sin(2 * np.pi * 1000.0 * t), jnp.float32)

    h = HilbertTransformer(number_of_coeffs=8, transition=0.01)
    print(f"designed image rejection: "
          f"{attenuation_from_order_tbw(8, 0.01):.0f} dB")
    env = np.asarray(h.envelope(x))

    # compare against the known modulation (skip group-delay edges)
    err = np.abs(env[2000:-2000] - mod[2000:-2000]).max()
    print(f"max envelope error: {err:.3f} (modulation depth 0.4)")


if __name__ == "__main__":
    main()
# Output:
# designed image rejection: 69 dB
# max envelope error: 0.005 (modulation depth 0.4)
