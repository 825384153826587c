"""Example: compressor static curve and per-block metering.

The 4:1 compressor above its -20 dB threshold maps 0 dBFS to -15 dBFS
(threshold + overshoot/ratio) — the same static curve the reference
exposes for its UI canvases (`dynamics/compressor.go:369`,
`webdemo engine.go:651-672`).

Run: python examples/dynamics_metering.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.effects.dynamics import Compressor


def main():
    sr = 48000.0
    comp = Compressor(sr, threshold_db=-20.0, ratio=4.0, knee_db=0.0,
                      attack_ms=5.0, release_ms=50.0)

    # static transfer curve at three probe levels
    for in_db in (-40.0, -20.0, 0.0):
        lin = 10.0 ** (in_db / 20.0)
        out = float(comp.calculate_output_level(jnp.asarray([lin]))[0])
        print(f"in {in_db:6.1f} dB -> out {20*np.log10(out):6.1f} dB")

    # block processing with gain-reduction metering
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.5 * rng.standard_normal((2, 4096)), jnp.float32)
    state = comp.init_state((2,))
    state, y, gain = comp.process(state, x, with_gain=True)
    print(f"max gain reduction: {-20*np.log10(float(jnp.min(gain))):.1f} dB")


if __name__ == "__main__":
    main()
# Output:
# in  -40.0 dB -> out  -40.0 dB
# in  -20.0 dB -> out  -20.0 dB
# in    0.0 dB -> out  -15.0 dB
