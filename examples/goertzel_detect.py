"""Example: DTMF digit detection with the Goertzel bank.

Eight Goertzel bins at the DTMF row/column frequencies detect which
two tones are present in a keypress — the classic Goertzel use case
(`dsp/spectrum/goertzel.go:41-161` semantics: per-bin tone power from
a streamed block).

Run: python examples/goertzel_detect.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.spectrum import Goertzel

ROWS = [697.0, 770.0, 852.0, 941.0]
COLS = [1209.0, 1336.0, 1477.0, 1633.0]
KEYS = ["123A", "456B", "789C", "*0#D"]


def main():
    sr = 8000.0
    n = 400  # 50 ms, telephony block
    t = np.arange(n) / sr
    # key "5" = row 770 Hz + col 1336 Hz
    x = jnp.asarray(0.5 * np.sin(2 * np.pi * 770.0 * t)
                    + 0.5 * np.sin(2 * np.pi * 1336.0 * t))

    g = Goertzel(ROWS + COLS, sr)
    state = g.init_state()
    state = g.process_block(state, x)
    p = np.asarray(g.power(state))
    row = int(np.argmax(p[:4]))
    col = int(np.argmax(p[4:]))
    print(f"row {ROWS[row]:.0f} Hz, col {COLS[col]:.0f} Hz "
          f"-> key '{KEYS[row][col]}'")


if __name__ == "__main__":
    main()
# Output:
# row 770 Hz, col 1336 Hz -> key '5'
