"""Example: time-delay estimation by cross-correlation peak.

`correlate` + `find_peak` + `lag_from_index` recover the integer
sample offset between a signal and a delayed copy — the reference's
correlation workflow (`dsp/conv/correlate.go:16,200` semantics).

Run: python examples/delay_estimation.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.conv import correlate, find_peak, lag_from_index


def main():
    rng = np.random.default_rng(2)
    n, true_delay = 4096, 137
    src = rng.standard_normal(n)
    delayed = np.concatenate([np.zeros(true_delay), src])[:n]
    delayed += 0.1 * rng.standard_normal(n)      # measurement noise

    corr = correlate(jnp.asarray(delayed), jnp.asarray(src))
    idx, peak = find_peak(corr)
    lag = int(lag_from_index(int(idx), n))
    print(f"estimated delay: {lag} samples (true {true_delay})")


if __name__ == "__main__":
    main()
# Output:
# estimated delay: 137 samples (true 137)
