"""Mastering chain example: JSON effect graph -> one jitted program.

Builds the kind of chain the reference's web demo ships (compressor ->
EQ -> reverb -> limiter), processes a multichannel program signal, and
meters integrated loudness before and after with the BS.1770/R128 meter.

Run: python examples/mastering_chain.py        (CPU or TPU)
"""

import json

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu.chain import Chain
from algodsp_tpu.measure import loudness
from algodsp_tpu import signal


def main():
    sr = 48000.0
    n = 1 << 16

    graph = {
        "nodes": [
            {"id": "comp", "type": "dyn-compressor",
             "params": {"thresholdDB": -24.0, "ratio": 3.0,
                        "attackMs": 10.0, "releaseMs": 120.0}},
            {"id": "eq", "type": "filter-peak",
             "params": {"freqHz": 3000.0, "gainDB": 2.5, "q": 1.0}},
            {"id": "verb", "type": "reverb", "params": {"wet": 0.12}},
            {"id": "lim", "type": "dyn-limiter",
             "params": {"thresholdDB": -1.0}},
        ],
        "connections": [
            {"from": "_input", "to": "comp"},
            {"from": "comp", "to": "eq"},
            {"from": "eq", "to": "verb"},
            {"from": "verb", "to": "lim"},
            {"from": "lim", "to": "_output"},
        ],
    }

    chain = Chain(sr)
    chain.load_graph(json.dumps(graph))
    state = chain.init_state((2,), dtype=jnp.float32)

    # program material: tone mixture + pink-noise bed, stereo
    mono = (np.asarray(signal.sine(220.0, 0.5, n, sr))
            + np.asarray(signal.sine(2200.0, 0.3, n, sr))
            + np.asarray(signal.pink_noise(0.05, n, seed=3)))
    x = jnp.asarray(np.stack([mono, 0.8 * mono]), jnp.float32)

    process = jax.jit(chain.process)
    state, y = process(state, x)

    for name, sig in (("input ", x), ("output", y)):
        r = loudness.measure(np.asarray(sig, np.float64), sr)
        print(f"{name}: integrated {r.integrated_lufs:+.2f} LUFS, "
              f"peak {float(jnp.max(jnp.abs(sig))):.3f}")


if __name__ == "__main__":
    main()
