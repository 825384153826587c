"""Example: a mastering-style effect chain compiled to one XLA program.

Run: python examples/mastering_chain.py
"""

import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu.chain import Chain
from algodsp_tpu.measure import loudness

SR = 48000.0

chain = Chain(SR)
chain.load_graph(json.dumps({
    "nodes": [
        {"id": "eq", "type": "filter-highpass", "params": {"freqHz": 30.0}},
        {"id": "comp", "type": "dyn-compressor",
         "params": {"thresholdDB": -18, "ratio": 3, "attackMs": 20,
                    "releaseMs": 200, "makeupGainDB": 4}},
        {"id": "lim", "type": "dyn-limiter", "params": {"thresholdDB": -1.0}},
    ],
    "connections": [
        {"from": "_input", "to": "eq"},
        {"from": "eq", "to": "comp"},
        {"from": "comp", "to": "lim"},
        {"from": "lim", "to": "_output"},
    ]}))

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((2, 5 * 48000)) * 0.2, jnp.float32)

state = chain.init_state((2,))
state, y = jax.jit(chain.process)(state, x)

before = loudness.measure(x, SR)
after = loudness.measure(y, SR)
print(f"integrated loudness: {before.integrated_lufs:.1f} -> "
      f"{after.integrated_lufs:.1f} LUFS")
print(f"peak: {float(jnp.abs(y).max()):.3f} (limited below -1 dBFS in steady state)")
