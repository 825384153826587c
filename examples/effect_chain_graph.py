"""Example: JSON effect-graph compiled to one jitted program.

The same graph JSON the reference's web demo emits (node/connection
lists, `effectchain/graph.go:19-56`) loads directly; the whole DAG —
compressor into split-band distortion into mixdown — traces into a
single XLA program per block size.

Run: python examples/effect_chain_graph.py
"""

import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu.chain import Chain

GRAPH = {
    "nodes": [
        {"id": "comp", "type": "dyn-compressor",
         "params": {"threshold": -18.0, "ratio": 3.0, "attack": 5.0,
                    "release": 80.0}},
        {"id": "split", "type": "split-freq", "params": {"frequency": 900.0}},
        {"id": "dist", "type": "distortion",
         "params": {"drive": 8.0, "mode": "soft"}},
    ],
    "connections": [
        {"from": "_input", "to": "comp"},
        {"from": "comp", "to": "split"},
        {"from": "split", "fromPort": 0, "to": "_output"},       # lows clean
        {"from": "split", "fromPort": 1, "to": "dist"},          # highs driven
        {"from": "dist", "to": "_output"},
    ],
}


def main():
    sr = 48000.0
    c = Chain(sr, block_size=2048)
    c.load_graph(json.dumps(GRAPH))
    print("nodes in topological order:", list(c.graph.order))

    rng = np.random.default_rng(0)
    x = jnp.asarray(0.25 * rng.standard_normal((2, 2048)), jnp.float32)
    state = c.init_state((2,))
    step = jax.jit(c.process)
    state, y = step(state, x)
    print(f"out shape: {tuple(y.shape)}, "
          f"rms: {float(jnp.sqrt(jnp.mean(y**2))):.3f}")


if __name__ == "__main__":
    main()
# Output:
# nodes in topological order: ['comp', 'split', 'dist']
# out shape: (2, 2048), rms: 0.417
