"""Effect-chain execution: JSON DAG -> one jitted program.

Capability parity with `dsp/effectchain/chain.go` + `chain_process.go`:
LoadGraph (JSON -> topo-sorted nodes + instantiated runtimes), Process
(walk topo order with per-node output buffers, fan-in mixing, split-freq
lo/hi ports, sidechain edges on input port 1, bypass passthrough).

TPU-first: the walk happens at TRACE time — the whole graph flattens
into a single XLA program per block shape; per-node state is one pytree
(`chain.go:122-137` State/SetState analog), so the chain is jit-able,
vmap-able over channels, and checkpointable.
"""

from __future__ import annotations

import jax.numpy as jnp

from algodsp_tpu.chain.graph import (
    parse_graph, CompiledGraph, GraphError, INPUT_NODE_ID, OUTPUT_NODE_ID)
from algodsp_tpu.chain.registry import Registry, Context, default_registry, NodeRuntime


class Chain:
    def __init__(self, sample_rate: float, *, block_size: int = 512,
                 registry: Registry | None = None):
        if not isinstance(sample_rate, (int, float)) or not sample_rate > 0:
            raise ValueError(
                f"chain: sample_rate must be a positive number, got "
                f"{sample_rate!r} — construct with Chain(sample_rate) and "
                f"pass the graph JSON to load_graph()")
        self.ctx = Context(sample_rate=sample_rate, block_size=block_size)
        self.registry = registry or default_registry()
        self.graph: CompiledGraph = parse_graph("")
        self.runtimes: dict[str, NodeRuntime] = {}

    def load_graph(self, raw: str):
        """Parse the graph and instantiate runtimes (`chain.go:60-99`)."""
        graph = parse_graph(raw)
        runtimes = {}
        for nid in graph.order:
            node = graph.nodes[nid]
            factory = self.registry.lookup(node.type)
            runtimes[nid] = factory(self.ctx, node.params)
        self.graph = graph
        self.runtimes = runtimes

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {nid: rt.init_state(batch_shape, dtype)
                for nid, rt in self.runtimes.items()}

    def process(self, state, x):
        """(state, x:(..., N)) -> (state, y). One traced program.

        Mirrors `chain_process.go:11-33`: mix fan-in edges per input
        port, run each node in topo order, sum everything reaching
        `_output`. An empty graph or no path to `_output` yields the
        input unchanged when `_input` connects straight through, else
        silence.
        """
        x = jnp.asarray(x)
        if not self.graph.nodes and not self.graph.incoming:
            return state, x

        # per-(node, port) output buffers
        outputs: dict[tuple[str, int], jnp.ndarray] = {(INPUT_NODE_ID, 0): x}
        new_state = dict(state)

        def mix_inputs(nid: str, port: int):
            total = None
            for e in self.graph.incoming.get(nid, []):
                if e.to_port != port:
                    continue
                src = outputs.get((e.src, e.from_port))
                if src is None:
                    continue
                total = src if total is None else total + src
            return total

        for nid in self.graph.order:
            node = self.graph.nodes[nid]
            rt = self.runtimes[nid]
            main_in = mix_inputs(nid, 0)
            if main_in is None:
                main_in = jnp.zeros_like(x)
            if node.bypassed:
                for port in range(rt.n_outputs):
                    outputs[(nid, port)] = main_in
                continue
            sidechain = mix_inputs(nid, 1)
            st, out = rt.process(state[nid], main_in, sidechain)
            new_state[nid] = st
            if rt.n_outputs == 1:
                outputs[(nid, 0)] = out
            else:
                for port, o in enumerate(out):
                    outputs[(nid, port)] = o

        y = mix_inputs(OUTPUT_NODE_ID, 0)
        if y is None:
            y = jnp.zeros_like(x)
        return new_state, y
