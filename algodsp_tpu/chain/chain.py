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

    def load_graph(self, raw: str, *, auto_fuse: bool = True,
                   fuse_tol_db: float = 150.0):
        """Parse the graph and instantiate runtimes (`chain.go:60-99`).

        auto_fuse (default True): after instantiation, run the LTI
        fusion pass (`fuse_lti`) so maximal straight-line runs of
        adjacent LTI nodes (EQ stacks, filter cascades — no sidechain
        or fan-in/out edges, tolerance-gated) compile to one FIR
        convolution, the headline formulation. Output is identical to
        the unfused graph within >= ~120 dB in f32 (asserted in
        tests/test_chain_fuse.py); per-node metering identity inside a
        fused run is lost. Pass `auto_fuse=False` to keep every node a
        separate runtime (the reference's always-sequential execution,
        `chain_process.go:24-30`); `fuse_lti` can still be called
        manually. Returns the fusion report ([(member_ids, kernel_len)]
        per fused run; [] when nothing fused or disabled).
        """
        graph = parse_graph(raw)
        runtimes = {}
        for nid in graph.order:
            node = graph.nodes[nid]
            factory = self.registry.lookup(node.type)
            runtimes[nid] = factory(self.ctx, node.params)
        self.graph = graph
        self.runtimes = runtimes
        if auto_fuse:
            return self.fuse_lti(tol_db=fuse_tol_db)
        return []

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return {nid: rt.init_state(batch_shape, dtype)
                for nid, rt in self.runtimes.items()}

    def fuse_lti(self, *, tol_db: float = 150.0,
                 max_kernel_len: int = 1 << 19) -> list[tuple[list[str], int]]:
        """LTI fusion pass: collapse maximal linear runs of LTI nodes
        into one FIR convolution per run (`conv/ltifold.py` algebra).

        A run is a straight-line path n1 -> n2 -> ... -> nk where every
        interior link is the sole port-0 edge between its endpoints and
        every member is LTI (`NodeRuntime.lti`) or bypassed. The
        members' combined impulse response (IIR tails truncated below
        -tol_db of peak) becomes one `FIRFilter` placed at the first
        active member; the rest become identities, which XLA folds
        away. Graph topology, node ids, and state-dict keys are
        unchanged, so curves/state introspection still resolve;
        `init_state` must be called AFTER fusing. Runs whose combined
        kernel would exceed `max_kernel_len` are left unfused (e.g. a
        high-feedback delay's echo train).

        Opt-in (call after `load_graph`), because a fused run loses
        per-node metering/hot-swap identity; the graph semantics are
        otherwise identical (>= ~100 dB SNR in f32). Returns
        [(member_ids, kernel_len)] for each fused run — the analog of a
        compiler's fusion report. The Go reference always executes
        nodes one by one (`chain_process.go:24-30`); this pass is
        TPU-native headroom on top of parity.
        """
        import numpy as np
        from algodsp_tpu.chain.registry import NodeRuntime
        from algodsp_tpu.conv.ltifold import fold_chain_into_kernel
        from algodsp_tpu.filters.fir import FIRFilter

        g = self.graph

        def fusable(nid: str) -> bool:
            rt = self.runtimes.get(nid)
            if rt is None or rt.n_outputs != 1:
                return False
            return rt.lti is not None or g.nodes[nid].bypassed

        def linked(a: str, b: str) -> bool:
            outs = [e for e in g.outgoing.get(a, [])]
            ins = [e for e in g.incoming.get(b, [])]
            return (len(outs) == 1 and outs[0].dst == b
                    and outs[0].from_port == 0 and outs[0].to_port == 0
                    and len(ins) == 1 and ins[0].src == a)

        report: list[tuple[list[str], int]] = []
        used: set[str] = set()
        for start in g.order:
            if start in used or not fusable(start):
                continue
            run = [start]
            cur = start
            while True:
                outs = g.outgoing.get(cur, [])
                if len(outs) != 1:
                    break
                nxt = outs[0].dst
                if (nxt in used or nxt not in g.nodes or not fusable(nxt)
                        or not linked(cur, nxt)):
                    break
                run.append(nxt)
                cur = nxt
            used.update(run)
            active = [n for n in run if not g.nodes[n].bypassed]
            if len(active) < 2:
                continue
            h = np.ones(1)
            too_long = False
            for nid in active:
                kind, payload = self.runtimes[nid].lti
                if kind == "chain":
                    h = fold_chain_into_kernel(payload, h, tol_db=tol_db)
                elif kind == "kernel_fn":
                    k = np.asarray(payload(tol_db), np.float64).reshape(-1)
                    if h.size + k.size - 1 > max_kernel_len:
                        too_long = True
                        break
                    h = np.convolve(h, k)
                else:
                    raise ValueError(
                        f"chain: unknown lti descriptor {kind!r} on {nid}")
                if h.size > max_kernel_len:
                    too_long = True
                    break
            if too_long:
                continue
            # trim the sub-noise-floor tail the folds accumulated
            peak = np.max(np.abs(h))
            if peak > 0.0:
                keep = np.nonzero(
                    np.abs(h) > peak * 10.0 ** (-tol_db / 20.0))[0]
                h = h[:int(keep[-1]) + 1] if keep.size else h[:1]
            fir = FIRFilter(h)
            self.runtimes[active[0]] = NodeRuntime(
                init_state=fir.init_state,
                process=lambda st, x, sc, _f=fir: _f.process_stream(st, x),
                effect=fir,
                lti=("kernel_fn", lambda tol, _h=h: _h))
            identity = NodeRuntime(
                init_state=lambda batch_shape=(), dtype=jnp.float32: {},
                process=lambda st, x, sc: (st, x),
                lti=("kernel_fn", lambda tol: np.ones(1)))
            for nid in active[1:]:
                self.runtimes[nid] = identity
            report.append((active, int(h.size)))
        return report

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

    def process_blocks(self, state, x, *, block_size: int | None = None,
                       unroll: int = 1):
        """Stream the whole graph over many latency blocks in ONE
        traced program: `lax.scan` over (N // block_size) blocks with
        every node's state carried — the same floats as calling
        `process` block by block (asserted in tests/test_streaming.py),
        but a single host<->device dispatch, so the relay's ~3-6 ms
        floor amortizes across all blocks instead of being paid per
        block. This is the TPU-shaped analog of the reference's
        fixed-latency block loop (`dsp/conv/partitioned.go:348-396`);
        latency semantics are unchanged (still one block).

        Args:
          state: chain state from `init_state`.
          x: (..., N) with N a multiple of `block_size`.
          block_size: defaults to the chain's configured block size.
        """
        from algodsp_tpu.streaming import scan_blocks
        bs = self.ctx.block_size if block_size is None else block_size
        return scan_blocks(self.process, state, x, block_size=bs,
                           unroll=unroll)
