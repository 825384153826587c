"""Streamed multi-block processing COMPOSED with mesh sharding.

Round 4 built the two flanks separately: `streaming.scan_blocks` runs
hundreds of latency blocks per dispatch with bit-identical state carry
(the reference's fixed-latency block loop, `dsp/conv/partitioned.go:348-396`,
amortized over the host<->device floor), and `parallel/sharded.py` runs
one-shot bulk ops over ('channel','time') meshes with halo/carry
collectives (SURVEY.md §2.9). This module is their composition — the
exact shape a pod deployment of a real-time chain would run:

  * `scan_blocks_channel_sharded` — shard_map OUTSIDE, scan INSIDE:
    each device owns a channel shard of every processor's state and
    scans its blocks locally. Channel-DP is communication-free (the
    reference's array-of-independent-mono-processors pattern,
    `measure/loudness/meter.go:80-93`), so the local scan IS the global
    answer — exactness vs single-device `scan_blocks` is structural,
    and asserted in tests/test_parallel_streamed.py.
  * `StreamingConvTimeSharded` — time-SP streaming convolution: each
    scan step convolves one block that is itself sharded across the
    time axis, running the overlap-add ppermute halo exchange of
    `conv_time_sharded` *inside* the scanned step, and carries the
    block's outgoing overlap tail (klen-1 samples, psum'd across the
    time axis) to the next step — the distributed form of the
    overlap-save history contract (`conv/overlap_save.go:47,92`).
  * `compressor_stream_time_sharded` — scan over the full time-SP
    compressor (`parallel/sharded.py:compressor_time_sharded`): every
    scan step runs the sidechain one-pole carry combines, multi-hop RMS
    halo, and the selection-fixpoint envelope carry across the mesh,
    threading the compressor state between steps.

Mesh layout guidance is unchanged (`parallel/mesh.py`): lay "time"
along ICI-adjacent devices so per-step halos/carries ride ICI;
"channel" never communicates and may span DCN.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from algodsp_tpu.streaming import scan_blocks


def channel_state_specs(state, n_channels: int,
                        channel_axis_name: str = "channel"):
    """Build a PartitionSpec pytree for a processor-state pytree.

    Every runtime in this package lays state out with the channel batch
    dims leading (`Chain.init_state(batch_shape)` broadcasts each leaf);
    leaves whose leading dim equals `n_channels` shard on the channel
    axis, everything else (scalar counters: LFO phase, ring write
    heads, sequencer steps) is replicated — those evolve identically on
    every shard because their update depends only on block count, never
    on signal content.
    """
    def spec(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] == n_channels:
            return P(channel_axis_name, *([None] * (leaf.ndim - 1)))
        return P()
    return jax.tree_util.tree_map(spec, state)


def scan_blocks_channel_sharded(process_fn, state, *signals, mesh: Mesh,
                                block_size: int,
                                channel_axis_name: str = "channel",
                                unroll: int = 1):
    """Channel-DP streamed processing: `scan_blocks` inside `shard_map`.

    Args match `streaming.scan_blocks`; signals are (C, N) with C
    divisible by the mesh channel-axis size. Each device scans its own
    channel shard's blocks in one traced program — N // block_size
    blocks per dispatch, zero inter-device communication. Returns
    (final_state, outputs) identical (same floats) to the unsharded
    `scan_blocks` call.
    """
    n_shards = mesh.shape[channel_axis_name]
    sig_specs = []
    for s in signals:
        s = jnp.asarray(s)
        if s.ndim < 2:
            raise ValueError(
                "scan_blocks_channel_sharded: signals must be (C, N) "
                f"(channels leading), got shape {s.shape}")
        if s.shape[0] % n_shards:
            raise ValueError(
                f"channel count {s.shape[0]} not divisible by "
                f"{n_shards} channel shards")
        sig_specs.append(P(channel_axis_name, *([None] * (s.ndim - 1))))
    n_ch = jnp.asarray(signals[0]).shape[0]
    st_specs = channel_state_specs(state, n_ch, channel_axis_name)

    def local(st, *sigs):
        return scan_blocks(process_fn, st, *sigs, block_size=block_size,
                           unroll=unroll)

    # Derive the OUTPUT structure by abstract evaluation of the local
    # computation, so pytree outputs (multi-port nodes, aux metrics)
    # shard correctly: leaves whose leading dim equals the local
    # channel count shard on the channel axis, others replicate.
    n_ch_local = n_ch // n_shards

    def local_struct(leaf):
        leaf = jnp.asarray(leaf)
        shape = ((n_ch_local,) + leaf.shape[1:]
                 if leaf.ndim >= 1 and leaf.shape[0] == n_ch
                 else leaf.shape)
        return jax.ShapeDtypeStruct(shape, leaf.dtype)

    abs_state = jax.tree_util.tree_map(local_struct, state)
    abs_sigs = [jax.ShapeDtypeStruct(
        (n_ch_local,) + jnp.asarray(s).shape[1:], jnp.asarray(s).dtype)
        for s in signals]
    _, abs_out = jax.eval_shape(local, abs_state, *abs_sigs)

    def out_spec(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == n_ch_local:
            return P(channel_axis_name, *([None] * (leaf.ndim - 1)))
        return P()

    out_specs_tree = jax.tree_util.tree_map(out_spec, abs_out)

    # out state keeps the in specs. check_vma=False: replicated scalar
    # state leaves (phase counters, ring write heads) are updated
    # identically per shard but the varying-mesh analysis cannot prove
    # it for scan carries.
    fn = shard_map(local, mesh=mesh, in_specs=(st_specs, *sig_specs),
                   out_specs=(st_specs, out_specs_tree), check_vma=False)
    return fn(state, *signals)


class StreamingConvTimeSharded:
    """Time-SP streaming FIR/IR convolution with carried overlap tail.

    The streaming analog of `parallel.sharded.conv_time_sharded`: every
    processed block is itself sharded across the mesh time axis. Within
    a step, each shard convolves its local slice and the in-block
    overlap is exchanged with ppermute hops (the `overlap_save.go:47,92`
    halo contract); the part of the convolution that extends BEYOND the
    block (klen-1 samples) is psum'd across the time axis into a
    replicated per-channel tail and carried to the next step, exactly
    as the unsharded streaming convolver carries its history. Output
    equals the unsharded causal convolution, block after block.

    Use `process` per block, or `stream` to scan many blocks in one
    dispatch (scan INSIDE jit, shard_map inside the scanned step).
    """

    def __init__(self, kernel, mesh: Mesh, *,
                 time_axis_name: str = "time",
                 channel_axis_name: str | None = "channel"):
        self.kernel = np.asarray(kernel, dtype=np.float64).reshape(-1)
        self.mesh = mesh
        self.time_axis_name = time_axis_name
        self.channel_axis_name = channel_axis_name

    @property
    def klen(self) -> int:
        return self.kernel.size

    def init_state(self, batch_shape, dtype=jnp.float32):
        """Overlap tail of klen-1 samples per channel (replicated over
        the time axis) — the streaming history (`overlap_save.go:275`)."""
        if isinstance(batch_shape, int):
            batch_shape = (batch_shape,)
        return {"tail": jnp.zeros(tuple(batch_shape)
                                  + (max(self.klen - 1, 0),), dtype)}

    def process(self, state, x):
        """One streamed block. x: (C, n_step) with n_step divisible by
        the time-axis size. Returns (new_state, y) with y == the causal
        convolution of everything fed so far, restricted to this block.
        """
        from algodsp_tpu.conv import fftconvolve

        mesh = self.mesh
        tname = self.time_axis_name
        cname = self.channel_axis_name
        n_time = mesh.shape[tname]
        x = jnp.asarray(x)
        n_step = x.shape[-1]
        if n_step % n_time:
            raise ValueError(
                f"block length {n_step} not divisible by {n_time} shards")
        n_local = n_step // n_time
        klen = self.klen
        if klen <= 1:
            y = x * jnp.asarray(self.kernel[0] if klen else 0.0, x.dtype)
            return dict(state), y
        tail_len = klen - 1
        hops = min(-(-tail_len // n_local), n_time - 1)
        kernel = self.kernel

        in_spec = P(cname, tname)
        tail_spec = P(cname, None)

        def local(xl, tl):
            idx = jax.lax.axis_index(tname)
            nsh = jax.lax.axis_size(tname)
            k = jnp.asarray(kernel, xl.dtype)
            full = fftconvolve(xl, k)          # (C_l, n_local + klen - 1)
            y = full[:, :n_local]
            rest = full[:, n_local:]           # (C_l, klen - 1)
            # in-block overlap-add: piece p lands p shards downstream
            for p in range(1, hops + 1):
                piece = rest[:, (p - 1) * n_local:p * n_local]
                if piece.shape[-1] < n_local:
                    piece = jnp.concatenate(
                        [piece, jnp.zeros(piece.shape[:-1]
                                          + (n_local - piece.shape[-1],),
                                          piece.dtype)], axis=-1)
                recv = jax.lax.ppermute(
                    piece, tname, [(i, i + p) for i in range(nsh - p)])
                recv = jnp.where(idx < p, jnp.zeros_like(recv), recv)
                y = y + recv
            # incoming tail: previous blocks' overlap into the first
            # tail_len samples of THIS block; shard idx owns global
            # positions [idx*n_local, (idx+1)*n_local)
            tpad = jnp.concatenate(
                [tl, jnp.zeros(tl.shape[:-1] + (n_local,), tl.dtype)],
                axis=-1)
            start_in = jnp.minimum(idx * n_local, tail_len)
            mine = jax.lax.dynamic_slice_in_dim(
                tpad, start_in, n_local, axis=-1)
            mine = jnp.where(idx * n_local < tail_len, mine,
                             jnp.zeros_like(mine))
            y = y + mine
            # outgoing tail: rest[j] has global out position
            # (idx+1)*n_local + j; tail index t = j - (nsh-1-idx)*n_local
            offset = (nsh - 1 - idx) * n_local
            rpad = jnp.concatenate([rest, jnp.zeros_like(rest)], axis=-1)
            start_out = jnp.minimum(offset, tail_len)
            contrib = jax.lax.dynamic_slice_in_dim(
                rpad, start_out, tail_len, axis=-1)
            contrib = jnp.where(offset < tail_len, contrib,
                                jnp.zeros_like(contrib))
            tail_new = jax.lax.psum(contrib, tname)
            # plus what the OLD tail still owes beyond this block
            # (klen-1 may exceed n_step): ext_old[n_step:]
            if n_step < tail_len:
                carry_old = jnp.concatenate(
                    [tl[:, n_step:],
                     jnp.zeros(tl.shape[:-1] + (n_step,), tl.dtype)],
                    axis=-1)
                tail_new = tail_new + carry_old
            return y, tail_new

        y, tail = shard_map(
            local, mesh=mesh, in_specs=(in_spec, tail_spec),
            out_specs=(in_spec, tail_spec))(x, state["tail"])
        return {"tail": tail}, y

    def stream(self, state, x, *, block_size: int, unroll: int = 1):
        """Scan `process` over N // block_size time-sharded blocks in
        one traced program — `scan_blocks` composed with the per-step
        halo/psum exchange."""
        return scan_blocks(self.process, state, x, block_size=block_size,
                           unroll=unroll)


def compressor_stream_time_sharded(comp, state, x, mesh: Mesh,
                                   sidechain=None, *, block_size: int,
                                   time_axis_name: str = "time",
                                   channel_axis_name: str | None = "channel",
                                   unroll: int = 1):
    """Streamed time-SP feedforward compressor: `scan_blocks` over
    `parallel.sharded.compressor_time_sharded`. Each scan step runs the
    full cross-shard machinery (one-pole carry combine, RMS halo,
    selection-fixpoint envelope) on one time-sharded block; compressor
    state (envelope, prefilter states, RMS history) threads between
    steps exactly as the unsharded `scan_blocks(comp.process, ...)`
    would carry it. Full `DynamicsCore.process` parity
    (`dsp/effects/dynamics/core.go:274`).
    """
    from algodsp_tpu.parallel.sharded import compressor_time_sharded

    kw = dict(time_axis_name=time_axis_name,
              channel_axis_name=channel_axis_name)

    if sidechain is None:
        def step(st, xb):
            return compressor_time_sharded(comp, st, xb, mesh, **kw)
        return scan_blocks(step, state, x, block_size=block_size,
                           unroll=unroll)

    def step(st, xb, sb):
        return compressor_time_sharded(comp, st, xb, mesh, sidechain=sb,
                                       **kw)
    return scan_blocks(step, state, x, sidechain, block_size=block_size,
                       unroll=unroll)
