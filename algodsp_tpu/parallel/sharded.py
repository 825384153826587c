"""Time-axis sequence parallelism: halo exchange + IIR carry propagation.

The TPU-native equivalents mandated by SURVEY.md §2.9/§7 for the
reference's streaming-state patterns:

  * `fir_time_sharded` — FIR/overlap-save style history: each time
    shard needs the previous shard's last taps-1 samples. One neighbor
    `ppermute` per block (the overlap-save halo, the analog of
    `conv/overlap_save.go:47,92` history carry).
  * `biquad_time_sharded` — IIR scan carries: each shard computes its
    zero-IC blocked solution locally (MXU), publishes its 2-vector end
    carry, and an `all_gather` + masked prefix combine (P tiny 2x2
    matmuls) gives every shard its true incoming state — the cross-
    device analog of the associative carry scan in `ops/linrec.py`.
    Payload per shard per section: 2 floats. Exact, not approximate.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from algodsp_tpu.ops import linrec
from algodsp_tpu.filters.biquad import BiquadChain


def fir_time_sharded(x, coeffs, mesh: Mesh, *, time_axis_name: str = "time",
                     channel_axis_name: str | None = "channel"):
    """Causal FIR over a time-sharded signal.

    x: (C, N) with N divisible by the time-axis size. Returns (C, N)
    equal to the unsharded causal convolution.
    """
    coeffs = np.asarray(coeffs, dtype=np.float64).reshape(-1)
    taps = coeffs.size
    in_spec = P(channel_axis_name, time_axis_name)

    def local(xl):
        h = jnp.asarray(coeffs, dtype=xl.dtype)
        # halo: previous shard's tail (taps-1 samples). ppermute shifts
        # right along the time axis; the first shard receives zeros.
        tail = xl[:, -(taps - 1):] if taps > 1 else xl[:, :0]
        idx = jax.lax.axis_index(time_axis_name)
        nshards = jax.lax.axis_size(time_axis_name)
        halo = jax.lax.ppermute(
            tail, time_axis_name,
            [(i, i + 1) for i in range(nshards - 1)])
        halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
        ext = jnp.concatenate([halo, xl], axis=-1)
        kern = h[::-1].reshape(1, 1, taps)
        y = jax.lax.conv_general_dilated(
            ext[:, None, :], kern, window_strides=(1,),
            padding=[(0, 0)] if taps > 1 else [(0, 0)],
            dimension_numbers=("NCH", "IOH", "NCH"),
            precision=jax.lax.Precision.HIGHEST)
        return y[:, 0, :]

    return shard_map(local, mesh=mesh, in_specs=(in_spec,),
                     out_specs=in_spec)(x)


def biquad_time_sharded(x, chain: BiquadChain, mesh: Mesh, *,
                        time_axis_name: str = "time",
                        channel_axis_name: str | None = "channel"):
    """Exact biquad cascade over a time-sharded (C, N) signal.

    Each shard runs the blocked-scan engine on its local slice with zero
    initial conditions, then corrects with the true incoming carry
    obtained from an all_gather of per-shard end states. The homogeneous
    correction columns (h[n+1], -a2 h[n] over the local length) and the
    per-shard transition matrices A = G_local are precomputed host-side.
    """
    n_time = mesh.shape[time_axis_name]
    n = x.shape[-1]
    if n % n_time:
        raise ValueError(f"time length {n} not divisible by {n_time} shards")
    n_local = n // n_time
    block = chain.block_size
    if n_local % block:
        raise ValueError(f"local length {n_local} not a multiple of block {block}")

    # runtime_sos, not sos: the runtime may split ill-conditioned
    # real-pole sections (linrec.condition_sos) and chain._kernels is
    # indexed by RUNTIME section, so the sharded loop must mirror it.
    sos = chain.runtime_sos
    S = sos.shape[0]
    # Host precompute: full-length homogeneous responses per section.
    h_full = linrec._ar2_impulse_response(sos[:, 3], sos[:, 4], n_local + 1)
    p_ext = h_full[:, 1:n_local + 1]            # (S, n_local)
    q_ext = -sos[:, 4:5] * h_full[:, :n_local]  # (S, n_local)
    # Shard transition matrix: [y_end, y_end-1] = A @ [y_in1, y_in2] + w
    A_shard = np.empty((S, 2, 2))
    A_shard[:, 0, 0] = h_full[:, n_local]
    A_shard[:, 0, 1] = -sos[:, 4] * h_full[:, n_local - 1]
    A_shard[:, 1, 0] = h_full[:, n_local - 1]
    A_shard[:, 1, 1] = -sos[:, 4] * h_full[:, n_local - 2]
    # Precomputed powers A^0..A^(P-1) for the prefix combine.
    A_pows = np.empty((n_time, S, 2, 2))
    A_pows[0] = np.broadcast_to(np.eye(2), (S, 2, 2))
    for p in range(1, n_time):
        A_pows[p] = np.einsum("sij,sjk->sik", A_shard, A_pows[p - 1])

    in_spec = P(channel_axis_name, time_axis_name)

    def local(xl):
        dtype = xl.dtype
        y = xl
        if chain.gain != 1.0:
            y = y * jnp.asarray(chain.gain, dtype)
        idx = jax.lax.axis_index(time_axis_name)
        nsh = jax.lax.axis_size(time_axis_name)
        for s in range(S):
            b0, b1, b2, a1, a2 = sos[s]
            # FIR halo: previous shard's last two inputs of this section
            tail2 = y[:, -2:]
            halo = jax.lax.ppermute(
                tail2, time_axis_name,
                [(i, i + 1) for i in range(nsh - 1)])
            halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
            f = linrec.fir3(y, jnp.asarray(b0, dtype), jnp.asarray(b1, dtype),
                            jnp.asarray(b2, dtype), halo[:, 1], halo[:, 0])
            zero = jnp.zeros(f.shape[:-1], dtype)
            y0 = linrec.ar2_apply_blocked(f, chain._kernels, s, zero, zero)
            # publish local end carry, gather all, combine prefix
            w_local = jnp.stack([y0[:, -1], y0[:, -2]], axis=-1)  # (C_l, 2)
            gathered = jax.lax.all_gather(w_local, time_axis_name)  # (P, C_l, 2)
            ap = jnp.asarray(A_pows[:, s], dtype)  # (P, 2, 2)
            # carry into shard idx: sum_{q < idx} A^(idx-1-q) w_q
            qs = jnp.arange(nsh)
            mask = (qs < idx).astype(dtype)  # (P,)
            pw = jnp.clip(idx - 1 - qs, 0, nsh - 1)
            terms = jnp.einsum("pij,pcj->pci", ap[pw], gathered)
            c_in = jnp.einsum("p,pci->ci", mask, terms)  # (C_l, 2)
            y = y0 + c_in[:, 0:1] * jnp.asarray(p_ext[s], dtype) \
                   + c_in[:, 1:2] * jnp.asarray(q_ext[s], dtype)
        return y

    return shard_map(local, mesh=mesh, in_specs=(in_spec,),
                     out_specs=in_spec)(x)


def reduce_metrics(values, mesh: Mesh, axis_name: str = "channel"):
    """psum-style metric aggregation across a mesh axis — the analog of
    pod-wide THD/loudness aggregation (SURVEY.md §2.9 comm backend)."""
    def local(v):
        return jax.lax.psum(v, axis_name)
    return shard_map(local, mesh=mesh, in_specs=(P(axis_name),),
                     out_specs=P(None))(values)


def conv_time_sharded(x, kernel, mesh: Mesh, *, time_axis_name: str = "time",
                      channel_axis_name: str | None = "channel"):
    """Exact causal FIR/IR convolution over a time-sharded (C, N) signal.

    The distributed form of the overlap-save history contract
    (`conv/overlap_save.go:47,92`): each shard convolves its local slice
    (zero-state), producing a tail of kernel_len-1 samples that belongs
    to FOLLOWING shards; the tails are overlap-added across the mesh
    with one `ppermute` hop per n_local-sized tail piece, so IRs longer
    than a shard (conv reverb) stay exact. Payload = kernel_len-1
    samples per channel total. Output equals the unsharded causal
    convolution truncated to N samples.
    """
    kernel = np.asarray(kernel, dtype=np.float64).reshape(-1)
    klen = kernel.size
    n_time = mesh.shape[time_axis_name]
    n = x.shape[-1]
    if n % n_time:
        raise ValueError(f"time length {n} not divisible by {n_time} shards")
    n_local = n // n_time
    hops = min(-(-(klen - 1) // n_local), n_time - 1) if klen > 1 else 0
    in_spec = P(channel_axis_name, time_axis_name)

    def local(xl):
        from algodsp_tpu.conv import fftconvolve
        idx = jax.lax.axis_index(time_axis_name)
        nsh = jax.lax.axis_size(time_axis_name)
        k = jnp.asarray(kernel, xl.dtype)
        full = fftconvolve(xl, k)              # (C_l, n_local + klen - 1)
        y = full[:, :n_local]
        tail = full[:, n_local:]
        for p in range(1, hops + 1):
            piece = tail[:, (p - 1) * n_local:p * n_local]
            if piece.shape[-1] < n_local:
                piece = jnp.concatenate(
                    [piece, jnp.zeros(piece.shape[:-1]
                                      + (n_local - piece.shape[-1],),
                                      piece.dtype)], axis=-1)
            recv = jax.lax.ppermute(
                piece, time_axis_name,
                [(i, i + p) for i in range(nsh - p)])
            recv = jnp.where(idx < p, jnp.zeros_like(recv), recv)
            y = y + recv
        return y

    return shard_map(local, mesh=mesh, in_specs=(in_spec,),
                     out_specs=in_spec)(x)
