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
            # full f32: a bf16-lowered carry combine would corrupt
            # the cross-shard state (same class as the affine_scan_nd
            # combine fix in linrec.py)
            terms = jnp.einsum("pij,pcj->pci", ap[pw], gathered,
                               precision=jax.lax.Precision.HIGHEST)
            c_in = jnp.einsum("p,pci->ci", mask, terms,
                              precision=jax.lax.Precision.HIGHEST)
            y = y0 + c_in[:, 0:1] * jnp.asarray(p_ext[s], dtype) \
                   + c_in[:, 1:2] * jnp.asarray(q_ext[s], dtype)
        return y

    return shard_map(local, mesh=mesh, in_specs=(in_spec,),
                     out_specs=in_spec)(x)


def _psum_axes(mesh: Mesh, time_axis_name: str,
               channel_axis_name: str | None) -> tuple[str, ...]:
    return tuple(a for a in (time_axis_name, channel_axis_name)
                 if a is not None and a in mesh.shape)


def envelope_time_sharded(targets, env0, attack, release, mesh: Mesh, *,
                          time_axis_name: str = "time",
                          channel_axis_name: str | None = "channel",
                          max_iters: int = 32,
                          return_converged: bool = False):
    """Branching one-pole envelope over a time-sharded (C, N) signal.

    The recurrence (`dsp/signal/generate.go:322-350`,
    `dsp/effects/dynamics/core.go:339-359`; same convention as
    `ops.envscan.envelope_scan`):

        env_n = env_{n-1} + a_n (t_n - env_{n-1}),
        a_n   = attack  if t_n > env_{n-1} else release

    is nonlinear through the attack/release selection, so unlike the
    biquad there is no one-shot cross-shard carry combine. But once the
    per-sample SELECTION is fixed, the recurrence is a time-varying 1x1
    affine map, whose cross-shard composition IS the gather-prefix
    combine. The sharded solve is therefore a selection fixpoint:

      1. seed: each shard runs the exact sequential scan on its local
         slice with a zero incoming carry (shard 0 with the true env0)
         -> initial selection pattern;
      2. iterate (global `while_loop`): treat the selection as fixed,
         compose the local affine maps (log-depth `affine1_scan`),
         all_gather each shard's (A, w) summary, prefix-combine to get
         every shard's true incoming carry, re-derive the selection
         from the corrected trajectory; stop when no sample's selection
         flips anywhere on the mesh (psum'd flag). A consistent
         selection + carry IS the exact solution (the forward
         recurrence has a unique trajectory), and the incoming-carry
         influence decays like prod(1-a) so flips are confined to a few
         boundary samples — convergence is 1-3 iterations in practice;
      3. refine: one sequential local scan seeded with the converged
         carry pins the output rounding to the plain `envelope_scan`.

    Payload per iteration per shard: 2 floats/channel (the affine
    summary) + one psum scalar. Returns (env_final, traj) like
    `envelope_scan`. attack/release must be scalars.

    Convergence contract: the fixpoint stops after `max_iters` global
    sweeps even if some selections are still flipping (a pathological
    regime — targets hovering exactly at the carried envelope with
    near-1 coefficients); the result is then the trajectory of the
    last consistent-selection solve, not the exact recurrence. Pass
    `return_converged=True` to additionally receive a traced boolean
    (True iff the selection fixpoint converged on every shard) to
    assert on or to gate a fallback; raise `max_iters` to buy more
    sweeps at 2 floats/channel each.
    """
    from algodsp_tpu.ops.envscan import envelope_scan

    targets = jnp.asarray(targets)
    if jnp.ndim(attack) or jnp.ndim(release):
        raise ValueError("envelope_time_sharded: attack/release must be "
                         "scalars (per-channel ballistics not supported "
                         "on the sharded path)")
    n_time = mesh.shape[time_axis_name]
    n = targets.shape[-1]
    if n % n_time:
        raise ValueError(f"time length {n} not divisible by {n_time} shards")
    dtype = targets.dtype
    att = jnp.asarray(attack, dtype)
    rel = jnp.asarray(release, dtype)
    env0 = jnp.broadcast_to(jnp.asarray(env0, dtype), targets.shape[:-1])
    paxes = _psum_axes(mesh, time_axis_name, channel_axis_name)

    in_spec = P(channel_axis_name, time_axis_name)
    c_spec = P(channel_axis_name)

    def local(tl, e0l):
        idx = jax.lax.axis_index(time_axis_name)

        def solve(sel):
            """Exact affine solve for a FIXED selection: returns the
            shard's true incoming carry and the corrected trajectory."""
            a = jnp.where(sel, att, rel)
            m = 1.0 - a
            b = a * tl
            M, Bv = linrec.affine1_scan(m, b)
            gA = jax.lax.all_gather(M[..., -1], time_axis_name)   # (Psh, C)
            gw = jax.lax.all_gather(Bv[..., -1], time_axis_name)

            def step(E, qv):
                Aq, wq = qv
                return Aq * E + wq, E

            # pvary: the gathered summaries are marked varying over the
            # time axis, so the scan carry must start varying too
            _, incoming = jax.lax.scan(
                step, jax.lax.pcast(e0l, (time_axis_name,), to='varying'), (gA, gw))
            c = jax.lax.dynamic_index_in_dim(incoming, idx, 0,
                                             keepdims=False)
            return c, M * c[..., None] + Bv

        # 1. seed (zero carry except shard 0)
        e_seed = jnp.where(idx == 0, e0l, jnp.zeros_like(e0l))
        _, traj0 = envelope_scan(tl, e_seed, att, rel)
        prev0 = jnp.concatenate([e_seed[..., None], traj0[..., :-1]], -1)
        sel0 = tl > prev0

        # 2. fixpoint
        def cond(st):
            k, changed, _ = st
            return jnp.logical_and(k < max_iters, changed > 0)

        def body(st):
            k, _, sel = st
            c, env = solve(sel)
            prev = jnp.concatenate([c[..., None], env[..., :-1]], -1)
            new_sel = tl > prev
            flips = jnp.sum((new_sel != sel).astype(jnp.int32))
            changed = jax.lax.psum(flips, paxes).astype(jnp.int32)
            return k + 1, changed, new_sel

        _, changed, sel = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(1), sel0))

        # 3. sequential refinement with the converged carry
        c, _ = solve(sel)
        _, traj = envelope_scan(tl, c, att, rel)
        # `changed` is already psum'd over the mesh axes, so the flag is
        # shard-invariant (replicated out_spec below)
        return traj, changed == 0

    traj, converged = shard_map(
        local, mesh=mesh, in_specs=(in_spec, c_spec),
        out_specs=(in_spec, P()))(targets, env0)
    if return_converged:
        return traj[..., -1], traj, converged
    return traj[..., -1], traj


def onepole_time_sharded(x, s0, coeff, mesh: Mesh, *,
                         time_axis_name: str = "time",
                         channel_axis_name: str | None = "channel"):
    """One-pole smoother s_n = (1-c) s_{n-1} + c x_n over a
    time-sharded (C, N) signal — the sidechain prefilter recurrence
    (`core.go:600-662`). Linear, so ONE gather-prefix combine is exact:
    each shard composes its local affine map (log-depth), publishes the
    2-float summary, and seeds from the combined incoming carry.
    Returns (s_final, y) matching `DynamicsCore._one_pole_lp`.
    """
    x = jnp.asarray(x)
    n_time = mesh.shape[time_axis_name]
    if x.shape[-1] % n_time:
        raise ValueError(
            f"time length {x.shape[-1]} not divisible by {n_time} shards")
    dtype = x.dtype
    c = jnp.asarray(coeff, dtype)
    s0 = jnp.broadcast_to(jnp.asarray(s0, dtype), x.shape[:-1])
    in_spec = P(channel_axis_name, time_axis_name)
    c_spec = P(channel_axis_name)

    def local(xl, s0l):
        idx = jax.lax.axis_index(time_axis_name)
        m = jnp.full_like(xl, 1.0 - c)
        b = c * xl
        M, Bv = linrec.affine1_scan(m, b)
        gA = jax.lax.all_gather(M[..., -1], time_axis_name)
        gw = jax.lax.all_gather(Bv[..., -1], time_axis_name)

        def step(E, qv):
            Aq, wq = qv
            return Aq * E + wq, E

        _, incoming = jax.lax.scan(
            step, jax.lax.pcast(s0l, (time_axis_name,), to='varying'), (gA, gw))
        cin = jax.lax.dynamic_index_in_dim(incoming, idx, 0, keepdims=False)
        return M * cin[..., None] + Bv

    y = shard_map(local, mesh=mesh, in_specs=(in_spec, c_spec),
                  out_specs=in_spec)(x, s0)
    return y[..., -1], y


def box_rms_time_sharded(src, hist, window: int, mesh: Mesh, *,
                         time_axis_name: str = "time",
                         channel_axis_name: str | None = "channel"):
    """Moving RMS over `window` samples of a time-sharded (C, N) signal
    with explicit (C, window-1) squared-sample history — the
    distributed form of the Go RMS ring buffer (`core.go:361-388`,
    matching `DynamicsCore._rms`). Multi-hop ppermute halo (windows may
    span several shards); positions before the global start read from
    `hist`. Returns the (C, N) RMS trajectory; the caller derives the
    new history from the global signal tail.
    """
    src = jnp.asarray(src)
    n_time = mesh.shape[time_axis_name]
    n = src.shape[-1]
    if n % n_time:
        raise ValueError(f"time length {n} not divisible by {n_time} shards")
    if window <= 1:
        return jnp.abs(src)
    n_local = n // n_time
    need = window - 1
    hops = min(-(-need // n_local), n_time - 1)
    in_spec = P(channel_axis_name, time_axis_name)
    h_spec = P(channel_axis_name)

    def local(sl, hl):
        idx = jax.lax.axis_index(time_axis_name)
        nsh = jax.lax.axis_size(time_axis_name)
        sq = sl * sl
        prev = jnp.zeros(sq.shape[:-1] + (need,), sq.dtype)
        # neighbor pieces: shard idx-h's slice lands at prev offset
        # [need - h*n_local, need - (h-1)*n_local)
        for h in range(1, hops + 1):
            recv = jax.lax.ppermute(
                sq, time_axis_name,
                [(i, i + h) for i in range(nsh - h)])
            recv = jnp.where(idx < h, jnp.zeros_like(recv), recv)
            lo = need - h * n_local
            hi = need - (h - 1) * n_local
            if lo >= 0:
                prev = jax.lax.dynamic_update_slice_in_dim(
                    prev, recv, lo, axis=-1)
            else:
                prev = jax.lax.dynamic_update_slice_in_dim(
                    prev, recv[..., -hi:], 0, axis=-1)
        # history mask: prev[j] has global position idx*n_local-need+j;
        # negative positions read hist[idx*n_local + j]
        hpad = jnp.concatenate(
            [hl.astype(sq.dtype), jnp.zeros_like(hl, sq.dtype)], axis=-1)
        start = jnp.minimum(idx * n_local, need)
        hslice = jax.lax.dynamic_slice_in_dim(hpad, start, need, axis=-1)
        j = jnp.arange(need)
        use_hist = (idx * n_local + j) < need
        prev = jnp.where(use_hist, hslice, prev)

        ext = jnp.concatenate([prev, sq], axis=-1)
        csum = jnp.cumsum(ext, axis=-1)
        csum = jnp.concatenate(
            [jnp.zeros(ext.shape[:-1] + (1,), ext.dtype), csum], axis=-1)
        hi_idx = jnp.arange(need, need + sl.shape[-1]) + 1
        lo_idx = hi_idx - window
        mean = (jnp.take(csum, hi_idx, axis=-1)
                - jnp.take(csum, lo_idx, axis=-1)) / window
        return jnp.sqrt(jnp.maximum(mean, 0.0))

    return shard_map(local, mesh=mesh, in_specs=(in_spec, h_spec),
                     out_specs=in_spec)(src, hist)


def compressor_time_sharded(comp, state, x, mesh: Mesh, sidechain=None, *,
                            time_axis_name: str = "time",
                            channel_axis_name: str | None = "channel"):
    """Feedforward compressor over a time-sharded (C, N) signal with
    full state semantics (`DynamicsCore.process` parity): sidechain
    one-pole prefilters (linear carry combine), peak or windowed-RMS
    detector (multi-hop halo), branching envelope ballistics
    (selection-fixpoint carry, `envelope_time_sharded`), elementwise
    log2-domain gain computer. Completes the SP/CP mandate of SURVEY
    §2.9 — no channel-DP gather anywhere in the pipeline.

    Feedback topology reads the processor's own output per sample and
    cannot be time-sharded; it raises.
    """
    from algodsp_tpu.effects.dynamics.core import DetectorMode, Topology

    core = comp.core
    if core.cfg.topology is not Topology.FEEDFORWARD:
        raise ValueError("compressor_time_sharded: feedback topology is "
                         "inherently per-sample sequential; use the "
                         "unsharded engine")
    x = jnp.asarray(x)
    sc = x if sidechain is None else jnp.asarray(sidechain)
    kw = dict(time_axis_name=time_axis_name,
              channel_axis_name=channel_axis_name)
    new_state = dict(state)

    pre = sc
    if core.lp_coeff > 0:
        last, pre = onepole_time_sharded(pre, state["lp"], core.lp_coeff,
                                         mesh, **kw)
        new_state["lp"] = last
    if core.hp_coeff > 0:
        last, lp_out = onepole_time_sharded(pre, state["hp_lp"],
                                            core.hp_coeff, mesh, **kw)
        new_state["hp_lp"] = last
        pre = pre - lp_out
    src = jnp.abs(pre)
    if core.cfg.detector_mode == DetectorMode.RMS and core.rms_window > 1:
        w = core.rms_window
        level_src = box_rms_time_sharded(src, state["rms_hist"], w, mesh,
                                         **kw)
        sq = src * src
        ext = jnp.concatenate(
            [state["rms_hist"].astype(sq.dtype), sq], axis=-1)
        new_state["rms_hist"] = ext[..., -(w - 1):]
        src = level_src
    env_f, env = envelope_time_sharded(
        src, state["envelope"], core.attack_coeff,
        1.0 - core.release_coeff, mesh, **kw)
    new_state["envelope"] = env_f
    gain = core.gain_for_level(env)
    y = x * gain * jnp.asarray(core.makeup_gain_lin, x.dtype)
    return new_state, y


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
