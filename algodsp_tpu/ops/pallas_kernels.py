"""Pallas TPU kernels + backend dispatch.

The analog of the reference's SIMD kernel registry
(`dsp/filter/biquad/internal/arch/registry`): hand-written kernels for
the truly sequential recurrences, with automatic fallback to the pure
XLA implementations off-TPU (the `purego` build-tag analog).

Kernel: branching attack/release envelope follower. The recurrence
    env = where(t > env, env + (t-env)*a, env + (t-env)*r)
is data-dependent (not linear), so unlike the biquad it cannot become
a matmul; the Pallas kernel keeps the whole block in VMEM and walks
time inside the kernel with channels on the 128-lane axis — one fused
VPU loop instead of lax.scan's per-step overhead. The time axis is
chunked via the grid; the envelope carry lives in a VMEM scratch that
persists across (sequential) grid steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK_T = 1024


def _env_kernel(att_ref, rel_ref, env0_ref, x_ref, out_ref, envf_ref, carry):
    t_chunk = x_ref.shape[0]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry[:] = env0_ref[:]

    a = att_ref[:, :]  # (1, C): per-channel (broadcast if scalar input)
    r = rel_ref[:, :]

    def body(t, env):
        # keep everything 2-D (1, C): Mosaic's layout inference requires
        # rank >= 2 vectors
        x = x_ref[pl.ds(t, 1), :]
        rising = env + (x - env) * a
        falling = env + (x - env) * r
        env = jnp.where(x > env, rising, falling)
        out_ref[pl.ds(t, 1), :] = env
        return env

    env = jax.lax.fori_loop(0, t_chunk, body, carry[:, :])
    carry[:, :] = env

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        envf_ref[:, :] = env


def envelope_scan_pallas(targets, env0, attack, release):
    """Pallas envelope scan.

    targets: (C, T) with C a multiple of 8 lanes-friendly width (padded
    internally); returns (env_final (C,), trajectory (C, T)).
    """
    x = jnp.asarray(targets)
    if x.ndim != 2:
        raise ValueError("envelope_scan_pallas expects (C, T)")
    c, t = x.shape
    dtype = x.dtype
    c_pad = (-c) % 128
    t_pad = (-t) % _CHUNK_T
    xp = jnp.pad(x, ((0, c_pad), (0, t_pad)))
    e0 = jnp.pad(jnp.asarray(env0, dtype), (0, c_pad))[None, :]
    cp, tp_ = xp.shape
    xt = xp.T  # (T, C): time on sublanes, channels on lanes
    grid = tp_ // _CHUNK_T

    # attack/release: scalars or per-channel (C,) vectors, carried as
    # (1, C) VMEM rows (padded lanes get coeff 0 -> env stays at env0)
    att = jnp.pad(jnp.broadcast_to(jnp.asarray(attack, dtype), (c,)),
                  (0, c_pad))[None, :]
    rel = jnp.pad(jnp.broadcast_to(jnp.asarray(release, dtype), (c,)),
                  (0, c_pad))[None, :]

    out, envf = pl.pallas_call(
        _env_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK_T, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_CHUNK_T, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        # vma: when called inside shard_map (e.g. the time-SP envelope
        # seed, parallel/sharded.py) the outputs vary over the union of
        # the inputs' mesh axes; outside shard_map the sets are empty
        out_shape=[
            jax.ShapeDtypeStruct(
                (tp_, cp), dtype,
                vma=jax.typeof(xt).vma | jax.typeof(e0).vma
                    | jax.typeof(att).vma | jax.typeof(rel).vma),
            jax.ShapeDtypeStruct(
                (1, cp), dtype,
                vma=jax.typeof(xt).vma | jax.typeof(e0).vma
                    | jax.typeof(att).vma | jax.typeof(rel).vma),
        ],
        scratch_shapes=[pltpu.VMEM((1, cp), dtype)],
        interpret=jax.default_backend() != "tpu",
    )(att, rel, e0, xt)

    del envf  # reflects padded tail; the true carry is the last real sample
    traj = out.T[:c, :t]
    return traj[:, -1], traj


def envelope_scan_dispatch(targets, env0, attack, release):
    """Backend dispatch (the `OpRegistry.Lookup` analog): Pallas on TPU
    for 2-D (C, T) batches, lax.scan elsewhere. Routed through
    `ops.envscan.envelope_scan`, which owns both the backend selection
    and the custom VJP (differentiable on either backend)."""
    from algodsp_tpu.ops.envscan import envelope_scan
    return envelope_scan(targets, env0, attack, release)


# ---------------------------------------------------------------------------
# Fused biquad cascade kernel
# ---------------------------------------------------------------------------
#
# The XLA blocked engine (ops/linrec.py) writes every section's
# intermediate signal to HBM (S passes over the data). This kernel runs
# the ENTIRE cascade per 128-sample block inside VMEM: for each block,
# section s's output feeds section s+1 immediately, with each section's
# (x-halo, y-carry) held in scratch across the sequential grid steps.
# Total HBM traffic: read x once, write y once — independent of S.
#
# Per section and block (channels tile on sublanes, time on lanes):
#   f   = b0*x + b1*shift1(x | halo) + b2*shift2(x | halo)
#   u   = f @ L_s^T                       (MXU, 128x128)
#   y   = u + c0 * p_s + c1 * q_s         (carry correction columns)
#   carry_s <- (y[:, -1], y[:, -2]) ; halo_s <- (x[:, -1], x[:, -2])

_BQ_BLOCK = 128
_BQ_CTILE = 128


def _biquad_kernel(fir_ref, L_ref, p_ref, q_ref, c0_ref, h0_ref,
                   x_ref, out_ref, cf_ref, hf_ref, carry, halo):
    k = pl.program_id(1)
    n_sections = L_ref.shape[0]

    @pl.when(k == 0)
    def _():
        carry[...] = c0_ref[...]
        halo[...] = h0_ref[...]

    x = x_ref[...]  # (CTILE, B)

    def section(s, x):
        b0 = fir_ref[s, 0]
        b1 = fir_ref[s, 1]
        b2 = fir_ref[s, 2]
        h = halo[s]                     # (CTILE, 2): [x_{-1}, x_{-2}]
        x1 = pltpu.roll(x, 1, 1)        # x shifted right by one (wraps)
        x1 = jnp.concatenate([h[:, 0:1], x1[:, 1:]], axis=1)
        x2 = pltpu.roll(x, 2, 1)
        x2 = jnp.concatenate([h[:, 1:2], x1_prev_col(x, h), x2[:, 2:]], axis=1)
        f = b0 * x + b1 * x1 + b2 * x2
        u = jax.lax.dot_general(
            f, L_ref[s], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        c = carry[s]                    # (CTILE, 2): [y_{-1}, y_{-2}]
        y = u + c[:, 0:1] * p_ref[s] + c[:, 1:2] * q_ref[s]
        halo[s] = jnp.concatenate([x[:, -1:], x[:, -2:-1]], axis=1)
        carry[s] = jnp.concatenate([y[:, -1:], y[:, -2:-1]], axis=1)
        return y

    def x1_prev_col(x, h):
        # second column of the shift-2 signal is x_{-1} (the halo's first)
        return h[:, 0:1]

    y = x
    for s in range(n_sections):
        y = section(s, y)
    out_ref[...] = y

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        cf_ref[...] = carry[...]
        hf_ref[...] = halo[...]


def _biquad_cascade_raw(x, sos, gain: float = 1.0, state=None,
                        return_state: bool = False):
    """Fused biquad cascade: x (C, N) -> y (C, N).

    C and N are padded internally to multiples of (8, 128). The cascade
    coefficient tensors (Toeplitz L, carry columns p/q) come from the
    same host precompute as the XLA engine.

    state: optional (C, S, 4) per-channel per-section streaming state
    [x_{n-1}, x_{n-2}, y_{n-1}, y_{n-2}] (the BiquadChain layout); zero
    state when None. With `return_state=True` returns (y, new_state) —
    the carry-out reflects the PADDED tail when N % 128 != 0, so
    streaming callers must keep N a block multiple.
    """
    import numpy as np
    from algodsp_tpu.ops import linrec

    x = jnp.asarray(x)
    if x.ndim != 2:
        raise ValueError("biquad_cascade_pallas expects (C, N)")
    sos_arr = np.asarray(sos, dtype=np.float64).reshape(-1, 5)
    n_sections = sos_arr.shape[0]
    kern = linrec.ar2_kernels(sos_arr[:, 3], sos_arr[:, 4], _BQ_BLOCK)

    c, n = x.shape
    dtype = x.dtype
    c_pad = (-c) % _BQ_CTILE
    n_pad = (-n) % _BQ_BLOCK
    if return_state and n_pad:
        raise ValueError("return_state requires N to be a multiple of 128")
    xp = jnp.pad(x, ((0, c_pad), (0, n_pad)))
    if gain != 1.0:
        xp = xp * jnp.asarray(gain, dtype)
    cp, np_ = xp.shape
    grid = (cp // _BQ_CTILE, np_ // _BQ_BLOCK)

    fir = jnp.asarray(sos_arr[:, :3], dtype)              # (S, 3)
    L = jnp.asarray(kern.L, dtype)                        # (S, B, B)
    p = jnp.asarray(kern.p, dtype)                        # (S, B)
    q = jnp.asarray(kern.q, dtype)                        # (S, B)

    if state is None:
        h0 = jnp.zeros((n_sections, cp, 2), dtype)
        c0 = jnp.zeros((n_sections, cp, 2), dtype)
    else:
        st = jnp.asarray(state, dtype)                    # (C, S, 4)
        st = jnp.pad(st, ((0, c_pad), (0, 0), (0, 0)))
        st = jnp.moveaxis(st, 0, 1)                       # (S, cp, 4)
        h0 = st[..., 0:2]                                 # [x1, x2]
        c0 = st[..., 2:4]                                 # [y1, y2]

    out, cf, hf = pl.pallas_call(
        _biquad_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_sections, 3), lambda i, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_sections, _BQ_BLOCK, _BQ_BLOCK),
                         lambda i, k: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sections, _BQ_BLOCK), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sections, _BQ_BLOCK), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sections, _BQ_CTILE, 2), lambda i, k: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sections, _BQ_CTILE, 2), lambda i, k: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BQ_CTILE, _BQ_BLOCK), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BQ_CTILE, _BQ_BLOCK), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sections, _BQ_CTILE, 2), lambda i, k: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sections, _BQ_CTILE, 2), lambda i, k: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp, np_), dtype),
            jax.ShapeDtypeStruct((n_sections, cp, 2), dtype),
            jax.ShapeDtypeStruct((n_sections, cp, 2), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_sections, _BQ_CTILE, 2), dtype),
            pltpu.VMEM((n_sections, _BQ_CTILE, 2), dtype),
        ],
        interpret=jax.default_backend() != "tpu",
    )(fir, L, p, q, c0, h0, xp)
    y = out[:c, :n]
    if not return_state:
        return y
    new_state = jnp.concatenate([hf, cf], axis=-1)        # (S, cp, 4)
    new_state = jnp.moveaxis(new_state, 0, 1)[:c]         # (C, S, 4)
    return y, new_state


@functools.lru_cache(maxsize=64)
def _cascade_diff_op(sos_bytes: bytes, n_sections: int, gain: float):
    """custom-VJP wrapper for the zero-state fused cascade.

    The zero-state cascade over a fixed length N is an exact causal LTI
    map: per channel y = gain * T x with T an N x N lower-triangular
    Toeplitz matrix (the carry corrections inside the kernel make the
    blocked evaluation mathematically identical to the sequential
    recurrence). Its adjoint is the anticausal filter T^T = J T J
    (J = time flip), so the VJP is ONE more pass of the same fused
    kernel on the time-reversed cotangent — no XLA fallback, no
    recomputation, and the backward runs at forward speed. JAX cannot
    autodiff the Pallas grid kernel itself; this rule makes the fast
    path differentiable w.r.t. the signal.
    """
    import numpy as np
    sos_arr = np.frombuffer(sos_bytes, dtype=np.float64).reshape(
        n_sections, 5).copy()

    @jax.custom_vjp
    def op(x):
        return _biquad_cascade_raw(x, sos_arr, gain=gain)

    def fwd(x):
        return _biquad_cascade_raw(x, sos_arr, gain=gain), None

    def bwd(_, g):
        dx = jnp.flip(_biquad_cascade_raw(jnp.flip(g, -1), sos_arr,
                                          gain=gain), -1)
        return (dx,)

    op.defvjp(fwd, bwd)
    return op


def biquad_cascade_pallas(x, sos, gain: float = 1.0, state=None,
                          return_state: bool = False):
    """Fused biquad cascade (see `_biquad_cascade_raw` for the kernel
    contract). The zero-state, no-state-return path — the bulk
    processing case — carries a custom VJP (exact adjoint filter), so
    `jax.grad` flows through it w.r.t. the input signal. The streaming
    path (explicit state in/out) is not differentiable through the
    Pallas kernel; streaming callers that need gradients should use the
    XLA blocked engine (`BiquadChain.process(mode="blocked")`)."""
    if state is None and not return_state:
        import numpy as np
        sos_arr = np.ascontiguousarray(
            np.asarray(sos, dtype=np.float64).reshape(-1, 5))
        op = _cascade_diff_op(sos_arr.tobytes(), sos_arr.shape[0],
                              float(gain))
        return op(x)
    return _biquad_cascade_raw(x, sos, gain=gain, state=state,
                               return_state=return_state)


# ---------------------------------------------------------------------------
# Fused Moog ladder kernel (classic family + Huovilainen)
# ---------------------------------------------------------------------------
# The nonlinear ladder is genuinely sequential (tanh feedback every
# sample), so like the envelope kernel it walks time inside VMEM with
# channels on the 128-lane axis: one fused VPU loop with the 8-row
# state (4 stages, 3 tanh memories, prev out) carried in scratch across
# sequential grid steps. ~6x over lax.scan on a v5e chip.

_MOOG_LIMIT = 32.0  # must equal filters.moog.STATE_LIMIT


def _poly_tanh(x):
    x2 = x * x
    return jnp.where(x > 3, 1.0,
                     jnp.where(x < -3, -1.0,
                               jnp.clip(x * (27 + x2) / (27 + 9 * x2), -1, 1)))


def _moog_kernel(params_ref, st0_ref, x_ref, out_ref, stf_ref, carry,
                 *, fast_tanh: bool, huovilainen: bool):
    t_chunk = x_ref.shape[0]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry[:] = st0_ref[:]

    coef = params_ref[0, 0]
    ds = params_ref[1, 0]
    fb = params_ref[2, 0]
    ig = params_ref[3, 0]
    osc = params_ref[4, 0]
    tanh_fn = _poly_tanh if fast_tanh else jnp.tanh

    def clip(v):
        return jnp.clip(v, -_MOOG_LIMIT, _MOOG_LIMIT)

    def body(t, st):
        s0, s1, s2, s3, t0m, t1m, t2m, prev = st
        xv = x_ref[pl.ds(t, 1), :]
        if huovilainen:
            fbv = 0.5 * (s3 + prev)
            u = xv * ig - fb * fbv
            t_in = jnp.tanh(ds * u)
            tS0 = jnp.tanh(ds * s0)
            tS1 = jnp.tanh(ds * s1)
            tS2 = jnp.tanh(ds * s2)
            tS3 = jnp.tanh(ds * s3)
            s0n = clip(s0 + coef * (t_in - tS0))
            t0 = jnp.tanh(ds * s0n)
            s1n = clip(s1 + coef * (t0 - tS1))
            t1 = jnp.tanh(ds * s1n)
            s2n = clip(s2 + coef * (t1 - tS2))
            t2 = jnp.tanh(ds * s2n)
            s3n = clip(s3 + coef * (t2 - tS3))
        else:
            u = xv * ig - fb * s3
            t_in = tanh_fn(ds * u)
            s0n = clip(s0 + coef * (t_in - t0m))
            t0 = tanh_fn(ds * s0n)
            s1n = clip(s1 + coef * (t0 - t1m))
            t1 = tanh_fn(ds * s1n)
            s2n = clip(s2 + coef * (t1 - t2m))
            t2 = tanh_fn(ds * s2n)
            s3n = clip(s3 + coef * (t2 - tanh_fn(ds * s3)))
        out_ref[pl.ds(t, 1), :] = osc * s3n
        return (s0n, s1n, s2n, s3n, t0, t1, t2, s3n)

    st = tuple(carry[i:i + 1, :] for i in range(8))
    st = jax.lax.fori_loop(0, t_chunk, body, st)
    for i in range(8):
        carry[i:i + 1, :] = st[i]

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        for i in range(8):
            stf_ref[i:i + 1, :] = st[i]


def moog_ladder_pallas(x, state8, params, *, fast_tanh: bool,
                       huovilainen: bool):
    """Fused ladder over (C, T).

    state8: (8, C) rows = [stage0..3, tanh_last0..2, prev_out];
    params: 5-vector [coef, drive_scale, feedback, input_gain,
    output_scale]. Returns (new_state8, y (C, T)).
    """
    x = jnp.asarray(x)
    c, t = x.shape
    dtype = x.dtype
    c_pad = (-c) % 128
    t_pad = (-t) % _CHUNK_T
    xp = jnp.pad(x, ((0, c_pad), (0, t_pad)))
    st0 = jnp.pad(jnp.asarray(state8, dtype), ((0, 0), (0, c_pad)))
    cp, tp_ = xp.shape
    xt = xp.T
    grid = tp_ // _CHUNK_T
    pvec = jnp.asarray(params, dtype).reshape(5, 1)

    kern = functools.partial(_moog_kernel, fast_tanh=fast_tanh,
                             huovilainen=huovilainen)
    out, stf = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((5, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK_T, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_CHUNK_T, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp_, cp), dtype),
            jax.ShapeDtypeStruct((8, cp), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((8, cp), dtype)],
        interpret=jax.default_backend() != "tpu",
    )(pvec, st0, xt)

    return stf[:, :c], out.T[:c, :t]


def _moog_zdf_kernel(params_ref, st0_ref, x_ref, out_ref, stf_ref, carry,
                     *, newton_iters: int):
    t_chunk = x_ref.shape[0]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry[:] = st0_ref[:]

    gk = params_ref[0, 0]
    shape = params_ref[1, 0]
    k = params_ref[2, 0]
    ig = params_ref[3, 0]
    osc = params_ref[4, 0]
    v_scale = gk / shape

    def clip(v):
        return jnp.clip(v, -_MOOG_LIMIT, _MOOG_LIMIT)

    def body(t, st):
        s0, s1, s2, s3, _t0, _t1, _t2, prev = st
        xv = x_ref[pl.ds(t, 1), :]
        inp = xv * ig
        tS0 = jnp.tanh(shape * s0)
        tS1 = jnp.tanh(shape * s1)
        tS2 = jnp.tanh(shape * s2)
        tS3 = jnp.tanh(shape * s3)

        def ladder(y3est):
            u = inp - k * y3est
            tU = jnp.tanh(shape * u)
            v0 = v_scale * (tU - tS0); y0 = v0 + s0
            d0 = gk * (1 - tU * tU)
            tY0 = jnp.tanh(shape * y0)
            v1 = v_scale * (tY0 - tS1); y1 = v1 + s1
            d1 = gk * (1 - tY0 * tY0)
            tY1 = jnp.tanh(shape * y1)
            v2 = v_scale * (tY1 - tS2); y2 = v2 + s2
            d2 = gk * (1 - tY1 * tY1)
            tY2 = jnp.tanh(shape * y2)
            v3 = v_scale * (tY2 - tS3); y3 = v3 + s3
            d3 = gk * (1 - tY2 * tY2)
            return (v0, v1, v2, v3), y3, d0 * d1 * d2 * d3

        y3est = prev
        for _ in range(newton_iters):
            _, y3, dprod = ladder(y3est)
            residual = y3 - y3est
            J = dprod * (-k) - 1.0
            y3est = jnp.where(jnp.abs(J) < 1e-15, y3est,
                              y3est - residual / jnp.where(jnp.abs(J) < 1e-15,
                                                           1.0, J))
        (v0, v1, v2, v3), y3, _ = ladder(y3est)
        out_ref[pl.ds(t, 1), :] = osc * y3
        return (clip(s0 + 2 * v0), clip(s1 + 2 * v1), clip(s2 + 2 * v2),
                clip(s3 + 2 * v3), _t0, _t1, _t2, y3)

    st = tuple(carry[i:i + 1, :] for i in range(8))
    st = jax.lax.fori_loop(0, t_chunk, body, st)
    for i in range(8):
        carry[i:i + 1, :] = st[i]

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        for i in range(8):
            stf_ref[i:i + 1, :] = st[i]


def moog_zdf_pallas(x, state8, params, *, newton_iters: int):
    """Fused ZDF (TPT + Newton) ladder over (C, T); same layout as
    `moog_ladder_pallas`. params = [zdf_gk, drive_scale, feedback,
    input_gain, output_scale]."""
    x = jnp.asarray(x)
    c, t = x.shape
    dtype = x.dtype
    c_pad = (-c) % 128
    t_pad = (-t) % _CHUNK_T
    xp = jnp.pad(x, ((0, c_pad), (0, t_pad)))
    st0 = jnp.pad(jnp.asarray(state8, dtype), ((0, 0), (0, c_pad)))
    cp, tp_ = xp.shape
    xt = xp.T
    grid = tp_ // _CHUNK_T
    pvec = jnp.asarray(params, dtype).reshape(5, 1)

    kern = functools.partial(_moog_zdf_kernel, newton_iters=newton_iters)
    out, stf = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((5, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK_T, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_CHUNK_T, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp_, cp), dtype),
            jax.ShapeDtypeStruct((8, cp), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((8, cp), dtype)],
        interpret=jax.default_backend() != "tpu",
    )(pvec, st0, xt)

    return stf[:, :c], out.T[:c, :t]
