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

    a = att_ref[0, 0]
    r = rel_ref[0, 0]

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

    att = jnp.full((1, 1), attack, dtype)
    rel = jnp.full((1, 1), release, dtype)

    out, envf = pl.pallas_call(
        _env_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK_T, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_CHUNK_T, cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp_, cp), dtype),
            jax.ShapeDtypeStruct((1, cp), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((1, cp), dtype)],
        interpret=jax.default_backend() != "tpu",
    )(att, rel, e0, xt)

    del envf  # reflects padded tail; the true carry is the last real sample
    traj = out.T[:c, :t]
    return traj[:, -1], traj


def envelope_scan_dispatch(targets, env0, attack, release):
    """Backend dispatch (the `OpRegistry.Lookup` analog): Pallas on TPU
    for 2-D (C, T) batches, lax.scan elsewhere."""
    from algodsp_tpu.ops.envscan import envelope_scan
    x = jnp.asarray(targets)
    if jax.default_backend() == "tpu" and x.ndim == 2:
        return envelope_scan_pallas(x, env0, attack, release)
    return envelope_scan(x, env0, attack, release)
