"""Pipeline parallelism for deep filter cascades.

SURVEY.md §2.9 (PP row): the reference executes its effect graph one
node after another on one core (`chain_process.go:24-30`); the
TPU-native counterpart stages a deep cascade across mesh devices with
block-granularity handoff.

GPipe-style schedule over a `stage` mesh axis: device s holds sections
[s*k, (s+1)*k) of the cascade plus their streaming state. Each step,
every device filters one block and hands the result to device s+1 via
`jax.lax.ppermute` (one ICI hop of a (C, B) block); after the S-1-step
fill, all S devices work concurrently on consecutive blocks. Streaming
carries stay device-local, so the result is EXACTLY the serial
cascade's output — verified by the mesh tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from algodsp_tpu.ops import linrec


def biquad_pipeline(mesh, axis: str, sos, x, *, block: int = 2048):
    """Run an S*k-section biquad cascade pipelined over mesh axis `axis`.

    sos: (total_sections, 5) a0-normalized coefficients; total_sections
    must divide evenly by the axis size. x: (..., N) with N a multiple
    of `block`. Returns y, bit-matching the serial cascade.
    """
    n_stages = mesh.shape[axis]
    sos = np.asarray(sos, dtype=np.float64).reshape(-1, 5)
    total = sos.shape[0]
    if total % n_stages:
        raise ValueError(
            f"pipeline: {total} sections do not split over {n_stages} stages")
    per = total // n_stages
    x = jnp.asarray(x)
    n = x.shape[-1]
    if n % block:
        raise ValueError(f"pipeline: length {n} not a multiple of {block}")
    nb = n // block
    dtype = x.dtype

    # per-stage blocked-recurrence kernels (host precompute, stacked on
    # the stage axis so each device gets its own slice)
    kerns = [linrec.ar2_kernels(sos[s * per:(s + 1) * per, 3],
                                sos[s * per:(s + 1) * per, 4], block)
             for s in range(n_stages)]
    L = jnp.asarray(np.stack([k.L for k in kerns]), dtype)    # (S, per, B, B)
    pcol = jnp.asarray(np.stack([k.p for k in kerns]), dtype)
    qcol = jnp.asarray(np.stack([k.q for k in kerns]), dtype)
    fir = jnp.asarray(np.stack([sos[s * per:(s + 1) * per, :3]
                                for s in range(n_stages)]), dtype)  # (S,per,3)

    batch = x.shape[:-1]
    xb = jnp.moveaxis(x.reshape(batch + (nb, block)), -2, 0)  # (nb, ..., B)
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def stage_apply(fir_s, L_s, p_s, q_s, carry, blk):
        """Filter one block through this device's sub-cascade: per
        section a 3-tap FIR with carried history, then the one-block
        Toeplitz solve u = f @ L^T plus initial-condition columns."""
        y = blk
        new_c = []
        for i in range(per):
            cx, cy = carry[i]
            f = linrec.fir3(y, fir_s[i, 0], fir_s[i, 1], fir_s[i, 2],
                            cx[0], cx[1])
            newx = jnp.stack([y[..., -1], y[..., -2]])
            u = jnp.einsum("...b,cb->...c", f, L_s[i],
                           precision=jax.lax.Precision.HIGHEST)
            y = (u + cy[0][..., None] * p_s[i]
                 + cy[1][..., None] * q_s[i])
            new_c.append((newx, jnp.stack([y[..., -1], y[..., -2]])))
        return new_c, y

    def run(fir_s, L_s, p_s, q_s, xblocks):
        # shapes inside shard_map: leading stage axis of size 1
        fir_s, L_s, p_s, q_s = fir_s[0], L_s[0], p_s[0], q_s[0]
        idx = jax.lax.axis_index(axis)
        zero = jnp.zeros(batch + (block,), dtype)
        carry = [(jnp.zeros((2,) + batch, dtype),
                  jnp.zeros((2,) + batch, dtype)) for _ in range(per)]
        buf = zero          # block handed over from the previous stage
        outs = []
        for k in range(nb + n_stages - 1):
            if k < nb:
                inblk = jnp.where(idx == 0, xblocks[k], buf)
            else:
                inblk = buf
            carry, y = stage_apply(fir_s, L_s, p_s, q_s, carry, inblk)
            buf = jax.lax.ppermute(y, axis, perm) if perm else y
            if k >= n_stages - 1:
                # only the last stage's block is the pipeline output
                outs.append(jnp.where(idx == n_stages - 1, y, 0.0))
        # every stage but the last contributed zeros; the outer shard
        # sum over the stage axis therefore selects the pipeline output
        return jnp.stack(outs)[None]                # (1, nb, ..., B)

    spec_stage = P(axis)
    run_sharded = shard_map(
        run, mesh=mesh,
        in_specs=(spec_stage, spec_stage, spec_stage, spec_stage, P()),
        out_specs=spec_stage)
    out = run_sharded(fir, L, pcol, qcol, xb)       # (S, nb, ..., B)
    y = out.sum(axis=0)
    return jnp.moveaxis(y, 0, -2).reshape(batch + (n,))
