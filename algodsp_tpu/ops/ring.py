"""Ring-buffer <-> shift-register layout conversion.

TPU note: a modulo-index gather (`buf[..., (step + arange(L)) % L]`)
lowers to a slow elementwise gather on TPU.  The same rotation is two
contiguous copies: double the buffer and take one dynamic slice —
pure memcpy-speed HLO, works with a traced `step`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ring_to_linear(buf, step):
    """Reorder a ring buffer (write pointer = step mod L) into
    shift-register layout: oldest sample first, newest last."""
    L = buf.shape[-1]
    s = jnp.mod(jnp.asarray(step, jnp.int32), L)
    return jax.lax.dynamic_slice_in_dim(
        jnp.concatenate([buf, buf], axis=-1), s, L, axis=-1)


def linear_to_ring(lin, step):
    """Inverse of ring_to_linear for the given (new) step count."""
    L = lin.shape[-1]
    s = jnp.mod(jnp.asarray(step, jnp.int32), L)
    return jax.lax.dynamic_slice_in_dim(
        jnp.concatenate([lin, lin], axis=-1), L - s, L, axis=-1)
