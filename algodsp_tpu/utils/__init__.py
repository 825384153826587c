"""Shared utilities: elliptic-function math, polynomial root helpers."""

import jax as _jax


def donated_jit(fn, *, donate_argnums=(0,), **jit_kwargs):
    """jit with buffer donation — the TPU analog of the reference's
    `dsp/buffer.Pool` (SURVEY.md §2.1): streaming state pytrees passed
    as donated arguments are reused in place by XLA instead of
    reallocated every block, keeping steady-state HBM allocation flat.

        process = donated_jit(chain.process_stream)
        state, y = process(state, block)   # state buffer recycled
    """
    return _jax.jit(fn, donate_argnums=donate_argnums, **jit_kwargs)
