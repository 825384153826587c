"""Per-instance jit wrapping for eager-safe public methods.

The axon TPU relay executes simple real-valued ops eagerly but lacks
standalone implementations of several complex-arithmetic ops (complex
multiply, ifft/irfft, .real extraction) — the same graphs compile fine
under jit. Methods whose bodies do complex spectral arithmetic are
wrapped with `jit_method`: inside an existing trace the inner jit
folds away (zero behavior change for jitted pipelines); in eager use
the method becomes a per-shape cached compiled call, so
`OverlapSave(...).process(x)` works directly on the TPU backend.

The wrapped method must be pure given (self, *args): `self` is
captured in the jit closure as static configuration.
"""

from __future__ import annotations

import functools

import jax


def jit_method(fn):
    """Wrap a pure method in a per-instance cached `jax.jit`.

    Keyword arguments are treated as STATIC configuration (hashable,
    e.g. ints/enums/None) and key the jit cache; positional arguments
    are traced.
    """
    cache_attr = f"_jit_{fn.__name__}"

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        cache = self.__dict__.get(cache_attr)
        if cache is None:
            cache = {}
            self.__dict__[cache_attr] = cache
        key = tuple(sorted(kwargs.items()))
        cached = cache.get(key)
        if cached is None:
            cached = jax.jit(functools.partial(fn, self, **kwargs))
            cache[key] = cached
        return cached(*args)

    wrapper.__wrapped__ = fn
    return wrapper
