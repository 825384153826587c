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

import collections
import functools
import os

import jax
import numpy as np

# Per-instance jit caches are bounded: each distinct (static kwargs,
# traced kwarg names, env values) key retains a compiled executable, so
# long-running processes that toggle env_keys variables would otherwise
# accumulate entries without bound. 16 covers every (mode, env) combo a
# single instance realistically cycles through.
_CACHE_MAX = 16


def _is_arraylike(v) -> bool:
    return isinstance(v, (jax.Array, np.ndarray)) or hasattr(v, "aval")


def jit_method(fn=None, *, env_keys: tuple[str, ...] = ()):
    """Wrap a pure method in a per-instance cached `jax.jit`.

    Keyword arguments that are arrays (jax/numpy or tracers) are traced
    like positional arguments; hashable keyword arguments are STATIC
    configuration (ints/enums/None) and key the jit cache. `env_keys`
    names environment variables whose *current values* join the cache
    key, so methods that dispatch on an env var (e.g.
    ``ALGODSP_FDL_FUSED``) re-trace when the variable changes instead
    of silently replaying the first-seen dispatch.
    """
    if fn is None:
        return functools.partial(jit_method, env_keys=env_keys)

    cache_attr = f"_jit_{fn.__name__}"

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        cache = self.__dict__.get(cache_attr)
        if cache is None:
            cache = collections.OrderedDict()
            self.__dict__[cache_attr] = cache
        static = {}
        traced = {}
        for k, v in kwargs.items():
            if _is_arraylike(v):
                traced[k] = v
            else:
                try:
                    hash(v)
                except TypeError:
                    raise TypeError(
                        f"{fn.__qualname__}: keyword argument {k!r} is "
                        "neither an array nor hashable; pass data as an "
                        "array or configuration as a hashable value"
                    ) from None
                static[k] = v
        key = (tuple(sorted(static.items())),
               tuple(sorted(traced)),
               tuple(os.environ.get(e, "") for e in env_keys))
        cached = cache.get(key)
        if cached is None:
            cached = jax.jit(functools.partial(fn, self, **static))
            cache[key] = cached
            if len(cache) > _CACHE_MAX:
                cache.popitem(last=False)
        else:
            cache.move_to_end(key)
        return cached(*args, **traced)

    wrapper.__wrapped__ = fn
    return wrapper
