"""Time-domain signal statistics.

Capability parity with `stats/time/stats.go`: single-pass moments — DC,
RMS, min/max with positions, peak, range, crest factor (linear & dB),
energy, power, zero crossings, variance/skewness/kurtosis
(`stats.go:66-170`) — plus a mergeable streaming variant
(`stats.go:285-410`, Welford/Chan parallel moment merging).

TPU-first: the one-shot path is pure jnp reductions (one fused pass on
the VPU); the streaming variant keeps Chan-mergeable moment sums as a
pytree so blocks (or shards, via psum) combine exactly.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TimeStats:
    dc: float
    rms: float
    min: float
    max: float
    min_pos: int
    max_pos: int
    peak: float
    range: float
    crest: float
    crest_db: float
    energy: float
    power: float
    zero_crossings: int
    variance: float
    skewness: float
    kurtosis: float


def calculate(x) -> TimeStats:
    """One-shot statistics (`stats.go:66-170`)."""
    xj = jnp.asarray(x)
    if xj.size == 0:
        raise ValueError("stats: empty input")
    n = xj.shape[-1]
    mean = jnp.mean(xj)
    energy = jnp.sum(xj * xj)
    power = energy / n
    rms = jnp.sqrt(power)
    mn, mx = jnp.min(xj), jnp.max(xj)
    peak = jnp.maximum(jnp.abs(mn), jnp.abs(mx))
    d = xj - mean
    m2 = jnp.mean(d * d)
    m3 = jnp.mean(d ** 3)
    m4 = jnp.mean(d ** 4)
    zc = jnp.sum((xj[..., :-1] * xj[..., 1:]) < 0)
    crest = jnp.where(rms > 0, peak / jnp.where(rms > 0, rms, 1.0), 0.0)

    f = lambda v: float(v)
    variance = f(m2)
    std = math.sqrt(variance) if variance > 0 else 0.0
    return TimeStats(
        dc=f(mean), rms=f(rms), min=f(mn), max=f(mx),
        min_pos=int(jnp.argmin(xj)), max_pos=int(jnp.argmax(xj)),
        peak=f(peak), range=f(mx - mn),
        crest=f(crest),
        crest_db=(20.0 * math.log10(f(crest)) if f(crest) > 0 else -math.inf),
        energy=f(energy), power=f(power),
        zero_crossings=int(zc), variance=variance,
        skewness=(f(m3) / std ** 3 if std > 0 else 0.0),
        kurtosis=(f(m4) / variance ** 2 if variance > 0 else 0.0))


@dataclasses.dataclass
class StreamingStats:
    """Mergeable incremental statistics (`stats.go:285-410`).

    Carries (n, mean, M2, M3, M4, energy, min, max, zero crossings,
    last sample) and merges blocks with Chan's parallel update — the
    same quantities shard cleanly across a mesh with psum.
    """
    n: int = 0
    mean: float = 0.0
    m2: float = 0.0
    m3: float = 0.0
    m4: float = 0.0
    energy: float = 0.0
    min: float = math.inf
    max: float = -math.inf
    zero_crossings: int = 0
    _last: float = 0.0
    _has_last: bool = False

    def update(self, x):
        """Fold a block in (vectorized, then Chan-merge)."""
        xa = np.asarray(x, dtype=np.float64).reshape(-1)
        if xa.size == 0:
            return self
        nb = xa.size
        mean_b = xa.mean()
        d = xa - mean_b
        m2_b = float((d ** 2).sum())
        m3_b = float((d ** 3).sum())
        m4_b = float((d ** 4).sum())
        zc = int(np.sum(xa[:-1] * xa[1:] < 0))
        if self._has_last and self._last * xa[0] < 0:
            zc += 1

        na, nn = self.n, self.n + nb
        delta = mean_b - self.mean
        if na == 0:
            self.mean, self.m2, self.m3, self.m4 = mean_b, m2_b, m3_b, m4_b
        else:
            # Chan et al. parallel moment merging
            self.m4 = (self.m4 + m4_b
                       + delta ** 4 * na * nb * (na ** 2 - na * nb + nb ** 2) / nn ** 3
                       + 6.0 * delta ** 2 * (na ** 2 * m2_b + nb ** 2 * self.m2) / nn ** 2
                       + 4.0 * delta * (na * m3_b - nb * self.m3) / nn)
            self.m3 = (self.m3 + m3_b
                       + delta ** 3 * na * nb * (na - nb) / nn ** 2
                       + 3.0 * delta * (na * m2_b - nb * self.m2) / nn)
            self.m2 = self.m2 + m2_b + delta ** 2 * na * nb / nn
            self.mean = self.mean + delta * nb / nn
        self.n = nn
        self.energy += float((xa * xa).sum())
        self.min = min(self.min, float(xa.min()))
        self.max = max(self.max, float(xa.max()))
        self.zero_crossings += zc
        self._last = float(xa[-1])
        self._has_last = True
        return self

    def merge(self, other: "StreamingStats") -> "StreamingStats":
        out = StreamingStats()
        na, nb = self.n, other.n
        if na == 0:
            return dataclasses.replace(other)
        if nb == 0:
            return dataclasses.replace(self)
        nn = na + nb
        delta = other.mean - self.mean
        out.n = nn
        out.mean = self.mean + delta * nb / nn
        out.m2 = self.m2 + other.m2 + delta ** 2 * na * nb / nn
        out.m3 = (self.m3 + other.m3
                  + delta ** 3 * na * nb * (na - nb) / nn ** 2
                  + 3.0 * delta * (na * other.m2 - nb * self.m2) / nn)
        out.m4 = (self.m4 + other.m4
                  + delta ** 4 * na * nb * (na ** 2 - na * nb + nb ** 2) / nn ** 3
                  + 6.0 * delta ** 2 * (na ** 2 * other.m2 + nb ** 2 * self.m2) / nn ** 2
                  + 4.0 * delta * (na * other.m3 - nb * self.m3) / nn)
        out.energy = self.energy + other.energy
        out.min = min(self.min, other.min)
        out.max = max(self.max, other.max)
        out.zero_crossings = self.zero_crossings + other.zero_crossings
        out._last = other._last
        out._has_last = other._has_last
        return out

    def result(self) -> TimeStats:
        if self.n == 0:
            raise ValueError("stats: no samples")
        variance = self.m2 / self.n
        std = math.sqrt(variance) if variance > 0 else 0.0
        power = self.energy / self.n
        rms = math.sqrt(power)
        peak = max(abs(self.min), abs(self.max))
        crest = peak / rms if rms > 0 else 0.0
        return TimeStats(
            dc=self.mean, rms=rms, min=self.min, max=self.max,
            min_pos=-1, max_pos=-1,  # positions not tracked in streaming mode
            peak=peak, range=self.max - self.min, crest=crest,
            crest_db=(20.0 * math.log10(crest) if crest > 0 else -math.inf),
            energy=self.energy, power=power,
            zero_crossings=self.zero_crossings, variance=variance,
            skewness=(self.m3 / self.n / std ** 3 if std > 0 else 0.0),
            kurtosis=(self.m4 / self.n / variance ** 2 if variance > 0 else 0.0))


# -- standalone helpers (stats.go:172-282) -----------------------------------
# Thin jnp reductions batched over leading dims; empty input returns 0
# like the reference's guard clauses.

def dc(x):
    """Mean value (`stats.go:186`)."""
    x = jnp.asarray(x)
    return jnp.mean(x, axis=-1) if x.shape[-1] else jnp.zeros(x.shape[:-1])


def rms(x):
    """Root mean square (`stats.go:172`)."""
    x = jnp.asarray(x)
    if not x.shape[-1]:
        return jnp.zeros(x.shape[:-1])
    return jnp.sqrt(jnp.mean(jnp.square(x), axis=-1))


def peak(x):
    """Largest absolute value (`stats.go:203`)."""
    x = jnp.asarray(x)
    if not x.shape[-1]:
        return jnp.zeros(x.shape[:-1])
    return jnp.max(jnp.abs(x), axis=-1)


def crest_factor(x):
    """peak/rms, 0 where rms is 0 (`stats.go:221`)."""
    r = rms(x)
    return jnp.where(r > 0, peak(x) / jnp.where(r > 0, r, 1.0), 0.0)


def zero_crossings(x):
    """Count of adjacent sample pairs with opposite signs — the strict
    product rule of `stats.go:239-243` (exact zeros never count),
    matching `calculate()`."""
    x = jnp.asarray(x)
    if x.shape[-1] < 2:
        return jnp.zeros(x.shape[:-1], jnp.int32)
    flips = (x[..., 1:] * x[..., :-1]) < 0
    return jnp.sum(flips, axis=-1).astype(jnp.int32)


def moments(x):
    """(mean, variance, skewness, kurtosis) (`stats.go:250-282`)."""
    x = jnp.asarray(x)
    if not x.shape[-1]:
        z = jnp.zeros(x.shape[:-1])
        return z, z, z, z
    mean = jnp.mean(x, axis=-1, keepdims=True)
    d = x - mean
    variance = jnp.mean(jnp.square(d), axis=-1)
    std = jnp.sqrt(variance)
    ok = std > 0
    safe = jnp.where(ok, std, 1.0)
    skew = jnp.where(ok, jnp.mean(d ** 3, axis=-1) / safe ** 3, 0.0)
    kurt = jnp.where(ok, jnp.mean(d ** 4, axis=-1) / safe ** 4, 0.0)
    return mean[..., 0], variance, skew, kurt
