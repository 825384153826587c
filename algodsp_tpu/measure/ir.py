"""Room-acoustics metrics from an impulse response.

Capability parity with `measure/ir/ir.go`: Schroeder backward
integration (`ir.go:94-139`), RT60/T20/T30/EDT via line fits on decay
segments extrapolated to -60 dB (`ir.go:140-212`), C50/C80 clarity
(`ir.go:264-316`), D50/D80 definition (`ir.go:214-262`), center time
(`ir.go:318-348`), impulse start/peak detection (`ir.go:381-420`).

The Schroeder integral is a reversed cumulative sum (one jnp op); the
line fits and scalar metrics run in float64 NumPy.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class IRMetrics:
    rt60: float = 0.0
    edt: float = 0.0
    t20: float = 0.0
    t30: float = 0.0
    c50: float = 0.0
    c80: float = 0.0
    d50: float = 0.0
    d80: float = 0.0
    center_time: float = 0.0
    peak_index: int = 0
    start_index: int = 0


class Analyzer:
    def __init__(self, sample_rate: float):
        if sample_rate <= 0:
            raise ValueError("ir: sample rate must be > 0")
        self.sample_rate = sample_rate

    def schroeder_integral(self, ir) -> np.ndarray:
        """Backward energy integration in dB, floored at -200
        (`ir.go:103-131`)."""
        x = np.asarray(ir, dtype=np.float64)
        if x.size == 0:
            raise ValueError("ir: empty impulse response")
        energy = np.cumsum((x * x)[::-1])[::-1]
        total = energy[0]
        if total <= 0:
            return energy
        ratio = energy / total
        with np.errstate(divide="ignore"):
            db = np.where(ratio > 0, 10.0 * np.log10(np.maximum(ratio, 1e-300)),
                          -200.0)
        return np.maximum(db, -200.0)

    def _reverb_time(self, schroeder: np.ndarray, start_db: float,
                     end_db: float) -> float:
        """Line fit between decay levels, extrapolated to -60 dB
        (`ir.go:140-212`)."""
        idx_start = np.argmax(schroeder <= start_db)
        idx_end = np.argmax(schroeder <= end_db)
        if schroeder[idx_start] > start_db or schroeder[idx_end] > end_db \
                or idx_end <= idx_start:
            return 0.0
        seg = schroeder[idx_start:idx_end + 1]
        t = np.arange(seg.size) / self.sample_rate
        # least-squares slope
        tm, sm = t.mean(), seg.mean()
        denom = ((t - tm) ** 2).sum()
        if denom <= 0:
            return 0.0
        slope = (((t - tm) * (seg - sm)).sum()) / denom
        if slope >= 0:
            return 0.0
        return -60.0 / slope

    def _find_start_peak(self, x: np.ndarray) -> tuple[int, int]:
        peak = int(np.argmax(np.abs(x)))
        thresh = np.abs(x[peak]) * 10 ** (-20 / 20)  # -20 dB before peak
        start = peak
        while start > 0 and abs(x[start - 1]) > thresh:
            start -= 1
        return start, peak

    def _clarity(self, x: np.ndarray, ms: float) -> float:
        split = int(round(ms * 1e-3 * self.sample_rate))
        early = float((x[:split] ** 2).sum())
        late = float((x[split:] ** 2).sum())
        if late <= 0:
            return math.inf
        if early <= 0:
            return -math.inf
        return 10.0 * math.log10(early / late)

    def _definition(self, x: np.ndarray, ms: float) -> float:
        split = int(round(ms * 1e-3 * self.sample_rate))
        total = float((x ** 2).sum())
        if total <= 0:
            return 0.0
        return float((x[:split] ** 2).sum()) / total

    def _center_time(self, x: np.ndarray) -> float:
        e = x * x
        total = e.sum()
        if total <= 0:
            return 0.0
        t = np.arange(x.size) / self.sample_rate
        return float((t * e).sum() / total)

    def analyze(self, ir) -> IRMetrics:
        """Full metric set (`ir.go:43-86`)."""
        x = np.asarray(ir, dtype=np.float64)
        if x.size == 0:
            raise ValueError("ir: empty impulse response")
        start, peak = self._find_start_peak(x)
        from_peak = x[peak:]
        schroeder = self.schroeder_integral(x)

        edt = self._reverb_time(schroeder, 0.0, -10.0)
        t20 = self._reverb_time(schroeder, -5.0, -25.0)
        t30 = self._reverb_time(schroeder, -5.0, -35.0)
        rt60 = t30 if t30 > 0 else t20
        return IRMetrics(
            rt60=rt60, edt=edt, t20=t20, t30=t30,
            c50=self._clarity(from_peak, 50.0),
            c80=self._clarity(from_peak, 80.0),
            d50=self._definition(from_peak, 50.0),
            d80=self._definition(from_peak, 80.0),
            center_time=self._center_time(from_peak),
            peak_index=peak, start_index=start)
