"""Real-time spectrum analyzer for the demo engine's EQ graph.

Capability parity with the reference web demo's analyzer
(`internal/webdemo/spectrum.go:13-197`): a ring of the last `fft_size`
master-bus samples, periodic-window STFT frames every
`hop = round(fft_size * (1 - overlap))` samples, magnitudes normalized
by `fft_size * mean(window)` with interior bins doubled, floored at
-130 dBFS, per-bin exponential smoothing across frames, and a curve
sampled at arbitrary frequencies by linear interpolation in bin space.

TPU-first: the reference pushes one sample at a time through a ring
(`pushSpectrumSample`); here a whole render block is framed at once —
frame triggers land deterministically at global sample N + k*hop, so
all frames in a block become ONE strided matrix and one batched
windowed-rfft device call. Only the tiny per-frame smoothing fold (a
handful of frames per block) runs on the host.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from algodsp_tpu import window as win_mod

MIN_DB = -130.0

_WINDOW_NAMES = {
    # `spectrum.go:202-217` name -> type mapping
    "hann": win_mod.WindowType.HANN,
    "hamming": win_mod.WindowType.HAMMING,
    "blackman": win_mod.WindowType.BLACKMAN,
    "blackmanharris": win_mod.WindowType.BLACKMAN_HARRIS_4TERM,
    "flattop": win_mod.WindowType.FLAT_TOP,
}

_VALID_FFT_SIZES = (256, 512, 1024, 2048, 4096, 8192)


def sanitize_params(fft_size=2048, overlap=0.75, window="blackmanharris",
                    smoothing=0.65):
    """Parameter sanitation per `spectrum.go:181-198` (invalid values
    coerce, they do not raise) — defaults from `engine.go:375-380`."""
    if fft_size not in _VALID_FFT_SIZES:
        fft_size = 2048
    overlap = float(np.clip(overlap, 0.25, 0.95))
    smoothing = float(np.clip(smoothing, 0.0, 0.95))
    window = str(window).strip().lower() or "blackmanharris"
    if window not in _WINDOW_NAMES:
        raise ValueError(f"unsupported spectrum window: {window}")
    return {"fft_size": int(fft_size), "overlap": overlap,
            "window": window, "smoothing": smoothing}


@partial(jax.jit, static_argnames=("norm",))
def _frames_db(frames, win, norm: float):
    """(F, N) real frames -> (F, N//2+1) magnitudes in dBFS, floored."""
    spec = jnp.fft.rfft(frames * win[None, :], axis=-1)
    mag = jnp.abs(spec) / norm
    scale = jnp.ones((mag.shape[-1],), mag.dtype).at[1:-1].set(2.0)
    db = 20.0 * jnp.log10(jnp.maximum(mag * scale, 1e-12))
    return jnp.maximum(db, MIN_DB)


class SpectrumAnalyzer:
    def __init__(self, sample_rate: float, **params):
        self.sample_rate = float(sample_rate)
        self.configure(**params)

    def configure(self, **params):
        cfg = sanitize_params(**params)
        self.params = cfg
        n = cfg["fft_size"]
        self.fft_size = n
        self.hop = max(int(round(n * (1.0 - cfg["overlap"]))), 1)
        self.smoothing = cfg["smoothing"]
        w = win_mod.generate(_WINDOW_NAMES[cfg["window"]], n, periodic=True)
        self._win = np.asarray(w, np.float32)
        self._win_gain = float(np.mean(self._win))
        self.db = np.full(n // 2 + 1, MIN_DB)
        self.ready = False
        self._tail = np.zeros(n - 1, np.float32)  # last n-1 samples seen
        self._pushed = 0                          # global sample counter

    def push(self, block) -> int:
        """Feed rendered master samples; returns #frames computed."""
        x = np.asarray(block, np.float32).ravel()
        if x.size == 0:
            return 0
        n, hop = self.fft_size, self.hop
        g0 = self._pushed
        self._pushed += x.size
        # trigger positions: global sample counts n + k*hop in (g0, g0+L]
        k0 = 0 if g0 < n else -(-(g0 - n + 1) // hop)
        ends = n + hop * np.arange(k0, (self._pushed - n) // hop + 1)
        ends = ends[ends > g0]
        y = np.concatenate([self._tail, x])
        self._tail = y[-(n - 1):] if n > 1 else y[:0]
        if ends.size == 0:
            return 0
        # frame ending at global g occupies y[g - g0 - 1 : ... + n]
        starts = ends - g0 - 1
        frames = np.lib.stride_tricks.sliding_window_view(y, n)[starts]
        db_new = np.asarray(_frames_db(
            jnp.asarray(frames), jnp.asarray(self._win),
            float(self.fft_size * max(self._win_gain, 1e-12))), np.float64)
        for row in db_new:  # F is tiny; smoothing is a per-bin one-pole
            if not self.ready:
                self.db = row
                self.ready = True
            else:
                s = self.smoothing
                self.db = s * self.db + (1.0 - s) * row
        return int(db_new.shape[0])

    def curve_db(self, freqs) -> np.ndarray:
        """Spectrum sampled at freqs, linear interp in bin space
        (`spectrum.go:63-108`)."""
        freqs = np.asarray(freqs, np.float64)
        if not self.ready:
            return np.full(freqs.shape, MIN_DB)
        nyq = self.sample_rate * 0.5
        bin_hz = self.sample_rate / self.fft_size
        b = np.clip(freqs, 0.0, nyq) / bin_hz
        b = np.clip(b, 0.0, len(self.db) - 1)
        base = np.minimum(b.astype(np.int64), len(self.db) - 2)
        frac = b - base
        return self.db[base] * (1.0 - frac) + self.db[base + 1] * frac

    def waveform(self, points: int = 256) -> dict:
        """Peak-preserving min/max decimation of the most recent
        master-bus samples — the oscilloscope panel's data source (the
        reference app's waveform canvas, `web/app.js` scope). Returns
        {"min": [...], "max": [...]} of `points` buckets spanning the
        last fft_size-1 samples."""
        points = max(2, min(int(points), 4096))
        y = self._tail
        usable = y.size - (y.size % points)
        if usable < points:
            z = [0.0] * points
            return {"min": z, "max": z}
        seg = y[-usable:].reshape(points, -1)
        return {"min": [round(float(v), 5) for v in seg.min(axis=1)],
                "max": [round(float(v), 5) for v in seg.max(axis=1)]}

    def meters(self) -> dict:
        """Output peak / RMS of the recent master-bus tail in dBFS —
        the level-meter row (`CompressorMetrics`-style observability
        for the demo bus)."""
        y = self._tail
        if y.size == 0:
            return {"peak_db": MIN_DB, "rms_db": MIN_DB}
        peak = float(np.max(np.abs(y)))
        rms = float(np.sqrt(np.mean(y.astype(np.float64) ** 2)))
        to_db = lambda v: round(max(20.0 * np.log10(max(v, 1e-12)),
                                    MIN_DB), 2)
        return {"peak_db": to_db(peak), "rms_db": to_db(rms)}

    def reset(self):
        self.configure(**self.params)
