"""THD / THD+N analysis.

Capability parity with `measure/thd/thd.go`: auto fundamental search in
[range_lower, range_upper] (`thd.go:297`), per-harmonic energy capture
over ±capture_bins auto-derived from the window's first-null width
(`thd.go:317-360`), odd/even separation, rub & buzz (harmonics >=
rubnbuzz_start, default 10), SINAD, noise = total - fundamental -
harmonics; window applied before the FFT (`thd.go:102-160`).

Host-facing analysis API: inputs may be jnp or numpy; spectra compute
with batched rfft on device, the scalar metric extraction runs in
float64 NumPy (it is measurement post-processing, not a hot path).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp

from algodsp_tpu import window as win
from algodsp_tpu.core.numeric import next_pow2


@dataclasses.dataclass(frozen=True)
class THDConfig:
    sample_rate: float = 0.0
    fft_size: int = 0
    fundamental_freq: float = 0.0
    range_lower_freq: float = 20.0
    range_upper_freq: float = 20000.0
    capture_bins: int = 0
    max_harmonics: int = 0
    rubnbuzz_start: int = 10
    window_type: win.WindowType = win.WindowType.HANN


@dataclasses.dataclass(frozen=True)
class THDResult:
    fundamental_freq: float = 0.0
    fundamental_level: float = 0.0
    thd: float = 0.0
    thdn: float = 0.0
    thd_db: float = -math.inf
    thdn_db: float = -math.inf
    odd_hd: float = 0.0
    even_hd: float = 0.0
    noise: float = 0.0
    rubnbuzz: float = 0.0
    harmonics: tuple = ()
    sinad: float = math.inf


_FIRST_MIN_BINS = {
    win.WindowType.RECTANGULAR: 1,
    win.WindowType.HANN: 2, win.WindowType.HAMMING: 2,
    win.WindowType.TRIANGLE: 2, win.WindowType.COSINE: 2,
    win.WindowType.WELCH: 2,
    win.WindowType.BLACKMAN: 3, win.WindowType.EXACT_BLACKMAN: 3,
    win.WindowType.KAISER: 3, win.WindowType.BLACKMAN_HARRIS_3TERM: 3,
    win.WindowType.BLACKMAN_HARRIS_4TERM: 4, win.WindowType.BLACKMAN_NUTTALL: 4,
    win.WindowType.NUTTALL_CTD: 4, win.WindowType.NUTTALL_CFD: 4,
    win.WindowType.FLAT_TOP: 5,
}


def _auto_capture_bins(cfg: THDConfig) -> int:
    if cfg.window_type in _FIRST_MIN_BINS:
        return _FIRST_MIN_BINS[cfg.window_type]
    n = min(cfg.fft_size or 4096, 4096)
    coeffs = win.generate(cfg.window_type, n)
    analysis = win.analyze(coeffs)
    if analysis.first_minimum_bins <= 0 or math.isnan(analysis.first_minimum_bins):
        return 0
    return int(round(analysis.first_minimum_bins))


def _get_bin_value(mag: np.ndarray, b: int, capture: int) -> float:
    """Sum of magnitudes over bin ± capture (`thd.go:394-416`)."""
    if b < 0 or b >= mag.size:
        return 0.0
    if capture <= 0:
        return float(mag[b])
    lo = max(b - capture, 0)
    hi = min(b + capture, mag.size - 1)
    return float(mag[lo:hi + 1].sum())


def analyze_signal(signal, cfg: THDConfig) -> THDResult:
    """Window + FFT + THD metrics (`thd.go:102-160`)."""
    x = np.asarray(signal, dtype=np.float64)
    if x.size == 0:
        return THDResult()
    fft_size = cfg.fft_size if cfg.fft_size > 0 else next_pow2(x.size)
    coeffs = win.generate(cfg.window_type, x.size)
    # compute the (real) power spectrum on device — the axon TPU runtime
    # cannot transfer complex arrays to the host
    spec = jnp.fft.rfft(jnp.asarray(x * coeffs), fft_size)
    mag2 = np.asarray(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)
    cfg = dataclasses.replace(cfg, fft_size=fft_size,
                              sample_rate=cfg.sample_rate or float(fft_size))
    return calculate_from_magnitude(mag2, cfg)


def analyze_spectrum(spectrum, cfg: THDConfig) -> THDResult:
    """THD metrics from a complex full-FFT spectrum (`thd.go:70-98`)."""
    spec = np.asarray(spectrum)
    bins = spec.size // 2 + 1
    if bins <= 1:
        return THDResult()
    mag2 = np.abs(spec[:bins]) ** 2
    cfg = dataclasses.replace(cfg, fft_size=cfg.fft_size or spec.size)
    return calculate_from_magnitude(mag2, cfg)


def calculate_from_magnitude(mag_squared, cfg: THDConfig) -> THDResult:
    """Core metric extraction (`thd.go:163-295`)."""
    mag2 = np.asarray(mag_squared, dtype=np.float64)
    if mag2.size <= 1:
        return THDResult()
    fft_size = cfg.fft_size if cfg.fft_size > 0 else 2 * (mag2.size - 1)
    sample_rate = cfg.sample_rate if cfg.sample_rate > 0 else float(fft_size)
    max_bin = mag2.size - 1
    bin_hz = sample_rate / fft_size

    lower = min(max(int(round(cfg.range_lower_freq / bin_hz)), 1), max_bin)
    upper = min(max(int(round(cfg.range_upper_freq / bin_hz)), lower), max_bin)

    if cfg.fundamental_freq > 0:
        fund_bin = min(max(int(round(cfg.fundamental_freq / bin_hz)), lower), upper)
    else:
        fund_bin = lower + int(np.argmax(mag2[lower:upper + 1]))
    if fund_bin < 1:
        return THDResult()

    capture = cfg.capture_bins if cfg.capture_bins > 0 else _auto_capture_bins(cfg)
    if capture * 2 > fund_bin:
        capture = fund_bin // 2

    mag = np.sqrt(np.maximum(mag2, 0.0))
    fundamental = _get_bin_value(mag, fund_bin, capture)
    if fundamental <= 0:
        return THDResult(fundamental_freq=fund_bin * bin_hz)

    thd_abs = odd_abs = even_abs = rub_abs = 0.0
    harmonics = []
    count = 0
    k = 2
    while True:
        if cfg.max_harmonics > 0 and count >= cfg.max_harmonics:
            break
        b = k * fund_bin
        if b > upper or b > max_bin:
            break
        if b >= lower:
            v = _get_bin_value(mag, b, capture)
            thd_abs += v
            if k % 2 == 0:
                even_abs += v
            else:
                odd_abs += v
            if k >= cfg.rubnbuzz_start:
                rub_abs += v
            if v > 0:
                harmonics.append(v / fundamental)
            count += 1
        k += 1

    total_abs = float(mag[lower:upper + 1].sum())
    thdn_abs = max(total_abs - fundamental, 0.0)
    noise_abs = max(thdn_abs - thd_abs, 0.0)

    thd_r = thd_abs / fundamental
    thdn_r = thdn_abs / fundamental

    def ratio_db(v):
        return 20.0 * math.log10(v) if v > 0 else -math.inf

    return THDResult(
        fundamental_freq=fund_bin * bin_hz,
        fundamental_level=fundamental,
        thd=thd_r, thdn=thdn_r,
        thd_db=ratio_db(thd_r), thdn_db=ratio_db(thdn_r),
        odd_hd=odd_abs / fundamental, even_hd=even_abs / fundamental,
        noise=noise_abs / fundamental, rubnbuzz=rub_abs / fundamental,
        harmonics=tuple(harmonics),
        sinad=(20.0 * math.log10(1.0 / thdn_r) if thdn_r > 0 else math.inf))


def analyze_channels(x, cfg: THDConfig, *, max_harmonics: int = 32):
    """Pod-scale batched THD/SINAD: (C, N) -> per-channel metric arrays,
    computed entirely on device with no host loops — shard the channel
    axis over a mesh for the BASELINE config-5 workload (1024-channel
    sweep analysis across hosts).

    Returns a dict of (C,) arrays: fundamental_freq, fundamental_level,
    thd, thdn, thd_db, thdn_db, odd_hd, even_hd, noise, sinad.
    Semantics follow `calculate_from_magnitude` with a static harmonic
    cap (masked, not truncated mid-band).
    """
    x = jnp.asarray(x)
    if x.ndim != 2:
        raise ValueError("analyze_channels expects (C, N)")
    c, n = x.shape
    fft_size = cfg.fft_size if cfg.fft_size > 0 else next_pow2(n)
    sample_rate = cfg.sample_rate if cfg.sample_rate > 0 else float(fft_size)
    coeffs = jnp.asarray(win.generate(cfg.window_type, n), x.dtype)
    from algodsp_tpu.ops.packfft import rfft_batched
    spec = rfft_batched(x * coeffs, fft_size)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)  # (C, bins)
    bins = mag.shape[-1]
    max_bin = bins - 1
    bin_hz = sample_rate / fft_size

    lower = min(max(int(round(cfg.range_lower_freq / bin_hz)), 1), max_bin)
    upper = min(max(int(round(cfg.range_upper_freq / bin_hz)), lower), max_bin)

    if cfg.fundamental_freq > 0:
        fund_bin = jnp.full((c,), min(max(int(round(
            cfg.fundamental_freq / bin_hz)), lower), upper), jnp.int32)
    else:
        band = mag[:, lower:upper + 1]
        fund_bin = (jnp.argmax(band, axis=-1) + lower).astype(jnp.int32)

    capture = cfg.capture_bins if cfg.capture_bins > 0 else _auto_capture_bins(
        dataclasses.replace(cfg, fft_size=fft_size))
    capture = int(capture)

    def capture_sum(bin_idx):
        """Sum of magnitudes over bin_idx ± capture, per channel."""
        offs = jnp.arange(-capture, capture + 1)
        idx = jnp.clip(bin_idx[:, None] + offs[None, :], 0, max_bin)
        vals = jnp.take_along_axis(mag, idx, axis=-1)
        valid = (bin_idx[:, None] + offs[None, :] >= 0) & \
                (bin_idx[:, None] + offs[None, :] <= max_bin)
        return jnp.sum(jnp.where(valid, vals, 0.0), axis=-1)

    fundamental = capture_sum(fund_bin)

    ks = jnp.arange(2, max_harmonics + 2)
    harm_bins = fund_bin[:, None] * ks[None, :]            # (C, K)
    in_range = (harm_bins >= lower) & (harm_bins <= jnp.minimum(upper, max_bin))
    hb = jnp.clip(harm_bins, 0, max_bin)
    offs = jnp.arange(-capture, capture + 1)
    idx = jnp.clip(hb[:, :, None] + offs[None, None, :], 0, max_bin)
    hvals = jnp.take_along_axis(
        jnp.broadcast_to(mag[:, None, :], (c, ks.size, bins)), idx, axis=-1)
    hsum = jnp.sum(hvals, axis=-1) * in_range              # (C, K)

    thd_abs = jnp.sum(hsum, axis=-1)
    even_abs = jnp.sum(hsum * (ks[None, :] % 2 == 0), axis=-1)
    odd_abs = thd_abs - even_abs
    total_abs = jnp.sum(mag[:, lower:upper + 1], axis=-1)
    thdn_abs = jnp.maximum(total_abs - fundamental, 0.0)
    noise_abs = jnp.maximum(thdn_abs - thd_abs, 0.0)

    safe = jnp.where(fundamental > 0, fundamental, 1.0)
    thd_r = thd_abs / safe
    thdn_r = thdn_abs / safe

    def ratio_db(v):
        return jnp.where(v > 0, 20.0 * jnp.log10(jnp.maximum(v, 1e-30)),
                         -jnp.inf)

    return {
        "fundamental_freq": fund_bin.astype(x.dtype) * bin_hz,
        "fundamental_level": fundamental,
        "thd": thd_r, "thdn": thdn_r,
        "thd_db": ratio_db(thd_r), "thdn_db": ratio_db(thdn_r),
        "odd_hd": odd_abs / safe, "even_hd": even_abs / safe,
        "noise": noise_abs / safe,
        "sinad": jnp.where(thdn_r > 0,
                           20.0 * jnp.log10(1.0 / jnp.maximum(thdn_r, 1e-30)),
                           jnp.inf),
    }
