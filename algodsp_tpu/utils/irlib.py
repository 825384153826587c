"""IR library container (.irlib).

Capability parity with the reference's binary IR container
(`internal/webdemo/irlib.go:13-30` + `scripts/extract_irs.py`): a
simple binary format bundling named impulse responses for convolution
reverb / HRTF crossfeed, plus a generator for a small built-in set of
synthetic IRs (rooms/halls/plates) so the demo works without assets.

Format (little-endian):
    magic   4s   b"IRL1"
    count   u32
    per IR: name_len u16, name utf-8, sample_rate f32, length u32,
            samples f32[length]
"""

from __future__ import annotations

import io
import os
import struct
from functools import lru_cache as _lru_cache

import numpy as np

MAGIC = b"IRL1"


def write_irlib(path_or_file, irs: dict[str, tuple[float, np.ndarray]]) -> None:
    """irs: name -> (sample_rate, samples)."""
    close = False
    if isinstance(path_or_file, (str, bytes, os.PathLike)):
        f = open(path_or_file, "wb")
        close = True
    else:
        f = path_or_file
    try:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(irs)))
        for name, (sr, samples) in irs.items():
            nb = name.encode("utf-8")
            data = np.ascontiguousarray(samples, dtype=np.float32)
            f.write(struct.pack("<H", len(nb)))
            f.write(nb)
            f.write(struct.pack("<fI", float(sr), data.size))
            f.write(data.tobytes())
    finally:
        if close:
            f.close()


def read_irlib(path_or_file) -> dict[str, tuple[float, np.ndarray]]:
    close = False
    if isinstance(path_or_file, (str, bytes, os.PathLike)):
        f = open(path_or_file, "rb")
        close = True
    else:
        f = path_or_file
    try:
        if f.read(4) != MAGIC:
            raise ValueError("irlib: bad magic")
        (count,) = struct.unpack("<I", f.read(4))
        out = {}
        for _ in range(count):
            (nlen,) = struct.unpack("<H", f.read(2))
            name = f.read(nlen).decode("utf-8")
            sr, length = struct.unpack("<fI", f.read(8))
            data = np.frombuffer(f.read(4 * length), dtype=np.float32).copy()
            if data.size != length:
                raise ValueError("irlib: truncated file")
            out[name] = (sr, data)
        return out
    finally:
        if close:
            f.close()


@_lru_cache(maxsize=8)
def builtin_irs(sample_rate: float = 48000.0,
                seed: int = 20260816) -> dict[str, tuple[float, np.ndarray]]:
    """Synthetic IR set (the analog of the embedded .irlib data):
    exponentially decaying noise with per-band decay shaping.

    Cached per (sample_rate, seed) — the synthesis includes a
    per-sample Python one-pole over ~400k samples, and the demo's IR
    endpoints hit this on every request. Callers must treat the
    returned dict and arrays as read-only."""
    rng = np.random.default_rng(seed)
    out = {}
    specs = {
        "small-room": (0.25, 6000.0),
        "medium-hall": (1.2, 4000.0),
        "large-hall": (2.5, 3000.0),
        "plate": (1.8, 10000.0),
        "spring": (0.9, 2500.0),
    }
    for name, (rt60, damp_hz) in specs.items():
        n = int(rt60 * 1.2 * sample_rate)
        t = np.arange(n) / sample_rate
        noise = rng.standard_normal(n)
        env = 10.0 ** (-3.0 * t / rt60)
        # crude HF damping: one-pole lowpass whose cutoff tracks damp_hz
        a = np.exp(-2 * np.pi * damp_hz / sample_rate)
        ir = np.empty(n)
        acc = 0.0
        for i in range(n):
            acc = (1 - a) * noise[i] + a * acc
            ir[i] = acc
        ir *= env
        ir[0] = 1.0  # direct path
        out[name] = (sample_rate, (ir / np.abs(ir).max()).astype(np.float32))
    # HRTF crossfeed paths (spherical-head model, `hrtf_ir_set`) so the
    # demo catalog can audition speaker-style crossfeed as a conv IR
    hrtf = hrtf_ir_set(sample_rate)
    for name, key in (("hrtf-direct-30deg", "left_direct"),
                      ("hrtf-crossfeed-30deg", "left_cross")):
        out[name] = (sample_rate, hrtf[key].astype(np.float32))
    return out


def hrtf_ir_set(sample_rate: float = 48000.0, *,
                speaker_angle_deg: float = 30.0,
                head_radius_m: float = 0.0875,
                n_taps: int = 256) -> dict[str, np.ndarray]:
    """Deterministic spherical-head HRTF IR set for stereo-speaker
    crosstalk simulation — a default implementation of the reference's
    `HRTFProvider` interface (`crosstalk_simulator_hrtf.go:20-30`).
    Note the reference ships NO measured HRTF data: its provider is an
    interface the caller must implement, and its own tests feed tiny
    synthetic sets (`crosstalk_simulator_hrtf_test.go:9-39`
    fixedHRTFProvider). This physical model therefore EXCEEDS reference
    parity; users with measured data (e.g. MIT KEMAR, which cannot be
    bundled in this zero-egress build) load it through the `.irlib`
    container via `hrtf_ir_set_from_irlib`.

    Model (Brown & Duda 1998 structural HRTF, public formulation):

      * head shadow: the one-pole/one-zero sphere approximation
        H(w, th) = (1 + j a(th) w / (2 w0)) / (1 + j w / (2 w0)) with
        w0 = c / r_head and a(th) = 1.05 + 0.95 cos(th * 180/150 deg),
        th the incidence angle between the source ray and the ear axis
        (ipsilateral boost ~+6 dB HF, contralateral shadow ~ -20 dB HF);
      * ITD: Woodworth ray model, T(th) = -(r/c) cos th on the lit side
        and (r/c)(th - pi/2) in the shadow zone, applied as a linear
        phase ramp (sub-sample accurate);
      * ears on the +-90 deg axis; speakers at +-speaker_angle_deg, so
        the direct path hits at |90 - angle| and the cross path at
        |90 + angle| incidence.

    Returns the reference's `HRTFImpulseResponseSet` fields as a dict:
    {"left_direct", "left_cross", "right_direct", "right_cross"},
    float64 arrays of n_taps samples each. By symmetry left_direct ==
    right_direct and left_cross == right_cross for a centered head;
    both are still emitted so asymmetric sets can drop in unchanged.
    """
    if sample_rate <= 0 or not np.isfinite(sample_rate):
        raise ValueError(f"hrtf: sample rate must be > 0: {sample_rate}")
    c = 343.0                      # speed of sound, m/s
    r = head_radius_m
    w0 = c / r
    # causality headroom: the Woodworth ITD on the lit side is an
    # ADVANCE of up to r/c seconds (th -> 0), so the base delay must
    # cover it at any sample rate / speaker angle or the main impulse
    # wraps out of the irfft window and is truncated
    base_delay = r / c + 4.0 / sample_rate

    freqs = np.fft.rfftfreq(2 * n_taps, 1.0 / sample_rate)
    w = 2.0 * np.pi * freqs

    def path_ir(incidence_deg: float) -> np.ndarray:
        th = np.radians(incidence_deg)
        alpha = 1.05 + 0.95 * np.cos(th * 180.0 / 150.0)
        shadow = (1.0 + 1j * alpha * w / (2.0 * w0)) / \
                 (1.0 + 1j * w / (2.0 * w0))
        if th < np.pi / 2.0:
            itd = -(r / c) * np.cos(th)
        else:
            itd = (r / c) * (th - np.pi / 2.0)
        phase = np.exp(-1j * w * (base_delay + itd))
        h = np.fft.irfft(shadow * phase, 2 * n_taps)[:n_taps]
        # cosine fade over the last 16 taps kills wrap-around ripple
        fade = np.ones(n_taps)
        fade[-16:] = 0.5 * (1.0 + np.cos(np.linspace(0, np.pi, 16)))
        return h * fade

    direct = path_ir(abs(90.0 - speaker_angle_deg))
    cross = path_ir(abs(90.0 + speaker_angle_deg))
    return {"left_direct": direct.copy(), "left_cross": cross.copy(),
            "right_direct": direct, "right_cross": cross}


HRTF_PATH_KEYS = ("left_direct", "left_cross", "right_direct",
                  "right_cross")


def write_hrtf_irlib(path_or_file, irs: dict[str, np.ndarray],
                     sample_rate: float, *, prefix: str = "hrtf") -> None:
    """Store a 4-path HRTF set (measured or synthetic) in an `.irlib`
    container under `<prefix>-<path>` names — the bring-your-own-data
    side of the reference's `HRTFProvider` contract. `irs` must carry
    the `HRTFImpulseResponseSet` keys (`crosstalk_simulator_hrtf.go:
    20-24`)."""
    missing = [k for k in HRTF_PATH_KEYS if k not in irs]
    if missing:
        raise ValueError(f"hrtf irlib: missing paths {missing}")
    write_irlib(path_or_file,
                {f"{prefix}-{k}": (sample_rate,
                                   np.asarray(irs[k], np.float32))
                 for k in HRTF_PATH_KEYS})


def hrtf_ir_set_from_irlib(path_or_file, *, prefix: str = "hrtf",
                           expect_sample_rate: float | None = None
                           ) -> dict[str, np.ndarray]:
    """Load a 4-path HRTF set from an `.irlib` container (inverse of
    `write_hrtf_irlib`): returns the dict `CrosstalkSimulator(
    hrtf_irs=...)` accepts. Raises if any path is absent or the stored
    sample rates disagree (or mismatch `expect_sample_rate`)."""
    lib = read_irlib(path_or_file)
    out = {}
    rates = set()
    for k in HRTF_PATH_KEYS:
        name = f"{prefix}-{k}"
        if name not in lib:
            raise ValueError(
                f"hrtf irlib: entry {name!r} not found (have "
                f"{sorted(lib)})")
        rate, ir = lib[name]
        rates.add(float(rate))
        out[k] = np.asarray(ir, np.float64)
    if len(rates) != 1:
        raise ValueError(f"hrtf irlib: inconsistent sample rates {rates}")
    if expect_sample_rate is not None and rates != {float(expect_sample_rate)}:
        raise ValueError(
            f"hrtf irlib: stored rate {rates.pop()} != expected "
            f"{expect_sample_rate}")
    return out
