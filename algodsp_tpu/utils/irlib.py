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
import struct

import numpy as np

MAGIC = b"IRL1"


def write_irlib(path_or_file, irs: dict[str, tuple[float, np.ndarray]]) -> None:
    """irs: name -> (sample_rate, samples)."""
    close = False
    if isinstance(path_or_file, (str, bytes)):
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
    if isinstance(path_or_file, (str, bytes)):
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


def builtin_irs(sample_rate: float = 48000.0,
                seed: int = 20260816) -> dict[str, tuple[float, np.ndarray]]:
    """Synthetic IR set (the analog of the embedded .irlib data):
    exponentially decaying noise with per-band decay shaping."""
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
    return out
