"""Profiling and roofline estimation.

The reference's only perf tooling is `go test -bench` snapshots
(SURVEY.md §5.1); the TPU build is required to provide tracing +
roofline extraction (BASELINE.json mentions "scan-kernel roofline %").

Two layers:
  * `trace(path)` — context manager around `jax.profiler` for full
    XLA/TPU traces viewable in TensorBoard/Perfetto.
  * `measure_op` / `roofline` — wall-clock measurement with honest
    completion semantics (a scalar fetch; on the axon relay
    block_until_ready returns before execution finishes) and roofline
    percentages against the chip's peak FLOP/s and HBM bandwidth.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax
import numpy as np

# v5e (TPU v5 lite) per-chip peaks; bf16 MACs run 2x the f32 rate.
TPU_PEAKS = {
    "v5e": {"flops_f32": 98e12, "flops_bf16": 197e12, "hbm_gbps": 819e9},
}


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace capture (open in TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class OpMeasurement:
    seconds: float
    flops: float | None
    bytes_accessed: float | None
    achieved_flops: float | None
    achieved_gbps: float | None
    flops_roofline_pct: float | None
    bandwidth_roofline_pct: float | None


def _force(result):
    """Force completion with a SINGLE-scalar fetch (relay-safe): a full
    np.asarray would drag the whole result through the relay."""
    leaf = jax.tree_util.tree_leaves(result)[0]
    float(jax.numpy.ravel(leaf)[-1])


def measure_op(fn, *args, reps: int = 10, flops: float | None = None,
               bytes_accessed: float | None = None,
               chip: str = "v5e") -> OpMeasurement:
    """Time a jitted callable and compute roofline percentages.

    `flops`/`bytes_accessed` are the caller's analytic op counts.
    """
    _force(fn(*args))  # warm-up / compile
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    dt = (time.time() - t0) / reps

    peaks = TPU_PEAKS.get(chip, TPU_PEAKS["v5e"])
    achieved_f = flops / dt if flops else None
    achieved_b = bytes_accessed / dt if bytes_accessed else None
    return OpMeasurement(
        seconds=dt, flops=flops, bytes_accessed=bytes_accessed,
        achieved_flops=achieved_f, achieved_gbps=achieved_b,
        flops_roofline_pct=(100.0 * achieved_f / peaks["flops_f32"]
                            if achieved_f else None),
        bandwidth_roofline_pct=(100.0 * achieved_b / peaks["hbm_gbps"]
                                if achieved_b else None))


def biquad_cascade_flops(channels: int, n: int, sections: int,
                         block: int = 128) -> float:
    """Analytic FLOP count of the blocked biquad engine: the Toeplitz
    matmul dominates at 2*B MACs per sample per section."""
    return 2.0 * channels * n * sections * block


def fft_conv_flops(channels: int, n: int, fft_size: int) -> float:
    """~5 N log2 N per FFT, 3 FFTs + bin multiply per overlap block."""
    import math
    blocks = max(n // max(fft_size // 2, 1), 1)
    per_fft = 5.0 * fft_size * math.log2(fft_size)
    return channels * blocks * (3.0 * per_fft + 8.0 * fft_size)
