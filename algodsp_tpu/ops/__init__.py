"""Compute-path building blocks: blocked linear recurrences, scans,
and Pallas TPU kernels.

This package is the analog of the reference's SIMD kernel layer
(`dsp/filter/biquad/internal/arch/` + algo-vecmath): the place where
per-sample Go loops become block algebra that XLA/Pallas can map onto
the MXU/VPU.
"""
