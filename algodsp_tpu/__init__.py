"""algodsp-tpu: TPU-native audio DSP framework (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of CWBudde/algo-dsp
(a pure-Go audio DSP library) for TPU hardware: windows & spectrum,
biquad/FIR filter runtimes + full design toolkit, FFT convolution,
polyphase resampling, effects, effect graphs, and measurement —
built on pure-function array transforms, blocked parallel scans,
and mesh sharding.
"""

__version__ = "0.1.0"

from algodsp_tpu import core  # noqa: F401
