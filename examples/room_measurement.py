"""Example: measure a (simulated) room with a Farina log sweep.

Run: python examples/room_measurement.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.measure.sweep import LogSweep
from algodsp_tpu.measure.ir import Analyzer
from algodsp_tpu.utils.irlib import builtin_irs

SR = 48000.0

# "the room": a synthetic hall IR from the built-in library
sr_ir, room_ir = builtin_irs(SR)["medium-hall"]

sweep = LogSweep(20.0, 20000.0, 2.0, SR)
stimulus = np.asarray(sweep.generate())
response = np.convolve(stimulus, room_ir)[:stimulus.size + room_ir.size]

deconv = np.asarray(sweep.deconvolve(jnp.asarray(response)))
ir = deconv[sweep.samples - 1:sweep.samples - 1 + room_ir.size]

metrics = Analyzer(SR).analyze(ir)
print(f"RT60: {metrics.rt60:.2f} s  EDT: {metrics.edt:.2f} s  "
      f"C50: {metrics.c50:.1f} dB  D50: {metrics.d50:.2f}")
