"""Room measurement workflow: log sweep -> deconvolve -> acoustics.

The Farina log-sweep method end-to-end, as in the reference's
measure/sweep + measure/ir packages:
  1. generate an exponential sweep and its inverse filter,
  2. play it through a simulated room (synthetic decaying IR),
  3. deconvolve the recording to recover the impulse response,
  4. report RT60 / EDT / C50 / D50 from Schroeder backward integration.

Run: python examples/room_measurement.py       (CPU or TPU)
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# float64 sweep math: run on CPU unless explicitly pointed at an
# accelerator (ALGODSP_DEVICE=tpu)
import os as _os
if _os.environ.get("ALGODSP_DEVICE", "cpu") != "tpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.measure.sweep import LogSweep
from algodsp_tpu.measure.ir import Analyzer
from algodsp_tpu.conv import fftconvolve


def main():
    sr = 48000.0
    rng = np.random.default_rng(7)

    # synthetic room: exponentially decaying noise tail, RT60 ~ 0.5 s
    rt60 = 0.5
    t = np.arange(int(0.8 * sr)) / sr
    room = rng.standard_normal(t.size) * 10.0 ** (-3.0 * t / rt60)
    room[0] = 1.0
    room *= 0.5

    sweep = LogSweep(20.0, 20000.0, 2.0, sr)
    excitation = sweep.generate()
    recording = fftconvolve(excitation, jnp.asarray(room, excitation.dtype),
                            mode="full")
    impulse = np.asarray(sweep.deconvolve(recording))

    # the linear IR peaks at the sweep length; analyze from the onset
    onset = int(np.argmax(np.abs(impulse)))
    segment = impulse[max(onset - 8, 0):onset + int(0.7 * sr)]
    metrics = Analyzer(sr).analyze(jnp.asarray(segment))
    direct = Analyzer(sr).analyze(jnp.asarray(room))
    print(f"true RT60: {rt60:.2f} s")
    print(f"  direct IR analysis:      rt60 {direct.rt60:.3f} s")
    print(f"  sweep-deconvolved IR:    rt60 {metrics.rt60:.3f} s  "
          f"(t20 {metrics.t20:.3f}, t30 {metrics.t30:.3f}, "
          f"edt {metrics.edt:.3f})")
    print(f"  clarity C50: {metrics.c50:.1f} dB, definition D50: "
          f"{metrics.d50:.2f}")


if __name__ == "__main__":
    main()
