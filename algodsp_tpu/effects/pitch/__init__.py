from algodsp_tpu.effects.pitch.spectral import SpectralPitchShifter
from algodsp_tpu.effects.pitch.wsola import WSOLAPitchShifter

__all__ = ["SpectralPitchShifter", "WSOLAPitchShifter"]
