"""Audio effects — capability parity with `dsp/effects/` (31 types).

Subpackages: dynamics, modulation, pitch, reverb, spatial; waveshaping
and spectral effects live at this level.
"""
