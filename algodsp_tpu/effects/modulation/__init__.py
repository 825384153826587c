from algodsp_tpu.effects.modulation.modulation import (
    Chorus,
    Flanger,
    Phaser,
    Tremolo,
    RingModulator,
    AutoWah,
    FrequencyShifter,
)

__all__ = [
    "AutoWah",
    "Chorus",
    "Flanger",
    "FrequencyShifter",
    "Phaser",
    "RingModulator",
    "Tremolo",
]
