from algodsp_tpu.effects.dynamics.core import (
    DynamicsConfig,
    DynamicsCore,
    Topology,
    DetectorMode,
    compression_gain,
    downward_expansion_gain,
)
from algodsp_tpu.effects.dynamics.processors import (
    Compressor,
    Expander,
    Gate,
    Limiter,
    LookaheadLimiter,
    DeEsser,
    TransientShaper,
    MultibandCompressor,
    BandConfig,
    BlockMetrics,
)

__all__ = [
    "BandConfig",
    "BlockMetrics",
    "Compressor",
    "DeEsser",
    "DetectorMode",
    "DynamicsConfig",
    "DynamicsCore",
    "Expander",
    "Gate",
    "Limiter",
    "LookaheadLimiter",
    "MultibandCompressor",
    "Topology",
    "TransientShaper",
    "compression_gain",
    "downward_expansion_gain",
]
