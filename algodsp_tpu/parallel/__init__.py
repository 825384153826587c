from algodsp_tpu.parallel.mesh import make_mesh, channel_sharding
from algodsp_tpu.parallel.pipeline import biquad_pipeline
from algodsp_tpu.parallel.sharded import (
    fir_time_sharded,
    biquad_time_sharded,
    conv_time_sharded,
    envelope_time_sharded,
    onepole_time_sharded,
    box_rms_time_sharded,
    compressor_time_sharded,
    reduce_metrics,
)
from algodsp_tpu.parallel.streamed import (
    channel_state_specs,
    scan_blocks_channel_sharded,
    compressor_stream_time_sharded,
    StreamingConvTimeSharded,
)

__all__ = [
    "biquad_time_sharded",
    "biquad_pipeline",
    "box_rms_time_sharded",
    "channel_sharding",
    "channel_state_specs",
    "compressor_stream_time_sharded",
    "compressor_time_sharded",
    "conv_time_sharded",
    "envelope_time_sharded",
    "fir_time_sharded",
    "make_mesh",
    "onepole_time_sharded",
    "reduce_metrics",
    "scan_blocks_channel_sharded",
    "StreamingConvTimeSharded",
]
