from algodsp_tpu.stats.time import TimeStats, calculate as calculate_time, StreamingStats
from algodsp_tpu.stats.frequency import FrequencyStats, calculate as calculate_frequency

__all__ = ["FrequencyStats", "StreamingStats", "TimeStats",
           "calculate_frequency", "calculate_time"]
