from mimic_iv_data_pipeline_spark.streaming.events import (
    read_event_stream,
    stream_bucketize,
    stream_exact_dedup,
    stream_sessionize,
)
from mimic_iv_data_pipeline_spark.streaming.stateful import (
    stream_ewma,
    stream_funnel,
    stream_holt,
    stream_locf,
    stream_lsh_dedup,
)

__all__ = [
    "read_event_stream",
    "stream_bucketize",
    "stream_exact_dedup",
    "stream_sessionize",
    "stream_ewma",
    "stream_funnel",
    "stream_holt",
    "stream_locf",
    "stream_lsh_dedup",
]
