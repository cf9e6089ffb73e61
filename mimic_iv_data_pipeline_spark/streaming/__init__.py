from mimic_iv_data_pipeline_spark.streaming.events import (
    read_event_stream,
    stream_bucketize,
    stream_sessionize,
)

__all__ = ["read_event_stream", "stream_bucketize", "stream_sessionize"]
