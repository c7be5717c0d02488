"""Structured Streaming twins of the batch time-window operators."""

from mapreduceindexer_spark.streaming.windows import (
    run_streaming_tumbling,
    streaming_tumbling_hourly,
)

__all__ = ["streaming_tumbling_hourly", "run_streaming_tumbling"]
