"""Structured Streaming twins of the batch time-window operators, plus the
custom stateful sessionization operator (applyInPandasWithState)."""

from mapreduceindexer_spark.streaming.stateful import streaming_user_sessions
from mapreduceindexer_spark.streaming.windows import (
    run_streaming_sliding,
    run_streaming_tumbling,
    streaming_sliding_hourly,
    streaming_tumbling_hourly,
)

__all__ = [
    "streaming_tumbling_hourly",
    "run_streaming_tumbling",
    "streaming_sliding_hourly",
    "run_streaming_sliding",
    "streaming_user_sessions",
]
