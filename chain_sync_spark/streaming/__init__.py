"""Structured Streaming runtime: micro-batch sync (stream_sync),
custom stateful operators (stateful)."""

from chain_sync_spark.streaming.stream_sync import (  # noqa: F401
    run_stream_sync,
    stream_ops_from_json,
    windowed_op_counts,
)
