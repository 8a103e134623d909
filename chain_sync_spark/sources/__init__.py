"""Sources: block-operation stream + checkpoint table (SURVEY.md §2.1)."""

from chain_sync_spark.sources.blocks import OP_STREAM_SCHEMA, synthesize_ops
from chain_sync_spark.sources.checkpoint import read_cursor, write_cursor

__all__ = ["OP_STREAM_SCHEMA", "synthesize_ops", "read_cursor", "write_cursor"]
