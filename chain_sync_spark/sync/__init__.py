"""The batch-sync engine (SURVEY.md §3): classify → handlers → MERGE."""

from chain_sync_spark.sync.engine import SyncEngine

__all__ = ["SyncEngine"]
