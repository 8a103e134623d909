"""Custom stateful streaming operator (SURVEY §2.7/§2.8 ⊕):
per-account running activity via applyInPandasWithState.

The batch engine folds account activity into the accounts table with
idempotent MERGE (A2); this is the streaming-native form: per-key
state (op count, last_active) lives in Spark's state store, survives
restarts through the checkpoint, and every micro-batch emits the
updated rows. Use this shape when the aggregate must be queryable
with sub-batch latency instead of after the sink MERGE.

Scale: state is partitioned by the grouping key across executors;
the state store holds one small tuple per account (bounded by
cardinality, not stream length). With event-time bounds, add a
timeout (GroupStateTimeout) to expire idle keys — not needed for the
running-total semantics here.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from chain_sync_spark.sync.classify import (
    ACCOUNT_UPDATE_SCHEMA,
    COMMENT_SCHEMA,
    VOTE_SCHEMA,
)

OUTPUT_SCHEMA = "name string, n_ops long, last_active timestamp"
STATE_SCHEMA = "n_ops long, last_active timestamp"


def account_activity_events(ops: DataFrame) -> DataFrame:
    """Op stream → (name, timestamp) activity rows: comments by
    author, votes by voter, account_updates by account — the same
    union the batch handler folds (handlers.py A2), minus the
    aggregation (state replaces it)."""
    def typed(op_type: str, schema: str, name_col: str) -> DataFrame:
        return (
            ops.filter(F.col("op_type") == op_type)
            .select(F.col("ts").alias("timestamp"), F.from_json("op", schema).alias("p"))
            .select(F.col(f"p.{name_col}").alias("name"), "timestamp")
        )

    return (
        typed("comment", COMMENT_SCHEMA, "author")
        .unionByName(typed("vote", VOTE_SCHEMA, "voter"))
        .unionByName(typed("account_update", ACCOUNT_UPDATE_SCHEMA, "account"))
        .filter(F.col("name").isNotNull())
    )


def _update_account_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_ops, last_active = state.get if state.exists else (0, None)
    for pdf in pdfs:
        n_ops += len(pdf)
        ts = pdf["timestamp"].dropna()
        if len(ts):
            mx = ts.max()
            if last_active is None or mx > last_active:
                last_active = mx
    state.update((n_ops, last_active))
    yield pd.DataFrame(
        {"name": [key[0]], "n_ops": [n_ops], "last_active": [last_active]}
    )


def running_account_activity(ops: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-account running totals; one output
    row per account per micro-batch that touched it."""
    return account_activity_events(ops).groupBy("name").applyInPandasWithState(
        _update_account_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
