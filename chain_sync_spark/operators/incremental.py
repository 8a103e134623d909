"""Incremental aggregate maintenance (materialized-rollup pattern).

The 100 TB version of "recompute the dashboard": a per-key aggregate
table is maintained by merging each new micro-batch's PARTIAL
aggregate into the stored totals, so per-round cost is O(batch), not
O(history). This is the batch analog of Structured Streaming's
stateful aggregation (state store = the stored aggregate table), and
the same decomposition Spark itself uses for partial+final hash
aggregation — applied across rounds instead of across tasks.

Only algebraic aggregates participate (sum, count, min, max, and
anything derivable from them like avg); holistic aggregates (exact
median) need the raw data by definition. Sums run in DECIMAL so
merge order never changes the result.

Reference parity: the reference maintains running per-account
aggregates (last_active, vote sets) incrementally on every block
batch (handlers/comments.js:179-180, handlers/votes.js:26-27) —
this operator is that idea generalized to arbitrary keyed rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate schema: key cols -> (n_events, sum_value DECIMAL, min_ts, max_ts)
AGG_COLS = ("n_events", "sum_value", "min_ts", "max_ts")


def rollup_events(batch: DataFrame, keys: list[str]) -> DataFrame:
    """Partial aggregate of one batch — the map-side combine shape.
    sum_value stays DECIMAL until the final read so cross-batch merge
    order cannot perturb the total."""
    return batch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("sum_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


def merge_rollup(existing: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge a batch's partial aggregate into the stored rollup:
    full-outer on the keys, combine with the aggregate's own merge
    function (+/min/max). Cost is O(|existing keys touched| + |delta|)
    rows through one join — at scale the stored side is partitioned
    by key so only matching partitions are read (same
    partition-pruned path as sync/merge.py)."""
    e = existing.alias("e")
    d = delta.alias("d")
    joined = e.join(d, keys, "full_outer")

    def _both(col: str, combine) -> F.Column:
        ec, dc = F.col(f"e.{col}"), F.col(f"d.{col}")
        return (
            F.when(ec.isNull(), dc)
            .when(dc.isNull(), ec)
            .otherwise(combine(ec, dc))
            .alias(col)
        )

    return joined.select(
        *keys,
        _both("n_events", lambda a, b: a + b),
        _both("sum_value", lambda a, b: a + b),
        _both("min_ts", F.least),
        _both("max_ts", F.greatest),
    )


def profile_stats(batch: DataFrame, cols: list[str]) -> DataFrame:
    """Mergeable column-profile partial of one batch: per column,
    row count, null count, and lexicographic min/max (values as
    strings so one schema covers every column type) — the
    incremental sibling of operators/corpus_ops.profile_column_stats.
    Exact distinct counts are HOLISTIC (their partials are the value
    sets themselves) and deliberately absent here; the batch profiler
    covers them on full recomputes.

    Single pass: one aggregate computes every column's stats, a
    ``stack`` projection unpivots to a row per column."""
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
        ]
    one = batch.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    stack = ", ".join(f"'{c}', {c}__nulls, {c}__min, {c}__max" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col_name, n_nulls, min_val, max_val)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "min_val", "max_val")


def merge_profile(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two profile partials: counts add, min/max fold — every
    stat is algebraic, so merge order never changes the result.
    Cost is O(columns), independent of either side's row history."""
    return (
        existing.unionByName(delta)
        .groupBy("col_name")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_nulls").alias("n_nulls"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
    )


def finalize_rollup(agg: DataFrame) -> DataFrame:
    """Read-side projection: derived measures (avg) computed from the
    algebraic state; DECIMAL sums surface as double."""
    return agg.select(
        *[c for c in agg.columns if c not in AGG_COLS],
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        (F.col("sum_value").cast("double") / F.col("n_events")).alias("avg_value"),
        "min_ts",
        "max_ts",
    )
