"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (SURVEY.md §4):
  - AQE on: runtime re-planning (skew-join splitting, dynamic
    coalescing of shuffle partitions, broadcast conversion).
  - UTC session timezone: keeps Spark/DuckDB/parquet timestamp
    semantics aligned (SURVEY.md §7 hard part d).
  - Arrow enabled: pandas_udf / applyInPandas run vectorized.
  - shuffle.partitions sized by env for local runs; on a real
    cluster this is superseded by AQE coalescing + initial
    partition num.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "chain-sync-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE post-shuffle coalescing knobs, env-exposed for cluster
        # deployments; local defaults are Spark's own.  r14 measured
        # parallelismFirst=false (size reduce partitions purely from
        # the byte advisory) with full-protocol interleaved bench
        # pairs at 32 AND 8 cores and REJECTED it: it lost the warm
        # headline at both core counts (32c: 7.73 vs 5.87 s; 8c: 6.21
        # vs 5.49 s) and collapsed compute-dense small-byte exchanges
        # to single tasks (sketch_fold_digest construct 0.7 -> 10.1 s)
        # — at local SFs partition-count parallelism carries real CPU
        # work that byte-sizing cannot see.  The r13 "32 cores slower
        # than 8" premise was re-measured as mostly that run's load
        # (load1 8.2); at clean probes the gap is ~7%.  On a cluster
        # with real I/O, flip via SPARK_GRAFT_PARALLELISM_FIRST=false
        # and size SPARK_GRAFT_ADVISORY_PART to taste (guide §2.2).
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_PARALLELISM_FIRST", "true"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PART", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet carries TIMESTAMP(NANOS); set once here for
        # our own sessions (tables.table keeps a runtime fallback
        # because the external driver builds a vanilla session)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # testdata timestamps are micros with isAdjustedToUTC=false;
        # read them as TIMESTAMP (LTZ) — with the UTC session timezone
        # the values are identical to DuckDB's naive timestamps, and
        # instant functions (unix_micros, window, ...) stay valid
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
