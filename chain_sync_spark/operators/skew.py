"""Skew mitigation: salted joins (SURVEY §4 / 100 TB mandate).

A join key with few distinct values (or a power-law hot key) lands
whole key-groups on single tasks. AQE's skew-join splitting handles
the sort-merge case at runtime; salting is the explicit, planner-
independent form: the big side spreads each key over `n_salts`
sub-keys derived from a deterministic per-row expression, the small
side is replicated n_salts times, and the join runs on
(key, salt) — every hot key now occupies n_salts tasks.

The salt must be deterministic (a hash of stable row columns, never
rand()) so retried tasks and replayed batches salt identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_from: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join `big` ⋈ `small` on `on`, spreading each key over
    `n_salts` sub-partitions. `salt_from` is any expression over
    `big`'s stable columns (e.g. a unique id) — hashed into the salt.
    `small` is replicated n_salts× (it must be small; that is the
    point of the pattern)."""
    spark = small.sparkSession
    big_s = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(salt_from), F.lit(n_salts)).cast("int")
    )
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias(SALT_COL))
    small_s = small.crossJoin(salts)
    return big_s.join(small_s, on + [SALT_COL], how).drop(SALT_COL)
