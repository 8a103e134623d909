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


def keep_first_by_key(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Keep-first-per-key WITHOUT a window: one MIN(struct(order,
    payload)) aggregate per key, re-exploded to columns.  Value-
    identical to ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY
    order_cols) = 1`` whenever ``order_cols`` are duplicate-free
    within a key (struct comparison is lexicographic; null keys
    group like a window partition, and null order fields sort first
    exactly like the window's ASC NULLS FIRST — both property-tested
    on nullable data), but the aggregate is MAP-SIDE COMBINABLE: each scan task emits one
    candidate row per key it saw, so a boilerplate key occurring
    millions of times costs one row per task in the shuffle instead
    of pinning its whole occurrence list in one unsplittable window
    task — the round-9 span-family hardening as a reusable
    primitive, staged for the round-10 queue (dedup_segment_rewrite
    seg_md5, dedup_incremental_batch content_md5; see the registry
    docstring).  Output column order: key_cols + order_cols +
    remaining columns, one row per key."""
    payload = [c for c in df.columns if c not in key_cols]
    ordered = order_cols + [c for c in payload if c not in order_cols]
    agg = df.groupBy(*key_cols).agg(
        F.min(F.struct(*ordered)).alias("_first")
    )
    return agg.select(
        *key_cols, *[F.col(f"_first.{c}").alias(c) for c in ordered]
    )


def attach_group_count(
    df: DataFrame, key_cols: list[str], out: str
) -> DataFrame:
    """``COUNT(*) OVER (PARTITION BY key)`` without the window: a
    map-side-combinable groupBy count joined back on the key.  The
    join is AQE-visible (broadcast when the distinct-key relation is
    small, skew-split when a key is hot) where a window partition is
    an indivisible task — the fix queued for tfidf_top_terms'
    term-df and neardup_prefix_filter_pairs' token-df at round 10.

    The join-back is NULL-SAFE (``<=>``): a window partitions null
    keys into a group like any other, and a plain equi-join-back
    would silently DROP those rows — none of the production callers
    feed nullable keys (md5/token/shingle hashes), but the primitive
    keeps the window's exact semantics so a future caller can't be
    bitten (property-tested on null keys).  ``<=>`` is still a plain
    equi-join to the planner — hash/broadcast strategies and AQE
    skew-split all apply.  Value-identical to the window; column
    order is preserved with ``out`` appended.  The join-side key
    renames are derived fresh against the input's columns, so a
    caller whose relation already carries an ``_agc_``-prefixed
    column can't hit an ambiguous reference or lose a column to the
    final drop."""
    taken = set(df.columns) | {out}

    def _fresh(c: str) -> str:
        cand = f"_agc_{c}"
        while cand in taken:
            cand = "_" + cand
        taken.add(cand)
        return cand

    ren = {c: _fresh(c) for c in key_cols}
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias(out))
    counts = counts.select(
        *[F.col(c).alias(ren[c]) for c in key_cols], out
    )
    cond = None
    for c in key_cols:
        eq = F.col(c).eqNullSafe(F.col(ren[c]))
        cond = eq if cond is None else cond & eq
    return df.join(counts, cond).drop(*ren.values())
