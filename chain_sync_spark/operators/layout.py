"""Data-layout operators: multi-column Z-order clustering for scan
pruning.

At 100 TB the cheapest query is the one that never reads the file:
parquet readers skip whole files/row-groups when the pushed predicate
falls outside the footer's min/max stats. A table sorted on one
column prunes only that column's predicates; interleaving the bits of
several columns (Morton / Z-order) tightens per-file min/max ranges
on ALL of them at once, so selective filters on any clustered column
skip most files. This is the layout trick behind Delta OPTIMIZE
ZORDER / Iceberg sort orders, expressed here with nothing but
built-in column expressions + repartitionByRange — no engine
extension needed.

Scale: the whole pipeline is one range shuffle. Min/max scaling uses
a broadcast 1-row aggregate (no window over a global partition); the
bit interleave is pure codegen arithmetic; repartitionByRange samples
the z-key to build balanced range bounds. Skew in the key space maps
to uneven z-ranges, which range partitioning absorbs by sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def interleave_bits(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton key: interleave the low `bits` bits of each non-negative
    integer column (col i contributes bit position b*n+i for its bit
    b). Pure built-in arithmetic — whole-stage codegen, no UDF."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(
            f"interleave_bits: {n} columns x {bits} bits = {bits * n} key bits "
            "exceeds the 63 usable bits of a signed long (the sign bit would "
            f"flip and corrupt the Morton ordering); use bits <= {63 // n}"
        )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + i)
    return key


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = DEFAULT_BITS,
    num_files: int = 16,
) -> DataFrame:
    """Return `df` re-arranged for a Z-ordered write: each named
    column is min/max-scaled into [0, 2^bits), the scaled values are
    bit-interleaved into a Morton key, and rows are range-partitioned
    + sorted by that key. Writing the result yields `num_files` files
    whose per-file min/max footers are tight on EVERY clustered
    column (see tests/test_layout.py for the measured pruning win).

    Numeric and timestamp columns are supported; timestamps scale via
    their microsecond instant.

    `bits` is auto-reduced to 63 // len(cols) when the requested
    interleave would spill into the long's sign bit (e.g. the default
    16 bits with 4+ columns): a wrapped-negative Morton key would
    silently corrupt the range ordering, and extra precision beyond
    the balanced budget adds nothing to pruning.
    """
    if bits * len(cols) > 63:
        bits = 63 // len(cols)
    stats_aggs = []
    for c in cols:
        stats_aggs.append(F.min(_as_long(df, c)).alias(f"__mn_{c}"))
        stats_aggs.append(F.max(_as_long(df, c)).alias(f"__mx_{c}"))
    stats = df.agg(*stats_aggs)
    out = df.crossJoin(F.broadcast(stats))
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        rng = F.when(mx > mn, (mx - mn).cast("double")).otherwise(F.lit(1.0))
        scaled.append(
            F.least(
                F.floor(((_as_long(out, c) - mn).cast("double") / rng) * (top + 1)),
                F.lit(top),
            ).cast("long")
        )
    out = out.withColumn("__zkey", interleave_bits(scaled, bits))
    out = (
        out.repartitionByRange(num_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])
    )
    return out


def _as_long(df: DataFrame, colname: str) -> Column:
    """Numeric/timestamp column as a long (timestamps via instant
    micros) for scaling arithmetic."""
    dtype = dict(df.dtypes).get(colname, "")
    c = F.col(colname)
    if dtype.startswith("timestamp"):
        return F.unix_micros(c)
    if dtype == "date":
        return F.datediff(c, F.lit("1970-01-01")).cast("long")
    return c.cast("long")
