"""TPC-H completion: the 13 query shapes not yet covered by
``operators/relational.py`` (which holds Q1/Q3/Q5/Q6/Q7/Q10/Q13/Q14/
Q18).  Together the registry now exposes all 22 TPC-H shapes.

The testdata star schema (TESTDATA.md) is TPC-H-ish but slimmer than
the spec: there is no ``partsupp`` table and lineitem carries no
commit/receipt dates, ship mode, or container.  Queries that depend on
those columns are implemented as *adapted shapes* — same logical plan
pattern (correlated aggregate, EXISTS/NOT EXISTS decorrelation,
disjunctive pushdown, HAVING-vs-global-scalar...), with the
part↔supplier bridge derived from ``lineitem`` and "lateness" defined
against ``o_orderdate``.  Each docstring names the substitution.

Cross-engine determinism follows the relational.py contract: money
math in exact DECIMAL, cast to DOUBLE only at the end; correlated
``x < frac * AVG(y)`` predicates are rewritten to the
multiplication-only exact form ``x * k * cnt < sum`` so neither engine
ever compares against an order-dependent double; LIMIT queries carry
unique tie-breaker sort keys.

Scale notes (100 TB): every dimension join (region/nation/supplier/
part) is broadcast; the only wide shuffles are fact-grain
aggregations and lineitem⋈orders on orderkey.  EXISTS/NOT EXISTS
compile to semi/anti joins, never per-row subqueries.  The two
HAVING-vs-total shapes (Q11/Q15) broadcast a 1-row aggregate against
the grouped relation — the decorrelated plan a scalar subquery should
produce (same pattern as relational.scalar_subquery_above_avg).

Reference parity: the reference engine (C++/JS ingest pipeline) has
no analytics surface; these queries cover SURVEY.md §2.3 J6 /
§2.4 A5-A7 / §2.5 sorts-limits via the standard TPC-H workload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chain_sync_spark.tables import table


def _dec(c: Column, prec: str = "18,2") -> Column:
    return c.cast(f"decimal({prec})")


def _revenue() -> Column:
    """extendedprice * (1 - discount), exact decimal (matches the
    DECIMAL(18,2) convention used by relational.py Q3/Q7/Q10)."""
    return _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier per part
# ---------------------------------------------------------------------------

Q2_TYPE = "STANDARD"
Q2_SIZE_LO, Q2_SIZE_HI = 10, 20
Q2_REGION = "EUROPE"


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part in a (type, size-band) slice, the
    European supplier offering the minimum unit cost.

    Substitution (no partsupp): the part↔supplier relationship and its
    cost come from observed lineitems — unit_cost(part, supp) =
    MIN(l_extendedprice / l_quantity).  The spec's correlated
    ``ps_supplycost = (SELECT MIN(ps_supplycost) ...)`` becomes a
    row_number window per part over (cost, suppkey) — the decorrelated
    plan.  Dims (part slice, supplier⋈nation⋈region) broadcast; the
    only wide shuffle is the (partkey, suppkey) cost aggregation."""
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == Q2_TYPE)
        & F.col("p_size").between(Q2_SIZE_LO, Q2_SIZE_HI)
    ).select("p_partkey", "p_name")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            F.round(
                F.min(F.col("l_extendedprice") / F.col("l_quantity")), 6
            ).alias("unit_cost")
        )
    )
    w = Window.partitionBy("p_partkey").orderBy(F.asc("unit_cost"), F.asc("s_suppkey"))
    return (
        cost.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


_Q2_ORACLE = f"""
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
         ROUND(MIN(l_extendedprice / l_quantity), 6) AS unit_cost,
         ROW_NUMBER() OVER (
           PARTITION BY p_partkey
           ORDER BY ROUND(MIN(l_extendedprice / l_quantity), 6) ASC, s_suppkey ASC
         ) AS rn
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = '{Q2_TYPE}' AND p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
    AND r_name = '{Q2_REGION}'
  GROUP BY s_acctbal, s_name, n_name, p_partkey, p_name, s_suppkey
)
WHERE rn = 1
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS → semi join)
# ---------------------------------------------------------------------------

Q4_LATE_DAYS = 60


def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders placed in one quarter that had at least
    one late line, counted by priority.

    Substitution (no commit/receipt dates): a line is late when it
    shipped more than Q4_LATE_DAYS after the order date.  The EXISTS
    subquery compiles to a LEFT SEMI join on orderkey with the
    lateness predicate in the join condition — one shuffle, no
    per-order subquery."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q4_LATE_DAYS} DAYS"
    )
    return (
        orders.join(li, (orders.o_orderkey == li.l_orderkey) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q4_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
  )
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

Q8_NATION = "NATION_3"
Q8_REGION = "EUROPE"
Q8_TYPE = "PROMO"


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the share of yearly revenue for one part type,
    sold to customers in one region, that is supplied by one nation.
    Conditional-aggregate-over-join: part/supplier/nation/region dims
    broadcast, lineitem⋈orders is the wide shuffle, then one grouped
    conditional sum — numerator and denominator in a single pass."""
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE).select(
        "p_partkey"
    )
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    li = table(spark, sf_dir, "lineitem")
    vol = _revenue()
    zero = F.lit(0).cast("decimal(18,2)")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    )
    return (
        joined.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


_Q8_ORACLE = f"""
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         {_REV_SQL} AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE p_type = '{Q8_TYPE}'
    AND EXISTS (
      SELECT 1 FROM customer
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region    ON cn.n_regionkey = r_regionkey
      WHERE c_custkey = o_custkey AND r_name = '{Q8_REGION}'
    )
)
GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit
# ---------------------------------------------------------------------------

Q9_NAME_PAT = "widget"
# Tight decimal casts keep every intermediate well under precision 38
# in BOTH engines (Spark caps at 38 and silently drops scale past it,
# DuckDB widens to HUGEINT differently — staying small sidesteps both).
_Q9_PROFIT_SQL = (
    "CAST(l_extendedprice AS DECIMAL(15,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
    " - CAST(p_retailprice AS DECIMAL(15,2))"
    "   * CAST(l_quantity AS DECIMAL(7,2))"
    "   * CAST(0.1 AS DECIMAL(2,1))"
)


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for
    parts matching a name pattern.

    Substitution (no partsupp.ps_supplycost): per-unit supply cost is
    proxied as 10% of p_retailprice, so profit = revenue −
    0.1·retail·qty, computed entirely in narrow exact decimals (see
    _Q9_PROFIT_SQL note).  part slice and supplier⋈nation broadcast;
    lineitem⋈orders is the wide shuffle."""
    part = table(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"%{Q9_NAME_PAT}%")
    ).select("p_partkey", "p_retailprice")
    nation = table(spark, sf_dir, "nation")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = table(spark, sf_dir, "lineitem")
    profit = (
        F.col("l_extendedprice").cast("decimal(15,2)")
        * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)"))
        - F.col("p_retailprice").cast("decimal(15,2)")
        * F.col("l_quantity").cast("decimal(7,2)")
        * F.lit("0.1").cast("decimal(2,1)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


_Q9_ORACLE = f"""
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(SUM({_Q9_PROFIT_SQL}) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{Q9_NAME_PAT}%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
"""


# ---------------------------------------------------------------------------
# Q11 — important stock identification (HAVING vs global scalar)
# ---------------------------------------------------------------------------

Q11_NATION = "NATION_5"
Q11_FRACTION_DENOM = 10_000  # value > total / 10000


def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value through one nation's
    suppliers exceeds a fixed fraction of that nation's total.

    Substitution (no partsupp): value(part) = Σ extendedprice·quantity
    over the nation's lineitems.  The spec's HAVING-vs-scalar-subquery
    decorrelates to: per-part aggregate once, 1-row total aggregated
    FROM the per-part relation, broadcast back and compared with
    multiplication-only exact decimals (value·10000 > total) — no
    double comparison.  Catalyst plans the per-part aggregate twice
    (once under the 1-row total); a deployment that minds the second
    pass materializes the aggregate first — kept stateless here
    because registry queries must not leak cached partitions
    (tests/test_cache_discipline)."""
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == Q11_NATION)
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    value = F.col("l_extendedprice").cast("decimal(15,2)") * F.col(
        "l_quantity"
    ).cast("decimal(7,2)")
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("value_dec"))
    )
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_dec") * Q11_FRACTION_DENOM > F.col("total_dec"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), F.asc("p_partkey"))
    )


_Q11_ORACLE = f"""
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(15,2))
             * CAST(l_quantity AS DECIMAL(7,2))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(value_dec AS DOUBLE) AS value
FROM per_part
WHERE value_dec * {Q11_FRACTION_DENOM} > (SELECT SUM(value_dec) FROM per_part)
ORDER BY value DESC, p_partkey ASC
"""


# ---------------------------------------------------------------------------
# Q12 — shipping class / priority (conditional counts over a join)
# ---------------------------------------------------------------------------

Q12_LATE_DAYS = 30


def tpch_q12_ship_class_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: for lines shipped late in one year, counts of
    high- vs low-priority orders per shipping class.

    Substitution (no l_shipmode): l_returnflag stands in as the
    line's shipping class; lateness = shipped more than Q12_LATE_DAYS
    after the order date (no receipt date).  Plan: lineitem year
    filter pushed to scan, one lineitem⋈orders shuffle, grouped
    conditional counts (CASE inside SUM, single pass)."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q12_LATE_DAYS} DAYS"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(late)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


_Q12_ORACLE = f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier (aggregate vs its own max)
# ---------------------------------------------------------------------------


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one
    quarter.  The spec's revenue view + scalar MAX subquery
    decorrelates to: aggregate lineitem per supplier, take the 1-row
    MAX of that relation, broadcast it back, filter on exact decimal
    equality (never double equality), then broadcast-join the
    supplier dim for names.  Like Q11, the grouped relation is
    planned twice (probe + MAX) — the stateless two-pass form; see
    the Q11 note."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    per_supp = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("rev_dec"))
    best = per_supp.agg(F.max("rev_dec").alias("max_rev"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.join(F.broadcast(best))
        .filter(F.col("rev_dec") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("rev_dec").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey, SUM({_REV_SQL}) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (distinct count + NOT IN anti join)
# ---------------------------------------------------------------------------

Q16_EXCL_BRAND = "Brand#5"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)
Q16_BAD_SUPP_PAT = "%7%"


def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can provide parts
    of each (brand, type, size) slice, excluding one brand, one type
    family, and a "complaints" supplier set.

    Substitution (no partsupp): supplier↔part pairs come from
    lineitem; the complaints filter (spec: comment LIKE) keys on
    s_name.  The NOT IN subquery compiles to a broadcast LEFT ANTI
    join; distinct pairs are reduced before the grouped
    count-distinct."""
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & F.col("p_size").isin(*Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = table(spark, sf_dir, "supplier").filter(
        F.col("s_name").like(Q16_BAD_SUPP_PAT)
    ).select("s_suppkey")
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q16_ORACLE = f"""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}' AND p_type <> '{Q16_EXCL_TYPE}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_name LIKE '{Q16_BAD_SUPP_PAT}'
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated AVG, exact rewrite)
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#3"


def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: weekly-averaged revenue that would be lost by
    no longer filling small-quantity orders of one brand's parts.

    The correlated ``l_quantity < 0.2 * AVG(l_quantity per part)`` is
    rewritten multiplication-only and exact:
        qty < sum/(5·cnt)  ⟺  qty · 5 · cnt < sum      (cnt > 0)
    so neither engine materializes an order-dependent double average.
    Plan: brand slice broadcast into both the per-part aggregate and
    the probe; one partkey-grain aggregate, one partkey join."""
    part = table(spark, sf_dir, "part").filter(
        F.col("p_brand") == Q17_BRAND
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    per_part = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(7,2)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    small = (
        li.join(per_part, F.col("l_partkey") == F.col("agg_partkey"))
        .filter(
            F.col("l_quantity").cast("decimal(7,2)") * 5 * F.col("cnt_qty")
            < F.col("sum_qty")
        )
    )
    return small.agg(
        (F.sum(_dec(F.col("l_extendedprice"))).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        )
    )


_Q17_ORACLE = f"""
WITH brand_lines AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'
), per_part AS (
  SELECT l_partkey AS agg_partkey,
         SUM(CAST(l_quantity AS DECIMAL(7,2))) AS sum_qty,
         COUNT(*) AS cnt_qty
  FROM brand_lines GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM brand_lines JOIN per_part ON l_partkey = agg_partkey
WHERE CAST(l_quantity AS DECIMAL(7,2)) * 5 * cnt_qty < sum_qty
"""


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive predicate pushdown)
# ---------------------------------------------------------------------------


def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd (brand, size-band,
    quantity-band) slices.  Substitution: p_size bands replace the
    spec's container lists (no p_container column).  The disjunction
    references both sides of the part⋈lineitem join; Catalyst still
    derives the table-local prefilters (brand ∈ {...}, size ≤ 15,
    quantity ≤ 30) for scan pushdown, the full OR is evaluated on the
    joined rows — the plan the spec query is designed to elicit."""
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = table(spark, sf_dir, "lineitem")

    def arm(brand: str, size_hi: int, qty_lo: int, qty_hi: int) -> Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(qty_lo, qty_hi)
        )

    cond = (
        arm("Brand#1", 5, 1, 11) | arm("Brand#2", 10, 10, 20) | arm("Brand#3", 15, 20, 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


_Q19_ORACLE = f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (nested semi-join chain)
# ---------------------------------------------------------------------------

Q20_NATION = "NATION_7"
Q20_NAME_PREFIX = "red"
Q20_QTY_THRESHOLD = 40


def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who moved more than a
    threshold quantity of any name-matched part in one year.

    Substitution (no partsupp.ps_availqty): "excess" is a per
    (supplier, part) shipped-quantity aggregate over the year's
    lineitems exceeding Q20_QTY_THRESHOLD (spec: > 0.5·availqty).
    The nested IN-subqueries compile to a semi-join chain: part slice
    broadcast into the pair aggregate, qualifying pairs semi-join
    suppliers, nation dim broadcast."""
    part = table(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"{Q20_NAME_PREFIX}%")
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    qualifying = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(7,2)")).alias("qty"))
        .filter(F.col("qty") > Q20_QTY_THRESHOLD)
        .select("l_suppkey")
    )
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == Q20_NATION)
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("decimal(18,2)").cast("double").alias("acctbal"))
        .orderBy("s_name")
    )


_Q20_ORACLE = f"""
SELECT s_name, CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q20_NATION}'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
      AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(7,2))) > {Q20_QTY_THRESHOLD}
  )
ORDER BY s_name
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------

Q21_NATION = "NATION_2"
Q21_LATE_DAYS = 365


def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers in one nation who were the ONLY
    late supplier on a finished multi-supplier order.

    Substitution (no commit/receipt dates): a line is late when it
    shipped more than Q21_LATE_DAYS after the order date.

    Scale rewrite: the spec's EXISTS (another supplier on the order) /
    NOT EXISTS (another LATE supplier on the order) pair would plan as
    semi + anti self-joins — three passes over lineitem⋈orders.  For
    a supplier s1 with a late line, "∃ other supplier" ⟺ the order
    has ≥ 2 distinct suppliers, and "∄ other late supplier" ⟺ the
    order's late-supplier set is exactly {s1} ⟺ its distinct
    late-supplier count is 1.  So ONE per-order aggregate
    (countDistinct supplier, countDistinct late supplier) replaces
    both subqueries; the oracle keeps the literal EXISTS/NOT EXISTS
    form, so the value-hash match proves the rewrite equivalent."""
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
        ).alias("is_late"),
    )
    order_stats = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == Q21_NATION)
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        lines.filter(F.col("is_late"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(order_stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


_Q21_ORACLE = f"""
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM lines l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE l1.is_late AND n_name = '{Q21_NATION}'
  AND EXISTS (
    SELECT 1 FROM lines l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lines l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.is_late
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (anti join + exact-avg rewrite)
# ---------------------------------------------------------------------------

Q22_NATIONS = tuple(f"NATION_{i}" for i in range(1, 8))
Q22_LAPSE_CUTOFF = "2000-01-01"


def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count and total balance of
    above-average-balance customers who have lapsed.

    Substitutions (no c_phone; the synthetic order stream gives every
    customer ~10 orders, so the spec's "never ordered" is empty):
    the country-code grouping keys on the customer's nation (a
    7-nation allow-list), and "lapsed" means no orders on or after
    Q22_LAPSE_CUTOFF.  NOT EXISTS(recent orders) is a LEFT ANTI join
    against the date-filtered orders scan; the ``c_acctbal >
    AVG(...)`` scalar subquery is rewritten exact: acctbal·cnt > sum
    over the positive-balance population, broadcast as a 1-row
    aggregate."""
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*Q22_NATIONS))
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_acctbal", "n_name")
    )
    pos = cust.filter(F.col("c_acctbal") > 0.0)
    avg_stats = pos.agg(
        F.sum(_dec(F.col("c_acctbal"))).alias("bal_sum"),
        F.count(F.lit(1)).alias("bal_cnt"),
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(Q22_LAPSE_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_stats))
        .filter(_dec(F.col("c_acctbal")) * F.col("bal_cnt") > F.col("bal_sum"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
    )


_Q22_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey, c_acctbal, n_name
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE n_name IN {Q22_NATIONS}
), stats AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum, COUNT(*) AS bal_cnt
  FROM cust WHERE c_acctbal > 0.0
)
SELECT n_name AS cntry, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM cust, stats
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bal_cnt > bal_sum
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{Q22_LAPSE_CUTOFF}'
  )
GROUP BY n_name
"""


QUERIES = {
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q4_order_priority": tpch_q4_order_priority,
    "tpch_q8_market_share": tpch_q8_market_share,
    "tpch_q9_product_profit": tpch_q9_product_profit,
    "tpch_q11_important_stock": tpch_q11_important_stock,
    "tpch_q12_ship_class_priority": tpch_q12_ship_class_priority,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q16_supplier_part_counts": tpch_q16_supplier_part_counts,
    "tpch_q17_small_quantity_revenue": tpch_q17_small_quantity_revenue,
    "tpch_q19_disjunctive_revenue": tpch_q19_disjunctive_revenue,
    "tpch_q20_excess_suppliers": tpch_q20_excess_suppliers,
    "tpch_q21_waiting_suppliers": tpch_q21_waiting_suppliers,
    "tpch_q22_sales_opportunity": tpch_q22_sales_opportunity,
}

ORACLE = {
    "tpch_q2_min_cost_supplier": _Q2_ORACLE,
    "tpch_q4_order_priority": _Q4_ORACLE,
    "tpch_q8_market_share": _Q8_ORACLE,
    "tpch_q9_product_profit": _Q9_ORACLE,
    "tpch_q11_important_stock": _Q11_ORACLE,
    "tpch_q12_ship_class_priority": _Q12_ORACLE,
    "tpch_q15_top_supplier": _Q15_ORACLE,
    "tpch_q16_supplier_part_counts": _Q16_ORACLE,
    "tpch_q17_small_quantity_revenue": _Q17_ORACLE,
    "tpch_q19_disjunctive_revenue": _Q19_ORACLE,
    "tpch_q20_excess_suppliers": _Q20_ORACLE,
    "tpch_q21_waiting_suppliers": _Q21_ORACLE,
    "tpch_q22_sales_opportunity": _Q22_ORACLE,
}
