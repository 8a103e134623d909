"""Core relational operator surface (SURVEY.md §2.2–2.6).

Every query here is a (spark, sf_dir) -> DataFrame callable with a
matching DuckDB oracle SQL string. Cross-engine determinism rules:

  * Money/double aggregates run through DECIMAL (exact, order-
    independent) and are cast to DOUBLE at the end. Summing raw
    doubles is order-dependent and never hash-matches across engines.
  * AVG is computed as exact-decimal SUM cast to double, divided by
    COUNT — one IEEE double division, identical in both engines.
  * Every window ORDER BY carries a unique tie-breaker key.
  * Sums of integers are CAST(... AS BIGINT) in DuckDB (it widens to
    HUGEINT by default; Spark stays LongType).

Scale notes (100 TB design): all joins here are either broadcastable
dimension joins (region/nation/supplier/part are tiny relative to the
facts — Spark's AQE converts them to broadcast-hash automatically and
we hint the unambiguous ones), or key-partitioned fact joins that
sort-merge/shuffle-hash on the join key. Filters are expressed on
base columns before joins so Catalyst pushes them into the parquet
scan.

Reference parity (SURVEY.md §2 operator ids are noted per query):
filters/projections P1–P11, joins J1–J6, aggregations A1–A7,
windows/sorts/limits/set-ops §2.5, scalar functions §2.6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chain_sync_spark.functions import sketches as sk
from chain_sync_spark.tables import table


def _dec(c: Column, prec: str = "18,2") -> Column:
    """Exact-decimal view of a money column (see module docstring)."""
    return c.cast(f"decimal({prec})")


def _sum_money(c: Column, alias: str) -> Column:
    return F.sum(_dec(c)).cast("double").alias(alias)


def _avg_money(c: Column, alias: str) -> Column:
    return (F.sum(_dec(c)).cast("double") / F.count(F.lit(1))).alias(alias)


# ---------------------------------------------------------------------------
# Flagship — the "sync digest" (SURVEY.md §7 step 1).
# Per-account activity rollup: the Spark-native analog of the
# reference's per-account last_active/upsert accounting
# (handlers/comments.js:179-180, handlers/votes.js:26-27) widened to
# a per-user/type/day aggregate with a ranking window.
# ---------------------------------------------------------------------------

def flagship_sync_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.col("user_id"),
            F.col("event_type"),
            F.to_date("ts").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_money(F.col("value"), "sum_value"),
            F.max("ts").alias("last_active"),
        )
    )
    w = Window.partitionBy("day").orderBy(
        F.desc("n_events"), F.asc("user_id"), F.asc("event_type")
    )
    return daily.withColumn("day_rank", F.row_number().over(w))


FLAGSHIP_ORACLE = """
WITH daily AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS day,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         MAX(CAST(ts AS TIMESTAMP)) AS last_active
  FROM events GROUP BY 1, 2, 3
)
SELECT user_id, event_type, day, n_events, sum_value, last_active,
       ROW_NUMBER() OVER (PARTITION BY day
                          ORDER BY n_events DESC, user_id, event_type) AS day_rank
FROM daily
"""


# ---------------------------------------------------------------------------
# Projections / filters (P1–P11)
# ---------------------------------------------------------------------------

def filter_project_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 type-partition filter + P2 projection: one op-type sub-stream.

    Mirrors listener.js:148-155 `filterOperation` — a typed filtered
    projection of the op stream. Filter + projection reach the
    parquet scan (PushedFilters / ReadSchema).
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            _dec(F.col("value")).cast("double").alias("amount"),
            F.to_date("ts").alias("day"),
        )
    )


def case_when_sign_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 vote-sign branch (handlers/votes.js:17): weight>0 routes to
    upvotes/downvotes — here value>=100 routes events to hi/lo buckets."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.when(F.col("value") >= 100, F.lit("hi")).otherwise(F.lit("lo")).alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def isin_allowlist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P7 membership predicates (comments.js:66,85-91): isin allow-list."""
    cust = table(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey", "c_name", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Aggregations (A1–A7)
# ---------------------------------------------------------------------------

def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 hash aggregate, partial+final (Catalyst does the map-side
    combine automatically). TPC-H Q1 shape over lineitem."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = _dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount")))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _dec(F.col("l_tax")))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            _sum_money(F.col("l_extendedprice"), "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            _avg_money(F.col("l_quantity"), "avg_qty"),
            _avg_money(F.col("l_extendedprice"), "avg_price"),
            _avg_money(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 count-distinct."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def rollup_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 rollup: subtotal lattice over (nation, mktsegment)."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return (
        joined.rollup("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _sum_money(F.col("c_acctbal"), "sum_acctbal"),
        )
    )


def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 cube over (orderstatus, orderpriority)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _sum_money(F.col("o_totalprice"), "sum_price"),
        )
    )


def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 explicit GROUPING SETS (two independent subtotal rows, no
    cross product — the lattice rollup/cube can't express) with
    grouping() markers to disambiguate real NULLs from subtotal
    NULLs. Runs through the SQL API (temp view + spark.sql) — the
    same Catalyst plan a DataFrame would produce, and evidence the
    engine's SQL surface works for users who bring SQL."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


_GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


# ---------------------------------------------------------------------------
# Joins (J1–J6)
# ---------------------------------------------------------------------------

def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 dimension join chain customer⋈nation⋈region with broadcast
    hints: dims are orders of magnitude smaller than facts, so at
    100 TB these stay broadcast-hash (no shuffle of the fact side)."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _avg_money(F.col("c_acctbal"), "avg_acctbal"),
        )
    )


def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/S5 existence semi-join (handlers/votes.js:31-47): keep only
    rows whose key exists in the other relation — left_semi, no
    payload columns from the right side are materialized."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
    )


def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 anti probe (comments.js:118-142 else-branch): rows with no
    match — left_anti."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def join_multiway_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 fact-fact + dims: lineitem⋈orders shuffles on orderkey
    (sort-merge at scale, AQE may pick shuffle-hash); customer/nation
    broadcast. Revenue per nation per order-year."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    revenue = _dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name"), F.year("o_orderdate").alias("order_year"))
        .agg(F.sum(revenue).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


def join_range_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 range (theta) join: events joined to a small literal band
    relation on value BETWEEN lo AND hi. The band side is tiny →
    broadcast nested-loop, which is the correct physical plan at any
    scale when one side is O(10) rows."""
    ev = table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1e18)],
        "band string, lo double, hi double",
    )
    return (
        ev.join(
            F.broadcast(bands),
            (ev.value >= bands.lo) & (ev.value < bands.hi),
            "inner",
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), _sum_money(F.col("value"), "sum_value"))
    )


def join_asof_purchase_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """⊕J6 as-of join: for each purchase, the most recent prior 'view'
    by the same user. Implemented scalably as a single shuffle on
    user_id: union both sides, one pass of last(ignorenulls) over an
    ordered window — no per-row lookups, no range explosion.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("event_type").isin("view", "purchase"))
    tagged = ev.withColumn(
        "view_ts", F.when(F.col("event_type") == "view", F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn("prior_view_ts", F.last("view_ts", ignorenulls=True).over(w))
    return (
        filled.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "prior_view_ts")
    )


# ---------------------------------------------------------------------------
# Windows / sorts / limits / set ops (§2.5)
# ---------------------------------------------------------------------------

def join_null_safe_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): the key
    is NULLed for one segment (an 'unknown' bucket), and the dim join
    must still match those rows — plain = drops every NULL pair, so
    the null-safe operator is the only correct single-join encoding.
    Still a hash join (null-safe equality is hashable); the dim side
    broadcasts."""
    cust = table(spark, sf_dir, "customer")
    key = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    left = cust.select("c_custkey", key.alias("k"))
    dim = (
        cust.select(key.alias("dk"))
        .distinct()
        .withColumn("label", F.coalesce(F.col("dk"), F.lit("unknown")))
    )
    return (
        left.join(F.broadcast(dim), F.col("k").eqNullSafe(F.col("dk")))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_NULL_SAFE_ORACLE = """
WITH l AS (
  SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS k FROM customer
),
d AS (
  SELECT DISTINCT NULLIF(c_mktsegment, 'BUILDING') AS dk,
         COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'unknown') AS label
  FROM customer
)
SELECT label, COUNT(*) AS n_customers
FROM l JOIN d ON l.k IS NOT DISTINCT FROM d.dk
GROUP BY label
"""


def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number ≤ k — the scalable top-k
    (partial top-k per partition, no global sort)."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame aggregate: running sum of order totals per customer over
    time. Exact-decimal running sum cast to double per row."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec(F.col("o_totalprice"))).over(w).cast("double").alias("running_total"),
    )


def window_trailing_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-customer trailing-7-day order
    total — the frame is bounded by VALUE distance on the time axis
    (every order within 7 days), not by row count. The axis is an
    integer day number from the NTZ date part — deliberately NOT an
    epoch cast, which would pass through the session timezone and
    shift frame boundaries across DST transitions on a non-UTC
    driver. Boundary ties all join the frame by RANGE semantics and
    the DECIMAL sum keeps the total order-independent."""
    orders = table(spark, sf_dir, "orders")
    day_num = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    w = Window.partitionBy("o_custkey").orderBy(day_num).rangeBetween(-7, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec(F.col("o_totalprice"))).over(w).cast("double").alias("trailing_7d_total"),
    )


_TRAILING_7D_ORACLE = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY (o_orderdate::DATE - DATE '1970-01-01')
         RANGE BETWEEN 7 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_7d_total
FROM orders
"""


def window_lag_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag: seconds since the user's previous event."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # Exact integer microsecond arithmetic — cross-engine deterministic
    # (seconds-level truncation semantics differ between engines).
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        ((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) / F.lit(1000000))
        .cast("double")
        .alias("gap_seconds"),
    )


def sort_limit_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by totalprice with deterministic tie-break.
    Spark plans limit+sort as TakeOrderedAndProject (no full sort)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


def set_ops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union/intersect/except surface: classify customer keys by
    membership in two derived sets (big spenders ∩/∖ building
    segment), tagged and unioned into one relation.

    Planned as ONE full-outer join of the two (distinct-key) sets
    with a membership CASE — the naive intersect/exceptAll form
    re-scans and re-aggregates orders once per branch (3×); this
    computes the expensive orders aggregation exactly once. Results
    are identical because both inputs are key-distinct.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    big_spenders = (
        orders.groupBy("o_custkey")
        .agg(F.sum(_dec(F.col("o_totalprice"))).alias("s"))
        .filter(F.col("s") > 500000)
        .select(F.col("o_custkey").alias("k"), F.lit(True).alias("is_spender"))
    )
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k"), F.lit(True).alias("is_building")
    )
    joined = big_spenders.join(building, "k", "full_outer")
    return joined.select(
        "k",
        F.when(F.col("is_spender") & F.col("is_building"), F.lit("both"))
        .when(F.col("is_spender").isNotNull(), F.lit("spender_only"))
        .otherwise(F.lit("building_only"))
        .alias("tag"),
    )


def set_ops_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — multiset set ops, which keep
    per-occurrence multiplicity (min / left-minus for each key)
    instead of deduplicating: a user with 5 purchases and 3 views
    contributes 3 'both' rows and 2 'purchase_excess' rows. Output is
    aggregated to (user, tag, n) so the check is order-insensitive.
    Both ops compile to one hash aggregation over tagged counts — no
    join, one shuffle per input."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    both = (
        purchases.intersectAll(views)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("tag", F.lit("both"))
    )
    excess = (
        purchases.exceptAll(views)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("tag", F.lit("purchase_excess"))
    )
    return both.unionByName(excess).select("user_id", "tag", "n")


_SET_OPS_ALL_ORACLE = """
WITH p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id FROM events WHERE event_type = 'view'),
ia AS (SELECT user_id FROM p INTERSECT ALL SELECT user_id FROM v),
ea AS (SELECT user_id FROM p EXCEPT ALL SELECT user_id FROM v)
SELECT user_id, 'both' AS tag, COUNT(*) AS n FROM ia GROUP BY 1, 2
UNION ALL
SELECT user_id, 'purchase_excess' AS tag, COUNT(*) AS n FROM ea GROUP BY 1, 2
"""


def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: orders above the global average price.
    The 1-row aggregate is broadcast against the fact scan — the plan
    a correlated `> (SELECT AVG(...))` compiles to, with no
    re-aggregation per row."""
    orders = table(spark, sf_dir, "orders")
    avg_price = orders.agg(
        (F.sum(_dec(F.col("o_totalprice"))).cast("double") / F.count(F.lit(1))).alias(
            "avg_price"
        )
    )
    return (
        orders.join(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_custkey",
                _dec(F.col("o_totalprice")).cast("double").alias("totalprice"))
    )


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer⋈orders⋈lineitem with
    date predicates on both fact scans (pushed to parquet), revenue
    aggregation, top-10 by revenue. The customer side broadcasts;
    orders⋈lineitem shuffles on orderkey."""
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1998-03-15").cast("timestamp")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share per month —
    conditional aggregation over the lineitem⋈part join (CASE inside
    SUM), exact-decimal revenue, one final double division per group.
    part broadcasts (bounded dim); the fact scan prunes to the month
    range via the pushed date predicate."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast("decimal(38,4)")
    )
    month = F.trunc(F.col("l_shipdate").cast("date"), "month")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(month.alias("ship_month"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo.cast("decimal(38,4)")).cast("double")
                / F.sum(revenue).cast("double")
            ).alias("promo_pct"),
            F.sum(revenue).cast("double").alias("total_revenue"),
        )
    )


_Q14_ORACLE = """
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
       100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))
                 ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS promo_pct,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
GROUP BY 1
"""


def join_salted_status_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated hot-key join: o_orderstatus has 3 distinct
    values — joined naively, each status is one key-group on one
    task. salted_join (operators/skew.py) spreads every status over 8
    deterministic sub-keys and replicates the 3-row dim 8×; the
    result is identical to the plain join, which is exactly what the
    oracle checks."""
    from chain_sync_spark.operators.skew import salted_join

    orders = table(spark, sf_dir, "orders")
    dim = spark.createDataFrame(
        [("O", "open"), ("F", "filled"), ("P", "partial")],
        "o_orderstatus string, status_name string",
    )
    joined = salted_join(
        orders, dim, ["o_orderstatus"], F.col("o_orderkey"), n_salts=8
    )
    return joined.groupBy("status_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _sum_money(F.col("o_totalprice"), "sum_price"),
    )


def pivot_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts spread across one column per
    event type (explicit value list → deterministic schema, one
    aggregation pass)."""
    types = ["click", "error", "purchase", "signup", "view"]
    ev = table(spark, sf_dir, "events")
    pivoted = ev.groupBy("user_id").pivot("event_type", types).count()
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )


# ---------------------------------------------------------------------------
# Scalar-function layer (§2.6)
# ---------------------------------------------------------------------------

def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of pivot_events_by_type: a wide
    per-segment aggregate (n_customers / sum_acctbal / max_acctbal
    columns) melts into (segment, metric, value) rows. Wide→long is a
    pure per-row flatMap — no shuffle beyond the feeding aggregation,
    and the metric name column is a literal, so Catalyst folds it."""
    cust = table(spark, sf_dir, "customer")
    wide = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n_customers"),
        _sum_money(F.col("c_acctbal"), "sum_acctbal"),
        F.max(_dec(F.col("c_acctbal"))).cast("double").alias("max_acctbal"),
    )
    return wide.melt(
        ids=["c_mktsegment"],
        values=["n_customers", "sum_acctbal", "max_acctbal"],
        variableColumnName="metric",
        valueColumnName="value",
    )


_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS DOUBLE) AS n_customers,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
         CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_acctbal
  FROM customer GROUP BY c_mktsegment
)
UNPIVOT wide ON n_customers, sum_acctbal, max_acctbal
INTO NAME metric VALUE value
"""


def json_extract_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 JSON field extraction (account_updates.js:2-6): pull a typed
    field out of a JSON string column and aggregate on it."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def surrogate_key_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 surrogate-key hash (comments.js:14-17 uses
    base64(xxhash64(author + "/" + permlink))). We key on
    md5(concat_ws('/', ...)) because md5 is bit-identical across
    Spark and DuckDB; xxhash64 variants (Spark seed 42, reference
    seed 0xCAFEBABE) are provided in functions.hashing for the sync
    engine, where only stability matters, not cross-engine equality."""
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.md5(F.concat_ws("/", F.col("c_name"), F.col("c_mktsegment"))).alias("surrogate_id"),
    )


def date_partition_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 calendar bucketing (comments.js:169-170 month/year index
    routing): year/month partition columns + per-bucket counts."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), _sum_money(F.col("o_totalprice"), "sum_price"))
    )


def string_funcs_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 standard scalar surface: substr/upper/trim/concat/like
    over part names."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_up"),
        F.substring(F.col("p_name"), 1, 8).alias("name_prefix"),
        F.length(F.col("p_name")).alias("name_len"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
        F.concat_ws(":", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
    )


def higher_order_token_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 hashtag-extraction shape (comments.js:71-73) as pure
    higher-order functions: split → filter → transform → array_join.
    Here: tokens starting with 's' from document text."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    s_toks = F.filter(toks, lambda t: t.startswith("s"))
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: t != "")).alias("n_tokens"),
        F.size(s_toks).alias("n_s_tokens"),
        # DuckDB's array_to_string returns NULL for an empty list; match it.
        F.when(F.size(s_toks) > 0,
               F.array_join(F.transform(s_toks, lambda t: F.upper(t)), " ")).alias("s_tokens_up"),
    )


def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by supplier nation within one region
    and date year, where the supplier and the ordering customer share
    a nation — the classic 6-way join whose co-nationality predicate
    (c_nationkey = s_nationkey) lands as a join condition, not a
    filter. Plan: the two facts shuffle on orderkey; supplier,
    customer-side nation, and region broadcast (all bounded dims);
    the region filter prunes nations BEFORE the fact join via the
    broadcast side."""
    cutoff_lo = F.lit("1996-01-01").cast("timestamp")
    cutoff_hi = F.lit("1997-01-01").cast("timestamp")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    revenue = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust),
              (orders.o_custkey == cust.c_custkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


_Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, … orders —
    LEFT OUTER customer⋈(filtered orders), per-customer count of
    non-null orderkeys (zero-order customers stay), then a histogram
    of the counts. Two shuffles (custkey, then order_count) — both
    on bounded-skew keys; the second aggregation input is one row per
    customer, already tiny relative to the fact."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return (
        per_cust.groupBy("order_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_Q13_ORACLE = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS order_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT order_count, COUNT(*) AS n_customers
FROM per_cust GROUP BY order_count
"""


def window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function surface in one pass: dense_rank,
    percent_rank, ntile(4), cume_dist over orders per customer by
    price. The ORDER BY carries the unique o_orderkey tie-break, so
    position-sensitive functions (ntile, cume_dist) are deterministic
    cross-engine. One shuffle on c_custkey; all four functions share
    the single sorted window frame."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).alias("price_dense_rank"),
        sk.floor_round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
        sk.floor_round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    )


_RANK_VARIANTS_ORACLE = f"""
SELECT o_custkey, o_orderkey,
       CAST(DENSE_RANK() OVER w AS INT) AS price_dense_rank,
       {sk.floor_round_sql('PERCENT_RANK() OVER w', 6)} AS price_pct_rank,
       CAST(NTILE(4) OVER w AS INT) AS price_quartile,
       {sk.floor_round_sql('CUME_DIST() OVER w', 6)} AS price_cume_dist
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


def stats_corr_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates with cross-engine determinism: Pearson
    correlation and sample stddev of (quantity, extendedprice) per
    return flag, computed from EXACT decimal power sums (n, Σx, Σy,
    Σxy, Σx², Σy²) so the result is independent of aggregation order;
    the final corr/stddev formulas run once per group in double.
    Native corr()/stddev() accumulate doubles in partition order and
    never hash-match across engines — this is the portable form, and
    it is still one map-side-combinable aggregation pass."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,4)")
    y = F.col("l_extendedprice").cast("decimal(18,4)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    sd = lambda s2, s1: F.sqrt(  # noqa: E731
        (n * F.col(s2) - F.col(s1) * F.col(s1)) / (n * (n - F.lit(1.0)))
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(corr, 6).alias("corr_qty_price"),
        F.round(sd("sxx", "sx"), 6).alias("stddev_qty"),
        F.round(sd("syy", "sy"), 6).alias("stddev_price"),
    )


_STATS_CORR_ORACLE = """
WITH sums AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
         -- (19,4) forces hugeint storage in DuckDB; the int64 path
         -- overflows on the scaled product of two (18,4) values.
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price,
       round(sqrt((n * sxx - sx * sx) / (n * (n - 1.0))), 6) AS stddev_qty,
       round(sqrt((n * syy - sy * sy) / (n * (n - 1.0))), 6) AS stddev_price
FROM sums
"""


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side revenue forecast — every
    predicate (year, discount band, quantity cap) is pushable to the
    parquet scan, then ONE map-side-combinable aggregation with no
    join and no wide shuffle: the cheapest possible plan for a
    100 TB fact table, bounded by scan bandwidth alone."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec(F.col("l_extendedprice")) * _dec(F.col("l_discount")))
        .cast("double")
        .alias("revenue")
    )


_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""

Q7_NATIONS = ("NATION_1", "NATION_2")


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue shipped between two nations, by
    (supplier nation, customer nation, ship year). supplier/customer/
    nation are broadcast dims; the only big shuffle is
    lineitem⋈orders on orderkey. The nation-pair predicate applies
    after the dim joins (both directions of the pair)."""
    n1, n2 = Q7_NATIONS
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    revenue = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )
    pair = (
        (F.col("supp_nation") == n1) & (F.col("cust_nation") == n2)
    ) | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE (sn.n_name = '{Q7_NATIONS[0]}' AND cn.n_name = '{Q7_NATIONS[1]}')
     OR (sn.n_name = '{Q7_NATIONS[1]}' AND cn.n_name = '{Q7_NATIONS[0]}')
)
GROUP BY supp_nation, cust_nation, l_year
"""


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one quarter. Date predicate pushed to the orders scan, return-flag
    predicate pushed to the lineitem scan; customer/nation broadcast;
    the one big shuffle is lineitem⋈orders, then a customer-grain
    aggregate and a global top-k."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = table(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    revenue = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

Q18_MIN_QTY = 200


def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold (the IN-subquery becomes a grouped semi-join), enriched
    with the customer dim. The quantity rollup and the semi-filter
    reuse ONE aggregation of lineitem on orderkey — no second scan;
    customer broadcasts."""
    li = table(spark, sf_dir, "lineitem")
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > Q18_MIN_QTY)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(qty, orders.o_orderkey == qty.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


_Q18_ORACLE = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {Q18_MIN_QTY}
) q
JOIN orders   ON o_orderkey = q.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES = {
    "flagship_sync_digest": flagship_sync_digest,
    "filter_project_events": filter_project_events,
    "case_when_sign_branch": case_when_sign_branch,
    "isin_allowlist_filter": isin_allowlist_filter,
    "tpch_q1_pricing_summary": tpch_q1_pricing_summary,
    "distinct_users_per_type": distinct_users_per_type,
    "rollup_nation_segment": rollup_nation_segment,
    "cube_status_priority": cube_status_priority,
    "grouping_sets_status_priority": grouping_sets_status_priority,
    "join_broadcast_dims": join_broadcast_dims,
    "join_semi_customers_with_orders": join_semi_customers_with_orders,
    "join_anti_customers_without_orders": join_anti_customers_without_orders,
    "join_multiway_revenue": join_multiway_revenue,
    "join_range_value_bands": join_range_value_bands,
    "join_asof_purchase_prior_view": join_asof_purchase_prior_view,
    "join_null_safe_segments": join_null_safe_segments,
    "window_topk_orders_per_customer": window_topk_orders_per_customer,
    "window_running_revenue": window_running_revenue,
    "window_trailing_7d_revenue": window_trailing_7d_revenue,
    "window_lag_event_gap": window_lag_event_gap,
    "sort_limit_top_orders": sort_limit_top_orders,
    "set_ops_segments": set_ops_segments,
    "set_ops_all_multiset": set_ops_all_multiset,
    "scalar_subquery_above_avg": scalar_subquery_above_avg,
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "pivot_events_by_type": pivot_events_by_type,
    "unpivot_customer_metrics": unpivot_customer_metrics,
    "join_salted_status_dim": join_salted_status_dim,
    "json_extract_events_props": json_extract_events_props,
    "surrogate_key_md5": surrogate_key_md5,
    "date_partition_buckets": date_partition_buckets,
    "string_funcs_projection": string_funcs_projection,
    "higher_order_token_filter": higher_order_token_filter,
    "tpch_q5_local_supplier_volume": tpch_q5_local_supplier_volume,
    "tpch_q13_order_distribution": tpch_q13_order_distribution,
    "tpch_q14_promo_revenue": tpch_q14_promo_revenue,
    "window_rank_variants": window_rank_variants,
    "stats_corr_lineitem": stats_corr_lineitem,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
    "tpch_q7_volume_shipping": tpch_q7_volume_shipping,
    "tpch_q10_returned_items": tpch_q10_returned_items,
    "tpch_q18_large_volume_customers": tpch_q18_large_volume_customers,
}

ORACLE = {
    "flagship_sync_digest": FLAGSHIP_ORACLE,
    "filter_project_events": """
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS amount,
               CAST(ts AS DATE) AS day
        FROM events WHERE event_type = 'purchase'
    """,
    "case_when_sign_branch": """
        SELECT event_type,
               CASE WHEN value >= 100 THEN 'hi' ELSE 'lo' END AS bucket,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "isin_allowlist_filter": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal > 0
    """,
    "tpch_q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "distinct_users_per_type": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        FROM events GROUP BY 1
    """,
    "rollup_nation_segment": """
        SELECT n_name, c_mktsegment, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
    "cube_status_priority": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "grouping_sets_status_priority": _GROUPING_SETS_ORACLE,
    "unpivot_customer_metrics": _UNPIVOT_ORACLE,
    "window_trailing_7d_revenue": _TRAILING_7D_ORACLE,
    "join_null_safe_segments": _NULL_SAFE_ORACLE,
    "set_ops_all_multiset": _SET_OPS_ALL_ORACLE,
    "join_broadcast_dims": """
        SELECT r_name, n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2
    """,
    "join_semi_customers_with_orders": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
    "join_anti_customers_without_orders": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "join_multiway_revenue": """
        SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    """,
    "join_range_value_bands": """
        WITH bands(band, lo, hi) AS (
          VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1e18)
        )
        SELECT band, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY 1
    """,
    "join_asof_purchase_prior_view": """
        WITH tagged AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
                 CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END AS view_ts
          FROM events WHERE event_type IN ('view', 'purchase')
        ), filled AS (
          SELECT event_id, user_id, ts, event_type,
                 LAST_VALUE(view_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_view_ts
          FROM tagged
        )
        SELECT event_id, user_id, ts, prior_view_ts
        FROM filled WHERE event_type = 'purchase'
    """,
    "window_topk_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders
        ) WHERE rk <= 3
    """,
    "window_running_revenue": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        FROM orders
    """,
    "window_lag_event_gap": """
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               (epoch_us(CAST(ts AS TIMESTAMP))
                 - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id))) / 1000000 AS gap_seconds
        FROM events
    """,
    "sort_limit_top_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "set_ops_segments": """
        WITH big_spenders AS (
          SELECT o_custkey AS k FROM orders
          GROUP BY 1 HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 500000
        ), building AS (
          SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        SELECT k, 'both' AS tag FROM (SELECT k FROM big_spenders INTERSECT SELECT k FROM building)
        UNION ALL
        SELECT k, 'spender_only' AS tag FROM (SELECT k FROM big_spenders EXCEPT ALL SELECT k FROM building)
        UNION ALL
        SELECT k, 'building_only' AS tag FROM (SELECT k FROM building EXCEPT ALL SELECT k FROM big_spenders)
    """,
    "scalar_subquery_above_avg": """
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
        FROM orders
        WHERE o_totalprice > (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM orders
        )
    """,
    "tpch_q3_shipping_priority": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "join_salted_status_dim": """
        WITH dim(o_orderstatus, status_name) AS (
          VALUES ('O', 'open'), ('F', 'filled'), ('P', 'partial')
        )
        SELECT status_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders JOIN dim USING (o_orderstatus)
        GROUP BY 1
    """,
    "pivot_events_by_type": """
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
        FROM events GROUP BY 1
    """,
    "json_extract_events_props": """
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
               COUNT(*) AS n
        FROM events GROUP BY 1
    """,
    "surrogate_key_md5": """
        SELECT c_custkey, md5(c_name || '/' || c_mktsegment) AS surrogate_id
        FROM customer
    """,
    "date_partition_buckets": """
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY 1, 2
    """,
    "string_funcs_projection": """
        SELECT p_partkey, UPPER(p_brand) AS brand_up,
               substr(p_name, 1, 8) AS name_prefix,
               CAST(length(p_name) AS INT) AS name_len,
               p_type LIKE '%BRASS%' AS is_brass,
               p_brand || ':' || p_type AS brand_type
        FROM part
    """,
    "higher_order_token_filter": """
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS n_tokens,
               CAST(len(list_filter(string_split(text, ' '), t -> t LIKE 's%')) AS INT) AS n_s_tokens,
               array_to_string(list_transform(list_filter(string_split(text, ' '), t -> t LIKE 's%'), t -> UPPER(t)), ' ') AS s_tokens_up
        FROM documents
    """,
    "tpch_q5_local_supplier_volume": _Q5_ORACLE,
    "tpch_q13_order_distribution": _Q13_ORACLE,
    "tpch_q14_promo_revenue": _Q14_ORACLE,
    "window_rank_variants": _RANK_VARIANTS_ORACLE,
    "stats_corr_lineitem": _STATS_CORR_ORACLE,
    "tpch_q6_forecast_revenue": _Q6_ORACLE,
    "tpch_q7_volume_shipping": _Q7_ORACLE,
    "tpch_q10_returned_items": _Q10_ORACLE,
    "tpch_q18_large_volume_customers": _Q18_ORACLE,
}
