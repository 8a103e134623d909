"""Scalar-surface queries closing SURVEY.md §2.6 ⊕ holes: explode,
map functions, and math functions. (String functions, JSON
extraction, higher-order array functions, and date bucketing are
covered in operators/relational.py; calendar arithmetic in
operators/temporal.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chain_sync_spark.tables import table


def explode_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (the #1 nested-data verb): token frequency and document
    frequency across the corpus. explode → two-level aggregate;
    map-side partial aggregation keeps the shuffle to (token,
    partial) pairs."""
    docs = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    return (
        docs.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
    )


_EXPLODE_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS token
  FROM documents
)
SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
FROM toks GROUP BY 1
"""


def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions over the JSON props column decoded to
    map<string,int>: map_keys / element_at / contains, aggregated per
    event type."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    proj = ev.select(
        "event_type",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
    )
    return proj.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("k_val").isNotNull(), 1).otherwise(0)).alias("n_with_k"),
        F.sum("k_val").alias("sum_k"),
        F.max("n_keys").alias("max_keys"),
    )


_MAP_FUNCS_ORACLE = """
WITH proj AS (
  SELECT event_type,
         CAST(len(json_keys(props)) AS INT) AS n_keys,
         CAST(json_extract_string(props, '$.k') AS INT) AS k_val
  FROM events
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN k_val IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
       CAST(SUM(k_val) AS BIGINT) AS sum_k,
       MAX(n_keys) AS max_keys
FROM proj GROUP BY 1
"""


def math_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function surface: round/abs/floor/ceil/pow/sqrt/pmod.
    Money math routes through DECIMAL (exact) before rounding; the
    IEEE functions (pow/sqrt) are bit-identical across engines."""
    li = table(spark, sf_dir, "lineitem")
    disc_amt = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * F.col("l_discount").cast("decimal(18,2)")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(disc_amt, 2).cast("double").alias("discount_amount"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.floor(F.col("l_quantity") / 7).cast("long").alias("qty_bucket"),
        F.ceil(F.col("l_tax") * 100).cast("long").alias("tax_pct_ceil"),
        F.pow(F.col("l_quantity"), 2).alias("qty_sq"),
        F.sqrt(F.col("l_extendedprice")).alias("price_sqrt"),
        F.pmod(F.col("l_orderkey"), 97).alias("key_mod"),
    )


_MATH_FUNCS_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)), 2) AS DOUBLE) AS discount_amount,
       abs(l_quantity - 25) AS qty_dev,
       CAST(floor(l_quantity / 7) AS BIGINT) AS qty_bucket,
       CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct_ceil,
       pow(l_quantity, 2) AS qty_sq,
       sqrt(l_extendedprice) AS price_sqrt,
       CAST(l_orderkey % 97 AS BIGINT) AS key_mod
FROM lineitem
"""


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 approx_count_distinct (HLL++). The sketch estimates differ
    between engines by design, so the cross-engine contract is: each
    engine's estimate must fall within 5% of the exact distinct count
    — a boolean that hash-matches when both sketches are sane.

    The Spark sketch precision is PINNED at rsd=0.01: the default
    rsd=0.05 makes "within 5%" a ONE-SIGMA test that HLL++ is
    expected to fail on a third of groups as cardinality grows —
    first seen at sf0.1, where the 'click' estimate missed 1500
    exact users by >5% while sf0.01 passed on the small-cardinality
    (linear-counting) regime. At rsd=0.01 the 5% band is ~5 sigma,
    so the boolean is stable at any scale; the sketch stays
    fixed-size (~16 KB per group — the whole point of the approx
    variant at 100 TB: no distinct shuffle). DuckDB's HLL is
    fixed-precision (~0.8% error) and sits inside the band by
    construction."""
    ev = table(spark, sf_dir, "events")
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id", 0.01)
    return ev.groupBy("event_type").agg(
        exact.alias("exact_users"),
        (F.abs(approx - exact) <= exact * F.lit(0.05)).alias("approx_within_5pct"),
    )


_APPROX_DISTINCT_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
         <= COUNT(DISTINCT user_id) * 0.05 AS approx_within_5pct
FROM events GROUP BY 1
"""


def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch next to the HLL sketch (approx_distinct_users):
    per-returnflag approximate median price. Spark's approx_percentile
    (Greenwald-Khanna) and DuckDB's approx_quantile (t-digest) are
    different sketches, so the cross-engine contract mirrors the HLL
    one — each engine's estimate must land within 2% of the exact
    interpolated median, which both engines define identically
    (quantile_cont). At 100 TB the sketch is the only affordable
    percentile: fixed-size state per group, map-side combinable, no
    global sort."""
    li = table(spark, sf_dir, "lineitem")
    exact = F.percentile(F.col("l_extendedprice"), F.lit(0.5))
    approx = F.percentile_approx(F.col("l_extendedprice"), F.lit(0.5), F.lit(10000))
    return li.groupBy("l_returnflag").agg(
        F.round(exact, 4).alias("exact_median"),
        (F.abs(approx - exact) <= exact * F.lit(0.02)).alias("approx_within_2pct"),
    )


_APPROX_PCT_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median,
       abs(approx_quantile(l_extendedprice, 0.5) - quantile_cont(l_extendedprice, 0.5))
         <= quantile_cont(l_extendedprice, 0.5) * 0.02 AS approx_within_2pct
FROM lineitem GROUP BY 1
"""


def array_funcs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over document tokens: slice, sort,
    distinct-count, membership position, and sequence generation —
    all builtin column expressions (whole-stage codegen, no UDF).
    Cross-engine notes: distinct goes through a sort (DuckDB's
    list_distinct does not promise first-occurrence order), Spark's
    array_position returns 0 for missing where DuckDB returns NULL
    (COALESCEd in the oracle), and the sequence length is clamped
    to ≥1 because Spark's sequence(1, 0) counts DOWN while DuckDB's
    range(1, 1) is empty. Array results are serialized to delimited
    strings at the output boundary: the correctness driver
    canonicalizes rows through a pandas sort, which cannot order
    list-typed cells — the arrays stay arrays inside the plan and
    collapse to strings only in the final projection."""
    docs = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    seq = F.sequence(
        F.lit(1).cast("long"),
        F.least(F.greatest(F.size(toks), F.lit(1)), F.lit(3)).cast("long"),
    )
    return docs.select(
        "doc_id",
        F.array_join(F.sort_array(F.slice(toks, 1, 5)), " ").alias("sorted_first5"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_position(toks, "the").alias("pos_the"),
        F.array_join(seq.cast("array<string>"), ",").alias("idx_seq"),
    )


_ARRAY_FUNCS_ORACLE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       array_to_string(list_sort(toks[1:5]), ' ') AS sorted_first5,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
       CAST(COALESCE(list_position(toks, 'the'), 0) AS BIGINT) AS pos_the,
       array_to_string(range(1, least(greatest(len(toks), 1), 3) + 1), ',') AS idx_seq
FROM t
"""


def agg_argmax_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/conditional aggregate surface: per event type, the user
    AND event id of the single highest-value event (max_by over a
    composite ordering key — the unique event_id tie-break makes the
    argmax deterministic in both engines), the earliest event's user
    and event id (min_by), a filtered count, and an any-negative
    existence flag. One aggregation pass, map-side combinable — at
    scale this replaces the common anti-pattern of a self-join
    against the per-group max.

    Round-5 output contract (red in r3 AND r4 under the old one):
    every output column is an integer, string, or boolean — no
    engine-computed doubles cross the boundary, and the winning
    event_ids are emitted so the argmax is auditable row-by-row.
    NULL ordering is pinned by an explicit null-flag sort key on BOTH
    engines (non-null value beats NULL for the max; non-null ts beats
    NULL for the min) instead of ±infinity sentinels, and the oracle
    is lowest-common-denominator SQL: derived-table ROW_NUMBER — no
    QUALIFY, and no count_if/bool_or (DuckDB backs count_if with a
    HUGEINT sum, whose pandas rendering is float64 — the round-4
    hash-red mechanism)."""
    ev = table(spark, sf_dir, "events")
    # struct comparison is field-by-field; every field is non-null so
    # the ordering is total and engine-independent
    ranked = F.struct(
        F.col("value").isNotNull().cast("int").alias("nn"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("v"),
        F.col("event_id").alias("e"),
    )
    first = F.struct(
        F.col("ts").isNull().cast("int").alias("nl"),
        F.coalesce(F.col("ts"), F.lit("1970-01-01").cast("timestamp")).alias("t"),
        F.col("event_id").alias("e"),
    )
    return ev.groupBy("event_type").agg(
        F.max_by(F.col("user_id"), ranked).alias("top_value_user"),
        F.max_by(F.col("event_id"), ranked).alias("top_event_id"),
        F.min_by(F.col("user_id"), first).alias("earliest_user"),
        F.min_by(F.col("event_id"), first).alias("earliest_event_id"),
        F.count(F.when(F.col("value") > 100, F.lit(1))).alias("n_big"),
        (F.max(F.when(F.col("value") < 0, 1).otherwise(0)) == 1).alias(
            "has_negative"
        ),
    )


_ARGMAX_ORACLE = """
WITH rmax AS (
  SELECT event_type, user_id, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY (CASE WHEN value IS NULL THEN 0 ELSE 1 END) DESC,
                    COALESCE(value, 0) DESC, event_id DESC) AS rn
  FROM events
),
rmin AS (
  SELECT event_type, user_id, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY (CASE WHEN ts IS NULL THEN 1 ELSE 0 END),
                    COALESCE(ts, TIMESTAMP '1970-01-01'), event_id) AS rn
  FROM events
),
conds AS (
  SELECT event_type,
         CAST(COUNT(CASE WHEN value > 100 THEN 1 END) AS BIGINT) AS n_big,
         MAX(CASE WHEN value < 0 THEN 1 ELSE 0 END) = 1 AS has_negative
  FROM events GROUP BY 1
)
SELECT c.event_type,
       t.user_id AS top_value_user, t.event_id AS top_event_id,
       f.user_id AS earliest_user, f.event_id AS earliest_event_id,
       c.n_big, c.has_negative
FROM conds c
JOIN rmax t ON c.event_type = t.event_type AND t.rn = 1
JOIN rmin f ON c.event_type = f.event_type AND f.rn = 1
"""


def regex_funcs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface: group extraction, global replacement,
    and match counting — patterns kept to the character-class subset
    where Java regex (Spark) and RE2 (DuckDB) agree byte-for-byte.
    All three run JVM-side in one projection; no UDF."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract(F.col("text"), r"([a-z]+)ing", 1).alias("first_ing_stem"),
        F.regexp_replace(F.col("text"), r"[aeiou]", "_").alias("devoweled_prefix"),
        F.regexp_count(F.col("text"), F.lit(r"[st][a-z]+")).alias("n_st_words"),
    ).withColumn("devoweled_prefix", F.substring("devoweled_prefix", 1, 40))


_REGEX_FUNCS_ORACLE = """
SELECT doc_id,
       regexp_extract(text, '([a-z]+)ing', 1) AS first_ing_stem,
       substr(regexp_replace(text, '[aeiou]', '_', 'g'), 1, 40) AS devoweled_prefix,
       CAST(len(regexp_extract_all(text, '[st][a-z]+')) AS INT) AS n_st_words
FROM documents
"""


def explode_outer_rare_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer — the null-preserving explode: docs whose
    'z…'-token list is EMPTY still emit one row with a NULL token
    (plain explode would drop them, silently losing documents from
    the output). The oracle emulates the outer semantics by
    substituting [NULL] for empty lists before unnest."""
    docs = table(spark, sf_dir, "documents")
    ztoks = F.filter(
        F.split(F.col("text"), " "), lambda t: t.startswith("z") & (t != "")
    )
    return docs.select(
        "doc_id", F.explode_outer(ztoks).alias("z_token")
    )


_EXPLODE_OUTER_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '),
                     x -> x LIKE 'z%' AND x <> '') AS zt
  FROM documents
),
padded AS (
  SELECT doc_id,
         CASE WHEN len(zt) = 0 THEN [NULL] ELSE zt END AS zt
  FROM t
)
SELECT doc_id, u.z_token
FROM padded, LATERAL (SELECT unnest(zt) AS z_token) u
"""


def histogram_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram: 10 buckets between the global min and
    max price. The 1-row (min, max) aggregate broadcasts against the
    scan (same shape as scalar_subquery_above_avg), bucketing is one
    arithmetic expression, and the final count groups on ≤10 keys —
    two tiny shuffles regardless of fact size."""
    orders = table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 10)),
        F.lit(9),
    ).cast("int")
    return (
        orders.join(F.broadcast(bounds))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_HISTOGRAM_ORACLE = """
WITH bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
)
SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 10)), 9) AS INT) AS bucket,
       COUNT(*) AS n_orders
FROM orders, bounds
GROUP BY 1
"""


def try_funcs_safe_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: Spark 4 runs ANSI mode, where div-by-zero
    on exact types throws — try_divide is the NULL-on-error form users
    reach for first. l_tax is legitimately 0 on many rows, so the
    discount/tax ratio exercises the real case; the oracle spells the
    same semantics as an explicit NULLIF guard."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_discount"), F.col("l_tax")), 6
        ).alias("disc_per_tax"),
        # integral div-by-zero: plain `/` would throw under ANSI
        F.try_divide(F.lit(1).cast("long"), F.lit(0).cast("long")).alias("always_null"),
    )


_TRY_FUNCS_ORACLE = """
SELECT l_orderkey, l_linenumber,
       round(l_discount / NULLIF(l_tax, 0), 6) AS disc_per_tax,
       CAST(NULL AS BIGINT) AS always_null
FROM lineitem
"""


def collect_sorted_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-to-array: each user's distinct event types as ONE
    array column — the nesting inverse of explode, and the shape the
    sync engine's vote-set accumulation (S11) uses. collect_set's
    order is partitioning-dependent, so the contract sorts the array
    (deterministic across engines and shuffles); map-side partial
    sets keep the shuffle payload to distinct values only. The final
    projection serializes the array to a comma-joined string so the
    driver's pandas-based canonicalizer can sort the rows."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias(
            "event_types"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )


_COLLECT_SORTED_ORACLE = """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
       COUNT(*) AS n_events
FROM events GROUP BY 1
"""


QUERIES = {
    "explode_token_frequency": explode_token_frequency,
    "map_funcs_events": map_funcs_events,
    "math_funcs_lineitem": math_funcs_lineitem,
    "approx_distinct_users": approx_distinct_users,
    "approx_percentile_prices": approx_percentile_prices,
    "array_funcs_documents": array_funcs_documents,
    "agg_argmax_conditional": agg_argmax_conditional,
    "regex_funcs_documents": regex_funcs_documents,
    "explode_outer_rare_tokens": explode_outer_rare_tokens,
    "histogram_order_prices": histogram_order_prices,
    "try_funcs_safe_division": try_funcs_safe_division,
    "collect_sorted_event_types": collect_sorted_event_types,
}

ORACLE = {
    "explode_token_frequency": _EXPLODE_ORACLE,
    "map_funcs_events": _MAP_FUNCS_ORACLE,
    "math_funcs_lineitem": _MATH_FUNCS_ORACLE,
    "approx_distinct_users": _APPROX_DISTINCT_ORACLE,
    "approx_percentile_prices": _APPROX_PCT_ORACLE,
    "array_funcs_documents": _ARRAY_FUNCS_ORACLE,
    "agg_argmax_conditional": _ARGMAX_ORACLE,
    "regex_funcs_documents": _REGEX_FUNCS_ORACLE,
    "explode_outer_rare_tokens": _EXPLODE_OUTER_ORACLE,
    "histogram_order_prices": _HISTOGRAM_ORACLE,
    "try_funcs_safe_division": _TRY_FUNCS_ORACLE,
    "collect_sorted_event_types": _COLLECT_SORTED_ORACLE,
}
