"""File-format breadth: query results round-trip through CSV and
JSON sinks/sources with explicit schemas (the reference's outbound
format is JSON documents; CSV is the interchange lowest common
denominator). Parquet is exercised everywhere else."""

from pyspark.sql import functions as F

from chain_sync_spark.operators.relational import tpch_q1_pricing_summary

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(map(str, df.select(sorted(df.columns)).collect()))


def test_csv_roundtrip_preserves_values(spark, tmp_path):
    res = tpch_q1_pricing_summary(spark, SF_DIR)
    out = str(tmp_path / "q1_csv")
    res.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(res.schema).option("header", True).csv(out)
    assert _canon(back) == _canon(res)


def test_json_roundtrip_preserves_values(spark, tmp_path):
    res = tpch_q1_pricing_summary(spark, SF_DIR)
    out = str(tmp_path / "q1_json")
    res.write.mode("overwrite").json(out)
    back = spark.read.schema(res.schema).json(out)
    assert _canon(back) == _canon(res)


def test_orc_roundtrip_preserves_values(spark, tmp_path):
    res = tpch_q1_pricing_summary(spark, SF_DIR)
    out = str(tmp_path / "q1_orc")
    res.write.mode("overwrite").orc(out)
    back = spark.read.schema(res.schema).orc(out)
    assert _canon(back) == _canon(res)


def test_orc_filter_pushdown_reaches_scan(spark, tmp_path):
    """ORC scans support predicate pushdown like parquet — the plan
    must carry the pushed filter, not re-filter the full scan."""
    out = str(tmp_path / "orders_orc")
    from chain_sync_spark.tables import table

    table(spark, SF_DIR, "orders").write.mode("overwrite").orc(out)
    df = spark.read.orc(out).filter(F.col("o_custkey") == 7).select("o_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_custkey" in plan


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution: a writer adds a column; mergeSchema reads
    the union schema and back-fills NULL for old files — the
    contract that lets the sync store add fields (e.g. the reference
    adding `jobs` to posts) without rewriting history."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
        "append"
    ).parquet(out)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_json_lines_source_matches_parquet(spark, tmp_path):
    """The op-stream JSON-lines shape: a parquet table exported to
    JSON lines reads back identically with an explicit schema —
    no inference drift on longs/doubles/timestamps."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "docs_json")
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema(docs.schema).json(out)
    assert back.count() == docs.count()
    a = sorted(map(str, docs.select("doc_id", "lang", F.md5("text")).collect()))
    b = sorted(map(str, back.select("doc_id", "lang", F.md5("text")).collect()))
    assert a == b


def test_table_restores_utc_timezone_for_vanilla_sessions(spark):
    """The external driver builds a vanilla session; on a non-UTC host
    its session timezone would shift every collected TIMESTAMP against
    the DuckDB oracles' naive values. table() must repair the timezone
    at read time, the same runtime-fallback contract as the parquet
    reader flags."""
    from chain_sync_spark.tables import table

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        table(spark, "/root/testdata/sf0.001", "orders").limit(1).collect()
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
