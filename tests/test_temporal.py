"""Fixture tests for temporal operators whose semantics have edges the
oracle corpus doesn't exercise: the drift profile's first-day NULL lag
row and DECIMAL-exact value totals."""

from pyspark.sql import functions as F

from chain_sync_spark.operators.temporal import profile_drift_events


def test_drift_first_day_null_lag_and_exact_totals(spark, tmp_path):
    rows = [
        (1, "2024-03-01 10:00:00", 1, "a", 0.1, "{}"),
        (2, "2024-03-01 11:00:00", 2, "b", 0.2, "{}"),
        (3, "2024-03-02 10:00:00", 1, "a", 0.3, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/events.parquet")
    out = {str(r.day): r for r in profile_drift_events(spark, str(tmp_path)).collect()}
    d1, d2 = out["2024-03-01"], out["2024-03-02"]
    # first day has no predecessor: deltas are NULL, not 0
    assert d1.d_events is None and d1.ratio_events is None
    assert (d1.n_events, d1.n_users, d1.n_types) == (2, 2, 2)
    # DECIMAL-exact sum: 0.1 + 0.2 == 0.3 exactly (no float drift)
    assert d1.sum_value == 0.3
    assert (d2.n_events, d2.d_events, d2.ratio_events) == (1, -1, 0.5)
