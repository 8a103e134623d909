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


def test_retention_cohort_matrix(spark, tmp_path):
    """Literal two-cohort fixture: week-0 retention is 1.0 for every
    cohort by construction; later cells count exactly the returning
    users; a user's cohort is their FIRST active week even when they
    skip weeks afterwards."""
    from chain_sync_spark.operators.temporal import retention_cohort_weeks

    rows = [
        # cohort 2024-03-04 (Mon): users 1,2 active wk0; user 1 returns wk1;
        # user 2 skips wk1, returns wk2
        (1, "2024-03-05 10:00:00", 1, "a", 0.0, "{}"),
        (2, "2024-03-06 10:00:00", 2, "a", 0.0, "{}"),
        (3, "2024-03-12 10:00:00", 1, "a", 0.0, "{}"),
        (4, "2024-03-20 10:00:00", 2, "a", 0.0, "{}"),
        # cohort 2024-03-11: user 3 only ever active once
        (5, "2024-03-13 10:00:00", 3, "a", 0.0, "{}"),
        # duplicate events in one week must not double-count a user
        (6, "2024-03-05 23:00:00", 1, "b", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/events.parquet")

    out = {(str(r.cohort_week), r.week_offset): r
           for r in retention_cohort_weeks(spark, str(tmp_path)).collect()}
    c1, c2 = "2024-03-04", "2024-03-11"
    assert out[(c1, 0)].cohort_size == 2 and out[(c1, 0)].active_users == 2
    assert out[(c1, 0)].retention == 1.0
    assert out[(c1, 1)].active_users == 1          # only user 1
    assert out[(c1, 1)].retention == 0.5
    assert out[(c1, 2)].active_users == 1          # user 2 after the gap
    assert out[(c2, 0)].cohort_size == 1 and out[(c2, 0)].retention == 1.0
    assert set(out) == {(c1, 0), (c1, 1), (c1, 2), (c2, 0)}
    # offset-0 retention is 1.0 for every cohort — the invariant
    assert all(r.retention == 1.0 for k, r in out.items() if k[1] == 0)
