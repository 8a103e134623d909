"""Whole-registry plan sweep: no query may plan a CartesianProduct.

Broadcast nested-loop joins against bounded sides (query sets,
centroids, 1-row aggregates) are legitimate; an unbounded-by-unbounded
cartesian is the one join shape that can never survive a 100× scale-up,
so every registered query is screened for it. Plans are inspected
without executing (executedPlan is the pre-execution AQE plan)."""

from chain_sync_spark.plans.audit import executed_plan
from chain_sync_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"

# Driver-loop operators execute jobs at construction time; they are
# covered by their own tests and skipped here to keep the sweep fast.
SKIP = {"neardup_clusters"}


def test_no_query_plans_a_cartesian_product(spark):
    offenders = []
    for name, fn in all_queries().items():
        if name in SKIP:
            continue
        plan = executed_plan(fn(spark, SF_DIR))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian product planned by: {offenders}"


# The round-5 entrants (vocab_coverage_oov, heavy_hitters_cms) joined
# the registry in round 5, so the main sweep above now covers them.


def test_no_staged_query_plans_a_cartesian_product(spark):
    """Round-6 staged queries get the same screen before they ever
    reach the registry (k-means' broadcast-nested-loop against the
    K-row centroid frame is the legitimate bounded shape)."""
    from chain_sync_spark.registry import pending_queries

    offenders = []
    for name, fn in pending_queries()[0].items():
        plan = executed_plan(fn(spark, SF_DIR))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian product planned by: {offenders}"


# Windows whose single-partition sort input is CONSTANT-bounded by
# construction, not corpus-bounded (the r10 verdict's audited list):
# bpe_pair_merges sorts adjacent-symbol PAIR counts (<= 36^2 rows for
# the [a-z0-9] alphabet), profile_drift_events sorts per-DAY profile
# rows (calendar-bounded), quantile_sketch_orders scans the
# <= 2*HIST_RANGE+3-bin sketch cumulatively.  Everything else must
# window WITH a partition key (or the _gtk_pid salt) — round 11
# cleared the last three vocabulary-sized offenders
# (bm25/vocab/heavy_hitters) via skew.global_topk_desc.
PARTITIONLESS_OK = {
    "bpe_pair_merges",
    "profile_drift_events",
    "quantile_sketch_orders",
}


def test_no_unbounded_partitionless_window(spark):
    """Whole-registry screen (registered + staged): a ROW_NUMBER /
    rank / running-sum window with NO partition columns pins its
    whole input in one task, which only survives scale-up when the
    input is constant-bounded — every such window must be on the
    audited allowlist above.  Detection: the first
    windowspecdefinition argument is an ORDER entry (ASC/DESC) iff
    the partition-column list is empty."""
    import re

    from chain_sync_spark.registry import pending_queries

    qs = dict(all_queries())
    qs.update(pending_queries()[0])
    offenders = {}
    for name, fn in qs.items():
        if name in SKIP:
            continue
        plan = fn(spark, SF_DIR)._jdf.queryExecution().optimizedPlan().toString()
        hits = sorted(
            {
                m.group(1).strip()
                for m in re.finditer(r"windowspecdefinition\(([^,)]*)", plan)
                if " ASC" in m.group(1) or " DESC" in m.group(1)
            }
        )
        if hits and name not in PARTITIONLESS_OK:
            offenders[name] = hits
    assert not offenders, (
        f"unbounded partition-less window planned by: {offenders}"
    )
