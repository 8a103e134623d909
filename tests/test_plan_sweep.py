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
