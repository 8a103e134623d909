"""Whole-registry plan sweeps (fast tier).

Three screens over every registered + staged query's PLAN — inspected
without executing (the pre-execution AQE plan), so the whole sweep is
one DataFrame-construction pass shared by a module fixture:

* no CartesianProduct: an unbounded-by-unbounded cartesian is the one
  join shape that can never survive a 100x scale-up.
* no unbounded partition-less window: a rank/running-sum window with
  no partition key pins its whole input in one task.
* no NEW duplicated expensive subtree (r14, VERDICT r13 item 8): the
  round-13 optimization class — the same long generation/fold/regex
  expression planned at more than one node — must not regrow
  silently.  Known, dispositioned recompute trades are allow-listed
  below with their reasons; a new query (or a new duplicate in an
  existing one) fails until it is either fixed or dispositioned here.
"""

import pytest

from chain_sync_spark.plans.audit import (
    duplicate_expensive_details,
    executed_plan,
    formatted_plan,
)
from chain_sync_spark.registry import all_queries, pending_queries

SF_DIR = "/root/testdata/sf0.001"

# Driver-loop operators execute jobs at construction time; they are
# covered by their own tests and skipped here to keep the sweep fast.
# (Their FINAL plans are checkpoint-backed LogicalRDD scans anyway —
# the loop-internal plans never appear in the handed-out relation.)
SKIP = {"neardup_clusters"}


@pytest.fixture(scope="module")
def all_plans(spark):
    """name -> (executed, formatted, optimized) plan strings for every
    registered + staged query, constructed ONCE for all three sweeps
    (the two r13-era sweeps each paid their own full construction
    pass — ~200 s of the old suite's budget)."""
    qs = dict(all_queries())
    qs.update(pending_queries()[0])
    out = {}
    for name, fn in qs.items():
        if name in SKIP:
            continue
        df = fn(spark, SF_DIR)
        out[name] = (
            executed_plan(df),
            formatted_plan(df),
            df._jdf.queryExecution().optimizedPlan().toString(),
        )
    return out


def test_no_query_plans_a_cartesian_product(all_plans):
    offenders = [n for n, (ex, _, _) in all_plans.items() if "CartesianProduct" in ex]
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


def test_no_unbounded_partitionless_window(all_plans):
    """A ROW_NUMBER / rank / running-sum window with NO partition
    columns pins its whole input in one task, which only survives
    scale-up when the input is constant-bounded — every such window
    must be on the audited allowlist above.  Detection: the first
    windowspecdefinition argument is an ORDER entry (ASC/DESC) iff
    the partition-column list is empty.  (Runs on the optimized
    logical plan like the r10-r13 sweeps did, from the shared
    fixture's one construction pass.)"""
    import re

    offenders = {}
    for name, (_, _, plan) in all_plans.items():
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


# Dispositioned duplicated-expensive-subtree survivors (the r13
# continuation sweep's findings, re-swept r14) as name -> max allowed
# duplicate GROUPS.  A query absent from this map must plan ZERO
# >1-node expensive duplicates; raising a cap (or adding a name)
# requires recording the disposition here, which is exactly the
# review the r13 VERDICT (item 8) asked this test to force.
# Dispositions, by family (details in OPTIMIZATION_r13.md):
#  * banded-MinHash (bands/containment/estimate_audit/semantic):
#    band-key posexplode over the CACHED sig — N_BANDS md5s/doc per
#    side, deliberately recomputed (pinning band rows caches rows for
#    pennies of compute).
#  * LSH trio (ann_lsh_pairs/multiprobe/semantic): bucket + norm per
#    self-join side — pin A/B'd warm-mixed r13, left (revisit on a
#    real cluster where the duplicated parquet SCAN costs I/O).
#  * PQ/IVF/kmeans (adc_topk/pq_assign/pq_probe/ivf_topk/kmeans_*):
#    the CONSTANT-FOLDED codebook literal inlined per consumer site /
#    the K-bounded argmin chain — bounded rows, not corpus work.
#  * token/gram-grain recomputes (span family, segment_dedup_ratio,
#    tfidf/vocab/kmv/cms/backoff/ngram_lm/ccnet/classifier_margin,
#    winnow_probe, source_overlap [3 ReusedExchange fire at runtime],
#    heavy_hitters): the corpus-sized-pin trades, each with a
#    measured flat-to-worse persist A/B on record; the r14
#    shared-exchange restructure was rejected on plan evidence
#    (plans/r14/experiments/).
DUP_ALLOWED: dict[str, int] = {
    "ccnet_quality_buckets": 4,
    "dedup_embedding_semantic": 1,
    "dedup_incremental_spans": 2,
    "dedup_span_cut": 1,
    "embedding_ann_lsh_pairs": 1,
    "embedding_ann_multiprobe": 1,
    "embedding_ivf_topk": 1,
    "embedding_pq_adc_topk": 1,
    "embedding_pq_assign": 1,
    "heavy_hitters_cms": 2,
    "kmeans_balanced_sample": 1,
    "kmeans_embedding_clusters": 1,
    "kmv_distinct_shingles": 2,
    "lm_stupid_backoff_newdocs": 2,
    "minhash_estimate_error_audit": 1,
    "neardup_containment_pairs": 1,
    "neardup_minhash_bands": 1,
    "ngram_lm_topk": 2,
    "pq_probe_newvecs": 1,
    "quality_classifier_margin": 1,
    "segment_dedup_ratio": 1,
    "source_overlap_matrix": 1,
    "tfidf_top_terms": 2,
    "vocab_coverage_oov": 1,
    "winnow_probe_newdocs": 1,
}


def test_no_new_duplicated_expensive_subtree(all_plans):
    """r14 (VERDICT r13 item 8): the duplicate-subtree detector in CI
    form.  Counts expr-id-normalized expensive detail strings (>160
    chars of aggregate/transform/explode/regexp work) appearing at
    more than one node of each query's formatted plan; every surviving
    duplicate group must fit the allow-listed cap for that query."""
    over = {}
    for name, (_, fmt, _) in all_plans.items():
        dups = duplicate_expensive_details(fmt)
        if len(dups) > DUP_ALLOWED.get(name, 0):
            over[name] = {d[:100]: c for d, c in dups.items()}
    assert not over, (
        "NEW duplicated expensive subtree(s) — optimize (share the "
        "relation) or record the recompute disposition in DUP_ALLOWED: "
        f"{sorted(over)}\nfirst offender detail heads: "
        f"{dict(list(over.items())[:2])}"
    )
