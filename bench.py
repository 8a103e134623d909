"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count-style action that forces full
evaluation of the plan (collect for small results) after a warm-up of
the session (JVM + parquet footer caches). Wall-clock per query is
measured on the second run.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from chain_sync_spark.registry import all_queries  # noqa: E402
from chain_sync_spark.session import get_spark  # noqa: E402

# The set BENCH_r01 recorded: `value` stays the total over exactly
# these queries so the 2x-of-baseline comparison is apples-to-apples
# across rounds (BASELINE.md).
BASELINE_SET = [
    "flagship_sync_digest",
    "tpch_q1_pricing_summary",
    "join_multiway_revenue",
    "join_broadcast_dims",
    "join_asof_purchase_prior_view",
    "window_topk_orders_per_customer",
    "window_running_revenue",
    "set_ops_segments",
    "json_extract_events_props",
    "date_partition_buckets",
]

# Operators added after the baseline was recorded — timed and
# reported alongside, summed separately.
EXTENDED_SET = [
    "window_session_events",
    "dedup_exact_documents",
    "neardup_minhash_bands",
    "embedding_cosine_topk",
    "embedding_ann_lsh_pairs",
    "embedding_ivf_topk",
    "training_prep_pipeline",
]

HEADLINE = BASELINE_SET + EXTENDED_SET


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    # Warm-up: JIT, codegen, parquet footers — every query once, so
    # no query pays first-touch costs inside its measured window.
    for n in names:
        queries[n](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for n in names:
        df = queries[n](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[n] = round(time.perf_counter() - t0, 3)

    total = round(sum(t for n, t in timings.items() if n in BASELINE_SET), 3)
    extended = round(sum(t for n, t in timings.items() if n in EXTENDED_SET), 3)
    print(json.dumps({
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "baseline_set_total": total,
        "extended_set_total": extended,
        "note": "value covers the BENCH_r01 baseline query set; extended_set_total times operators added later (see BENCH.md)",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
