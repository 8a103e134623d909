"""Spark-job census for one sync-engine round (r13/r14 action-census
evidence): runs the bench's exact sync_round shape (synthesized ops,
one batch, fresh store) N times in one session and reports the job
count per round via the public StatusTracker API, plus wall clock.

Usage: python tools/sync_census.py [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import SYNC_BLOCKS, SYNC_OPS_PER_BLOCK, _cpu_probe  # noqa: E402
from chain_sync_spark.session import get_spark  # noqa: E402
from chain_sync_spark.sources.blocks import synthesize_ops  # noqa: E402
from chain_sync_spark.sync.engine import SyncEngine  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    probe_open = _cpu_probe()
    spark = get_spark("sync-census")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    ops = synthesize_ops(spark, SYNC_BLOCKS, SYNC_OPS_PER_BLOCK).cache()
    ops.count()
    rounds = []
    for _ in range(reps):
        store = tempfile.mkdtemp(prefix="census_sync_")
        try:
            jobs0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            SyncEngine(spark, store).run(ops, batch_size=SYNC_BLOCKS)
            dt = time.perf_counter() - t0
            jobs1 = len(tracker.getJobIdsForGroup(None))
            rounds.append({"jobs": jobs1 - jobs0, "sec": round(dt, 2)})
        finally:
            shutil.rmtree(store, ignore_errors=True)
    probe_close = _cpu_probe()
    print(
        json.dumps(
            {"rounds": rounds, "probes": [probe_open, probe_close]}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
