"""Sync-engine throughput bench: drive the full batch-sync loop over
a synthesized op stream and report blocks/s and ops/s against the
reference's operational envelope (BASELINE.md: 1 block / 3 s
sustained, ~10 blocks/s catch-up burst).

Usage: python tools/sync_bench.py [n_blocks] [ops_per_block] [batch_size]
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

from chain_sync_spark.session import get_spark  # noqa: E402
from chain_sync_spark.sources.blocks import synthesize_ops  # noqa: E402
from chain_sync_spark.sync.engine import SyncEngine  # noqa: E402


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 900
    ops_per_block = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    batch_size = int(sys.argv[3]) if len(sys.argv) > 3 else 300

    spark = get_spark("sync-bench")
    spark.sparkContext.setLogLevel("ERROR")
    store = tempfile.mkdtemp(prefix="sync_bench_")
    try:
        ops = synthesize_ops(spark, n_blocks, ops_per_block).cache()
        n_ops = ops.count()  # materialize the synthetic stream up front

        eng = SyncEngine(spark, store)
        t0 = time.perf_counter()
        cursor = eng.run(ops, batch_size=batch_size)
        elapsed = time.perf_counter() - t0

        posts = spark.read.parquet(f"{store}/posts").count()
        accounts = spark.read.parquet(f"{store}/accounts").count()
        print(
            json.dumps(
                {
                    "metric": "sync_engine_throughput",
                    "n_blocks": n_blocks,
                    "n_ops": n_ops,
                    "batch_size": batch_size,
                    "rounds": (n_blocks + batch_size - 1) // batch_size,
                    "elapsed_sec": round(elapsed, 2),
                    "blocks_per_sec": round(n_blocks / elapsed, 2),
                    "ops_per_sec": round(n_ops / elapsed, 1),
                    "cursor": cursor,
                    "posts": posts,
                    "accounts": accounts,
                    "reference_envelope": "1 block/3s sustained; ~10 blocks/s burst",
                }
            )
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
