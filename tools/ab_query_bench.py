"""Interleaved A/B timing harness for single queries (r13-opt).

One PROCESS per invocation (fresh JVM, fresh session) so arms never
share JIT/codegen/cache state.  Times construct + cold + warm for the
named queries with the noop sink, brackets the run with the bench's
own CPU probes so every reading carries its throttle context, and
prints one JSON line.  The caller alternates arms (base/changed
processes) and compares per-rep series at matched probes — the only
comparison that means anything on a host that throttles in waves
(BENCH.md round-13 context note).

Usage: python tools/ab_query_bench.py <query> [<query> ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _cpu_probe, _cpu_probe_multicore  # noqa: E402
from chain_sync_spark.registry import all_queries, pending_queries  # noqa: E402
from chain_sync_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sc_open, mc_open = _cpu_probe(), _cpu_probe_multicore()
    spark = get_spark("ab-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = dict(all_queries())
    for name, fn in pending_queries()[0].items():
        if name in queries:
            raise SystemExit(
                f"staged query {name!r} shadows a registered query — "
                "the A/B would silently time the pending variant"
            )
        queries[name] = fn
    out: dict[str, dict[str, float]] = {}
    for n in names:
        t0 = time.perf_counter()
        df = queries[n](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        df2 = queries[n](spark, sf_dir)
        t3 = time.perf_counter()
        df2.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        out[n] = {
            "construct_cold": round(t1 - t0, 3),
            "cold": round(t2 - t1, 3),
            "construct_warm": round(t3 - t2, 3),
            "warm": round(t4 - t3, 3),
        }
    sc_close, mc_close = _cpu_probe(), _cpu_probe_multicore()
    print(
        json.dumps(
            {
                "arm": os.environ.get("AB_ARM", "?"),
                "probes": [sc_open, mc_open, sc_close, mc_close],
                "q": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
