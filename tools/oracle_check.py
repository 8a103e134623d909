"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf dir, then compares row count, column names, and an
order-insensitive value representation. Usage:

    python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from chain_sync_spark.registry import all_oracles, all_queries  # noqa: E402
from chain_sync_spark.session import get_spark  # noqa: E402
from chain_sync_spark.tables import TABLE_NAMES  # noqa: E402


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = all_queries(), all_oracles()
    failures = []
    n_run = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_run += 1
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(srows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        status = []
        if len(srows) != len(drows):
            status.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            status.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not status:
            sc, dc = _canon(srows, scols), _canon(drows, dcols)
            if sc != dc:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(sc, dc)) if a != b), None
                )
                msg = f"values differ; first diff row {diff}:"
                if diff is not None:
                    msg += f"\n  spark: {sc[diff]}\n  duck : {dc[diff]}"
                status.append(msg)
        if status:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(status))
        else:
            print(f"ok {name}: {len(srows)} rows")
    print(f"\n{n_run - len(failures)}/{n_run} pass")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
