"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf dir, then compares row count, column names, and an
order-insensitive value representation. Usage:

    python tools/oracle_check.py [sf_dir] [query_name ...]

Driver emulation (round-4 hardening)
------------------------------------
The driver canonicalizes results by loading both sides into pandas,
sorting columns by name, then row-sorting with ``DataFrame.sort_values``
over all columns before hashing values.  ``sort_values`` factorizes each
column via ``Categorical`` — which raises ``TypeError: unhashable type:
'list'`` on any list-typed column.  Round 3 lost three green rows to
exactly this: the old checker stringified lists BEFORE sorting, masking
the failure class.  This version goes through the same pandas
``sort_values`` path, so a query whose output the driver cannot
canonicalize fails HERE first.  Complex top-level columns (array / map /
struct) are additionally rejected up-front from the Spark schema, with a
pointer to the fix (serialize via array_join / to_json in both engines).
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from chain_sync_spark.registry import all_oracles, all_queries  # noqa: E402
from chain_sync_spark.session import get_spark  # noqa: E402
from chain_sync_spark.tables import TABLE_NAMES  # noqa: E402


def _norm(v):
    """Render one scalar to the cross-engine comparison string.

    Deliberately REJECTS containers: by the time _norm runs, the frame
    has already been through pandas sort_values (which would have raised
    on lists), and any container that slipped through (e.g. a dict from
    a map column — dicts don't break sort_values on single-row frames)
    must still fail loudly rather than compare by repr.
    """
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise TypeError(
            f"container value in query output ({type(v).__name__}); "
            "serialize with array_join/to_json in the query + oracle"
        )
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        # DuckDB surfaces DATE as midnight datetimes in pandas while
        # Spark keeps datetime.date — render midnight as the bare date
        # so the two agree (a true midnight timestamp collapses on both
        # sides identically, so the comparison stays symmetric)
        if ts.tzinfo is None and ts == ts.normalize():
            return ts.date().isoformat()
        return ts.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def _canon(pdf: pd.DataFrame) -> list[str]:
    """Driver-faithful canonicalization: sort columns by name, then
    row-sort via pandas sort_values (raises TypeError on list columns,
    matching the driver), then render each row with _norm."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    out = ["|".join(_norm(v) for v in row) for row in pdf.itertuples(index=False)]
    # row order after sort_values is dtype-sensitive across engines
    # (e.g. int64 vs float64 NULL handling); the final sorted() makes the
    # comparison order-insensitive while keeping the driver's failure mode
    return sorted(out)


_COMPLEX_TYPES = ("array", "map", "struct")


def _complex_cols(sdf) -> list[str]:
    return [
        f.name
        for f in sdf.schema.fields
        if f.dataType.typeName() in _COMPLEX_TYPES
    ]


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
            bad = _complex_cols(sdf)
            if bad:
                raise TypeError(
                    f"complex top-level columns {bad} — the driver canon "
                    "cannot sort these; serialize via array_join/to_json"
                )
            # build the pandas frame from collected tuples (not toPandas):
            # Arrow/df() dtype coercions differ between engines (e.g.
            # DuckDB HUGEINT sums -> float64) while python-object
            # inference is symmetric — and matches the driver's observed
            # failure mode on list values
            srows = [tuple(r) for r in sdf.collect()]
            spdf = pd.DataFrame(srows, columns=sdf.columns)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(spdf)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            dpdf = pd.DataFrame(res.fetchall(), columns=dcols)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        status = []
        if len(spdf) != len(dpdf):
            status.append(f"rowcount spark={len(spdf)} duck={len(dpdf)}")
        if sorted(spdf.columns) != sorted(dpdf.columns):
            status.append(
                f"cols spark={sorted(spdf.columns)} duck={sorted(dpdf.columns)}"
            )
        if not status:
            try:
                sc, dc = _canon(spdf), _canon(dpdf)
            except TypeError as e:
                failures.append(name)
                print(f"FAIL {name}: canon error (driver would red-row): {e}")
                continue
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
            print(f"ok {name}: {len(spdf)} rows")
    print(f"\n{n_run - len(failures)}/{n_run} pass")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
