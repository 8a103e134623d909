"""Checkpoint cursor table (reference S3/S4).

The reference persists a single `{block_num}` doc under id
`chain-sync-block-number` (config.js:39, listener.js:16-42) and
advances it only after a fully successful batch. Here: a one-row
parquet table, rewritten atomically per sync round. A dry-run flag
(reference `DISABLE_UPDATE_SETTINGS`, listener.js:35-36) skips the
write.

r13 optimization: the cursor is ONE row, but it was read and written
through full Spark jobs — a per-round driver barrier costing a job
each way (the write alone measured ~0.3 s idle / 8 s under host load
in the r13 action census). Both paths now go through pyarrow on the
driver: the on-disk format is unchanged (a directory holding one
parquet file, exactly what `coalesce(1).write.parquet` produced — a
store written by either revision reads back under the other), the
atomic tmp-dir + rename protocol is unchanged, and zero Spark jobs
run. The `spark` parameter stays in both signatures so every caller
is source-compatible.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def read_cursor(spark: SparkSession, path: str, default: int = 0) -> int:
    if not os.path.exists(path):
        return default
    import pyarrow.parquet as pq

    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        tbl = pq.read_table(os.path.join(path, name), columns=["block_num"])
        if tbl.num_rows:
            return int(tbl.column("block_num")[0].as_py())
    return default


def write_cursor(spark: SparkSession, path: str, block_num: int, dry_run: bool = False) -> None:
    if dry_run:
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    pq.write_table(
        pa.table({"block_num": pa.array([block_num], type=pa.int64())}),
        os.path.join(tmp, "part-00000.parquet"),
    )
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
