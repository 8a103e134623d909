"""Checkpoint cursor table (reference S3/S4).

The reference persists a single `{block_num}` doc under id
`chain-sync-block-number` (config.js:39, listener.js:16-42) and
advances it only after a fully successful batch. Here: a one-row
parquet table, rewritten atomically per sync round. A dry-run flag
(reference `DISABLE_UPDATE_SETTINGS`, listener.js:35-36) skips the
write.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def read_cursor(spark: SparkSession, path: str, default: int = 0) -> int:
    if not os.path.exists(path):
        return default
    row = spark.read.parquet(path).first()
    return default if row is None else int(row["block_num"])


def write_cursor(spark: SparkSession, path: str, block_num: int, dry_run: bool = False) -> None:
    if dry_run:
        return
    tmp = path + ".tmp"
    spark.createDataFrame([(block_num,)], "block_num long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
