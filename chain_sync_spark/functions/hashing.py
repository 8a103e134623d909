"""Surrogate-key hashing (reference F1).

The reference keys documents on
base64(xxhash64(author + "/" + permlink, seed 0xCAFEBABE))
(handlers/comments.js:14-17, handlers/votes.js:6-9). The seed is an
internal detail with no semantic weight — any stable key works.
We provide:

  surrogate_id      — Spark builtin xxhash64 (seed 42, LongType):
                      the fast path used by the sync engine.
  surrogate_id_md5  — md5 hex string: bit-identical across Spark and
                      DuckDB, used wherever an oracle compares keys.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def surrogate_id(*parts: Column | str) -> Column:
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.xxhash64(F.concat_ws("/", *cols))


def surrogate_id_md5(*parts: Column | str) -> Column:
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.md5(F.concat_ws("/", *cols))
