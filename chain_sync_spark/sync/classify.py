"""Op classification (reference P1, listener.js:148-155).

`filterOperation` partitions the op stream into 4 typed collections.
Spark form: one filtered projection per op type with an explicit
StructType decode of the JSON payload; Catalyst shares the scan.
The block timestamp is stamped into each payload (P2,
listener.js:164) as a plain column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMMENT_SCHEMA = (
    "author string, permlink string, parent_author string, parent_permlink string,"
    " title string, body string, json_metadata string"
)
VOTE_SCHEMA = "voter string, author string, permlink string, weight int"
ACCOUNT_UPDATE_SCHEMA = "account string, json_metadata string"

_SCHEMAS = {
    "comment": COMMENT_SCHEMA,
    "vote": VOTE_SCHEMA,
    "account_update": ACCOUNT_UPDATE_SCHEMA,
    "custom_json": "cid string",  # unused — empty handler in reference
}


def classify(ops: DataFrame) -> dict[str, DataFrame]:
    """Split the op stream into typed sub-frames keyed by op type."""
    out: dict[str, DataFrame] = {}
    for op_type, schema in _SCHEMAS.items():
        out[op_type] = (
            ops.filter(F.col("op_type") == op_type)
            .select(
                "block_num",
                F.col("ts").alias("timestamp"),
                F.from_json("op", schema).alias("p"),
            )
            .select("block_num", "timestamp", "p.*")
        )
    return out
