"""Column-function library (SURVEY.md §2.6).

All functions return pyspark Column expressions built from builtins
(JVM-side, codegen-friendly); nothing here is a Python UDF except the
clearly-marked markdown renderer fallback in text_funcs.
"""

from chain_sync_spark.functions.json_utils import (
    double_decode_json,
    profile_from_metadata,
)
from chain_sync_spark.functions.hashing import surrogate_id, surrogate_id_md5
from chain_sync_spark.functions.text_funcs import (
    extract_hashtags,
    extract_image_srcs,
    markdown_to_text,
    space_newlines,
)

__all__ = [
    "double_decode_json",
    "profile_from_metadata",
    "surrogate_id",
    "surrogate_id_md5",
    "extract_hashtags",
    "extract_image_srcs",
    "markdown_to_text",
    "space_newlines",
]
