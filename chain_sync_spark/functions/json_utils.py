"""Resilient JSON decoding (reference F2/F9).

The reference double-parses json_metadata — `JSON.parse` and, if the
result is still a string, parse again; on any failure it falls back
to defaults (handlers/comments.js:21-40). Expressed here as pure
column expressions: one `from_json` probe to detect the
string-in-string case, then a second decode of the inner payload.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _inner_json(raw: Column) -> Column:
    """If `raw` is a JSON-encoded string (i.e. its first non-space
    char is a double quote), return the decoded inner string, else
    `raw` itself. Mirrors the reference's `typeof parsed ===
    'string'` re-parse branch."""
    trimmed = F.ltrim(raw)
    is_wrapped = trimmed.startswith('"')
    # from_json requires a struct schema; wrap the scalar in a
    # one-field object so the JSON string-escape decoding applies.
    inner = F.from_json(F.concat(F.lit('{"v":'), trimmed, F.lit("}")), "v string").getField("v")
    return F.when(is_wrapped & inner.isNotNull(), inner).otherwise(raw)


def double_decode_json(raw: Column, schema: StructType | str) -> Column:
    """Decode `raw` against `schema`, tolerating one extra level of
    JSON string encoding. Invalid JSON yields NULL struct (callers
    coalesce defaults, matching the reference's `{tags:[], image:[]}`
    fallback)."""
    return F.from_json(_inner_json(raw), schema)


def profile_from_metadata(raw: Column, schema: StructType | str) -> Column:
    """F9: `JSON.parse(json_metadata).profile || {}`
    (handlers/account_updates.js:2-6)."""
    return double_decode_json(raw, schema).getField("profile")
