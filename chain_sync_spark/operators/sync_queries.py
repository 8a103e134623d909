"""Oracle-checked queries for the sync-engine handler semantics.

The sync engine itself runs against op streams (tested in
tests/test_sync_engine.py); the driver's DuckDB oracle only sees the
testdata tables, so these queries embed the reference edge-case rows
as identical VALUES literals on both sides:

  * double-encoded / invalid json_metadata (comments.js:21-40)
  * reply filtering (comments.js:113)
  * vote sign routing + distinct-set accumulation (votes.js:11-28)
  * existence semi-join dropping votes on missing posts (votes.js:43)
  * last-active max across op kinds (A2)
  * hashtag extraction for stock-image posts (comments.js:71-96)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chain_sync_spark.functions.hashing import surrogate_id_md5
from chain_sync_spark.functions.json_utils import double_decode_json
from chain_sync_spark.functions.text_funcs import (
    extract_hashtags,
    extract_image_srcs,
    markdown_to_text,
)
from chain_sync_spark.tables import table

# ---- shared literal fixtures (kept in python so both sides agree) ----

_META_ROWS = [
    ("alice", "p1", '{"tags": ["a", "b"], "image": []}'),
    ("carol", "p2", '"{\\"tags\\": [\\"x\\"], \\"image\\": [\\"http://i/1\\"]}"'),  # double-encoded
    ("dave", "p3", "{not json"),  # invalid → defaults
    ("erin", "p4", None),  # missing → defaults
]

_VOTE_ROWS = [
    ("v1", "alice", "p1", 100),
    ("v1", "alice", "p1", 100),   # duplicate → set semantics
    ("v2", "alice", "p1", -50),
    ("v3", "ghost", "nope", 10),  # missing post → dropped
    ("v2", "carol", "p2", 70),
]

_POST_ROWS = [("alice", "p1"), ("carol", "p2")]

_ACTIVITY_ROWS = [
    ("alice", "2024-03-05 12:00:00", "comment"),
    ("alice", "2024-03-06 08:00:00", "vote"),
    ("bob", "2024-03-04 10:00:00", "vote"),
    ("bob", "2024-03-07 09:30:00", "account_update"),
]

_BODY_ROWS = [
    (1, "selling photos !update-stock-image-tags #Sunset #beach-life ok"),
    (2, "no command here #ignored"),
    (3, "!update-stock-image-tags no tags present"),
]


def _sql_values(rows) -> str:
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    return ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)


# ---- queries ----

def sync_metadata_double_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame(_META_ROWS, "author string, permlink string, raw string")
    meta = double_decode_json(F.col("raw"), "tags array<string>, image array<string>")
    return df.select(
        surrogate_id_md5("author", "permlink").alias("doc_key"),
        F.coalesce(F.to_json(meta.getField("tags")), F.lit("[]")).alias("tags_json"),
        F.coalesce(F.to_json(meta.getField("image")), F.lit("[]")).alias("image_json"),
    )


def sync_vote_set_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    votes = spark.createDataFrame(_VOTE_ROWS, "voter string, author string, permlink string, weight int")
    posts = spark.createDataFrame(_POST_ROWS, "author string, permlink string")
    keyed = votes.withColumn("doc_key", surrogate_id_md5("author", "permlink"))
    existing = keyed.join(
        posts.select(surrogate_id_md5("author", "permlink").alias("doc_key")),
        "doc_key",
        "left_semi",
    )
    return existing.groupBy("doc_key").agg(
        F.array_join(
            F.sort_array(F.collect_set(F.when(F.col("weight") > 0, F.col("voter")))), ","
        ).alias("upvotes"),
        F.array_join(
            F.sort_array(F.collect_set(F.when(F.col("weight") <= 0, F.col("voter")))), ","
        ).alias("downvotes"),
    )


def sync_account_last_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame(_ACTIVITY_ROWS, "name string, ts string, kind string")
    return (
        df.withColumn("ts", F.to_timestamp("ts"))
        .groupBy("name")
        .agg(F.max("ts").alias("last_active"), F.count(F.lit(1)).alias("n_ops"))
    )


def sync_stock_image_hashtags(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame(_BODY_ROWS, "id int, body string")
    has_cmd = F.col("body").contains("!update-stock-image-tags")
    tags = extract_hashtags(F.col("body"))
    # Reference-faithful: a matched command with zero hashtags yields
    # '' ([].join(' ') === '', comments.js handleReply). DuckDB's
    # array_to_string-of-empty-list quirk (NULL) is normalized on the
    # ORACLE side with COALESCE, not here.
    return df.select(
        "id",
        F.when(has_cmd, F.array_join(tags, " ")).alias("stock_tags"),
    )


_MARKDOWN_ROWS = [
    (1, "# Title\nSome **bold** and *em* text with [a link](http://l/1)."),
    (2, 'Photo: ![cat](http://i/cat.png) and <img src="http://i/dog.png">'),
    (3, "code `inline` and\n```\nfenced block\n```\ndone"),
    (4, 'escaped &lt;img src="http://i/esc.png"&gt; markup'),
    (5, None),
]


def sync_markdown_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3–F5 high-fidelity path: markdown render → img-src collection
    → double tag-strip, as one Arrow-batched pandas_udf
    (functions/markdown_udf.py). Genuinely non-SQL (no markdown
    renderer in DuckDB) → rows-only driver check; semantics are pinned
    by tests/test_markdown.py against reference-behavior fixtures."""
    from chain_sync_spark.functions.markdown_udf import parse_post

    df = spark.createDataFrame(_MARKDOWN_ROWS, "id int, body string")
    p = parse_post(F.col("body"))
    return df.select(
        "id",
        p.getField("text").alias("text"),
        F.to_json(p.getField("images")).alias("images_json"),
    )


def markdown_extract_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4+F5 builtin-regex path, oracle-checkable (round 5): image-src
    extraction and double-tag-strip plain-texting as pure column
    expressions over a deterministically markdown-augmented documents
    corpus.  ``sync_markdown_parse`` exercises the high-fidelity
    pandas_udf renderer but can never earn a hash row (no markdown
    renderer exists in DuckDB); this variant certifies everything in
    the reference pipeline EXCEPT the render itself — the <img src>
    collection and the double strip (handlers/comments.js:43-55) are
    regex-expressible in both engines.  Image lists are deduplicated
    and emitted sorted+joined (driver canon rejects arrays).

    Scale: per-row regexp projection, whole-stage codegen, zero
    shuffles — the shape the 100 TB text-cleaning pass needs."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id").cast("string")
    m = F.pmod(F.col("doc_id"), F.lit(4))
    aug = F.concat(
        F.col("text"),
        F.when(
            m == 0,
            F.concat(
                F.lit(" ![a](http://img/a"), i, F.lit(".png) dup ![a](http://img/a"),
                i, F.lit('.png) <img src="http://img/b'), i, F.lit('.png"> done'),
            ),
        )
        .when(
            m == 1,
            F.concat(F.lit(" see [docs](http://l/"), i, F.lit(") **bold** `code`")),
        )
        .when(
            m == 2,
            F.concat(F.lit(" <img alt='x' src='http://img/c"), i, F.lit(".gif'> t")),
        )
        .otherwise(F.lit("")),
    )
    imgs = extract_image_srcs(aug)
    return d.select(
        "doc_id",
        F.size(imgs).alias("n_imgs"),
        F.array_join(F.array_sort(imgs), " ").alias("img_srcs"),
        F.substring(markdown_to_text(aug), 1, 80).alias("plain_head"),
    )


# the same augmentation + regex chains, rendered for DuckDB (RE2):
# patterns stay inside the Java/RE2 shared subset; '' escapes the
# single quotes the img-src char class needs
_MD_BUILTIN_ORACLE = r"""
WITH aug AS (
  SELECT doc_id,
         text || CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN ' ![a](http://img/a' || doc_id::VARCHAR
                || '.png) dup ![a](http://img/a' || doc_id::VARCHAR
                || '.png) <img src="http://img/b' || doc_id::VARCHAR
                || '.png"> done'
           WHEN 1 THEN ' see [docs](http://l/' || doc_id::VARCHAR
                || ') **bold** `code`'
           WHEN 2 THEN ' <img alt=''x'' src=''http://img/c' || doc_id::VARCHAR
                || '.gif''> t'
           ELSE '' END AS b
  FROM documents
),
imgs AS (
  SELECT doc_id, b,
         list_distinct(
           regexp_extract_all(b, '<img[^>]*src\s*=\s*["'']([^"'']+)["'']', 1)
           || regexp_extract_all(b, '!\[[^\]]*\]\(([^)\s]+)[^)]*\)', 1)
         ) AS srcs
  FROM aug
)
SELECT doc_id,
       CAST(len(srcs) AS INT) AS n_imgs,
       COALESCE(array_to_string(list_sort(srcs), ' '), '') AS img_srcs,
       substr(trim(regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(b, '<[^>]+>', ' ', 'g'),
                 '<[^>]+>', ' ', 'g'),
               '!\[[^\]]*\]\(([^)\s]+)[^)]*\)', ' ', 'g'),
             '\[([^\]]*)\]\([^)]*\)', '\1', 'g'),
           '[*_`#>~]+', ' ', 'g'),
         '\s+', ' ', 'g')), 1, 80) AS plain_head
FROM imgs
"""


QUERIES = {
    "sync_metadata_double_decode": sync_metadata_double_decode,
    "sync_vote_set_accumulation": sync_vote_set_accumulation,
    "sync_account_last_active": sync_account_last_active,
    "sync_stock_image_hashtags": sync_stock_image_hashtags,
    "sync_markdown_parse": sync_markdown_parse,
    "markdown_extract_builtin": markdown_extract_builtin,
}

ORACLE = {
    "sync_metadata_double_decode": f"""
        WITH t(author, permlink, raw) AS (VALUES {_sql_values(_META_ROWS)}),
        u AS (
          SELECT author, permlink,
                 CASE WHEN raw IS NOT NULL AND json_valid(raw) AND json_type(raw::JSON) = 'VARCHAR'
                      THEN raw->>'$' ELSE raw END AS unwrapped
          FROM t
        )
        SELECT md5(author || '/' || permlink) AS doc_key,
               COALESCE(CASE WHEN json_valid(unwrapped) THEN json_extract(unwrapped, '$.tags')::VARCHAR END, '[]') AS tags_json,
               COALESCE(CASE WHEN json_valid(unwrapped) THEN json_extract(unwrapped, '$.image')::VARCHAR END, '[]') AS image_json
        FROM u
    """,
    "sync_vote_set_accumulation": f"""
        WITH votes(voter, author, permlink, weight) AS (VALUES {_sql_values(_VOTE_ROWS)}),
        posts(author, permlink) AS (VALUES {_sql_values(_POST_ROWS)}),
        keyed AS (
          SELECT md5(v.author || '/' || v.permlink) AS doc_key, voter, weight
          FROM votes v
          WHERE EXISTS (SELECT 1 FROM posts p
                        WHERE p.author = v.author AND p.permlink = v.permlink)
        )
        SELECT doc_key,
               COALESCE(array_to_string(list(DISTINCT voter ORDER BY voter) FILTER (WHERE weight > 0), ','), '') AS upvotes,
               COALESCE(array_to_string(list(DISTINCT voter ORDER BY voter) FILTER (WHERE weight <= 0), ','), '') AS downvotes
        FROM keyed GROUP BY doc_key
    """,
    "sync_account_last_active": f"""
        WITH t(name, ts, kind) AS (VALUES {_sql_values(_ACTIVITY_ROWS)})
        SELECT name, MAX(CAST(ts AS TIMESTAMP)) AS last_active, COUNT(*) AS n_ops
        FROM t GROUP BY name
    """,
    "sync_stock_image_hashtags": f"""
        WITH t(id, body) AS (VALUES {_sql_values(_BODY_ROWS)})
        SELECT id,
               CASE WHEN contains(body, '!update-stock-image-tags') THEN
                 COALESCE(array_to_string(
                   list_transform(
                     list_filter(string_split(replace(body, chr(10), ' ' || chr(10) || ' '), ' '),
                                 tok -> tok LIKE '#_%'),
                     tok -> lower(substr(tok, 2, 1000))), ' '), '')
               END AS stock_tags
        FROM t
    """,
    "markdown_extract_builtin": _MD_BUILTIN_ORACLE,
}
