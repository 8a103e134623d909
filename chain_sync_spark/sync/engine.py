"""The batch-sync engine (reference listener.js main loop, §3.1).

Per round: read ops for ``[cursor, cursor + batch)`` → classify →
handler transforms → MERGE into posts/accounts tables → advance
cursor. Delivery is at-least-once with idempotent keyed MERGE
(re-running a round is a no-op), exactly the reference's
crash-replay contract (SURVEY.md §1.3).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chain_sync_spark.sources.checkpoint import read_cursor, write_cursor
from chain_sync_spark.sync.classify import classify
from chain_sync_spark.sync.handlers import (
    account_activity_upserts,
    comments_to_post_upserts,
    votes_to_vote_upserts,
)
from chain_sync_spark.sync.merge import (
    keep_target,
    max_of,
    merge_parquet,
    recover_table,
    set_union,
    take_source,
)


# Full posts-table schema (comments.js:150-160 upsert doc + the
# mutable fields added by later merges) so an engine that has not yet
# written any posts still exposes a typed empty relation — the
# reference tolerates votes arriving before any post exists.
POSTS_SCHEMA = (
    "post_id long, author string, permlink string, text_title string,"
    " text_body string, parent_permlink string, tags array<string>,"
    " image array<string>, stockimage_tags string, timestamp timestamp,"
    " year int, month int, upvotes array<string>, downvotes array<string>"
)


@dataclass
class SyncEngine:
    spark: SparkSession
    store_dir: str
    dry_run: bool = False  # reference DISABLE_UPDATE_SETTINGS

    @property
    def posts_dir(self) -> str:
        return os.path.join(self.store_dir, "posts")

    @property
    def accounts_dir(self) -> str:
        return os.path.join(self.store_dir, "accounts")

    @property
    def cursor_path(self) -> str:
        return os.path.join(self.store_dir, "checkpoint")

    def existing_posts(self) -> DataFrame:
        recover_table(self.posts_dir)
        if os.path.exists(self.posts_dir):
            return self.spark.read.parquet(self.posts_dir)
        return self.spark.createDataFrame([], POSTS_SCHEMA)

    def process_batch(self, ops: DataFrame) -> None:
        """One sync round over an op-stream micro-batch."""
        typed = classify(ops)
        comments, votes, accounts = typed["comment"], typed["vote"], typed["account_update"]

        # posts: comment upserts (month/year partitioned, S9/S12)
        post_upserts = comments_to_post_upserts(comments)
        merge_parquet(
            self.spark,
            self.posts_dir,
            post_upserts,
            key_cols=["post_id"],
            merge_exprs={
                # votes accumulate across rounds; a re-upserted post
                # must not clear them (scripted set-add semantics)
                "upvotes": keep_target,
                "downvotes": keep_target,
            },
            partition_cols=["year", "month"],
        )

        # votes: set-add into the posts table (S11/A1) — only after
        # posts merge so same-batch comment+vote resolves (J1)
        vote_upserts = votes_to_vote_upserts(votes, self.existing_posts()).select(
            "post_id",
            F.col("upvotes_add").alias("upvotes"),
            F.col("downvotes_add").alias("downvotes"),
        )
        if vote_upserts.limit(1).count() > 0:
            # join back partition columns so the merge stays pruned
            keyed = vote_upserts.join(
                self.existing_posts().select("post_id", "year", "month"), "post_id"
            )
            merge_parquet(
                self.spark,
                self.posts_dir,
                keyed,
                key_cols=["post_id"],
                merge_exprs={"upvotes": set_union, "downvotes": set_union},
                partition_cols=["year", "month"],
            )

        # accounts: last_active max + latest profile (A2/F9)
        acct_upserts = account_activity_upserts(comments, votes, accounts)
        merge_parquet(
            self.spark,
            self.accounts_dir,
            acct_upserts,
            key_cols=["name"],
            merge_exprs={"last_active": max_of, "profile": take_source},
        )

    def run(self, source: DataFrame, batch_size: int = 30, stop_block: int | None = None) -> int:
        """Reference main loop (listener.js:157-195): consume
        `source` from the checkpoint cursor in `batch_size` block
        rounds; advance the cursor only after all merges commit.
        Returns the final cursor."""
        cursor = read_cursor(self.spark, self.cursor_path, default=0)
        max_block_row = source.agg(F.max("block_num")).first()
        if max_block_row is None or max_block_row[0] is None:
            return cursor
        last = int(max_block_row[0])
        if stop_block is not None:
            last = min(last, stop_block - 1)
        while cursor <= last:
            hi = min(cursor + batch_size, last + 1)
            batch = source.filter(
                (F.col("block_num") >= cursor) & (F.col("block_num") < hi)
            )
            self.process_batch(batch)
            cursor = hi
            write_cursor(self.spark, self.cursor_path, cursor, dry_run=self.dry_run)
        return cursor
