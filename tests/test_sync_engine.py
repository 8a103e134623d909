"""Sync-engine semantics tests — edge cases lifted from the reference
(SURVEY.md §5): reply dropped, double-encoded metadata, invalid
metadata defaults, duplicate vote no-op, vote on missing post
dropped, idempotent re-run, cross-batch vote accumulation,
last_active monotone max."""

import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from chain_sync_spark.sources.blocks import OP_STREAM_SCHEMA
from chain_sync_spark.sync.engine import SyncEngine


def _op(block, ts, op_type, payload):
    if isinstance(ts, str):
        ts = datetime.fromisoformat(ts)
    return (block, ts, op_type, json.dumps(payload))


def _comment(author, permlink, body="hello", meta=None, parent_author="", title="T",
             parent_permlink="cat1"):
    return {
        "author": author, "permlink": permlink, "parent_author": parent_author,
        "parent_permlink": parent_permlink, "title": title, "body": body,
        "json_metadata": meta if meta is not None else json.dumps({"tags": ["a"], "image": []}),
    }


def _vote(voter, author, permlink, weight):
    return {"voter": voter, "author": author, "permlink": permlink, "weight": weight}


TS = "2024-03-05 12:00:00"


@pytest.fixture()
def ops_batch1(spark):
    rows = [
        _op(1, TS, "comment", _comment("alice", "p1", body="Post *one* #tag1 #Tag2")),
        # reply — must be dropped (comments.js:113)
        _op(1, TS, "comment", _comment("bob", "r1", parent_author="alice")),
        # double-encoded metadata (comments.js:28-29)
        _op(2, TS, "comment", _comment("carol", "p2", meta=json.dumps(json.dumps({"tags": ["x"], "image": ["http://i/1"]})))),
        # invalid metadata → defaults (comments.js:37-40)
        _op(2, TS, "comment", _comment("dave", "p3", meta="{not json")),
        _op(3, TS, "vote", _vote("v1", "alice", "p1", 100)),
        _op(3, TS, "vote", _vote("v1", "alice", "p1", 100)),      # duplicate in batch
        _op(3, TS, "vote", _vote("v2", "alice", "p1", -50)),
        _op(3, TS, "vote", _vote("v3", "ghost", "nope", 10)),     # missing post → dropped
        _op(3, TS, "account_update",
            {"account": "alice", "json_metadata": json.dumps({"profile": {"name": "Alice", "about": "hi"}})}),
    ]
    return spark.createDataFrame(rows, OP_STREAM_SCHEMA)


def _posts(spark, d):
    return spark.read.parquet(f"{d}/posts")


def _accounts(spark, d):
    return spark.read.parquet(f"{d}/accounts")


def test_sync_round_semantics(spark, tmp_path, ops_batch1):
    eng = SyncEngine(spark, str(tmp_path))
    eng.run(ops_batch1, batch_size=10)

    posts = {r["permlink"]: r for r in _posts(spark, tmp_path).collect()}
    # reply dropped
    assert set(posts) == {"p1", "p2", "p3"}
    # double-decoded metadata
    assert posts["p2"]["tags"] == ["x"]
    assert posts["p2"]["image"] == ["http://i/1"]
    # invalid metadata → defaults
    assert posts["p3"]["tags"] == []
    # markdown stripped
    assert "*" not in posts["p1"]["text_body"]
    # votes: duplicate collapsed, sign-routed
    assert posts["p1"]["upvotes"] == ["v1"]
    assert posts["p1"]["downvotes"] == ["v2"]
    # partition columns
    assert posts["p1"]["year"] == 2024 and posts["p1"]["month"] == 3

    accts = {r["name"]: r for r in _accounts(spark, tmp_path).collect()}
    assert accts["alice"]["profile"]["name"] == "Alice"
    assert str(accts["v1"]["last_active"]).startswith("2024-03-05")


def test_idempotent_replay(spark, tmp_path, ops_batch1):
    eng = SyncEngine(spark, str(tmp_path))
    eng.run(ops_batch1, batch_size=10)
    before_posts = sorted(map(str, _posts(spark, tmp_path).collect()))
    before_accts = sorted(map(str, _accounts(spark, tmp_path).collect()))
    # replay the same batch (at-least-once delivery)
    eng.process_batch(ops_batch1)
    assert sorted(map(str, _posts(spark, tmp_path).collect())) == before_posts
    assert sorted(map(str, _accounts(spark, tmp_path).collect())) == before_accts


def test_cross_batch_vote_accumulation_and_last_active(spark, tmp_path, ops_batch1):
    eng = SyncEngine(spark, str(tmp_path))
    eng.run(ops_batch1, batch_size=10)
    ts2 = "2024-03-06 12:00:00"
    batch2 = spark.createDataFrame(
        [
            _op(10, ts2, "vote", _vote("v1", "alice", "p1", 80)),   # dup across batches → no-op
            _op(10, ts2, "vote", _vote("v4", "alice", "p1", 80)),   # new upvote
            # re-upsert of existing post must not clear votes
            _op(11, ts2, "comment", _comment("alice", "p1", body="edited")),
        ],
        OP_STREAM_SCHEMA,
    )
    eng.run(batch2, batch_size=10)
    p1 = _posts(spark, tmp_path).filter(F.col("permlink") == "p1").first()
    assert p1["upvotes"] == ["v1", "v4"]
    assert p1["downvotes"] == ["v2"]
    assert p1["text_body"] == "edited"
    alice = _accounts(spark, tmp_path).filter(F.col("name") == "alice").first()
    assert str(alice["last_active"]).startswith("2024-03-06")
    # cursor advanced past the max block
    from chain_sync_spark.sources.checkpoint import read_cursor
    assert read_cursor(spark, f"{tmp_path}/checkpoint") == 12


def test_vote_only_first_round(spark, tmp_path):
    """Votes arriving before any post exists must be dropped without
    crashing, and no zero-row posts table may be materialized."""
    import os
    eng = SyncEngine(spark, str(tmp_path))
    ops = spark.createDataFrame(
        [_op(1, TS, "vote", _vote("v1", "alice", "p1", 100))], OP_STREAM_SCHEMA
    )
    eng.run(ops, batch_size=10)
    assert not os.path.exists(f"{tmp_path}/posts")
    # the voter's last_active still lands in accounts
    assert _accounts(spark, tmp_path).filter(F.col("name") == "v1").count() == 1
    # a later round with a real post works against the absent table
    ops2 = spark.createDataFrame(
        [_op(2, TS, "comment", _comment("alice", "p1"))], OP_STREAM_SCHEMA
    )
    eng.run(ops2, batch_size=10)
    assert _posts(spark, tmp_path).count() == 1


def test_cross_partition_edit_keeps_single_row(spark, tmp_path, ops_batch1):
    """An edit whose timestamp falls in a later month must land in the
    partition the post already lives in — one row per post_id."""
    eng = SyncEngine(spark, str(tmp_path))
    eng.run(ops_batch1, batch_size=10)
    batch2 = spark.createDataFrame(
        [_op(20, "2024-05-02 09:00:00", "comment", _comment("alice", "p1", body="moved"))],
        OP_STREAM_SCHEMA,
    )
    eng.run(batch2, batch_size=10)
    p1 = _posts(spark, tmp_path).filter(F.col("permlink") == "p1").collect()
    assert len(p1) == 1
    assert p1[0]["text_body"] == "moved"
    # stays in the original (2024, 3) partition; votes preserved
    assert (p1[0]["year"], p1[0]["month"]) == (2024, 3)
    assert p1[0]["upvotes"] == ["v1"]


@pytest.mark.slow
def test_crash_recovery_restores_backup(spark, tmp_path, ops_batch1):
    """A crash between the two renames of _atomic_overwrite leaves
    only the backup; the next round must restore and proceed."""
    import os
    import shutil
    from chain_sync_spark.sync.merge import BACKUP_SUFFIX, STAGING_SUFFIX
    eng = SyncEngine(spark, str(tmp_path))
    eng.run(ops_batch1, batch_size=10)
    posts_dir = f"{tmp_path}/posts"
    os.rename(posts_dir, posts_dir + BACKUP_SUFFIX)      # simulate mid-swap crash
    os.makedirs(posts_dir + STAGING_SUFFIX + "/garbage")  # stale staging output
    batch2 = spark.createDataFrame(
        [_op(20, TS, "vote", _vote("v9", "alice", "p1", 100))], OP_STREAM_SCHEMA
    )
    eng.run(batch2, batch_size=10)
    assert not os.path.exists(posts_dir + BACKUP_SUFFIX)
    assert not os.path.exists(posts_dir + STAGING_SUFFIX)
    p1 = _posts(spark, tmp_path).filter(F.col("permlink") == "p1").first()
    assert "v9" in p1["upvotes"]
    shutil.rmtree(posts_dir + STAGING_SUFFIX, ignore_errors=True)


def test_synthesize_ops_smoke(spark):
    """The demo op-stream source must produce parseable payloads of
    every type, including double-encoded metadata (reference F2)."""
    import json as _json
    from chain_sync_spark.sources.blocks import synthesize_ops
    from chain_sync_spark.sync.classify import classify
    ops = synthesize_ops(spark, n_blocks=20, ops_per_block=10)
    rows = ops.collect()
    assert len(rows) == 200
    kinds = {r["op_type"] for r in rows}
    assert kinds == {"comment", "vote", "account_update", "custom_json"}
    typed = classify(ops)
    comments = typed["comment"].collect()
    assert comments and all(c["author"] for c in comments)
    metas = [c["json_metadata"] for c in comments]
    double_encoded = [m for m in metas if m and m.startswith('"')]
    assert double_encoded, "expected some double-encoded json_metadata"
    inner = _json.loads(_json.loads(double_encoded[0]))
    assert "tags" in inner and "image" in inner


def _file_states(root):
    import os
    out = {}
    for r, _d, files in os.walk(root):
        for f in files:
            p = os.path.join(r, f)
            out[p] = os.path.getmtime(p)
    return out


@pytest.mark.slow
def test_bounded_rewrite_touched_partitions_only(spark, tmp_path, ops_batch1):
    """The 100 TB contract: a merge rewrites only the partition
    directories its batch touches — posts in other months and account
    buckets of other users keep their exact files."""
    eng = SyncEngine(spark, str(tmp_path))
    eng.run(ops_batch1, batch_size=10)
    # second round: one post in a different month, one vote by a new voter
    batch2 = spark.createDataFrame(
        [
            _op(20, "2024-07-01 10:00:00", "comment", _comment("zed", "zp1")),
            _op(20, "2024-07-01 10:00:01", "vote", _vote("newvoter", "zed", "zp1", 10)),
        ],
        OP_STREAM_SCHEMA,
    )
    posts_before = _file_states(f"{tmp_path}/posts")
    accounts_before = _file_states(f"{tmp_path}/accounts")
    eng.run(batch2, batch_size=10)
    posts_after = _file_states(f"{tmp_path}/posts")
    accounts_after = _file_states(f"{tmp_path}/accounts")

    # all March post files are bit-for-bit untouched (same path+mtime)
    for p, mt in posts_before.items():
        if "year=2024/month=3" in p:
            assert posts_after.get(p) == mt, f"untouched partition rewritten: {p}"
    # the new July partition exists
    assert any("year=2024/month=7" in p for p in posts_after)

    # accounts: only the buckets of {zed, newvoter} changed
    from chain_sync_spark.sync.engine import N_ACCOUNT_BUCKETS, _bucket
    touched = {
        r["b"]
        for r in spark.createDataFrame([("zed",), ("newvoter",)], "name string")
        .select(_bucket("name", N_ACCOUNT_BUCKETS).alias("b"))
        .collect()
    }
    changed = {
        p for p in set(accounts_before) | set(accounts_after)
        if accounts_before.get(p) != accounts_after.get(p)
    }
    for p in changed:
        assert any(f"bucket={b}/" in p or p.endswith(f"bucket={b}") for b in touched), (
            f"file outside touched buckets changed: {p} (touched {touched})"
        )


@pytest.mark.slow
def test_reply_tag_update_allowlist(spark, tmp_path):
    """Intended handleReply semantics (P7/J5): an allow-listed reply
    with the command updates the parent's stockimage_tags; replies
    from other authors, or to missing posts, are dropped. The path is
    opt-in (dead code in the shipped reference, comments.js:115)."""
    eng = SyncEngine(spark, str(tmp_path), enable_reply_tag_updates=True)
    ops = spark.createDataFrame(
        [
            _op(1, TS, "comment", _comment("alice", "p1", body="photo #original",
                                           parent_permlink="hive-118554")),
            # allow-listed reply → replaces parent tags
            _op(2, TS, "comment", _comment("crosheille", "r1", parent_author="alice",
                                           parent_permlink="p1",
                                           body="!update-stock-image-tags #Fixed #Tags")),
            # non-allow-listed reply → ignored
            _op(3, TS, "comment", _comment("rando", "r2", parent_author="alice",
                                           parent_permlink="p1",
                                           body="!update-stock-image-tags #evil")),
            # allow-listed reply to a missing post → dropped
            _op(3, TS, "comment", _comment("kattycrochet", "r3", parent_author="ghost",
                                           parent_permlink="nope",
                                           body="!update-stock-image-tags #lost")),
        ],
        OP_STREAM_SCHEMA,
    )
    eng.run(ops, batch_size=10)
    posts = {r["permlink"]: r for r in _posts(spark, tmp_path).collect()}
    assert set(posts) == {"p1"}  # replies never become posts
    assert posts["p1"]["stockimage_tags"] == "fixed tags"
    # S12: jobs map reset present and empty
    assert posts["p1"]["jobs"] == {}


def test_stock_post_tags_without_command(spark, tmp_path):
    """handleStockImagePost runs unconditionally on top-level stock
    posts (comments.js:146) — no command required."""
    eng = SyncEngine(spark, str(tmp_path))
    ops = spark.createDataFrame(
        [
            _op(1, TS, "comment", _comment("bob", "s1", body="pic #Sea #sky",
                                           parent_permlink="hivestockimages")),
            _op(1, TS, "comment", _comment("bob", "n1", body="pic #Sea",
                                           parent_permlink="cat1")),
        ],
        OP_STREAM_SCHEMA,
    )
    eng.run(ops, batch_size=10)
    posts = {r["permlink"]: r for r in _posts(spark, tmp_path).collect()}
    assert posts["s1"]["stockimage_tags"] == "sea sky"
    assert posts["n1"]["stockimage_tags"] is None


@pytest.mark.slow
def test_stream_guards_and_stop_block(spark, tmp_path):
    """P3 empty batches advance the cursor without work; P4 malformed
    ops abort before any merge; stop_block bounds the replay."""
    import os
    eng = SyncEngine(spark, str(tmp_path))
    # blocks 0-1 have ops, 2-9 empty (absent), 10 has ops
    rows = [
        _op(0, TS, "comment", _comment("alice", "p1")),
        _op(1, TS, "vote", _vote("v1", "alice", "p1", 5)),
        _op(10, TS, "comment", _comment("bob", "p2")),
    ]
    ops = spark.createDataFrame(rows, OP_STREAM_SCHEMA)
    # stop_block=5: only blocks < 5 processed
    cur = eng.run(ops, batch_size=2, stop_block=5)
    assert cur == 5
    assert {r["permlink"] for r in _posts(spark, tmp_path).collect()} == {"p1"}
    # resume without stop: processes block 10
    cur = eng.run(ops, batch_size=4)
    assert cur == 11
    assert {r["permlink"] for r in _posts(spark, tmp_path).collect()} == {"p1", "p2"}
    # P4: malformed op (null payload) aborts and leaves cursor put
    bad = spark.createDataFrame(
        [(12, None, "comment", None)], OP_STREAM_SCHEMA
    )
    import pytest as _pytest
    with _pytest.raises(ValueError, match="malformed"):
        eng.run(bad, batch_size=4)
    from chain_sync_spark.sources.checkpoint import read_cursor
    assert read_cursor(spark, f"{tmp_path}/checkpoint") == 11


def test_row_order_invariance(spark, tmp_path, ops_batch1):
    """Set-based handlers must not depend on the source DataFrame's
    row order: a reversed op stream produces the identical store
    (dedup/sign-routing key on (block_num, timestamp), never on
    physical order) — SURVEY §5.4's reorder property."""
    eng_a = SyncEngine(spark, str(tmp_path / "a"))
    eng_a.run(ops_batch1, batch_size=10)
    reversed_ops = spark.createDataFrame(
        list(reversed(ops_batch1.collect())), ops_batch1.schema
    )
    eng_b = SyncEngine(spark, str(tmp_path / "b"))
    eng_b.run(reversed_ops, batch_size=10)
    for tbl in ["posts", "accounts"]:
        a = sorted(map(str, spark.read.parquet(f"{tmp_path}/a/{tbl}").collect()))
        b = sorted(map(str, spark.read.parquet(f"{tmp_path}/b/{tbl}").collect()))
        assert a == b, tbl


@pytest.mark.slow
def test_compaction_bounds_file_counts(spark, tmp_path, ops_batch1):
    """Merge-heavy partitions accumulate files; compact_partitions
    rewrites crowded partitions only, preserving every row."""
    import os
    from chain_sync_spark.sync.merge import compact_partitions
    eng = SyncEngine(spark, str(tmp_path))
    eng.run(ops_batch1, batch_size=10)
    posts_dir = f"{tmp_path}/posts"
    # crowd the (2024, 3) partition: at cluster scale each merge can
    # leave one file per shuffle partition (appends simulate that)
    part = f"{posts_dir}/year=2024/month=3"
    # materialize on the driver first — appending to a path while
    # lazily reading from it is the read-overwrite hazard
    src = spark.read.parquet(part)
    pdf = spark.createDataFrame(src.collect(), src.schema)
    for _ in range(3):
        pdf.write.mode("append").parquet(part)
    before_rows = sorted(map(str, _posts(spark, tmp_path).collect()))

    def _files(d):
        return [
            os.path.join(r, f)
            for r, _dd, ff in os.walk(d)
            for f in ff
            if f.endswith(".parquet")
        ]

    assert len(_files(part)) > 2
    n = compact_partitions(spark, posts_dir, ["year", "month"], max_files_per_partition=1)
    assert n >= 1
    part_files = [p for p in _files(posts_dir) if "year=2024/month=3" in p]
    assert len(part_files) == 1                   # coalesced
    assert sorted(map(str, _posts(spark, tmp_path).collect())) == before_rows


def test_mutings(spark, tmp_path):
    eng = SyncEngine(spark, str(tmp_path))
    ops = spark.createDataFrame(
        [
            _op(1, TS, "comment", _comment("alice", "s1", parent_permlink="hive-118554")),
            _op(1, TS, "comment", _comment("bob", "s2", parent_permlink="hive-118554")),
            _op(1, TS, "comment", _comment("alice", "other", parent_permlink="cat1")),
        ],
        OP_STREAM_SCHEMA,
    )
    eng.run(ops, batch_size=10)
    from chain_sync_spark.sync.mutings import apply_community_mutings
    roles = spark.createDataFrame(
        [("alice", "muted"), ("bob", "member")], "account string, role string"
    )
    apply_community_mutings(spark, f"{tmp_path}/posts", roles, "hive-118554")
    rows = {r["permlink"]: r["muted_in_community"] for r in _posts(spark, tmp_path).collect()}
    assert rows == {"s1": True, "s2": None, "other": None}


def test_reply_tag_updates_off_by_default(spark, tmp_path):
    """The shipped reference never runs handleReply (call site
    commented out, comments.js:115) — with the default flag the parent
    post's stockimage_tags stay untouched by command replies."""
    eng = SyncEngine(spark, str(tmp_path))
    ops = spark.createDataFrame(
        [
            _op(1, TS, "comment", _comment("alice", "p1", body="photo #original",
                                           parent_permlink="hive-118554")),
            _op(2, TS, "comment", _comment("crosheille", "r1", parent_author="alice",
                                           parent_permlink="p1",
                                           body="!update-stock-image-tags #Fixed")),
        ],
        OP_STREAM_SCHEMA,
    )
    eng.run(ops, batch_size=10)
    p1 = _posts(spark, tmp_path).filter(F.col("permlink") == "p1").first()
    assert p1["stockimage_tags"] == "original"


def test_authoritative_snapshot_wins(spark, tmp_path):
    """J3 'authoritative store wins' (comments.js:123-142): when the
    engine is given an authoritative snapshot, its non-null content
    overrides the op's for posts it contains; other posts and columns
    keep op-derived content."""
    from chain_sync_spark.functions.hashing import surrogate_id

    auth = spark.createDataFrame(
        [("alice", "p1", "Authoritative title")],
        "author string, permlink string, text_title string",
    ).select(
        surrogate_id("author", "permlink").alias("post_id"),
        "text_title",
        F.lit(None).cast("string").alias("text_body"),  # null → op wins
    )
    eng = SyncEngine(spark, str(tmp_path), authoritative=auth)
    ops = spark.createDataFrame(
        [
            _op(1, TS, "comment", _comment("alice", "p1", body="op body", title="Op title")),
            _op(1, TS, "comment", _comment("bob", "p2", body="other", title="Bob title")),
        ],
        OP_STREAM_SCHEMA,
    )
    eng.run(ops, batch_size=10)
    posts = {r["permlink"]: r for r in _posts(spark, tmp_path).collect()}
    assert posts["p1"]["text_title"] == "Authoritative title"   # snapshot wins
    assert posts["p1"]["text_body"] == "op body"                # null col → op wins
    assert posts["p2"]["text_title"] == "Bob title"             # not in snapshot


@pytest.mark.slow
def test_legacy_store_migration(spark, tmp_path, ops_batch1):
    """Stores written by earlier engine revisions — unpartitioned
    accounts without the bucket column, posts partitions missing the
    later-added mutable columns — are migrated once and then sync
    normally (ADVICE r2 #1)."""
    import os

    store = str(tmp_path)
    # legacy accounts: unpartitioned, no bucket column
    spark.createDataFrame(
        [("olduser", datetime.fromisoformat("2023-01-01 00:00:00"))],
        "name string, last_active timestamp",
    ).write.parquet(f"{store}/accounts")
    # legacy posts: partitioned but missing jobs/upvotes/downvotes/muted
    spark.createDataFrame(
        [(123, "olduser", "oldpost", "T", "b", "cat1",
          datetime.fromisoformat("2023-01-01 00:00:00"), 2023, 1)],
        "post_id long, author string, permlink string, text_title string,"
        " text_body string, parent_permlink string, timestamp timestamp,"
        " year int, month int",
    ).write.partitionBy("year", "month").parquet(f"{store}/posts")

    eng = SyncEngine(spark, store)
    applied = eng.migrate_store()
    assert set(applied) == {"accounts_bucketed", "posts_schema_completed"}
    assert any(e.startswith("bucket=") for e in os.listdir(f"{store}/accounts"))
    # migration is idempotent
    assert eng.migrate_store() == []

    # a normal round now merges into the migrated store without error
    eng.run(ops_batch1, batch_size=10)
    posts = _posts(spark, tmp_path)
    assert {"jobs", "upvotes", "downvotes", "muted_in_community"} <= set(posts.columns)
    old = posts.filter(F.col("permlink") == "oldpost").first()
    assert old is not None and old["upvotes"] is None
    accounts = spark.read.parquet(f"{store}/accounts")
    assert accounts.filter(F.col("name") == "olduser").first()["last_active"] is not None
    # new activity merged alongside the legacy row
    assert accounts.filter(F.col("name") == "alice").count() == 1


def test_heartbeat_fires_per_committed_round(spark, tmp_path):
    """S13 parity (listener.js:44-56,145): the heartbeat hook fires
    once per committed round — EMPTY rounds included (the reference
    pings its monitor after every round; silence across empty block
    spans would trip a liveness monitor) — after the cursor advance,
    with the round's block span, op count, and elapsed time."""
    from chain_sync_spark.sources.blocks import synthesize_ops
    from chain_sync_spark.sync.engine import SyncEngine

    beats = []
    ops = synthesize_ops(spark, n_blocks=20, ops_per_block=5)
    engine = SyncEngine(spark, str(tmp_path / "store"), heartbeat=beats.append)
    final = engine.run(ops, batch_size=10)
    assert len(beats) == 2
    assert [b["batch_lo"] for b in beats] == [0, 10]
    assert beats[-1]["cursor"] == final
    assert all(b["n_ops"] == 50 and b["elapsed_s"] > 0 for b in beats)

    # empty rounds still beat: drop blocks 0-9 → round one has no ops
    beats2 = []
    sparse = ops.filter(F.col("block_num") >= 10)
    engine2 = SyncEngine(spark, str(tmp_path / "store2"), heartbeat=beats2.append)
    engine2.run(sparse, batch_size=10)
    assert [b["n_ops"] for b in beats2] == [0, 50]
    assert [b["batch_lo"] for b in beats2] == [0, 10]


@pytest.mark.slow
def test_accounts_merge_failure_aborts_round(spark, tmp_path, ops_batch1, monkeypatch):
    """The accounts merge runs in a worker thread concurrent with the
    posts chain; its failure must still fail the ROUND before the
    cursor advances (replay then redoes the whole batch — merges are
    idempotent, so the half-committed posts chain is safe)."""
    from chain_sync_spark.sources.checkpoint import read_cursor
    from chain_sync_spark.sync.engine import SyncEngine

    eng = SyncEngine(spark, str(tmp_path))

    def boom(*a, **k):
        raise RuntimeError("accounts store unavailable")

    monkeypatch.setattr(eng, "_merge_accounts", boom)
    with pytest.raises(RuntimeError, match="accounts store unavailable"):
        eng.run(ops_batch1.withColumn("block_num", F.lit(0)), batch_size=10)
    # cursor never advanced: the batch replays in full on restart
    assert read_cursor(spark, f"{tmp_path}/checkpoint", default=0) == 0

    # restart with the real merge: round completes and converges to
    # the same store state a clean run produces (idempotent replay
    # over the posts chain's partial commit)
    eng2 = SyncEngine(spark, str(tmp_path))
    cur = eng2.run(ops_batch1.withColumn("block_num", F.lit(0)), batch_size=10)
    assert cur == 1
    accounts = {r["name"] for r in _accounts(spark, tmp_path).collect()}
    assert "alice" in accounts


def test_cursor_format_cross_compat(spark, tmp_path):
    """r13: cursor I/O moved from Spark jobs to driver-side pyarrow.
    The on-disk contract is unchanged — a directory holding one
    parquet file — so a store written by either revision must read
    back under the other."""
    import os

    from chain_sync_spark.sources.checkpoint import read_cursor, write_cursor

    # new writer → Spark reader (the old read path)
    p1 = f"{tmp_path}/ck_new"
    write_cursor(spark, p1, 42)
    assert spark.read.parquet(p1).first()["block_num"] == 42
    # Spark writer (the old write path, reproduced verbatim) → new reader
    p2 = f"{tmp_path}/ck_old"
    tmp = p2 + ".tmp"
    spark.createDataFrame([(7,)], "block_num long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(tmp, p2)
    assert read_cursor(spark, p2) == 7
    # overwrite via the new writer stays atomic + re-readable
    write_cursor(spark, p2, 9)
    assert read_cursor(spark, p2) == 9
    assert read_cursor(spark, f"{tmp_path}/absent", default=3) == 3


def test_first_write_empty_updates_materializes_no_table(spark, tmp_path):
    """r13: the first-write path stages once instead of probing
    isEmpty() first — but a zero-row update batch must STILL leave no
    table behind (partitioned zero-row dirs would later fail reads
    with UNABLE_TO_INFER_SCHEMA), and no staging turd either."""
    import os

    from chain_sync_spark.sync.merge import merge_parquet

    empty = spark.createDataFrame([], "k long, v string, part int")
    tgt_part = f"{tmp_path}/t_part"
    merge_parquet(spark, tgt_part, empty, key_cols=["k"], partition_cols=["part"])
    assert not os.path.exists(tgt_part)
    tgt_flat = f"{tmp_path}/t_flat"
    merge_parquet(spark, tgt_flat, empty.drop("part"), key_cols=["k"])
    assert not os.path.exists(tgt_flat)
    assert not [e for e in os.listdir(tmp_path) if "__staging__" in e]
    # and a NON-empty first write lands with rows intact
    rows = spark.createDataFrame([(1, "a", 3), (2, "b", 4)], "k long, v string, part int")
    merge_parquet(spark, tgt_part, rows, key_cols=["k"], partition_cols=["part"])
    assert spark.read.parquet(tgt_part).count() == 2


def test_process_batch_type_counts_matches_probe(spark, tmp_path, ops_batch1):
    """r13: run() folds per-type counts into the batch-stats job and
    process_batch skips its two isEmpty() probes when given them.
    Both paths must produce byte-identical stores."""
    a = SyncEngine(spark, str(tmp_path / "a"))
    a.process_batch(ops_batch1)  # probe path (no counts)
    b = SyncEngine(spark, str(tmp_path / "b"))
    b.process_batch(
        ops_batch1,
        type_counts={"comment": 4, "vote": 4},  # exact counts in ops_batch1
    )
    def rows(store, sub):
        df = spark.read.parquet(f"{tmp_path}/{store}/{sub}")
        return sorted(repr(r) for r in df.select(sorted(df.columns)).collect())

    for sub in ("posts", "accounts"):
        assert rows("a", sub) == rows("b", sub), (
            f"{sub} diverged between probe and type_counts paths"
        )


def test_run_vote_bucket_fold_matches_probe(spark, ops_batch1):
    """r14: run() folds the vote path's distinct-bucket collect into
    the same batch-stats aggregate that already carries the per-type
    counts.  The folded expression (from_json on the raw op payload)
    must produce exactly the bucket set the probe path computes from
    classify's extracted columns — same surrogate key, same xxhash64,
    same pmod."""
    from chain_sync_spark.functions.hashing import surrogate_id
    from chain_sync_spark.sync.classify import VOTE_SCHEMA, classify
    from chain_sync_spark.sync.engine import N_INDEX_BUCKETS

    vp = F.from_json("op", VOTE_SCHEMA)
    folded = set(
        ops_batch1.agg(
            F.collect_set(
                F.when(
                    F.col("op_type") == "vote",
                    F.pmod(
                        F.xxhash64(surrogate_id(vp["author"], vp["permlink"])),
                        F.lit(N_INDEX_BUCKETS),
                    ).cast("int"),
                )
            ).alias("b")
        ).first()["b"]
    )
    votes = classify(ops_batch1)["vote"]
    probe = {
        r["b"]
        for r in votes.select(
            F.pmod(
                F.xxhash64(surrogate_id("author", "permlink")),
                F.lit(N_INDEX_BUCKETS),
            )
            .cast("int")
            .alias("b")
        )
        .distinct()
        .collect()
    }
    assert folded == probe and folded


def test_process_batch_vote_buckets_matches_probe(spark, tmp_path, ops_batch1):
    """r14: process_batch skips the vote-path distinct+collect job
    when handed the batch's bucket set.  Both paths must produce
    byte-identical stores — including when the handed set is the
    FULL bucket range (a superset never drops an update: the probe
    filter is an optimization, membership decides nothing)."""
    from chain_sync_spark.sync.engine import N_INDEX_BUCKETS

    a = SyncEngine(spark, str(tmp_path / "a"))
    a.process_batch(ops_batch1)  # probe path (no buckets handed)
    b = SyncEngine(spark, str(tmp_path / "b"))
    b.process_batch(
        ops_batch1,
        type_counts={"comment": 4, "vote": 4},
        vote_buckets=list(range(N_INDEX_BUCKETS)),
    )

    def rows(store, sub):
        df = spark.read.parquet(f"{tmp_path}/{store}/{sub}")
        return sorted(repr(r) for r in df.select(sorted(df.columns)).collect())

    for sub in ("posts", "accounts"):
        assert rows("a", sub) == rows("b", sub), (
            f"{sub} diverged between probe and handed-bucket paths"
        )
