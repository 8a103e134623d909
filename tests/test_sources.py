"""Source-stage parity tests: RPC request building/parsing + node
failover (S1/S2, listener.js:58-146) and paginated REST draining
(S8, handle_mutings.js:5-24), end-to-end into the sync engine."""

import json

import pytest

from chain_sync_spark.sources.paginated import fetch_all_pages, roles_snapshot
from chain_sync_spark.sources.rpc import (
    GET_OPS_METHOD,
    NodePool,
    build_block_requests,
    ops_from_rpc,
    parse_rpc_responses,
)


def _responses(start):
    """Two blocks: one with a comment+vote, one empty (P3 parity)."""
    return [
        {"id": 0, "result": [
            {"op": ["comment", {"author": "a", "permlink": "p",
                                "parent_author": "", "parent_permlink": "c",
                                "title": "t", "body": "b", "json_metadata": "{}"}],
             "timestamp": "2024-03-05T12:00:00"},
            {"op": ["vote", {"voter": "v", "author": "a", "permlink": "p",
                             "weight": 100}],
             "timestamp": "2024-03-05T12:00:01"},
        ]},
        {"id": 1, "result": []},
    ]


def test_build_block_requests_shape():
    reqs = build_block_requests(1000, 3)
    assert [r["params"][0] for r in reqs] == [1000, 1001, 1002]
    assert all(r["method"] == GET_OPS_METHOD and r["jsonrpc"] == "2.0" for r in reqs)
    assert [r["id"] for r in reqs] == [0, 1, 2]


def test_parse_rpc_responses_rows():
    rows = parse_rpc_responses(1000, _responses(1000))
    assert len(rows) == 2                      # empty block yields no rows
    assert rows[0][0] == 1000 and rows[0][2] == "comment"
    assert json.loads(rows[1][3])["voter"] == "v"


def test_parse_rpc_failed_block_raises():
    with pytest.raises(ValueError, match="failed block"):
        parse_rpc_responses(0, [{"id": 0, "result": None}])


def test_node_pool_failover_and_exhaustion():
    calls = []

    def flaky(node, payload):
        calls.append(node)
        if node != "good":
            raise ConnectionError(node)
        return _responses(0)

    pool = NodePool(["bad1", "bad2", "good"])
    out = pool.fetch(flaky, build_block_requests(0, 2))
    assert len(out) == 2
    assert calls == ["bad1", "bad2", "good"]
    assert pool.nodes == ["good"]              # failing nodes removed

    pool2 = NodePool(["bad1"])
    with pytest.raises(RuntimeError, match="no RPC nodes"):
        pool2.fetch(flaky, [])


def test_ops_from_rpc_feeds_engine(spark, tmp_path):
    from chain_sync_spark.sync.engine import SyncEngine
    ops = ops_from_rpc(spark, 1000, _responses(1000))
    eng = SyncEngine(spark, str(tmp_path))
    eng.run(ops, batch_size=10)
    posts = spark.read.parquet(f"{tmp_path}/posts").collect()
    assert len(posts) == 1 and posts[0]["upvotes"] == ["v"]


def test_paginated_drain_and_snapshot(spark):
    data = [(f"acct{i:03d}", "muted" if i % 3 == 0 else "member", "") for i in range(250)]

    def fetch_page(cursor):
        after = [r for r in data if r[0] > cursor]
        return after[:100]

    rows = fetch_all_pages(fetch_page)
    assert len(rows) == 250                    # 100 + 100 + 50 + empty
    assert rows == sorted(data)

    snap = roles_snapshot(spark, lambda c: [r[:2] for r in fetch_page(c)])
    assert snap.count() == 250
    assert snap.filter("role = 'muted'").count() == len([r for r in data if r[1] == "muted"])


def test_paginated_never_drains_guard():
    with pytest.raises(RuntimeError, match="did not drain"):
        fetch_all_pages(lambda c: [("same", "x")], max_pages=5)
