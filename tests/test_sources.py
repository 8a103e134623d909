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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Live-socket transport: S1/S2/S8 over a real local HTTP server
# ---------------------------------------------------------------------------

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from chain_sync_spark.sources.blocks import OP_STREAM_SCHEMA
from chain_sync_spark.sources.rpc import http_transport, json_rpc_call


class _RpcHandler(BaseHTTPRequestHandler):
    """Answers JSON-RPC batches the way a block-ops node does: one
    op per requested block; the roles method pages 2 rows at a time."""

    fail = False
    roles = [(f"acct{i:02d}", "muted" if i % 3 == 0 else "member") for i in range(5)]

    def do_POST(self):
        if self.fail:
            self.send_response(500)
            self.end_headers()
            return
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        out = []
        for req in body:
            if req["method"] == "condenser_api.get_ops_in_block":
                block = req["params"][0]
                out.append({
                    "id": req["id"],
                    "result": [{
                        "timestamp": "2024-03-05T12:00:00",
                        "op": ["vote", {"voter": f"u{block}", "author": "a",
                                        "permlink": f"p{block}", "weight": 100}],
                    }],
                })
            elif req["method"] == "bridge.list_community_roles":
                last = req["params"][1]
                names = [r[0] for r in self.roles]
                start = names.index(last) + 1 if last else 0
                out.append({"id": req["id"],
                            "result": self.roles[start:start + 2]})
            else:
                out.append({"id": req["id"], "error": "unknown method"})
        payload = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *args):  # keep pytest output clean
        pass


class _FailHandler(_RpcHandler):
    fail = True


@pytest.fixture()
def rpc_servers():
    """One healthy and one always-500 local node."""
    servers = []
    urls = []
    for handler in (_FailHandler, _RpcHandler):
        srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        urls.append(f"http://127.0.0.1:{srv.server_address[1]}/")
    yield urls  # [bad, good]
    for srv in servers:
        srv.shutdown()
        srv.server_close()


def test_http_transport_end_to_end_with_failover(spark, rpc_servers):
    """S1+S2 over real sockets: the pool tries the 500-node, drops it,
    and the healthy node's batch response flows through parse →
    DataFrame with the exact op-stream schema."""
    bad, good = rpc_servers
    pool = NodePool([bad, good])
    payload = build_block_requests(start_block=7, n_blocks=3)
    responses = pool.fetch(http_transport(timeout=5.0), payload)
    assert pool.nodes == [good]  # failing node dropped over the wire
    df = ops_from_rpc(spark, 7, responses)
    rows = {r["block_num"]: r for r in df.collect()}
    assert sorted(rows) == [7, 8, 9]
    assert json.loads(rows[8]["op"])["voter"] == "u8"
    assert df.schema.simpleString() == spark.createDataFrame(
        [], OP_STREAM_SCHEMA
    ).schema.simpleString()


def test_http_transport_exhausted_pool_raises(rpc_servers):
    bad, _ = rpc_servers
    pool = NodePool([bad])
    with pytest.raises(RuntimeError, match="no RPC nodes left"):
        pool.fetch(http_transport(timeout=5.0), build_block_requests(0, 1))


def test_paginated_roles_over_http(spark, rpc_servers):
    """S8 over real sockets: cursor pagination via repeated
    bridge.list_community_roles calls, 2 rows per page, drained into
    the roles snapshot."""
    _, good = rpc_servers

    def fetch_page(cursor):
        return [
            tuple(r)
            for r in json_rpc_call(
                good, "bridge.list_community_roles", ["comm", cursor, 2]
            )
        ]

    snap = roles_snapshot(spark, fetch_page)
    got = {r["account"]: r["role"] for r in snap.collect()}
    assert len(got) == 5
    assert got["acct00"] == "muted" and got["acct01"] == "member"
