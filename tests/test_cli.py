"""CLI entry point (python -m chain_sync_spark) — the analog of the
reference's `node listener.js` command line (config.js:31-40)."""

import pytest
from chain_sync_spark.__main__ import main


def test_cli_list_prints_all_queries(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "tpch_q1_pricing_summary" in out
    assert len(out) >= 100


def test_cli_run_and_explain(spark, capsys):
    # spark fixture already holds the session; get_spark reuses it
    assert main(["run", "sort_limit_top_orders", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out
    assert "o_orderkey" in out or "+" in out
    assert main(["explain", "sort_limit_top_orders", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_cli_unknown_query_errors(spark):
    assert main(["run", "no_such_query"]) == 2


def test_cli_sql(spark, capsys):
    assert main(["sql", "SELECT count(*) AS n FROM orders", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    assert "n" in capsys.readouterr().out


@pytest.mark.slow
def test_cli_sync_runs_engine_round(spark, tmp_path, capsys):
    store = str(tmp_path / "store")
    assert main(["sync", "--store", store, "--blocks", "12", "--batch", "12"]) == 0
    out = capsys.readouterr().out
    assert store in out
    posts = spark.read.parquet(f"{store}/posts")
    assert posts.count() > 0
