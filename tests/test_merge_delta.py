"""merge_delta backend adapter: the Delta-present path is exercised
only where delta-spark is installed (skip-if-unavailable); the merge
assignment construction — the piece that guarantees contract parity
with merge_parquet — is pure and tested everywhere."""

import pytest

from chain_sync_spark.sync.merge import (
    _merge_set_map,
    delta_available,
    keep_target,
    set_union,
)


def test_set_map_mirrors_parquet_merge_semantics(spark):
    m = _merge_set_map(
        target_cols=["post_id", "title", "upvotes", "only_in_target"],
        update_cols=["post_id", "title", "upvotes", "only_in_source"],
        key_cols=["post_id"],
        merge_exprs={"upvotes": set_union, "only_in_target": keep_target},
    )
    # keys never assigned; target-only columns implicitly preserved;
    # source-only columns are insert-path concerns, not UPDATE SET
    assert set(m) == {"title", "upvotes"}
    assert "coalesce(s.title, t.title)" in str(m["title"])      # take_source default
    assert "array_union" in str(m["upvotes"])                    # custom expr applied


@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
def test_merge_delta_end_to_end(spark, tmp_path):
    from chain_sync_spark.sync.merge import merge_delta

    path = str(tmp_path / "delta_posts")
    spark.createDataFrame(
        [(1, "old", ["a"])], "post_id long, title string, upvotes array<string>"
    ).write.format("delta").save(path)
    updates = spark.createDataFrame(
        [(1, "new", ["b"]), (2, "ins", ["c"])],
        "post_id long, title string, upvotes array<string>",
    )
    merge_delta(spark, path, updates, ["post_id"], {"upvotes": set_union})
    rows = {r.post_id: r for r in spark.read.format("delta").load(path).collect()}
    assert rows[1].title == "new" and sorted(rows[1].upvotes) == ["a", "b"]
    assert rows[2].title == "ins"
