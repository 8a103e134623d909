"""Z-order layout: per-file min/max footer ranges must tighten on
EVERY clustered column versus a hash-shuffled layout — the property
parquet readers turn into file/row-group skipping at scale."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from chain_sync_spark.operators.layout import interleave_bits, zorder_layout
from chain_sync_spark.tables import table

SF_DIR = "/root/testdata/sf0.001"


def _span_sum(path_glob, colname):
    """Sum over files of (file max - file min) / global range for one
    column — lower is tighter; a random layout scores ~n_files."""
    stats = []
    for p in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(p).metadata
        names = [md.row_group(0).column(i).path_in_schema for i in range(md.num_columns)]
        ci = names.index(colname)
        mns, mxs = [], []
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(ci).statistics
            mns.append(s.min)
            mxs.append(s.max)
        stats.append((min(mns), max(mxs)))
    gmin = min(s[0] for s in stats)
    gmax = max(s[1] for s in stats)
    rng = (gmax - gmin) or 1
    return sum((mx - mn) / rng for mn, mx in stats)


def test_interleave_bits_orders_by_morton_curve(spark):
    # (x, y) pairs on a 4x4 grid with 2 bits: the Morton key of (3, 3)
    # is 15, (0, 0) is 0, and (1, 0) < (0, 1) < (1, 1)
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 3)], "x long, y long"
    ).withColumn("z", interleave_bits([F.col("x"), F.col("y")], bits=2))
    z = {(r.x, r.y): r.z for r in df.collect()}
    assert z[(0, 0)] == 0
    assert z[(3, 3)] == 15
    assert z[(1, 0)] == 1 and z[(0, 1)] == 2 and z[(1, 1)] == 3


def test_zorder_tightens_file_stats_on_both_columns(spark, tmp_path):
    orders = table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_files = 8
    plain_dir = str(tmp_path / "plain")
    z_dir = str(tmp_path / "zorder")
    # baseline: content-agnostic hash shuffle (what an unsorted ETL
    # write produces) — every file spans ~the full value range
    orders.repartition(n_files).write.mode("overwrite").parquet(plain_dir)
    zorder_layout(orders, ["o_custkey", "o_totalprice"], num_files=n_files).write.mode(
        "overwrite"
    ).parquet(z_dir)

    for col in ["o_custkey", "o_totalprice"]:
        plain = _span_sum(f"{plain_dir}/part-*.parquet", col)
        z = _span_sum(f"{z_dir}/part-*.parquet", col)
        # hash layout: every file spans ~full range (score ≈ n_files);
        # 2-col z-order: each file covers ~1/sqrt(n_files) per column
        assert z < 0.6 * plain, f"{col}: zorder {z:.2f} vs plain {plain:.2f}"

    # layout change must not change content
    back = spark.read.parquet(z_dir)
    assert back.count() == orders.count()
    assert sorted(back.columns) == sorted(orders.columns)


def test_zorder_handles_timestamp_columns(spark, tmp_path):
    events = table(spark, SF_DIR, "events").select("event_id", "ts", "user_id")
    out = str(tmp_path / "events_z")
    zorder_layout(events, ["ts", "user_id"], num_files=4).write.mode(
        "overwrite"
    ).parquet(out)
    assert spark.read.parquet(out).count() == events.count()
    assert _span_sum(f"{out}/part-*.parquet", "user_id") < 3.0


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=16,
        unique=True,
    )
)
def test_interleave_bits_matches_reference_morton(spark, pairs):
    """Property: the column expression equals the arithmetic Morton
    definition for arbitrary in-range inputs (hence injective)."""
    df = spark.createDataFrame(pairs, "x long, y long").withColumn(
        "z", interleave_bits([F.col("x"), F.col("y")], bits=8)
    )

    def morton(x, y):
        return sum(
            (((x >> b) & 1) << (2 * b)) | (((y >> b) & 1) << (2 * b + 1))
            for b in range(8)
        )

    for r in df.collect():
        assert r.z == morton(r.x, r.y)


def test_interleave_bits_guards_sign_bit(spark):
    # 4 cols x 16 bits = 64 key bits would flip the long's sign and
    # wrap Morton keys negative — must refuse loudly
    cols = [F.col(c) for c in "abcd"]
    with pytest.raises(ValueError, match="sign bit"):
        interleave_bits(cols, bits=16)
    # 4 x 15 = 60 bits is fine
    interleave_bits(cols, bits=15)


def test_zorder_auto_reduces_bits_for_wide_column_sets(spark, tmp_path):
    # default bits=16 with 4 columns must not raise (auto-reduced to
    # 15) and must produce non-negative keys end to end
    df = spark.createDataFrame(
        [(i, i * 3 % 17, i * 7 % 13, i * 11 % 19) for i in range(200)],
        "a long, b long, c long, d long",
    )
    out = zorder_layout(df, ["a", "b", "c", "d"], num_files=4)
    assert out.count() == 200
    key = out.withColumn(
        "z",
        interleave_bits([F.col(c) for c in ["a", "b", "c", "d"]], bits=15),
    )
    assert key.filter(F.col("z") < 0).count() == 0
