"""The sharded training-data exporter: layout contract (one ordered
parquet file per shard under shard=K), determinism across reruns, and
a manifest that accounts for every document exactly once."""

import glob

import pyarrow.parquet as pq

from chain_sync_spark.operators.export import write_training_shards
from chain_sync_spark.operators.pipeline_extras import PACK_SHARDS
from chain_sync_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_export_layout_order_and_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    manifest = write_training_shards(spark, SF, out).collect()

    n_docs = table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in manifest) == n_docs
    assert {r.shard for r in manifest} <= set(range(PACK_SHARDS))

    shard_dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert len(shard_dirs) == len(manifest)
    for d in shard_dirs:
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        # one writer task per shard -> one ordered file per shard
        assert len(files) == 1, d
        t = pq.read_table(files[0]).to_pydict()
        order = list(zip(t["seq_in_shard"], t["offset_in_seq"]))
        assert order == sorted(order), f"unordered rows in {d}"


def test_export_is_deterministic_across_reruns(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(spark, SF, a).collect()
    write_training_shards(spark, SF, b).collect()
    for d in sorted(glob.glob(f"{a}/shard=*")):
        fa = glob.glob(f"{d}/*.parquet")[0]
        fb = glob.glob(f"{b}/{d.rsplit('/',1)[1]}/*.parquet")[0]
        ta = pq.read_table(fa).to_pydict()
        tb = pq.read_table(fb).to_pydict()
        assert ta == tb, d
