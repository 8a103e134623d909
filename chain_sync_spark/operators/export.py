"""Training-data export: materialize packed sequences as sharded
parquet a trainer can stream in order.

This is the sink side of pipeline_extras.pack_training_sequences —
the step that turns the (doc -> shard, seq, offset) assignment into
bytes on disk. The layout contract consumers rely on:

  out_dir/shard=K/part-*.parquet   one file per shard, rows ordered
                                   by (seq_in_shard, offset_in_seq)

Order inside a parquet file is the file's row order, and a single
writing task preserves its sort, so each shard is written by exactly
ONE task (repartition on the shard column; PACK_SHARDS partitions)
after an in-partition sort. At 100 TB the same plan holds with
thousands of shards — one writer task per shard is exactly how
production exporters bound both file counts and trainer-side merge
work, and the shard column prunes reads (a data-parallel trainer
rank opens only its own shard directories).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chain_sync_spark.tables import table


def write_training_shards(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> DataFrame:
    """Write the packed corpus as ordered per-shard parquet under
    ``out_dir`` and return the manifest (one row per shard: sequence
    and document counts, token total) — the summary a training job
    reads to size its data loader. The write is deterministic: the
    pack assignment is hash-keyed and the in-shard sort total, so
    re-running produces byte-identical shard contents."""
    from chain_sync_spark.operators.pipeline_extras import (
        PACK_SHARDS,
        pack_training_sequences,
    )

    packed = pack_training_sequences(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = packed.join(docs, "doc_id")
    # doc_id closes the sort key: zero-token documents share the same
    # (seq_in_shard, offset_in_seq), and a non-total key would leave
    # their relative order to the shuffle — breaking the byte-identical
    # rerun contract exactly on such inputs
    (
        rows.repartition(PACK_SHARDS, "shard")
        .sortWithinPartitions("shard", "seq_in_shard", "offset_in_seq", "doc_id")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(out_dir)
    )
    manifest = (
        spark.read.parquet(out_dir)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.max("seq_in_shard") + 1).alias("n_seqs"),
            F.sum("n_tok").alias("total_tokens"),
        )
        .orderBy("shard")
    )
    return manifest
