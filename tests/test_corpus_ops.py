"""Known-answer tests for the corpus-preparation operators: the
oracle gate proves Spark==DuckDB on the testdata; these pin the
semantics on tiny literal fixtures — chunk offsets tile the text with
the right overlap, TF-IDF surfaces the rare repeated term, bigram
conditional probabilities sum to 1 per head, and incremental dedup
drops re-crawls through both the historical anti join and the
in-batch first-wins window."""

import hashlib

import pytest
from pyspark.sql import functions as F

from chain_sync_spark.operators import corpus_ops as co


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_chunking_tiles_with_overlap(spark, tmp_path):
    text = "x" * 199 + "Z"  # 200 chars, distinctive tail
    d = _write_docs(spark, tmp_path, [(1, text, "en", "s", len(text))])
    rows = sorted(
        co.chunk_documents_overlap(spark, d).collect(), key=lambda r: r.chunk_idx
    )
    # offsets tile by stride; substring clamps at end-of-text
    assert [(r.chunk_idx, r.chunk_off, r.chunk_len) for r in rows] == [
        (0, 0, 120),
        (1, 90, 110),
        (2, 180, 20),
    ]
    # md5 is of the actual substring (tail chunk includes the Z)
    tail = text[180:]
    assert rows[2].chunk_md5 == hashlib.md5(tail.encode()).hexdigest()
    # consecutive chunks overlap by window - stride characters
    assert rows[0].chunk_off + co.CHUNK_WINDOW - rows[1].chunk_off == (
        co.CHUNK_WINDOW - co.CHUNK_STRIDE
    )


def test_tfidf_prefers_rare_repeated_term(spark, tmp_path):
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "common zebra zebra zebra common", "en", "s", 31),
            (2, "common filler words here", "en", "s", 24),
            (3, "common other text body", "en", "s", 22),
        ],
    )
    out = co.tfidf_top_terms(spark, d)
    top = {r.doc_id: r for r in out.filter(F.col("rank") == 1).collect()}
    # 'zebra': tf=3, df=1 → score 3*4/2 = 6.0 beats 'common' (tf=2, df=3 → 2)
    assert top[1].term == "zebra"
    assert top[1].tf == 3 and top[1].df == 1
    assert top[1].score == pytest.approx(3 * (3 + 1) / (1 + 1))
    # every doc emits at most TFIDF_TOP_K rows
    counts = out.groupBy("doc_id").count().collect()
    assert all(r["count"] <= co.TFIDF_TOP_K for r in counts)


def test_bigram_lm_counts_and_probabilities(spark, tmp_path):
    d = _write_docs(
        spark,
        tmp_path,
        [(1, "a b a b c", "en", "s", 9), (2, "a b", "en", "s", 3)],
    )
    rows = {(r.w1, r.w2): r for r in co.ngram_lm_topk(spark, d).collect()}
    # bigrams: (a,b)x3, (b,a)x1, (b,c)x1
    assert rows[("a", "b")].cnt == 3 and rows[("a", "b")].cond_p == 1.0
    assert rows[("b", "a")].head_total == 2
    assert rows[("b", "a")].cond_p == pytest.approx(0.5)
    # conditional probabilities sum to 1 per head (K exceeds fanout here)
    by_head = {}
    for (w1, _), r in rows.items():
        by_head[w1] = by_head.get(w1, 0.0) + r.cond_p
    assert all(abs(total - 1.0) < 1e-12 for total in by_head.values())


def test_incremental_dedup_both_drop_paths(spark, tmp_path):
    rows = [
        (i, f"unique text number {i}", "en", "s", 20) for i in range(14)
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = co.dedup_incremental_batch(spark, d)
    got = sorted(r.doc_id for r in out.collect())
    # batch = fresh {0, 10} + re-crawls {100000 (copy of 0), 100007 (copy of 7)}
    # 100007 dies in the anti join (7 is historical);
    # 100000 dies in the in-batch window (0 is the first-wins survivor)
    assert got == [0, 10]
    md5s = {r.doc_id: r.content_md5 for r in out.collect()}
    assert md5s[0] == hashlib.md5(b"unique text number 0").hexdigest()


def test_incremental_neardup_flags_hist_and_inbatch_dups(spark, tmp_path):
    """Known-answer: a new doc duplicating a HISTORICAL doc is flagged
    against it; a new doc duplicating a smaller-id IN-BATCH doc is
    flagged against that; fresh texts pass through unique."""
    text_a = " ".join(f"alpha{i:02d}" for i in range(40))
    text_b = " ".join(f"beta{i:02d}" for i in range(40))
    text_c = " ".join(f"gamma{i:02d}" for i in range(40))
    rows = [
        (3, text_a, "en", "s", len(text_a)),    # historical original
        (5, text_a, "en", "s", len(text_a)),    # new: dup of hist 3
        (10, text_b, "en", "s", len(text_b)),   # new: first of its text
        (15, text_b, "en", "s", len(text_b)),   # new: dup of in-batch 10
        (20, text_c, "en", "s", len(text_c)),   # new: unique
        (7, "totally unrelated historical words here", "en", "s", 38),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: (r.is_dup, r.dup_of)
           for r in co.neardup_incremental_minhash(spark, d).collect()}
    from chain_sync_spark.operators import llm_pipeline as lp

    lp.release_caches()
    assert out == {
        5: (True, 3),
        10: (False, None),
        15: (True, 10),
        20: (False, None),
    }
