"""Known-answer tests for the pipeline-extras operators: the oracle
gate proves Spark==DuckDB on the testdata; these pin the semantics on
tiny literal fixtures — PII actually redacts, URL normalization folds
variants, repetition stuffing is flagged, a planted eval-set copy is
contaminated, and mixture weights invert the source shares."""

import pytest
from pyspark.sql import functions as F

from chain_sync_spark.operators import pipeline_extras as px


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


@pytest.fixture()
def extras_dir(spark, tmp_path):
    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    rows = [
        # doc_ids 0-4 are the frozen eval set (EVAL_DOCS_BELOW)
        (0, eval_text, "en", "srcA", len(eval_text)),
        (1, "one two three four five six seven", "en", "srcA", 33),
        (2, "red green blue yellow purple orange", "en", "srcA", 35),
        (3, "north south east west up down", "en", "srcB", 29),
        (4, "spring summer autumn winter solstice equinox", "en", "srcB", 44),
        # 5: verbatim copy of the eval doc → contaminated
        (5, eval_text, "en", "srcB", len(eval_text)),
        # 6: unrelated → clean
        (6, "unrelated words entirely fresh content here today", "en", "srcB", 49),
        # 7: keyword stuffing → repetition-flagged (7 = 0 mod 7 → email PII)
        (7, " ".join(["spam"] * 40) + " ham", "en", "srcB", 200),
    ]
    return _write_docs(spark, tmp_path, rows)


def test_pii_scrub_counts_and_redacts(spark, extras_dir):
    out = {r.doc_id: r for r in px.pii_scrub_documents(spark, extras_dir).collect()}
    assert out[7].n_emails == 1 and out[7].n_ipv4 == 0   # 7 % 7 == 0 → email
    assert out[0].n_emails == 1 and out[0].n_ipv4 == 1   # 0 hits both branches
    assert out[1].n_emails == 0 and out[1].n_ipv4 == 0
    # redaction fixpoint: scrubbing the scrubbed text changes nothing,
    # i.e. the scrub hash differs from the raw-augmented hash iff PII
    aug = px._pii_augmented(F.col("text"), F.col("doc_id"))
    raw = {
        r.doc_id: r.h
        for r in spark.read.parquet(f"{extras_dir}/documents.parquet")
        .select("doc_id", F.md5(aug).alias("h"))
        .collect()
    }
    assert out[1].scrub_hash == raw[1]      # nothing to scrub → unchanged
    assert out[7].scrub_hash != raw[7]      # email removed → hash moved


def test_url_normalization_folds_variants(spark, extras_dir):
    # doc 0 and 5 get the synthetic pair; https://Example.com/p/0/ and
    # http://www.example.com/p/0 normalize to the same key
    out = {r.url: r for r in px.url_extract_normalize(spark, extras_dir).collect()}
    assert set(out) == {"example.com/p/0", "example.com/p/2"}
    assert out["example.com/p/0"].n_mentions == 2 and out["example.com/p/0"].n_docs == 1
    assert out["example.com/p/2"].n_mentions == 2 and out["example.com/p/2"].n_docs == 1


def test_repetition_filter_flags_stuffed_doc(spark, extras_dir):
    out = {r.doc_id: r for r in px.quality_repetition_filter(spark, extras_dir).collect()}
    assert out[7].n_tokens == 41
    assert not out[7].keep                      # 40/41 'spam' → dropped
    assert out[7].top_ratio_micros == round(40 / 41 * 1e6)
    assert out[1].n_distinct == 7               # all-distinct doc


def test_contamination_flags_eval_copy_only(spark, extras_dir):
    out = {r.doc_id: r for r in px.contamination_ngram_overlap(spark, extras_dir).collect()}
    assert 5 in out and out[5].contaminated      # verbatim eval copy
    assert out[5].n_overlap == 12                # 14 words → 12 tri-grams
    assert 6 not in out and 7 not in out         # clean docs unflagged


def test_mixture_weights_invert_shares(spark, extras_dir):
    out = {r.source: r for r in px.domain_mixture_weights(spark, extras_dir).collect()}
    assert set(out) == {"srcA", "srcB"}
    tot = sum(r.n_tokens for r in out.values())
    for r in out.values():
        assert r.share_micros == round(r.n_tokens / tot * 1e6)
        assert r.weight_micros == round(tot / (2 * r.n_tokens) * 1e6)
        # weight * share == target share (0.5 for two sources)
        assert (r.weight_micros / 1e6) * (r.share_micros / 1e6) == pytest.approx(
            0.5, abs=1e-4
        )


def test_sequence_packing_invariants(spark):
    """Packing invariants on real testdata: offsets start inside the
    budget, advance by each doc's token count within a (shard, seq),
    and sequence ids are dense and non-decreasing in doc order."""
    out = (
        px.pack_training_sequences(spark, "/root/testdata/sf0.001")
        .orderBy("shard", "doc_id")
        .collect()
    )
    assert out, "empty packing"
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        cum = 0
        prev_seq = 0
        for r in rows:
            assert r.seq_in_shard == cum // px.PACK_BUDGET
            assert r.offset_in_seq == cum - r.seq_in_shard * px.PACK_BUDGET
            assert r.offset_in_seq < px.PACK_BUDGET     # docs start in-budget
            assert r.seq_in_shard >= prev_seq
            prev_seq = r.seq_in_shard
            cum += r.n_tok


def test_semantic_dedup_drops_near_identical_vector(spark, tmp_path):
    """Known-answer: a scaled copy of a vector (cosine 1.0) lands in
    the same LSH bucket and is dropped (greedy min-id); the opposite
    vector flips every hyperplane sign (different bucket) and an
    orthogonal vector scores cosine 0 — both survive."""
    dim = 64
    e1 = [1.0] + [0.0] * (dim - 1)
    v1 = [0.9] + [0.0] * (dim - 1)           # cos(e1, v1) = 1.0
    neg = [-1.0] + [0.0] * (dim - 1)         # cos = -1, bucket differs
    e2 = [0.0, 1.0] + [0.0] * (dim - 2)      # cos = 0
    rows = [(0, e1, 7), (1, v1, 7), (2, neg, 8), (3, e2, 9)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = px.dedup_embedding_semantic(spark, str(tmp_path)).collect()
    assert {r.vec_id for r in out} == {0, 2, 3}
    assert {r.vec_id: r.label for r in out} == {0: 7, 2: 8, 3: 9}


def test_cluster_canonical_prefers_quality_over_min_id(spark, tmp_path):
    """Known-answer: a 3-doc near-dup cluster where the LONGEST copy
    (highest composite quality) has the middle doc_id — the canonical
    pick must be quality-argmax, not the min-id the cluster label
    uses."""
    base = " ".join(f"tok{i:02d}" for i in range(40))
    rows = [
        (10, base, "en", "srcA", len(base)),
        (11, base + " extra01", "en", "srcA", len(base) + 8),  # best quality
        (12, base, "en", "srcB", len(base)),
        (99, "completely different words here now", "en", "srcB", 36),
    ]
    _write_docs(spark, tmp_path, rows)
    out = px.neardup_cluster_canonical(spark, str(tmp_path)).collect()
    from chain_sync_spark.operators import llm_pipeline as lp

    lp.release_caches()
    by_cluster = {r.cluster_id: r for r in out}
    assert 10 in by_cluster, f"expected cluster rooted at 10, got {by_cluster}"
    assert by_cluster[10].canonical_doc == 11
    assert by_cluster[10].cluster_size == 3


def test_dedup_token_spans_known_answer(spark, tmp_path):
    """Hand corpus pinning every span behavior: cross-doc duplication,
    adjacent-hit merging into one maximal span, two separated spans in
    one doc, WITHIN-doc repetition, short docs (< SD_N tokens, no
    shingles), and token-less docs (no ratio division)."""
    assert px.SD_N == 8  # fixture geometry assumes 8-token shingles
    c10 = " ".join(f"c{i}" for i in range(10))
    a8 = " ".join(f"a{i}" for i in range(8))
    b8 = " ".join(f"b{i}" for i in range(8))
    r8 = " ".join(f"r{i}" for i in range(8))
    m9 = " ".join(f"m{i}" for i in range(9))
    z9 = " ".join(f"z{i}" for i in range(9))
    w9 = " ".join(f"w{i}" for i in range(9))
    rows = [
        (1, c10, "en", "s", len(c10)),                    # whole doc duplicated
        (2, "u1 u2 " + c10, "en", "s", 1),                # shifted copy
        (3, f"{a8} {m9} {b8}", "en", "s", 1),             # two separated spans
        (4, f"{a8} {z9} {b8}", "en", "s", 1),             # the other side
        (5, f"{r8} {w9} {r8}", "en", "s", 1),             # within-doc repeat
        (6, "s1 s2 s3", "en", "s", 1),                    # too short to shingle
        (7, "!!!", "en", "s", 1),                         # normalizes to empty
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {
        r.doc_id: (r.n_tokens, r.n_spans, r.dup_tokens, r.dup_micros)
        for r in px.dedup_token_spans(spark, d).collect()
    }
    assert got == {
        1: (10, 1, 10, 1000000),   # hits at pos 0,1,2 merge into 0..9
        2: (12, 1, 10, 833333),    # round-half-up(10/12 * 1e6)
        3: (25, 2, 16, 640000),    # spans 0..7 and 17..24, gap 17 > SD_N
        4: (25, 2, 16, 640000),
        5: (25, 2, 16, 640000),    # same-hash shingle twice in ONE doc
        6: (3, 0, 0, 0),
        7: (0, 0, 0, 0),
    }


def test_dedup_span_cut_keep_first_known_answer(spark, tmp_path):
    """Keep-first cut on the span fixture: the globally-first
    occurrence of each duplicated shingle keeps its text (doc 1 and
    doc 3 stay whole), later occurrences are cut (doc 2 loses the
    shared run but keeps its unique prefix; doc 4 loses both shared
    runs; doc 5's SECOND within-doc copy is cut while the first
    stays), and short/empty docs pass through."""
    from hashlib import md5 as _md5

    def h(s):
        return _md5(s.encode()).hexdigest()

    c10 = " ".join(f"c{i}" for i in range(10))
    a8 = " ".join(f"a{i}" for i in range(8))
    b8 = " ".join(f"b{i}" for i in range(8))
    r8 = " ".join(f"r{i}" for i in range(8))
    m9 = " ".join(f"m{i}" for i in range(9))
    z9 = " ".join(f"z{i}" for i in range(9))
    w9 = " ".join(f"w{i}" for i in range(9))
    rows = [
        (1, c10, "en", "s", len(c10)),
        (2, "u1 u2 " + c10, "en", "s", 1),
        (3, f"{a8} {m9} {b8}", "en", "s", 1),
        (4, f"{a8} {z9} {b8}", "en", "s", 1),
        (5, f"{r8} {w9} {r8}", "en", "s", 1),
        (6, "s1 s2 s3", "en", "s", 1),
        (7, "!!!", "en", "s", 1),
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {
        r.doc_id: (r.n_tokens, r.cut_tokens, r.kept_md5)
        for r in px.dedup_span_cut(spark, d).collect()
    }
    assert got == {
        1: (10, 0, h(c10)),                      # first occurrence keeps
        2: (12, 10, h("u1 u2")),                 # later copy cut
        3: (25, 0, h(f"{a8} {m9} {b8}")),
        4: (25, 16, h(z9)),                      # both shared runs cut
        5: (25, 8, h(f"{r8} {w9}")),             # second within-doc copy cut
        6: (3, 0, h("s1 s2 s3")),
        7: (0, 0, h("")),
    }


def test_dedup_incremental_spans_history_wins(spark, tmp_path):
    """Rolling-crawl semantics: batch docs (doc_id % SPAN_BATCH_MOD
    == 0) cut exactly the intervals whose shingle exists in history;
    history docs are not in the output; batch-internal duplication is
    NOT cut (left to the full pass)."""
    from hashlib import md5 as _md5

    def h(s):
        return _md5(s.encode()).hexdigest()

    assert px.SPAN_BATCH_MOD == 5
    c10 = " ".join(f"c{i}" for i in range(10))
    q8 = " ".join(f"q{i}" for i in range(8))
    rows = [
        # history (ids not divisible by 5)
        (1, c10, "en", "s", 1),
        (2, "noise tokens only here", "en", "s", 1),
        # batch: 10 re-crawls history's run; 15 and 20 share q8 only
        # with EACH OTHER (batch-internal -> not cut)
        (10, "u1 u2 " + c10, "en", "s", 1),
        (15, q8, "en", "s", 1),
        (20, f"{q8} tail1 tail2", "en", "s", 1),
    ]
    d = _write_docs(spark, tmp_path, rows)
    got = {
        r.doc_id: (r.n_tokens, r.cut_tokens, r.kept_md5)
        for r in px.dedup_incremental_spans(spark, d).collect()
    }
    assert got == {
        10: (12, 10, h("u1 u2")),          # history run cut
        15: (8, 0, h(q8)),                 # batch-internal: kept
        20: (10, 0, h(f"{q8} tail1 tail2")),
    }


def _py_hash60(s: str) -> int:
    from hashlib import md5

    return int(md5(s.encode()).hexdigest()[:15], 16)


def test_winnow_guarantee_shared_run(spark, tmp_path):
    """The winnowing guarantee: two docs sharing a token run of
    exactly WN_W + WN_K - 1 tokens (one full shared window) ALWAYS
    share at least one fingerprint, regardless of alignment — here
    the shared run sits at different offsets in the two docs."""
    assert (px.WN_K, px.WN_W) == (4, 4)
    run7 = " ".join(f"s{i}" for i in range(7))
    rows = [
        (1, f"{run7} x1 x2 x3 x4 x5", "en", "s", 1),
        (2, f"y1 y2 y3 y4 {run7} y5 y6", "en", "s", 1),
        (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10", "en", "s", 1),
    ]
    d = _write_docs(spark, tmp_path, rows)
    docs = spark.read.parquet(f"{tmp_path}/documents.parquet").select(
        "doc_id", "text"
    )
    fps = {}
    for r in px.winnow_fingerprints(docs).collect():
        fps.setdefault(r.doc_id, set()).add(r.h)
    assert fps[1] & fps[2], "shared 7-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_neardup_winnow_pairs_matches_replica_random_batch(spark, tmp_path):
    """Random docs over a tiny vocabulary — fingerprint sets, the
    boilerplate cap, and the pair counts all equal a from-scratch
    replica of gram-hash -> full-window minima -> distinct -> df-cap
    -> pair join."""
    import random
    from collections import Counter

    rng = random.Random(59)
    vocab = [f"t{i}" for i in range(3)]
    rows, toks = [], {}
    for d in range(40):
        n = rng.randint(0, 60)
        ws = [rng.choice(vocab) for _ in range(n)]
        toks[d] = ws
        text = " ".join(ws)
        rows.append((d, text, "en", "s", len(text)))
    dpath = _write_docs(spark, tmp_path, rows)

    K, W = px.WN_K, px.WN_W
    fp = {}
    for d, ws in toks.items():
        g = [
            _py_hash60("wn:" + " ".join(ws[i : i + K]))
            for i in range(len(ws) - K + 1)
        ]
        fp[d] = {min(g[j : j + W]) for j in range(len(g) - W + 1)}
    df = Counter(h for s in fp.values() for h in s)
    fpc = {d: {h for h in s if df[h] <= px.WN_MAX_DF} for d, s in fp.items()}
    want = {}
    ids = sorted(fpc)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(fpc[a] & fpc[b])
            if shared >= px.WN_MIN_SHARED:
                want[(a, b)] = shared
    got = {
        (r.doc_a, r.doc_b): r.shared_fps
        for r in px.neardup_winnow_pairs(spark, dpath).collect()
    }
    assert got == want
    assert want, "fixture must actually produce candidate pairs"


def test_winnow_dup_clusters_matches_union_find_replica(spark, tmp_path):
    """Random dense docs — the connected components over the winnow
    pair graph equal a from-scratch union-find over the replica's
    pairs: same membership, min-id labels, sizes, canonical flags;
    docs without edges stay absent."""
    import random
    from collections import Counter

    rng = random.Random(61)
    # two disjoint vocabularies → cross-group edges are impossible, so
    # the graph has >= 2 components and label separation is exercised
    vocabs = ([f"t{i}" for i in range(3)], [f"u{i}" for i in range(3)])
    rows, toks = [], {}
    for d in range(40):
        vocab = vocabs[d % 2]
        n = rng.randint(0, 60)
        ws = [rng.choice(vocab) for _ in range(n)]
        toks[d] = ws
        text = " ".join(ws)
        rows.append((d, text, "en", "s", len(text)))
    dpath = _write_docs(spark, tmp_path, rows)

    K, W = px.WN_K, px.WN_W
    fp = {}
    for d, ws in toks.items():
        g = [
            _py_hash60("wn:" + " ".join(ws[i : i + K]))
            for i in range(len(ws) - K + 1)
        ]
        fp[d] = {min(g[j : j + W]) for j in range(len(g) - W + 1)}
    df = Counter(h for s in fp.values() for h in s)
    fpc = {d: {h for h in s if df[h] <= px.WN_MAX_DF} for d, s in fp.items()}
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(fpc)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if len(fpc[a] & fpc[b]) >= px.WN_MIN_SHARED:
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for d in parent:
        comp.setdefault(find(d), set()).add(d)
    want = {
        d: (min(members), len(members), d == min(members))
        for members in comp.values()
        for d in members
    }
    got = {
        r.doc_id: (r.cluster_id, r.cluster_size, r.is_canonical)
        for r in px.winnow_dup_clusters(spark, dpath).collect()
    }
    assert got == want
    assert len({c for c, _, _ in want.values()}) >= 2, "need >1 component"


def test_source_overlap_matrix_containment_asymmetry(spark, tmp_path):
    """Known answer: source s2 holds exactly one of s1's two disjoint
    documents, so fp(s2) ⊂ fp(s1): containment s2→s1 is exactly
    1.0 (1_000_000 micros) while s1→s2 is the strict subset ratio —
    the asymmetry that identifies WHICH source is the near-subset.
    Totals are pinned against the pure-python winnowing replica; a
    disjoint third source never appears."""
    import random

    rng = random.Random(17)
    t1 = " ".join(f"a{i}" for i in range(20))
    t2 = " ".join(f"b{i}" for i in range(25))
    t3 = " ".join(f"c{i}" for i in range(20))
    dpath = _write_docs(spark, tmp_path, [
        (1, t1, "en", "s1", len(t1)),
        (2, t2, "en", "s1", len(t2)),
        (3, t1, "en", "s2", len(t1)),
        (4, t3, "en", "s3", len(t3)),
    ])

    K, W = px.WN_K, px.WN_W

    def fps(text):
        ws = text.split(" ")
        g = [
            _py_hash60("wn:" + " ".join(ws[i : i + K]))
            for i in range(len(ws) - K + 1)
        ]
        return {min(g[j : j + W]) for j in range(len(g) - W + 1)}

    f1, f2 = fps(t1), fps(t2)
    assert not f1 & f2  # disjoint vocabularies -> disjoint fingerprints
    n1, n12 = len(f1), len(f1 | f2)
    got = {
        (r.src_a, r.src_b): (r.shared_fps, r.a_fps, r.contain_micros)
        for r in px.source_overlap_matrix(spark, dpath).collect()
    }
    micros = lambda num, den: (num * 2_000_000 + den) // (2 * den)  # noqa: E731
    assert got == {
        ("s2", "s1"): (n1, n1, 1_000_000),
        ("s1", "s2"): (n1, n12, micros(n1, n12)),
    }
    assert got[("s1", "s2")][2] < 1_000_000  # strict-subset asymmetry
