"""Sketch / fingerprint primitives for the LLM-data-pipeline operators.

Everything here is pure Catalyst column expressions (no Python UDFs):
normalization, shingling, MinHash signatures, SimHash fingerprints,
and a portable 60-bit hash that produces bit-identical values in
Spark and DuckDB — the cross-engine contract the oracle checks rely
on:

    Spark :  conv(substr(md5(x), 1, 15), 16, 10)   (cast to long)
    DuckDB:  ('0x' || substr(md5(x), 1, 15))::BIGINT

Both take the top 60 bits of the md5 hex digest, so minima, band
buckets and bit arithmetic agree across engines. For MinHash we go
one step simpler: the *hex digest string itself* is uniform and
totally ordered, so per-seed minima over md5 strings are engine-
independent without any numeric conversion.

Design for 100 TB: every function here is embarrassingly parallel
per-row column work (whole-stage codegen, no shuffle). The shuffles
happen only in the candidate-pair joins built on top (band-bucket
self-joins — never all-pairs), see operators/llm_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Portable hashing
# ---------------------------------------------------------------------------

HASH_BITS = 60  # 15 hex chars of md5 — fits a BIGINT in both engines


def hash60(c: Column) -> Column:
    """Portable 60-bit integer hash of a string column."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """DuckDB rendering of the same 60-bit hash."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


# ---------------------------------------------------------------------------
# Text normalization / tokenization
# ---------------------------------------------------------------------------

def normalize_text(c: Column) -> Column:
    """lowercase, strip non-alphanumerics, collapse runs of spaces."""
    t = F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(t, " +", " "))


NORMALIZE_SQL = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)


def words(c: Column) -> Column:
    """Whitespace tokens of a normalized text column (no empties)."""
    return F.filter(F.split(c, " "), lambda t: t != "")


WORDS_SQL = "list_filter(string_split({c}, ' '), t -> t <> '')"


def bind1(col: Column, f) -> Column:
    """Evaluate ``col`` ONCE per row and pass it to ``f`` as a bound
    lambda variable. Use whenever a COMPUTED expression feeds a
    helper that references its argument inside per-element lambdas
    (word_shingles, char_ngrams, segmenters): each reference embeds a
    full COPY of the argument tree at build time, and higher-order
    lambdas evaluate free-variable copies once per ELEMENT — measured
    20x on contamination_ngram_overlap and 16x on
    dedup_segment_rewrite. The transform-over-1-element-array is the
    binding; no Catalyst rule re-inlines through it. Raw column
    attributes don't need this; aliased columns behind a Project are
    protected only by CollapseProject's repeated-reference guard,
    which is fragile — prefer bind1 for any non-attribute input."""
    return F.transform(F.array(col), lambda x: f(x))[0]


def word_shingles(w: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; empty array when < n words.
    1-based indices to mirror the DuckDB rendering exactly.

    The input is bound ONCE per row through bind1 (round-5 migration):
    the body references its token array n+2 times, and each reference
    to a COMPUTED input expression would otherwise embed a copy that
    higher-order lambdas re-evaluate per shingle ELEMENT (the round-4
    trap measured at 12-20x on dedup_segment_rewrite/contamination).
    Binding internally makes every call site safe; value-identity is
    guarded by tests/test_properties.py."""
    return bind1(w, lambda ww: _word_shingles_bound(ww, n))


def _word_shingles_bound(w: Column, n: int) -> Column:
    """Body over an already-bound (lambda-variable) token array."""
    gram = lambda j: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(w, j + i) for i in range(n)]
    )
    return F.when(
        F.size(w) >= n,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), F.size(w) - (n - 1)), gram)
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles_sql(w: str, n: int = 3) -> str:
    gram = " || ' ' || ".join(f"{w}[j + {i}]" for i in range(n))
    return (
        f"CASE WHEN len({w}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len({w}) - {n - 2}), j -> {gram})) "
        f"ELSE [] END"
    )


def word_ngrams_all(w: Column, n: int) -> Column:
    """ALL word n-gram occurrences, position order, duplicates kept —
    the counting companion to ``word_shingles`` (which is distinct by
    construction and therefore blind to repetition). Empty array when
    < n words. Input bound once per row via bind1 — same rationale
    and guard as word_shingles."""
    return bind1(w, lambda ww: _word_ngrams_all_bound(ww, n))


def _word_ngrams_all_bound(w: Column, n: int) -> Column:
    gram = lambda j: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(w, j + i) for i in range(n)]
    )
    return F.when(
        F.size(w) >= n,
        F.transform(F.sequence(F.lit(1), F.size(w) - (n - 1)), gram),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams_all_sql(w: str, n: int) -> str:
    gram = " || ' ' || ".join(f"{w}[j + {i}]" for i in range(n))
    return (
        f"CASE WHEN len({w}) >= {n} THEN "
        f"list_transform(range(1, len({w}) - {n - 2}), j -> {gram}) "
        f"ELSE [] END"
    )


def char_ngrams(t: Column, n: int = 4) -> Column:
    """Distinct character n-grams of a normalized text column.
    Input bound once per row via bind1 — same rationale and guard as
    word_shingles."""
    return bind1(t, lambda tt: _char_ngrams_bound(tt, n))


def _char_ngrams_bound(t: Column, n: int) -> Column:
    return F.when(
        F.length(t) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(t) - (n - 1)),
                lambda i: F.substring(t, i, n),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams_sql(t: str, n: int = 4) -> str:
    return (
        f"CASE WHEN length({t}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, length({t}) - {n - 2}), i -> substr({t}, i, {n}))) "
        f"ELSE [] END"
    )


# ---------------------------------------------------------------------------
# MinHash — numeric, one md5 per shingle
# ---------------------------------------------------------------------------
# One portable 31-bit base hash per shingle; the k signatures are
# affine transforms (a_i·h + b_i) mod M of that base hash (the
# standard universal-hash family), so signature cost is k multiply-
# adds per shingle instead of k md5 calls. All arithmetic stays below
# 2^62, so BIGINT math agrees across engines.

MINHASH_MOD = 2_147_483_647  # 2^31 - 1 (prime)
_MASK31 = 0x7FFFFFFF


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs derived from md5 — shared by
    the Spark plan and the oracle SQL."""
    import hashlib

    out = []
    for i in range(k):
        a = int.from_bytes(hashlib.md5(f"mh-a{i}".encode()).digest()[:4], "big")
        b = int.from_bytes(hashlib.md5(f"mh-b{i}".encode()).digest()[:4], "big")
        out.append((a % (MINHASH_MOD - 1) + 1, b % MINHASH_MOD))
    return out


def base_hash31(shingles: Column) -> Column:
    """array<string> shingles → array<long> 31-bit base hashes."""
    return F.transform(shingles, lambda s: hash60(s).bitwiseAND(F.lit(_MASK31)))


def base_hash31_sql(shingles: str) -> str:
    return f"list_transform({shingles}, s -> {hash60_sql('s')} & {_MASK31})"


def minhash_sigs(shingles: Column, k: int) -> Column:
    """All k MinHash signatures in ONE fold over the shingle array:
    the accumulator is the array of running minima, updated per
    shingle with the k affine hashes. Single pass, single base-hash
    evaluation, pure codegen."""
    coeffs = minhash_coeffs(k)
    a_lit = F.array(*[F.lit(a) for a, _ in coeffs])
    b_lit = F.array(*[F.lit(b) for _, b in coeffs])

    def merge(acc: Column, h: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.lit(k)),
            lambda i: F.least(
                F.element_at(acc, i),
                (h * F.element_at(a_lit, i) + F.element_at(b_lit, i)) % F.lit(MINHASH_MOD),
            ),
        )

    init = F.array_repeat(F.lit(MINHASH_MOD).cast("long"), k)
    return F.aggregate(base_hash31(shingles), init, merge)


def minhash_sig_sql(shingles: str, a: int, b: int) -> str:
    """One signature's oracle rendering (DuckDB recomputes the base
    hashes per signature — fine at oracle scale)."""
    return (
        f"list_min(list_transform({base_hash31_sql(shingles)},"
        f" x -> (x * {a} + {b}) % {MINHASH_MOD}))"
    )


# ---------------------------------------------------------------------------
# SimHash (60-bit, term-frequency weighted)
# ---------------------------------------------------------------------------
# The bit-shift-by-lambda-variable forms only exist in SQL (the Python
# wrappers take int shift amounts), so the fingerprint is authored as
# a SQL expression over a named tokens column — still a single
# codegen'd Catalyst expression, no UDF, no shuffle.

# The per-token hash is hoisted into its own transform (tokens →
# hashes) so the bit fold consumes precomputed bigints: without the
# hoist, md5(t) is referenced inside the per-bit lambda — up to
# HASH_BITS hash references per token riding on Catalyst subexpression
# elimination (measured as the slowest sketch before the hoist).
_SIMHASH_EXPR = f"""
aggregate(
  zip_with(
    aggregate(
      transform({{toks}}, t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint)),
      array_repeat(0L, {HASH_BITS}),
      (acc, h) -> zip_with(
        acc,
        transform(
          sequence(0, {HASH_BITS - 1}),
          b -> IF((h >> b) & 1 = 1, 1L, -1L)
        ),
        (x, y) -> x + y
      )
    ),
    sequence(0, {HASH_BITS - 1}),
    (c, b) -> IF(c > 0, shiftleft(1L, cast(b as int)), 0L)
  ),
  0L,
  (s, v) -> s + v
)
"""


def simhash60(toks_col_name: str) -> Column:
    """60-bit SimHash fingerprint of a tokens (array<string>) column:
    per token, each hash bit votes +1/-1; positive bit-sums set the
    fingerprint bit. Token multiplicity counts (tf-weighted)."""
    return F.expr(_SIMHASH_EXPR.format(toks=toks_col_name))


def simhash60_sql(docs_cte: str, toks: str) -> str:
    """DuckDB rendering via explode + two grouped aggregations (the
    set semantics match the Spark fold exactly)."""
    return f"""
    sh_toks AS (
      SELECT doc_id, unnest({toks}) AS tok FROM {docs_cte}
    ),
    sh_hashed AS (
      SELECT doc_id, {hash60_sql('tok')} AS h FROM sh_toks
    ),
    sh_bits AS (
      SELECT doc_id, bb.b AS b,
             SUM(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM sh_hashed, (SELECT unnest(range(0, {HASH_BITS})) AS b) bb
      GROUP BY 1, 2
    ),
    sh_fp AS (
      SELECT doc_id,
             SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS fingerprint
      FROM sh_bits GROUP BY 1
    )"""


# ---------------------------------------------------------------------------
# Embedding vector math
# ---------------------------------------------------------------------------

def vec_double(c: Column) -> Column:
    """array<float> → array<double> (all math runs in double)."""
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double fold — same order DuckDB's
    list_sum uses, so rounded results agree cross-engine."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def floor_round(c: Column, digits: int) -> Column:
    """Tie-safe fixed-digit rounding: floor(x·10^d + 0.5)/10^d.
    ``round()`` half-tie rules differ across engines (Spark HALF_UP,
    DuckDB HALF_EVEN on doubles), and ratios of small integers CAN
    land on exact representable half-ties (1/128 at 6 dp); ``floor``
    is defined identically everywhere. Use this for any rounded
    integer-ratio output; irrational-valued scores (cosines) cannot
    tie and may keep plain round()."""
    m = 10 ** digits
    return F.floor(c * m + F.lit(0.5)) / m


def floor_round_sql(expr: str, digits: int) -> str:
    """DuckDB rendering of the same tie-safe rounding."""
    m = 10 ** digits
    return f"FLOOR(({expr}) * {m} + 0.5) / {m}"


def ratio_micros(num: str, den: str, digits: int = 6) -> Column:
    """Fixed-point ratio of two positive integer SQL expressions as
    BIGINT micro-units: round-half-up(num/den * 10^digits) computed in
    PURE integer arithmetic — floor((num·10^d·2 + den) / (2·den)) via
    integral ``div``, so no floating point ever forms and the value is
    identical on every engine version regardless of float formatting,
    HALF_UP/HALF_EVEN rules, or integer-widening pandas coercions.

    This is the round-5 output contract for engine-computed ratios at
    the query boundary (VERDICT r4: DOUBLE ratio outputs cost 6 driver
    rows): emit ``*_micros BIGINT`` and derive keep/flag booleans from
    the integer.  Overflow bound: num < 2^63 / (2·10^d) ≈ 4.6e12 at
    d=6 — per-GROUP numerators (per-doc/per-source token counts), not
    corpus totals; production at larger grains widens to DECIMAL(38,0).

    Takes SQL strings (not Columns) because integral division is only
    exposed as the SQL ``div`` operator; callers pass post-aggregation
    column names."""
    m = 10 ** digits
    return F.expr(f"(({num}) * {m} * 2 + ({den})) div (({den}) * 2)")


def ratio_micros_sql(num: str, den: str, digits: int = 6) -> str:
    """DuckDB rendering of the same integer fixed-point ratio.  ``//``
    is DuckDB's floor division; the CAST collapses HUGEINT (DuckDB
    widens integer SUM operands) back to BIGINT so pandas dtype
    coercion matches Spark's long."""
    m = 10 ** digits
    return f"CAST((({num}) * {m} * 2 + ({den})) // ((({den})) * 2) AS BIGINT)"


def cos_prenorm(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine from PREcomputed L2 norms — bit-identical association to
    ``cosine()`` (dot / (na * nb)), for join sites where the norms
    were hoisted out of the per-pair expression (materialized through
    a shuffle exchange or a broadcast build)."""
    return dot(a, b) / (na * nb)


def round_sim(c: Column, digits: int = 4) -> Column:
    """round(x, digits) with NEGATIVE ZERO canonicalized to +0.0 —
    ``+ 0.0`` is the IEEE identity that rewrites ONLY -0.0.  A
    noise-magnitude similarity (near-orthogonal cosine) can land on
    opposite sides of 0 in Spark's vs DuckDB's float summation, and
    the driver canon treats -0.0 and 0.0 as DIFFERENT values: found
    live at sf0.1 (embedding_ann_multiprobe pair 276/1232 — Spark
    0.0, DuckDB -0.0 — in an otherwise identical 8777-pair set).
    Pair with :func:`round_sim_sql` on the oracle side."""
    return F.round(c, digits) + F.lit(0.0)


def round_sim_sql(expr: str, digits: int = 4) -> str:
    """Oracle-side twin of :func:`round_sim`."""
    return f"(round({expr}, {digits}) + 0.0)"


def dot_sql(a: str, b: str) -> str:
    return f"list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"


def cosine_sql(a: str, b: str) -> str:
    norm = lambda v: f"sqrt(list_sum(list_transform({v}, x -> x::DOUBLE * x::DOUBLE)))"  # noqa: E731
    return f"({dot_sql(a, b)} / ({norm(a)} * {norm(b)}))"
