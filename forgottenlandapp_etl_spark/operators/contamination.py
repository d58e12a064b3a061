"""Benchmark decontamination for training corpora (SURVEY.md §7.6 family).

The standard eval-hygiene step an LLM data pipeline runs before training:
flag every corpus document that shares word-n-gram shingles with a held-out
benchmark/eval set, so contaminated documents can be dropped (or the overlap
audited) before the corpus ships.

Scale shape: the benchmark side is SMALL by construction (eval sets are
thousands of documents, the corpus is billions), so its distinct-shingle set
is broadcast — the corpus is scanned ONCE, shingled in a narrow map
(operators.dedup.shingles — explode, no shuffle), hit-tested against the
broadcast set with a hash lookup, and aggregated with a single shuffle on
doc_id. No corpus self-join, no second scan. At 100 TB this is the cheapest
possible shape: one pass + one keyed aggregation.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup

# --- Bloom-filter membership tier -----------------------------------------
# m = 2^16 bits packed into 32-bit words held in BIGINTs: shifts never
# exceed 2^31, so the bit math is overflow-free (and therefore identical)
# in both Spark and DuckDB. k = 4 universal hashes over the 31-bit
# token-hash domain, coefficients seeded so the generated DuckDB oracle
# shares the exact same filter (the MINHASH_COEFFS discipline,
# dedup.py:32-37).
BLOOM_BITS = 1 << 16
BLOOM_WORD = 32
# Seed mixes a module tag so the Bloom pairs are INDEPENDENT of
# sketches.CMS_COEFFS and dedup.MINHASH_COEFFS (which share the 1337
# stream): identical coefficient streams across operators would correlate
# their hash functions if the structures ever compose (r5 ADVICE finding).
# The generated DuckDB oracle reads this same constant, so the filter stays
# bit-identical cross-engine.
_rng = random.Random("bloom:1337")
BLOOM_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, dedup.MERSENNE_31), _rng.randrange(0, dedup.MERSENNE_31))
    for _ in range(4)
]


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    flag_threshold: float = 0.2,
) -> DataFrame:
    """Per-corpus-document shingle overlap with the benchmark set.

    Returns one row per corpus document that has at least ``n`` tokens:
    ``(id, n_shingles, n_contaminated, contaminated_frac, is_contaminated)``
    where ``n_contaminated`` counts the document's distinct n-gram shingles
    that appear anywhere in the benchmark, ``contaminated_frac`` is the
    int/int ratio (deterministic cross-engine), and ``is_contaminated`` is
    1 when the fraction reaches ``flag_threshold`` (int, not bool, for
    cross-engine hash stability).

    One broadcast left join + one groupBy(id): documents shorter than n
    tokens yield no shingles and are absent, mirroring the SQL
    generate_series emptiness of the oracle.
    """
    c_sh = dedup.shingles(corpus, id_col, text_col, n)
    b_sh = (
        dedup.shingles(benchmark, id_col, text_col, n)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    flagged = c_sh.join(F.broadcast(b_sh), "shingle", "left")
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("__hit").alias("n_contaminated"),
        (F.count("__hit").cast("double") / F.count(F.lit(1))).alias(
            "contaminated_frac"
        ),
        (
            (F.count("__hit").cast("double") / F.count(F.lit(1)))
            >= F.lit(flag_threshold)
        )
        .cast("int")
        .alias("is_contaminated"),
    )


def _bloom_positions(h: F.Column) -> list[F.Column]:
    """The k bit positions a token hash sets/probes: universal hash per
    coefficient pair, folded from the 31-bit domain onto the m-bit filter.
    All-positive BIGINT math — `%` agrees across engines."""
    return [
        ((F.lit(a) * h + F.lit(b)) % F.lit(dedup.MERSENNE_31)) % F.lit(BLOOM_BITS)
        for a, b in BLOOM_COEFFS
    ]


def bloom_bits(
    benchmark: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Build the benchmark's Bloom bitset as a ``(widx, w)`` relation:
    word index → 32-bit word (in a BIGINT) with the members' bits OR-ed in.

    At most ``BLOOM_BITS / BLOOM_WORD`` = 2048 rows ≈ 8 KB regardless of
    benchmark size — this relation IS the broadcast Bloom filter. Unlike
    the exact tier's distinct-shingle broadcast (contamination_overlap),
    its size is CONSTANT: a benchmark of a billion shingles still ships
    8 KB to every executor, at the price of a bounded false-positive rate
    (k=4, m=65536 → ~(1-e^{-kn/m})^k).
    """
    sh = dedup.shingles(benchmark, id_col, text_col, n).select("shingle").distinct()
    h = dedup.token_hash(F.col("shingle"))
    pos = sh.select(F.explode(F.array(*_bloom_positions(h))).alias("pos")).distinct()
    # shiftleft's bit count must be a column here, so the bit expressions are
    # SQL fragments (F.shiftleft the Python API takes only literal counts)
    word_bit = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD} AS INT))"
    )
    return (
        pos.groupBy((F.col("pos") / BLOOM_WORD).cast("long").alias("widx"))
        .agg(F.bit_or(word_bit).alias("w"))
    )


def bloom_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    flag_threshold: float = 0.2,
) -> DataFrame:
    """Bloom-filter decontamination: the constant-size-broadcast variant of
    ``contamination_overlap``.

    Per corpus document: ``(id, n_shingles, n_bloom_hits, bloom_frac,
    is_flagged)`` where a shingle "hits" iff ALL k of its Bloom positions
    are set. No false negatives (every truly-shared shingle hits), bounded
    false positives — so the filter's verdict is a conservative SUPERSET of
    the exact tier's, which is exactly what an eval-hygiene gate wants.

    Scale shape: corpus scanned once; the ≤2048-entry bits relation is
    folded into a ONE-ROW ``map<widx,w>`` (still ≤8 KB — the literal
    broadcast form of the bitset) and cross-joined in, so all k probes are
    ROW-LOCAL column math: ``element_at(map, pos div 32)``, shift, AND.
    No per-position explode, no (id, shingle) shuffle to recombine the k
    probes — the only corpus-side shuffles are the shingle distinct and
    the per-document rollup. Missing words coalesce to 0.
    """
    bits = bloom_bits(benchmark, id_col, text_col, n)
    bitmap = bits.agg(
        F.map_from_entries(F.collect_list(F.struct("widx", "w"))).alias("bm")
    )
    c_sh = dedup.shingles(corpus, id_col, text_col, n)
    h = dedup.token_hash(F.col("shingle"))

    def probe_one(pos: F.Column) -> F.Column:
        word = F.coalesce(
            F.element_at(F.col("bm"), (pos / BLOOM_WORD).cast("long")),
            F.lit(0).cast("long"),
        )
        # 2^bit as the mask: exact in doubles for bit < 32 (≪ 2^53), and
        # pow takes a column exponent where shiftleft's Python API doesn't
        mask = F.pow(F.lit(2.0), (pos % BLOOM_WORD).cast("double")).cast("long")
        return (word.bitwiseAND(mask) > 0).cast("int")

    probes = [probe_one(p) for p in _bloom_positions(h)]
    maybe = probes[0]
    for p in probes[1:]:
        maybe = maybe * p  # all k bits must be set
    per_shingle = c_sh.crossJoin(F.broadcast(bitmap)).select(
        id_col, "shingle", maybe.alias("maybe")
    )
    return per_shingle.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum("maybe").cast("long").alias("n_bloom_hits"),
        (F.sum("maybe").cast("double") / F.count(F.lit(1))).alias("bloom_frac"),
        (
            (F.sum("maybe").cast("double") / F.count(F.lit(1)))
            >= F.lit(flag_threshold)
        )
        .cast("int")
        .alias("is_flagged"),
    )


def key_hash(key: F.Column) -> F.Column:
    """Integer join keys folded onto the 31-bit hash domain the Bloom
    coefficient pairs expect (non-negative; pmod handles negatives)."""
    return F.pmod(key.cast("long"), F.lit(dedup.MERSENNE_31))


def bloom_bits_for_keys(keys: DataFrame, key_col: str) -> DataFrame:
    """The ``(widx, w)`` Bloom bitset relation over a KEY column — the
    join-pruning form of ``bloom_bits`` (same k/m geometry, same ≤2048-row
    ≈ 8 KB bound regardless of key count)."""
    pos = (
        keys.select(key_hash(F.col(key_col)).alias("h"))
        .select(F.explode(F.array(*_bloom_positions(F.col("h")))).alias("pos"))
        .distinct()
    )
    word_bit = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD} AS INT))"
    )
    return pos.groupBy((F.col("pos") / BLOOM_WORD).cast("long").alias("widx")).agg(
        F.bit_or(word_bit).alias("w")
    )


def bloom_prune(fact: DataFrame, fact_key: str, keys: DataFrame, key_col: str) -> DataFrame:
    """Pre-shuffle Bloom pruning of a fact table against a dimension's key
    set: keep only fact rows whose key MIGHT be in the dimension (all k
    probe bits set). No false negatives — the surviving superset feeds the
    exact join unchanged, so the composition is LOSSLESS; false positives
    only cost extra shuffled rows (bounded by the k=4/m=2^16 rate).

    This is the runtime-filter pattern (Spark's own bloom runtime filters,
    made explicit and engine-independent): at 100 TB a dimension too large
    to broadcast-join still ships as an 8 KB bitset, and the fact shuffle
    shrinks by the dimension's selectivity BEFORE any exchange. All probe
    math is row-local column arithmetic on a broadcast 1-row map literal."""
    bits = bloom_bits_for_keys(keys, key_col)
    bitmap = bits.agg(
        F.map_from_entries(F.collect_list(F.struct("widx", "w"))).alias("bm")
    )
    h = key_hash(F.col(fact_key))

    def probe_one(pos: F.Column) -> F.Column:
        word = F.coalesce(
            F.element_at(F.col("bm"), (pos / BLOOM_WORD).cast("long")),
            F.lit(0).cast("long"),
        )
        mask = F.pow(F.lit(2.0), (pos % BLOOM_WORD).cast("double")).cast("long")
        return (word.bitwiseAND(mask) > 0).cast("int")

    probes = [probe_one(p) for p in _bloom_positions(h)]
    maybe = probes[0]
    for p in probes[1:]:
        maybe = maybe * p
    return (
        fact.crossJoin(F.broadcast(bitmap))
        .where(maybe == 1)
        .drop("bm")
    )
