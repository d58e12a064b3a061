"""Deduplication operators for LLM-data pipelines (SURVEY.md §7.6).

Four tiers, each a different cost/recall point at 100 TB:

- exact            hash-groupBy on a normalized fingerprint (one shuffle)
- n-gram Jaccard   exact set-similarity via shingle self-join (the oracle
                   for the approximate tiers; quadratic in bucket size)
- MinHash + LSH    shingle→minhash signature→banded bucket join: candidate
                   generation is linear in corpus size, verification only
                   within buckets — the scale path
- SimHash          31-bit sign projection; equal-signature buckets catch
                   near-identical docs at one shuffle

Everything is engine-native column math: token hashes derive from md5 (a
cross-engine-stable hash), folded to 60 bits, then universal-hashed mod a
31-bit prime so products stay inside BIGINT. No Python UDFs anywhere.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import graph

# 31-bit prime universal-hash domain: a*h+b stays < 2^62 (no BIGINT overflow
# in either engine).
MERSENNE_31 = 2_147_483_647

_rng = random.Random(42)
# (a, b) pairs for k=16 minhash permutations — module constants so the Spark
# plan and the generated DuckDB oracle share one source of truth.
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, MERSENNE_31), _rng.randrange(0, MERSENNE_31)) for _ in range(16)
]
LSH_BANDS = 4  # 16 hashes = 4 bands × 4 rows
# 31, not 32: token hashes live in the 31-bit Mersenne-prime domain, so a
# 32nd signature bit would always be 0 (dead weight, inflated claim)
SIMHASH_BITS = 31


def token_hash(tok: Column) -> Column:
    """Cross-engine-stable 60-bit token hash folded to the 31-bit domain.

    md5 hex → first 15 nibbles → BIGINT → mod p. Identical in Spark
    (conv(...,16,10)) and DuckDB (CAST('0x'||… AS BIGINT)).
    """
    h60 = F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
    return h60 % F.lit(MERSENNE_31)


def _zip_grams(toks, n: int):
    """Word n-gram array built ONLY from row-level outer references.

    ``arrays_zip`` of the n shifted slices of the token array, then a
    transform whose lambda touches nothing but its own struct variable.
    This shape is load-bearing twice over:

    - an index-based lambda (``element_at(toks, i+j)``) re-evaluates its
      outer expression PER ELEMENT once the optimizer inlines it — there
      is no common-subexpression elimination across higher-order-function
      boundaries, so ``split(text)`` would re-tokenize the document for
      every gram (O(m²) chars);
    - the optimizer's InferFiltersFromGenerate pushes a ``size(e) > 0``
      predicate below every staging projection, fully re-inlining ``e`` —
      with per-element outer references that inlined copy cost O(m²) PER
      ROW (measured: 11 s vs 1.6 s for the sf0.1 corpus explode; 272 s in
      the worst formulation). With slices-and-zip, the fully inlined
      expression stays O(m·n) per evaluation.

    Short docs yield empty slices → an empty gram array (no phantom
    grams, no ANSI out-of-range probes — the slice length is clamped ≥ 0).
    """
    ln = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, k + 1, ln) for k in range(n)])
    return F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])
    )


def shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, sharr) — each document's DISTINCT shingle set as one array row.

    Entirely map-side: the distinct-per-document step happens inside the
    row, not as a cluster-wide ``DISTINCT`` — a document's shingles never
    leave the row, so no Exchange is needed to dedupe them. Requires
    ``id_col`` to be unique per input row (true for every caller: documents
    are keyed by doc_id), under which per-row distinct ≡ relation-wide
    distinct on (id, shingle). Documents shorter than n tokens produce no
    row (mirrors SQL generate_series emptiness).

    The in-row dedupe is SORT-based (array_sort + drop-equal-to-previous
    via zip_with against the 1-shifted copy + array_compact), NOT
    ``array_distinct``: for non-primitive element types (strings here)
    ArrayDistinct takes Spark's O(m²) pairwise-comparison fallback — the
    specialized hash-set path covers only primitive numerics — which an
    alternating A/B measured as a 2× wall regression on the shingle
    self-join entries. Sorting is O(m log m) comparisons; element order
    inside ``sharr`` is not part of the contract (every consumer treats it
    as a set). Like :func:`_zip_grams`, every outer-array reference is
    row-level, so the optimizer's inferred generate-filter copy stays
    O(m log m) per row.

    Consumers that EXPLODE this relation should do so from a persisted
    handle (the minhash tier does) — an unpersisted explode pays one extra
    inlined evaluation of the whole pipeline in the pushed-down inferred
    filter. Consumers that only need the flat distinct relation should use
    :func:`shingles`, which keeps the relation-level distinct.
    """
    toks = F.split(F.col(text_col), " ")
    grams = _zip_grams(toks, n)
    # the sorted gram array is staged as its own projection so downstream
    # references don't re-evaluate the sort
    staged = df.where(F.size(toks) >= n).select(
        F.col(id_col), F.array_sort(grams).alias("_sg")
    )
    sg = F.col("_sg")
    prev = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(sg, 1, F.greatest(F.size(sg) - 1, F.lit(0))),
    )
    dedup = F.array_compact(
        F.zip_with(sg, prev, lambda x, p: F.when(p.isNull() | (x != p), x))
    )
    return staged.select(F.col(id_col), dedup.alias("sharr"))


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) — distinct word n-grams per document.

    Explode + relation-level ``.distinct()``. The distinct's exchange is
    retained HERE deliberately: this form feeds the exact self-join tiers,
    whose join shuffles the relation anyway, and an in-row dedupe would be
    re-inlined into the pushed-down inferred generate-filter (one full
    extra per-row evaluation of the dedupe pipeline — measured net-slower
    than the partial-agg distinct, whose map-side combine already removes
    every duplicate BEFORE the exchange because a document's duplicate
    shingles are row-local). The gram construction shares
    :func:`_zip_grams`, so no per-element re-tokenization anywhere. The
    shuffle-free set form for signature building is :func:`shingle_arrays`.
    """
    toks = F.split(F.col(text_col), " ")
    return (
        df.where(F.size(toks) >= n)
        .select(F.col(id_col), F.explode(_zip_grams(toks, n)).alias("shingle"))
        .distinct()
    )


# Polynomial rolling-hash base for winnowing k-grams: token values live in
# the 31-bit domain, so base^2 * v < 2^16 * 2^31 * k stays far inside BIGINT.
WINNOW_BASE = 257


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): polynomial rolling hash over token k-grams, then keep the
    MINIMUM hash of every window of ``w`` consecutive k-grams. Guarantees
    any shared run of w+k-1 tokens between two documents shares at least one
    selected fingerprint — position-robust partial-overlap detection, which
    md5-of-whole-document (text.fingerprint) cannot give.

    Everything is array math inside one narrow projection (no shuffle until
    the final distinct): token hash → k-gram polynomial hash
    h = Σ v_j·B^(k-1-j) mod p → per-window array_min. Returns distinct
    (id, fp) rows; the fingerprint SET is the document sketch that joins
    documents to candidate sources at 100 TB (equi-join on fp — linear,
    like every other LSH-family tier here).
    """
    toks = F.split(F.col(text_col), " ")
    # Each array stage is its OWN projection: referencing an upstream array
    # through element_at/slice inside a lambda re-evaluates the full child
    # expression per element (no common-subexpression elimination across
    # higher-order-function boundaries), which turns the rolling hash into
    # O(m^2) md5 calls and the window mins into O(m^3). Aliased per-row
    # columns are computed once; the multi-referenced aliases are expensive
    # enough that CollapseProject keeps the boundaries.
    staged = df.where(F.size(toks) >= k + w - 1).select(
        F.col(id_col), F.transform(toks, lambda t: token_hash(t)).alias("_tv")
    )

    # k-gram polynomial rolling hash at each position i (1-based)
    def kgram(i: Column) -> Column:
        h = F.lit(0).cast("long")
        for j in range(k):
            h = (h * WINNOW_BASE + F.element_at(F.col("_tv"), i + j)) % F.lit(
                MERSENNE_31
            )
        return h

    staged = staged.select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("_tv")) - (k - 1)), kgram
        ).alias("_kg"),
    )
    fps = F.transform(
        F.sequence(F.lit(1), F.size(F.col("_kg")) - (w - 1)),
        lambda i: F.array_min(F.slice(F.col("_kg"), i, w)),
    )
    return staged.select(F.col(id_col), F.explode(fps).alias("fp")).distinct()


# Edit-distance near-dup tier: block key = first LEV_PREFIX chars. The
# module constants feed both the Spark plan and the generated DuckDB oracle.
LEV_PREFIX = 16
LEV_MAX_DIST = 32


def levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = LEV_MAX_DIST,
    prefix: int = LEV_PREFIX,
) -> DataFrame:
    """Blocked edit-distance near-dup pairs: (id_a, id_b, dist) for every
    same-block pair with levenshtein ≤ ``max_dist``.

    Edit distance is O(L₁·L₂) per pair — all-pairs is unrunnable at corpus
    scale, so candidates are blocked twice before any distance is computed:

    1. equi-join on the first ``prefix`` characters — one hash shuffle,
       linear candidate generation (the same banded-join discipline as the
       MinHash tier; a true edit within the first ``prefix`` chars escapes
       the block, the documented recall trade of every blocking scheme);
    2. length pre-filter |len(a) − len(b)| ≤ ``max_dist`` — a length gap
       is a lower bound on edit distance, so this drops no true pair
       WITHIN a block and skips the quadratic-cost comparison for free.

    The surviving pairs get Spark's thresholded ``levenshtein(l, r, k)``
    (early-exits its DP band above ``k``, returning −1) — cost is
    O(k·min(L)) per candidate, not O(L²). Output values are the exact
    distances, hash-comparable against DuckDB's un-thresholded function.
    """
    sel = lambda a, b, c: df.select(  # noqa: E731 - tiny projection helper
        F.col(id_col).alias(a),
        F.col(text_col).alias(b),
        F.substring(F.col(text_col), 1, prefix).alias("blk"),
        F.length(F.col(text_col)).alias(c),
    )
    left, right = sel("id_a", "t_a", "len_a"), sel("id_b", "t_b", "len_b")
    pairs = left.join(right, on="blk").where(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("len_a") - F.col("len_b")) <= max_dist)
    )
    dist = F.levenshtein(F.col("t_a"), F.col("t_b"), max_dist)
    return (
        pairs.select("id_a", "id_b", dist.cast("long").alias("dist"))
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )


def exact_dedup(df: DataFrame, id_col: str, key: Column) -> DataFrame:
    """Exact dedup: group by fingerprint, keep the lowest id, count copies.

    One hash shuffle on the fingerprint; at 100 TB this is the cheapest tier
    and runs first to shrink the corpus for the approximate tiers.
    """
    return df.select(key.alias("fp"), F.col(id_col)).groupBy("fp").agg(
        F.min(id_col).alias("keeper"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def drop_frequent_shingles(
    sh: DataFrame, max_doc_freq: int, id_col: str = "doc_id"
) -> DataFrame:
    """Drop shingles that occur in more than ``max_doc_freq`` documents.

    The standard hot-key mitigation for shingle self-joins: a boilerplate
    shingle present in d documents contributes d² candidate rows to the
    join — one stop-phrase across 1% of a 10-billion-doc corpus is 10^16
    pairs, which no skew-split saves. Dropping document-frequency outliers
    caps per-key fan-out at max_doc_freq² while barely moving Jaccard
    scores (a shingle shared by half the corpus carries no similarity
    signal — same rationale as IDF). One extra groupBy + semi-join, both
    on the shingle key.

    NOTE: downstream sizes must be computed from the FILTERED relation
    (jaccard_pairs recomputes them internally) so numerator and denominator
    see the same shingle universe.
    """
    keep = (
        # count_distinct, not count: the contract is DOCUMENT frequency, and
        # callers may pass a non-deduped shingle relation (occurrence counts
        # would over-drop shingles that merely repeat within documents)
        sh.groupBy("shingle")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .where(F.col("df") <= max_doc_freq)
        .select("shingle")
    )
    return sh.join(keep, "shingle", "left_semi")


def jaccard_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs from a shingle relation.

    Self-equi-join on shingle (skew-prone: AQE skew-join splits oversized
    partitions, but a single hot shingle's d² pair fan-out needs
    ``max_doc_freq`` — see drop_frequent_shingles), then
    |A∩B| / (|A|+|B|−|A∩B|). All-integer math until the final division, so
    the score is bit-stable cross-engine. With ``max_doc_freq`` set, both
    the intersection and the set sizes are computed over the filtered
    shingle universe (scores stay internally consistent).
    """
    if max_doc_freq is not None:
        sh = drop_frequent_shingles(sh, max_doc_freq, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, on="shingle")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    out = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "common", "na", "nb", "jaccard")


def prefix_filter_candidates(
    sh: DataFrame, id_col: str = "doc_id", threshold: float = 0.8
) -> DataFrame:
    """LOSSLESS prefix-filtered candidate pairs for exact Jaccard ≥ t
    (AllPairs, Bayardo et al. WWW'07; PPJoin, Xiao et al. WWW'08).

    The exact tier's bottleneck is the shingle self-join: every pair of
    documents sharing ANY shingle becomes a group. Prefix filtering prunes
    that lossless-ly. Order every document's shingle set by one GLOBAL
    total order — ascending document frequency, shingle ASC as the
    tie-break (rarest first, so prefixes index the least-shared tokens) —
    and keep only each document's first

        p(x) = |x| − ⌈t·|x|⌉ + 1

    shingles. If J(x,y) ≥ t then |x∩y| ≥ t·|x∪y| ≥ ⌈t·max(|x|,|y|)⌉ = α,
    and two sets whose overlap is ≥ α must collide within their first
    |x|−α+1 / |y|−α+1 tokens of any shared total order (if all α shared
    tokens sat past both prefixes, each set would need α tokens AFTER a
    prefix that already excludes fewer than α positions — pigeonhole).
    Since α ≥ ⌈t·|x|⌉ and α ≥ ⌈t·|y|⌉, the per-side prefix p(·) suffices.
    So the prefix self-join loses NO qualifying pair — same output as the
    full self-join, verified downstream by exact counting.

    The length filter stacks on top: t·|x| ≤ |y| ≤ |x|/t, held in exact
    integers (t as a rational t_num/t_den, so t·|x| ≤ |y| becomes
    t_num·n_a ≤ t_den·n_b — no float boundary).

    Scale: document frequency is one re-aggregatable shuffle on shingle;
    rank-within-document is a PARTITIONED window (by id — no global sort,
    the "global" order is only a comparator); the candidate join touches
    prefix rows only. At t=0.8 a 100-shingle document indexes 21 shingles
    instead of 100 — a ~25× pair-volume cut before verification, and the
    rarest-first order makes surviving buckets the smallest ones.
    """
    from fractions import Fraction

    from pyspark.sql import Window as W

    fr = Fraction(threshold).limit_denominator(10**6)
    t_num, t_den = fr.numerator, fr.denominator
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w_rank = W.partitionBy(id_col).orderBy(
        F.col("df").asc(), F.col("shingle").asc()
    )
    w_size = W.partitionBy(id_col)
    ranked = sh.join(dfreq, "shingle").select(
        F.col(id_col),
        "shingle",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_size).alias("n"),
    )
    # p = n − ceil(t·n) + 1 with ceil(t·n) = (t_num·n + t_den − 1) div t_den
    # (integer `div`, not float `/`+floor: at t_den=10⁶ and n~10⁶ the true
    # rational sits closer to an integer than one double ulp)
    prefix_len = F.expr(f"n - (({t_num} * n + {t_den - 1}) div {t_den}) + 1")
    pref = ranked.where(F.col("rn") <= prefix_len).select(id_col, "shingle", "n")
    a = pref.select(
        F.col(id_col).alias("id_a"), "shingle", F.col("n").alias("na")
    )
    b = pref.select(
        F.col(id_col).alias("id_b"), "shingle", F.col("n").alias("nb")
    )
    return (
        a.join(b, "shingle")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.lit(t_num) * F.col("na") <= F.lit(t_den) * F.col("nb"))
            & (F.lit(t_num) * F.col("nb") <= F.lit(t_den) * F.col("na"))
        )
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """k=16 minhash values + shingle-set size per document.

    h_i(x) = (a_i·H(x) + b_i) mod p over the document's shingle set; MIN and
    COUNT are map-side-combinable, so the whole signature (including the
    ``n_shingles`` size that Jaccard verification needs later) costs ONE
    partial-agg shuffle — no separate sizes pass over the shingle relation.
    """
    h = token_hash(F.col("shingle")).alias("h")
    base = sh.select(F.col(id_col), h)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE_31)).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ] + [F.count(F.lit(1)).alias("n_shingles")]
    return base.groupBy(id_col).agg(*aggs)


def minhash_signatures_arrays(sa: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Map-side minhash signatures from a :func:`shingle_arrays` relation.

    Value-identical to :func:`minhash_signatures` over the exploded shingle
    relation — min and count commute with the array form (duplicates cannot
    exist inside ``sharr``) — but with ZERO shuffles: a document's signature
    is a fold over its own row, so the groupBy-by-id Exchange disappears
    (guide §2.4). The shingle hash array is projected once (its own Project
    node — Catalyst does not inline a non-cheap alias referenced k times),
    then each of the k permutations is an ``array_min`` over a linear
    transform of it.
    """
    hashed = sa.select(
        F.col(id_col),
        F.transform(F.col("sharr"), lambda s: token_hash(s)).alias("ha"),
    )

    def perm(a: int, b: int):
        return lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MERSENNE_31)

    mins = [
        F.array_min(F.transform(F.col("ha"), perm(a, b))).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return hashed.select(
        F.col(id_col), *mins, F.size("ha").cast("long").alias("n_shingles")
    )


def band_table(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Long-format banded signature: one ``(id, bk)`` row per band, where
    ``bk`` is the (band, r0..r{rows-1}) struct key. This is the exact
    relation an LSH *index* stores — the streaming incremental dedup
    (streaming/dedup.py) appends it per micro-batch and probes new
    arrivals against it."""
    k = len(MINHASH_COEFFS)
    rows = k // LSH_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                *[F.col(f"mh{band * rows + j}").alias(f"r{j}") for j in range(rows)],
            )
            for band in range(LSH_BANDS)
        ]
    )
    return sig.select(F.col(id_col), F.explode(bands).alias("bk"))


def lsh_candidate_pairs(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Banded LSH: equal signature in ANY band → candidate pair.

    Long-format formulation: explode each signature into (id, band-key
    struct) rows and self-equi-join ONCE on the band key — one shuffle on
    the band signature instead of one join per band, and a plan whose size
    is independent of the band count. Linear candidate generation: no
    all-pairs comparison ever happens.
    """
    long = band_table(sig, id_col)
    a = long.alias("a")
    b = long.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def verify_candidate_pairs(
    cand: DataFrame,
    sh: DataFrame,
    sizes: DataFrame | None = None,
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact-Jaccard verification restricted to candidate pairs.

    Work is proportional to |candidates| × avg shingles/doc, NOT to the
    all-pairs shingle self-join — this is what makes LSH the scale path:
    at 100 TB the quadratic `jaccard_pairs` is infeasible, but candidates
    are near-linear in corpus size. Pairs with zero common shingles drop
    out of the inner join, which is correct for any threshold > 0.

    ``sizes`` is an (id, n) relation of shingle-set cardinalities; pass the
    minhash signature table (which carries ``n_shingles`` for free) to avoid
    a second aggregation over the shingle relation.
    """
    if sizes is None:
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
        n_col = "n"
    else:
        n_col = "n_shingles" if "n_shingles" in sizes.columns else "n"
    sha = sh.select(F.col(id_col).alias("id_a"), "shingle")
    shb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        cand.join(sha, "id_a")
        .join(shb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col(n_col).alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col(n_col).alias("nb"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dedup: shingle → signature → banded candidates
    → exact-Jaccard verification of candidates only (never the all-pairs
    shingle join — candidate generation is linear in corpus size).

    The per-document shingle-array relation feeds three consumers (the
    map-side signature build and both sides of the verify join) and the
    signature relation three (both sides of the band join + the sizes side
    of verification); without materialization each consumer re-derives its
    input from the source scan — 6 corpus passes, a full-table read each
    at 100 TB. Both are persisted MEMORY_AND_DISK (spill-safe): the corpus
    parquet is scanned ONCE to build ``sa``, once more nothing. Catalyst's
    ReuseExchange does NOT reliably fold these branches on its own (observed:
    0 reuses across the band/verify branches), so the materialization is
    explicit. r11: signatures are computed map-side from the shingle arrays
    (minhash_signatures_arrays), so the pre-candidate pipeline plans ZERO
    Exchange — the old shape shuffled the exploded shingle relation twice
    (relation-wide DISTINCT + groupBy(id) signature aggregation).

    Cache lifetime contract: the persisted relations live in the session's
    CacheManager until unpersisted (repeat calls over the SAME corpus dedupe
    to one cache entry via plan canonicalization, so they don't grow the
    cache; DIFFERENT corpora each pin their own). A long-lived session that
    dedups many corpora should pass ``handles`` — the two persisted
    DataFrames are appended to it so the caller can ``h.unpersist()`` each
    after consuming the result (or ``spark.catalog.clearCache()`` wholesale,
    as bench.py and tools/drive_gate.py do between queries).
    """
    from pyspark import StorageLevel

    sa = shingle_arrays(df, id_col, text_col, n=3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sig = minhash_signatures_arrays(sa, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    if handles is not None:
        handles.extend([sa, sig])
    cand = lsh_candidate_pairs(sig, id_col)
    sh = sa.select(F.col(id_col), F.explode("sharr").alias("shingle"))
    return verify_candidate_pairs(cand, sh, sizes=sig, id_col=id_col, threshold=threshold).select(
        "id_a", "id_b", "jaccard"
    )


def positional_window_hashes(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", length: int = 8
) -> DataFrame:
    """(id, pos, wh) — 60-bit hash of the ``length``-token window starting at
    every position (1-based). Unlike :func:`shingles` this keeps EVERY
    occurrence with its position — exact-substring dedup needs positional
    coverage, not set semantics — and does NOT fold to the 31-bit domain:
    window equality stands in for substring equality, so the full 60-bit
    md5 prefix is kept (collision odds ~n²/2^61, negligible even at
    100 TB-corpus window counts per partition-disjoint hash space).

    Narrow (tokenize → per-position hash → posexplode): no shuffle. The
    token array is staged as its own projection so the window lambda does
    not re-evaluate ``split`` per element (no common-subexpression
    elimination across higher-order-function boundaries).
    """
    toks = F.split(F.col(text_col), " ")
    staged = df.where(F.size(toks) >= length).select(
        F.col(id_col), toks.alias("_t")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("_t")) - (length - 1)),
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ", *[F.element_at(F.col("_t"), i + j) for j in range(length)]
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
    )
    return staged.select(
        F.col(id_col), F.posexplode(grams).alias("pos0", "wh")
    ).select(F.col(id_col), (F.col("pos0") + 1).alias("pos"), F.col("wh"))


def exact_substring_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    length: int = 8,
    handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Cross-document exact-substring duplication profile — the distributed
    re-expression of the ExactSubstr tier of Lee et al. 2021 ("Deduplicating
    Training Data Makes Language Models Better").

    The paper's suffix-array formulation is inherently sequential; the
    shuffle-native equivalent fingerprints the L-token window at every
    position and marks a position duplicated iff its window hash occurs in
    at least one OTHER document. Any shared span of ≥ L tokens is caught
    (every window inside it collides); shorter overlaps are not — L is the
    match-length threshold, exactly the paper's 50-BPE-token knob.
    Within-document repetition is deliberately excluded (covered by
    ``text.repetition_profile``); a window is cross-doc-repeated iff
    min(doc) ≠ max(doc) among its occurrences.

    Scale shape: the window relation is linear in corpus token count and
    is persisted so the corpus parquet is scanned ONCE for its two
    consumers (the repeated-hash aggregate and the mark join). Both
    shuffles key on the 8-byte hash / doc id — never on strings — and the
    min/max aggregate combines map-side. Returns one row per document with
    ``total_windows``, ``dup_windows``, ``dup_ratio``; the drop/trim
    decision is a downstream filter on ``dup_ratio``.

    Cache lifetime contract matches :func:`minhash_lsh_dedup` — pass
    ``handles`` to unpersist after consuming.
    """
    from pyspark import StorageLevel

    win = positional_window_hashes(df, id_col, text_col, length).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if handles is not None:
        handles.append(win)
    rep = (
        win.groupBy("wh")
        .agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
        .where(F.col("_lo") != F.col("_hi"))
        .select("wh", F.lit(1).alias("_dup"))
    )
    marked = win.join(rep, "wh", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("total_windows"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0))).cast("long").alias("dup_windows"),
        )
        .withColumn(
            "dup_ratio",
            F.col("dup_windows").cast("double") / F.col("total_windows"),
        )
    )


def exact_substring_trim(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    length: int = 8,
    handles: list[DataFrame] | None = None,
) -> DataFrame:
    """The transform half of ExactSubstr dedup: REMOVE every token covered
    by a cross-document duplicated window and rebuild the document.

    :func:`exact_substring_profile` measures; this excises. Overlapping
    duplicated windows merge naturally — coverage is computed per token
    index (a token is dropped iff ANY duplicated window spans it), which is
    exactly interval union without interval arithmetic:

      dup positions → explode [pos, pos+L) → distinct covered indexes
      → anti-join the positional token stream → ordered re-concat.

    The rebuild aggregates ``sort_array(collect_list(struct(idx, tok)))`` —
    order restored deterministically after the shuffle, never relying on
    collect_list's arrival order. Documents shorter than L tokens have no
    windows and pass through verbatim; fully-duplicated documents come back
    as empty text (the drop decision is the caller's filter on ``n_kept``).

    Scale: the window relation is persisted (one corpus scan for its two
    consumers); the token stream is a second pruned scan — at 100 TB
    re-reading two columns beats caching exploded tokens. Every shuffle
    keys on (doc, idx) or the window hash; nothing goes single-partition.
    """
    from pyspark import StorageLevel

    win = positional_window_hashes(df, id_col, text_col, length).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if handles is not None:
        handles.append(win)
    rep = (
        win.groupBy("wh")
        .agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
        .where(F.col("_lo") != F.col("_hi"))
        .select("wh")
    )
    dup_pos = win.join(rep, "wh").select(id_col, "pos")
    covered = (
        dup_pos.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (length - 1))
            ).alias("idx"),
        )
        .distinct()
    )
    toks = F.split(F.col(text_col), " ")
    tokpos = df.select(F.col(id_col), F.posexplode(toks).alias("idx0", "tok")).select(
        F.col(id_col), (F.col("idx0") + 1).alias("idx"), F.col("tok")
    )
    kept = tokpos.join(covered, [id_col, "idx"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("idx", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    base = df.select(F.col(id_col), F.size(toks).alias("_n_toks"))
    return base.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        (F.col("_n_toks") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash signature per document over distinct tokens.

    bit_j(sig) = sign of Σ_tokens (2·bit_j(H(tok)) − 1): one groupBy with
    ``bits`` SUM aggregates (map-side combinable), then the signature is
    recomposed bit by bit. Equal signatures → near-identical docs. ``bits``
    is capped by the token-hash domain (31-bit prime) — asking for more
    would only add always-zero bits.
    """
    tok = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .distinct()
        .withColumn("h", token_hash(F.col("tok")))
    )
    weights = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"w{j}")
        for j in range(bits)
    ]
    w = tok.groupBy(id_col).agg(*weights)
    sig = F.lit(0).cast("long")
    for j in range(bits):
        sig = sig + F.when(F.col(f"w{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return w.select(F.col(id_col), sig.alias("simhash"))


def _components_single_task(edges: DataFrame) -> DataFrame:
    """Exact connected components for a measured-small edge relation:
    path-compressed union-find over the whole graph inside a single
    applyInPandas task, rooting each set at its MINIMUM id — the same
    (id, component=min reachable id) contract as the distributed loop."""
    import pandas as pd

    def solve(pdf: "pd.DataFrame") -> "pd.DataFrame":
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(pdf["src"], pdf["dst"]):
            a, b = int(a), int(b)
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN root so the final root IS the component label
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        ids = sorted(parent)
        return pd.DataFrame(
            {"id": ids, "component": [find(i) for i in ids]}
        )

    return (
        edges.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(solve, schema="id long, component long")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Duplicate-cluster assembly: connected components over near-dup pairs.

    Returns (id, component) where component = min id reachable through the
    pair graph — the canonical keeper for each duplicate cluster. This is
    the iterative step after any pair tier (exact, LSH, SimHash bucket,
    embedding cosine): pairs only relate two docs, clusters need closure.

    Algorithm: min-label propagation with pointer-jumping. Each round
    propagates the minimum label across edges (one groupBy with map-side-
    combinable MIN + one join, both hash-partitioned on id) and then
    SHORTCUTS each label to its label's label (one more self-join) — the
    pointer-jumping step doubles the propagation distance per round, so a
    path graph of length L converges in O(log L) rounds instead of O(L).
    Convergence is checked with a changed-label probe per round (one
    lightweight action each — an iterative algorithm is the one place
    per-round actions are the design, not a smell). If the cap is hit
    before convergence a RuntimeError is raised rather than silently
    returning partial clusters (which would diverge from the transitive-
    closure oracle).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        # materialize ONCE: every iteration joins against edges, and without
        # this the whole upstream pair-generation pipeline (e.g. MinHash-LSH)
        # would re-execute per round
        .localCheckpoint(eager=True)
    )
    # size per-round task counts from the MEASURED pair-graph size (same
    # discipline as graph.pagerank_fixed_point): near-dup pair graphs are
    # tiny relative to the corpus, and iterating a few hundred edges across
    # 32+ partitions is pure task-launch latency; a genuinely large graph
    # (≥100k edges/partition) keeps full parallelism, so the scale shape is
    # unchanged. count() is free — edges was just materialized.
    n_edges = edges.count()
    if n_edges <= graph.SMALL_GRAPH_EDGES:
        # Two-tier execution, same discipline as graph.pagerank_fixed_point:
        # a MEASURED-small pair graph computes its exact transitive closure
        # (union-find) inside ONE Arrow task instead of paying ~0.65 s of
        # job-scheduling latency per propagation round. Identical output —
        # component = min reachable id — and the distributed min-label loop
        # below remains the path for genuinely large graphs.
        return _components_single_task(edges)
    par = pairs.sparkSession.sparkContext.defaultParallelism
    nparts = max(1, min(par, -(-n_edges // 100_000)))
    if nparts < edges.rdd.getNumPartitions():
        edges = edges.coalesce(nparts)
    # initial label: min neighbor (including self)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("component"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("component")).alias("component"),
        )
    )
    converged = False
    for _ in range(max_iterations):
        # propagate: my next label = min(my label, labels of my neighbors)
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "dst"), on="dst")
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(
                neighbor_min.withColumnRenamed("src", "id"), on="id", how="left"
            )
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        )
        # pointer jumping: component ← label of my component. Doubles the
        # propagation distance per round → O(log diameter) total rounds.
        parent = new_labels.select(
            F.col("id").alias("component"), F.col("component").alias("gp")
        )
        new_labels = (
            new_labels.join(parent, on="component", how="left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("gp"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)  # cut lineage growth
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "rounds — graph diameter exceeds 2^rounds; raise max_iterations"
        )
    return labels


def minhash_error_histogram(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Accuracy contract of the MinHash sketch, measured: over every LSH
    candidate pair, the error decile of the signature's Jaccard ESTIMATE
    (matching minhash coordinates / k) against the TRUE shingle Jaccard.

    The evaluation a dedup deployment runs before trusting banded LSH —
    the sketch-tier analogue of the ANN recall histogram. The verdict is
    pure integer cross-multiplication (|m·u − c·k|·10 div (k·u) with
    u = |A∪B|), so the histogram is hash-exact with no float compare.
    True-Jaccard work is candidate-restricted (the verify join shape),
    never all-pairs; candidates with ZERO common shingles keep c=0 via a
    left join rather than silently dropping out.
    """
    from pyspark import StorageLevel

    sharrs = shingle_arrays(df, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sh = sharrs.select(F.col(id_col), F.explode("sharr").alias("shingle"))
    sig = minhash_signatures_arrays(sharrs, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cand = lsh_candidate_pairs(sig, id_col)
    k = len(MINHASH_COEFFS)
    sa = sig.select(
        F.col(id_col).alias("id_a"),
        F.col("n_shingles").alias("na"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)],
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"),
        F.col("n_shingles").alias("nb"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)],
    )
    m = None
    for i in range(k):
        t = (F.col(f"a{i}") == F.col(f"b{i}")).cast("long")
        m = t if m is None else m + t
    mm = cand.join(sa, "id_a").join(sb, "id_b").select(
        "id_a", "id_b", "na", "nb", m.alias("m")
    )
    sha = sh.select(F.col(id_col).alias("id_a"), "shingle")
    shb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        cand.join(sha, "id_a")
        .join(shb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    j = (
        mm.join(common, ["id_a", "id_b"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .withColumn("u", F.col("na") + F.col("nb") - F.col("c"))
    )
    err = F.expr(f"(abs(m * u - c * {k}) * 10) div ({k} * u)")
    out = j.groupBy(err.cast("long").alias("err_decile")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    # deciles-sized result: materialize, then release the shingle/signature
    # caches (same discipline as the LM scorers in operators/text.py) so
    # repeated gate/bench invocations don't accumulate cached blocks
    out = out.localCheckpoint(eager=True)
    sig.unpersist()
    sharrs.unpersist()
    return out


#: content-defined chunking: fingerprint window width (chars) and the cut
#: modulus — a boundary lands after any W-char window whose md5-derived
#: 60-bit integer is ≡ 0 mod CDC_MOD, so the EXPECTED chunk length is
#: CDC_MOD + CDC_W − 1 chars and boundaries move only when the local W
#: characters change (the insertion-locality property fixed-size chunking
#: lacks)
CDC_W = 8
CDC_MOD = 64


def _cdc_cut_hash_sql(win: str) -> str:
    """The shared window-hash cut predicate: 60-bit integer from the md5
    hex prefix (identical in DuckDB as CAST('0x'||SUBSTR(md5(w),1,15) AS
    BIGINT)), reduced mod CDC_MOD."""
    return (
        f"cast(conv(substring(md5({win}), 1, 15), 16, 10) as bigint)"
        f" % {CDC_MOD} = 0"
    )


def cdc_chunk_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content-defined chunking dedup profile (the storage-dedup classic —
    Muthitacharoen et al., LBFS SOSP'01 — applied to corpus text): each
    document is split at positions where the rolling W-char window's
    fingerprint matches a mask, chunks are keyed by md5, and an instance
    is 'dup' iff an identical chunk exists at a strictly earlier
    (doc_id, idx). Because boundaries are chosen by CONTENT, an insertion
    reshapes only the chunks overlapping the edit — shared passages at
    ARBITRARY byte offsets still align, which is exactly what fixed
    n-gram/shingle tiers miss (property-tested: prefix edits preserve the
    suffix chunk set). Σ dup_chars over the corpus is the exact
    dedup-savings a chunk store would realize.

    Per doc: (n_chunks, n_chars, dup_chunks, dup_chars).

    Scale shape: cut discovery is per-row ARRAY math inside codegen (a
    transform/filter over char positions — linear, no fan-out); the only
    explode is one row per ~(CDC_MOD+W)-char chunk; chunk TEXT never
    crosses a shuffle — instances are reduced to (md5, len) immediately
    (the round-10 digest discipline) before the digest-partitioned
    row_number and the per-doc re-aggregation. Every empty document forms
    one zero-length chunk, so the output is total on doc_id with no
    left-join leg."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    W, L = CDC_W, f"length({text_col})"
    cuts = (
        f"filter(transform(sequence(1, greatest({L} - {W - 1}, 1)),"
        f" i -> IF(i + {W - 1} < {L}"
        f" AND {_cdc_cut_hash_sql(f'substr({text_col}, i, {W})')},"
        " cast(i as bigint) + " + str(W - 1) + ", cast(0 as bigint))),"
        " x -> x > 0)"
    )
    b = f"concat(array(cast(0 as bigint)), {cuts}, array(cast({L} as bigint)))"
    chunks_expr = (
        f"transform(sequence(1, size({b}) - 1),"
        f" k -> substr({text_col}, cast(element_at({b}, k) as int) + 1,"
        f" cast(element_at({b}, k + 1) - element_at({b}, k) as int)))"
    )
    inst = (
        df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(F.expr(chunks_expr)).alias("idx", "chunk"),
        )
        .select(
            "__id",
            F.col("idx").cast("long").alias("idx"),
            F.md5(F.col("chunk")).alias("h"),
            F.length("chunk").cast("long").alias("clen"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    w = Window.partitionBy("h").orderBy("__id", "idx")
    ranked = inst.withColumn("r", F.row_number().over(w))
    out = (
        ranked.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("clen").alias("n_chars"),
            F.sum(F.when(F.col("r") > 1, 1).otherwise(0)).alias("dup_chunks"),
            F.sum(F.when(F.col("r") > 1, F.col("clen")).otherwise(0)).alias(
                "dup_chars"
            ),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("dup_chunks").cast("long").alias("dup_chunks"),
            F.col("dup_chars").cast("long").alias("dup_chars"),
        )
    )
    out = out.localCheckpoint(eager=True)
    inst.unpersist()
    return out
