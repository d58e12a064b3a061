"""Corpus-curation operators: line-level dedup, URL canonicalization,
epoch-upsampling mixture planning, and contrastive triplet mining.

These are the remaining curation stages a web-scale training-data pipeline
runs that the dedup/mixing/text modules don't already cover:

- **Line-level exact dedup** (CCNet §4.1 / RefinedWeb §3.2): boilerplate
  lines (navigation, cookie banners, footers) repeat across *documents*;
  dropping every line that occurs in ≥2 distinct documents removes them
  without touching document-level near-dup machinery. The unit here is a
  fixed-width token line (the synthetic corpus is single-line), but the
  operator is the same count-join-reassemble shape for newline units.
- **URL canonicalization + keep-best** (C4, Raffel et al. 2020 §2.1
  dedups pages by URL): lowercase, strip scheme/www/fragment/tracking
  params/index.html/trailing slashes, then keep one page per canonical
  URL (longest text wins, ties to the smallest id).
- **Epoch upsampling** (the integer form of data-budget mixing, cf.
  Muennighoff et al. 2023 "Scaling Data-Constrained LMs"): given a total
  token budget split uniformly across domains, each domain contributes
  ``floor(target / domain_tokens)`` full epochs plus a deterministic
  hash-ordered partial pass that tops up the remainder.
- **Contrastive triplet mining**: (anchor, positive, negative) training
  triplets where positives come from MinHash-LSH candidate pairs (the
  linear-time near-dup path) and negatives are offset-derived ids checked
  against the anchor's partner set — fully deterministic, no seeded
  sampling.

Every operator is pure DataFrame composition — integer/string math only,
so each is hash-exact against its DuckDB oracle in plans/extension_queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import dedup
from .mixing import id_hash60

#: tokens per synthetic line for line-level dedup (the corpus is
#: single-line; real deployments pass newline-split lines instead)
LINE_TOKENS = 3
#: a line is boilerplate when it appears in at least this many DISTINCT docs
MIN_DUP_DOCS = 2


def reline(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = LINE_TOKENS,
    unit: str = "token",
) -> DataFrame:
    """Explode documents into lines: (id, pos, line).

    One narrow projection + posexplode — no shuffle. ``unit="token"``
    (default) cuts fixed-width token lines — the synthetic corpus is
    single-line — with ``slice`` clamping the trailing partial line so
    every token lands in exactly one line. ``unit="newline"`` is the real
    deployment form: split on the newline character, KEEPING empty lines
    (blank separators repeat across documents and must count as
    boilerplate) and the trailing empty line a trailing newline produces
    (Spark's split defaults to limit=-1, which — unlike Java's
    String.split — preserves trailing empties, matching DuckDB's
    string_split; pinned by the adversarial multi-line corpus).
    """
    if unit == "newline":
        return df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
    if unit != "token":
        raise ValueError(f"unit must be 'token' or 'newline': {unit!r}")
    t = F.split(F.col(text_col), " ")
    n_lines = F.floor((F.size(t) + F.lit(line_tokens - 1)) / F.lit(line_tokens))
    lines = F.transform(
        F.sequence(F.lit(0), (n_lines - 1).cast("int")),
        lambda i: F.array_join(
            F.slice(t, i * F.lit(line_tokens) + F.lit(1), F.lit(line_tokens)), " "
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(lines).alias("pos", "line")
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = LINE_TOKENS,
    min_dup_docs: int = MIN_DUP_DOCS,
    unit: str = "token",
) -> DataFrame:
    """Corpus-wide line-level exact dedup (CCNet-style boilerplate removal).

    Shape: explode to lines (narrow) → per-line distinct-doc count (one
    partial-agg shuffle on the line key) → join counts back (one shuffle
    join on the same key; AQE broadcasts the count relation when it turns
    out small at runtime — its size is data-dependent, so it is never
    broadcast by declaration) → reassemble per document (one shuffle on
    the id). Linear in corpus size. The exploded relation feeds BOTH the
    count aggregate and the join probe; measured on the fixture plan,
    Catalyst does NOT fold the two branches (two corpus scans), so it is
    persisted spill-safe — same discipline, same reason as the shingle
    relation in operators/dedup.minhash_lsh_dedup: one corpus scan total.

    Output per document: ``n_lines``, ``n_dropped``, and ``kept_text`` —
    the surviving lines rejoined in original order (order carried by the
    exploded position through an array_sort over (pos, line) structs, so
    the reassembly is deterministic under any partitioning).
    """
    from pyspark import StorageLevel

    ln = reline(df, id_col, text_col, line_tokens, unit=unit).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    counts = ln.groupBy("line").agg(
        F.countDistinct(F.col(id_col)).alias("ndocs")
    )
    flagged = ln.join(counts, "line").withColumn(
        "dup", F.col("ndocs") >= F.lit(min_dup_docs)
    )
    kept = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(~F.col("dup"), F.struct("pos", "line"))
                )
            ),
            lambda s: s["line"],
        ),
        "\n" if unit == "newline" else " ",
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("dup").cast("long")).alias("n_dropped"),
        kept.alias("kept_text"),
    )


# --- URL canonicalization ---------------------------------------------------

#: tracking query parameters stripped during canonicalization. The regex is
#: capture-group-free (Java uses $1, RE2 uses \1 — avoiding groups keeps the
#: Spark plan and the DuckDB oracle on literally the same pattern strings).
TRACKING_PARAMS_RE = "[?&](utm_[^&]*|ref=[^&]*|fbclid=[^&]*)"

#: ordered (pattern, replacement) canonicalization pipeline, shared verbatim
#: with the oracle SQL. Documented constraint: tracking params are assumed
#: to form the ENTIRE query string (true for the synthetic URLs here); a
#: mixed query would need a capture-group rewrite of the '&'→'?' promotion,
#: which Java and RE2 spell differently.
URL_CANON_STEPS: tuple[tuple[str, str], ...] = (
    ("#.*$", ""),  # fragment
    ("^https?://", ""),  # scheme
    ("^www\\.", ""),  # www prefix
    (TRACKING_PARAMS_RE, ""),  # tracking params
    ("\\?$", ""),  # empty query left by param stripping
    ("/index\\.html$", ""),  # default-document suffix
    ("/+$", ""),  # trailing slashes
)


def url_canonicalize(url: Column) -> Column:
    """Canonical URL: lowercase then the shared regex pipeline above."""
    out = F.lower(url)
    for pat, rep in URL_CANON_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def url_canonicalize_sql(expr: str) -> str:
    """The IDENTICAL pipeline as DuckDB SQL, generated from the same
    constant table (one source of truth; RE2 needs the explicit 'g' flag
    where Java's regexp_replace is global by default)."""
    out = f"lower({expr})"
    for pat, rep in URL_CANON_STEPS:
        # DuckDB standard string literals keep backslashes verbatim (unlike
        # Python source), so only quotes need escaping — the pattern string
        # reaching RE2 is byte-identical to the one reaching Java regex.
        lit = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{lit}', '{rep}', 'g')"
    return out


def url_dedup(
    df: DataFrame, url_col: str, id_col: str = "doc_id", len_col: str = "n_chars"
) -> DataFrame:
    """One page per canonical URL: longest text wins, ties to smallest id.

    One shuffle on the canonical URL (both window functions share the
    partitioning); emits (curl, keeper, keeper_chars, n_copies).
    """
    curl = url_canonicalize(F.col(url_col)).alias("curl")
    w = Window.partitionBy("curl")
    ranked = df.select(curl, F.col(id_col), F.col(len_col)).select(
        "curl",
        F.col(id_col),
        F.col(len_col),
        F.row_number()
        .over(w.orderBy(F.col(len_col).desc(), F.col(id_col)))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_copies"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "curl",
        F.col(id_col).alias("keeper"),
        F.col(len_col).cast("long").alias("keeper_chars"),
        F.col("n_copies").cast("long").alias("n_copies"),
    )


# --- epoch upsampling --------------------------------------------------------


def epoch_upsample_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Integer epoch/remainder plan for a uniform-per-domain token budget.

    The corpus' total token count is split uniformly across domains;
    domain d then contributes ``epochs = target // tokens_d`` full passes
    (0 for head domains — a downsample) plus a partial pass: documents
    ordered by id-hash, taken while their cumulative tokens fit the
    remainder. All integer math, so the plan is bit-exact cross-engine
    and reproducible under any partitioning.

    Shape: one pruned-column pass for per-domain counts (map-side
    combine), the domains-sized stats broadcast back, a per-domain window
    cumsum (partitioned — never a global sort), and a final domains-sized
    agg.
    """
    n_toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    docs = df.select(
        F.col(id_col), F.col(domain_col).alias("domain"), n_toks.alias("n_toks")
    )
    per_dom = docs.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").alias("domain_tokens")
    )
    tot = per_dom.agg(
        F.sum("domain_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_domains"),
    )
    # `div` (not floor of a double ratio): the budget arithmetic must be
    # EXACT integer division to stay bit-identical with the oracle's `//`
    stats = per_dom.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_docs",
        "domain_tokens",
        F.expr("total_tokens div n_domains").alias("target_tokens"),
    )
    stats = stats.select(
        "domain",
        "n_docs",
        "domain_tokens",
        "target_tokens",
        F.expr("target_tokens div domain_tokens").alias("epochs"),
        (F.col("target_tokens") % F.col("domain_tokens")).alias("rem_tokens"),
    )
    w = (
        Window.partitionBy("domain")
        .orderBy(id_hash60(F.col(id_col)), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = docs.select(
        "domain", F.col(id_col), F.sum("n_toks").over(w).alias("cum")
    )
    sel = cum.join(F.broadcast(stats), "domain").where(
        F.col("cum") <= F.col("rem_tokens")
    )
    extras = sel.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_extra_docs"),
        F.max("cum").alias("extra_tokens"),
    )
    return (
        stats.join(extras, "domain", "left")
        .select(
            F.col("domain").alias("source"),
            "n_docs",
            "domain_tokens",
            "target_tokens",
            "epochs",
            F.coalesce(F.col("n_extra_docs"), F.lit(0)).cast("long").alias(
                "n_extra_docs"
            ),
            F.coalesce(F.col("extra_tokens"), F.lit(0)).cast("long").alias(
                "extra_tokens"
            ),
        )
    )


# --- text normalization -------------------------------------------------------

#: ordered literal (search, replace) pairs run BEFORE lowercasing — the
#: unicode-punctuation folding every corpus pass does (curly quotes,
#: guillemets, dashes, ellipsis, NBSP). Literal `replace`, not regex, so the
#: Java and RE2 dialect question never arises for this table.
NORM_REPLACES: tuple[tuple[str, str], ...] = (
    ("«", '"'),  # «
    ("»", '"'),  # »
    ("“", '"'),  # "
    ("”", '"'),  # "
    ("’", "'"),  # '
    ("—", "-"),  # em dash
    ("…", "..."),  # ellipsis
    ("\u00a0", " "),  # NBSP
)

#: whitespace collapse AFTER the NBSP fold — a plain space class, shared
#: verbatim with the oracle (no \s, whose dialect nuances differ)
NORM_WS_RE = " +"


def normalize_text(col: Column) -> Column:
    """Punctuation fold → lowercase → collapse runs of spaces → trim."""
    out = col
    for search, rep in NORM_REPLACES:
        out = F.replace(out, F.lit(search), F.lit(rep))
    return F.trim(F.regexp_replace(F.lower(out), NORM_WS_RE, " "))


def normalize_text_sql(expr: str) -> str:
    """The IDENTICAL normalization as DuckDB SQL, from the same tables."""
    out = expr
    for search, rep in NORM_REPLACES:
        out = f"replace({out}, '{search}', '{rep.replace(chr(39), chr(39) * 2)}')"
    return f"trim(regexp_replace(lower({out}), '{NORM_WS_RE}', ' ', 'g'))"


# --- domain blocklist filtering ------------------------------------------------

#: blocked registrable domains / exact hosts. A host is blocked when ANY of
#: its dot-suffix chains equals an entry — so `src1.example.com` takes the
#: bare host AND every subdomain, while `cdn.src4.example.com` takes only
#: that exact host (the standard adblock/safety-list semantics).
DOMAIN_BLOCKLIST: tuple[str, ...] = (
    "src1.example.com",
    "src7.example.com",
    "cdn.src4.example.com",
)


def host_suffixes(host: Column) -> Column:
    """All dot-suffix chains of a host, longest first."""
    parts = F.split(host, "\\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, i, F.size(parts) - i + 1), "."),
    )


def domain_blocklist_stats(
    df: DataFrame,
    host_col: str,
    group_col: str = "source",
    blocklist: tuple[str, ...] = DOMAIN_BLOCKLIST,
) -> DataFrame:
    """Per-group keep/drop accounting under the suffix-chain blocklist.

    The blocklist is a literal membership set (broadcast-sized by nature —
    real lists are a few MB, shipped inside the plan or a broadcast join),
    probed with `exists` over the suffix array: zero joins, zero extra
    shuffles beyond the final group agg. Linear at any corpus size.
    """
    blocked = F.exists(
        host_suffixes(F.col(host_col)), lambda s: s.isin(*blocklist)
    )
    return (
        df.select(F.col(group_col), blocked.cast("long").alias("blocked"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("blocked").alias("n_blocked"),
            (F.count(F.lit(1)) - F.sum("blocked")).alias("n_kept"),
        )
    )


# --- per-domain calibrated quality filtering ------------------------------------

#: fraction of each domain dropped from the bottom of the score ordering,
#: as an EXACT rational (numerator, denominator): the cutoff rank is
#: ``ceil(q·n)`` computed as ``(num·n + den − 1) div den`` — pure integer
#: math, never ``ceil`` of a double product, so a non-dyadic q (e.g. 1/3)
#: cannot drift between engines' float rounding
CALIBRATION_Q_NUM = 1
CALIBRATION_Q_DEN = 4


def calibrated_quality_stats(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    group_col: str = "source",
    q_num: int = CALIBRATION_Q_NUM,
    q_den: int = CALIBRATION_Q_DEN,
) -> DataFrame:
    """Per-domain quantile-calibrated quality cutoff (CCNet §4.3 buckets
    its perplexity filter per language for the same reason: one global
    threshold over-prunes clean domains and under-prunes noisy ones).

    The cutoff is the score of the row at rank ``ceil(q·n)`` under the
    total order (score ASC, id ASC) within each domain, with the rank
    computed as ``(q_num·n + q_den − 1) div q_den`` — exact integer
    selection under an exact rational q, not an interpolated percentile
    and never float ``ceil``, so it is bit-identical cross-engine for ANY
    q. One partitioned window (never a global sort) + a domains-sized
    agg; the filter itself is a broadcast-joined predicate. Emits per
    domain: cutoff (in the score column's own type), n_total, n_kept.
    """
    from pyspark.sql import Window as W

    if not (0 < q_num <= q_den):
        raise ValueError(f"q must be a rational in (0, 1]: {q_num}/{q_den}")
    w = W.partitionBy(group_col).orderBy(F.col(score_col), F.col(id_col))
    ranked = df.select(
        F.col(group_col),
        F.col(score_col).alias("score"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy(group_col)).alias("n"),
    )
    cut_rank = F.expr(f"({q_num} * n + {q_den - 1}) div {q_den}")
    cutoffs = ranked.groupBy(group_col).agg(
        F.min(
            F.when(F.col("rn") == cut_rank, F.col("score"))
        ).alias("cutoff")
    )
    return (
        ranked.join(F.broadcast(cutoffs), group_col)
        .groupBy(group_col)
        .agg(
            F.min("cutoff").alias("cutoff"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum((F.col("score") >= F.col("cutoff")).cast("long")).alias(
                "n_kept"
            ),
        )
    )


# --- contrastive triplet mining ----------------------------------------------

#: negative-candidate offsets tried in order; the first id that is neither
#: the anchor, its positive, nor any LSH partner wins
NEG_OFFSETS = (0, 1, 2)


def contrastive_triplets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(anchor, pos_id, neg_id) triplets for contrastive training.

    Positives: the anchor's smallest MinHash-LSH candidate partner — the
    same linear banded-signature path the dedup tier uses (never
    all-pairs). Negatives: the id at ``(anchor + n//2 + off) % n`` for the
    first offset that avoids the anchor, its positive, and every LSH
    partner (ids are dense 0..n-1 in this corpus; n comes from a
    broadcast scalar agg, not a collect). Deterministic — no seeds, no
    partitioning dependence.
    """
    from pyspark import StorageLevel

    # the signature relation feeds both sides of the band join, and the
    # partner relation feeds three consumers (the positive agg, the
    # anti-join, and its own union build) — without materialization each
    # consumer re-derives the whole shingle pipeline from the corpus scan
    # (measured: 9 scans unpersisted vs 2 persisted)
    sig = dedup.minhash_signatures_arrays(
        dedup.shingle_arrays(df, id_col, text_col, n=3), id_col
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cand = dedup.lsh_candidate_pairs(sig, id_col)
    partners = (
        cand.select(F.col("id_a").alias("anchor"), F.col("id_b").alias("partner"))
        .unionAll(
            cand.select(
                F.col("id_b").alias("anchor"), F.col("id_a").alias("partner")
            )
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pos = partners.groupBy("anchor").agg(F.min("partner").alias("pos_id"))
    n = df.agg(F.count(F.lit(1)).alias("n"))
    offs = F.explode(F.array(*[F.lit(o) for o in NEG_OFFSETS])).alias("off")
    neg_cand = (
        pos.crossJoin(F.broadcast(n))
        .select("anchor", "pos_id", "n", offs)
        .withColumn("neg", F.expr("(anchor + n div 2 + off) % n"))
        .where((F.col("neg") != F.col("anchor")) & (F.col("neg") != F.col("pos_id")))
    )
    ok = neg_cand.join(
        partners,
        (neg_cand["anchor"] == partners["anchor"])
        & (neg_cand["neg"] == partners["partner"]),
        "left_anti",
    )
    return ok.groupBy("anchor", "pos_id").agg(
        F.min_by("neg", "off").alias("neg_id")
    )


# --- corpus datasheet ---------------------------------------------------------


def corpus_datasheet(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    group_col: str = "source",
) -> DataFrame:
    """Per-source corpus datasheet — the summary card corpus releases
    publish (Datasheets for Datasets, Gebru et al. 2021; the per-source
    tables in the Dolma / RefinedWeb corpus reports): volume (docs,
    tokens, chars), corpus-wide exact-duplication attribution, and the
    language mix, one row per source.

    All integer math (rates are ×10^6 fixed-point via ``div``):

    - ``n_tokens`` counts NON-EMPTY whitespace tokens (delimiter runs
      mint empty split elements — the standing empty-token hazard);
    - ``n_dup_docs`` counts docs whose exact (byte-identical) text occurs
      ≥2 times in the WHOLE corpus, so a page syndicated across sources
      is charged to every source carrying it (cross-source attribution —
      per-source grouping of a corpus-wide count join, the dedup_exact
      shape). The count key is ``md5(text)``, not the text itself: at
      100 TB the dup-count shuffle moves 32-char digests instead of full
      documents, and both engines compute the same md5 so the oracle
      stays byte-exact (collisions, were one ever to occur, would be the
      SAME collision on both sides);
    - ``top_lang`` is the majority language with ties to the
      lexicographically smallest, selected by a partitioned row_number
      under a total order (never a bare max).

    Shapes: one narrow scan feeds a text-keyed count agg and a join back
    on the same key (AQE exchange reuse), then a sources-sized agg; the
    language mix is a second partial agg + a sources-sized broadcast
    join. Linear at any corpus size; no all-pairs anywhere.
    """
    toks = F.size(
        F.filter(
            F.split(F.col(text_col), " "), lambda x: F.length(x) > 0
        )
    )
    base = df.select(
        F.col(group_col),
        F.col(lang_col),
        F.md5(F.col(text_col)).alias("fp"),
        F.length(F.col(text_col)).alias("nchar"),
        toks.alias("ntok"),
    )
    tc = base.groupBy("fp").agg(F.count(F.lit(1)).alias("tcount"))
    per = (
        base.join(tc, "fp")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
            F.sum("nchar").cast("long").alias("n_chars"),
            F.sum((F.col("tcount") >= 2).cast("long")).alias("n_dup_docs"),
            F.countDistinct(F.col(lang_col)).cast("long").alias("n_langs"),
        )
    )
    # NULL lang is NOT a language: it is excluded from the mix entirely,
    # matching countDistinct's NULL-skip in n_langs above. Ranking a NULL
    # group would also be a cross-engine hazard — Spark sorts NULLS FIRST
    # on ASC, DuckDB NULLS LAST, so a NULL-lang group tying on count
    # would pick different top_langs. The join back is LEFT so a source
    # whose docs are ALL unidentified keeps its volume row
    # (top_lang NULL, share 0).
    lc = (
        df.where(F.col(lang_col).isNotNull())
        .groupBy(group_col, lang_col)
        .agg(F.count(F.lit(1)).alias("lcnt"))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("lcnt").desc(), F.col(lang_col)
    )
    top = (
        lc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col(group_col),
            F.col(lang_col).alias("top_lang"),
            F.col("lcnt").alias("top_lang_docs"),
        )
    )
    return per.join(F.broadcast(top), group_col, "left").select(
        group_col,
        "n_docs",
        "n_tokens",
        "n_chars",
        F.col("n_dup_docs").cast("long").alias("n_dup_docs"),
        F.expr("(n_dup_docs * 1000000) div n_docs").alias("dup_rate_fp"),
        "n_langs",
        "top_lang",
        F.expr(
            "(coalesce(top_lang_docs, 0) * 1000000) div n_docs"
        ).alias("top_lang_share_fp"),
    )
